"""Tests for stateful actors: seen-set shards, cuckoo filter, robots cache,
politeness buckets."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from webcrawl_lowres_lang_ray.state.politeness import HostBudget
from webcrawl_lowres_lang_ray.state.seen import CuckooFilter


def _digest(i: int) -> bytes:
    return hashlib.sha1(str(i).encode()).digest()


class TestCuckooFilter:
    def test_no_false_negatives(self):
        cf = CuckooFilter(capacity=4096)
        keys = [_digest(i) for i in range(3000)]
        for k in keys:
            cf.add(k)
        assert all(cf.might_contain(k) for k in keys)

    def test_false_positive_rate_bounded(self):
        cf = CuckooFilter(capacity=8192)
        for i in range(4000):
            cf.add(_digest(i))
        probes = [_digest(i) for i in range(100_000, 120_000)]
        fp = sum(cf.might_contain(p) for p in probes)
        assert fp / len(probes) < 0.02  # 16-bit fingerprints, 2 buckets

    def test_overflow_goes_to_stash_not_lost(self):
        cf = CuckooFilter(capacity=16)  # deliberately tiny
        keys = [_digest(i) for i in range(500)]
        for k in keys:
            cf.add(k)
        assert all(cf.might_contain(k) for k in keys)


@pytest.mark.usefixtures("ray_session")
class TestSeenShards:
    def test_contains_and_add_first_wins(self):
        from webcrawl_lowres_lang_ray.state.seen import (
            create_seen_shards,
            seen_filter_new,
        )

        shards = create_seen_shards(4)
        batch1 = [_digest(i) for i in range(100)]
        new1 = seen_filter_new(shards, batch1)
        assert new1.all()
        batch2 = [_digest(i) for i in range(50, 150)]
        new2 = seen_filter_new(shards, batch2)
        assert (~new2[:50]).all() and new2[50:].all()

    def test_snapshot_restore_roundtrip(self):
        from webcrawl_lowres_lang_ray.state.seen import (
            create_seen_shards,
            restore_all,
            seen_filter_new,
            snapshot_all,
        )

        shards = create_seen_shards(3)
        keys = [_digest(i) for i in range(200)]
        seen_filter_new(shards, keys)
        blobs = snapshot_all(shards)
        fresh = create_seen_shards(3)
        restore_all(fresh, blobs)
        again = seen_filter_new(fresh, keys)
        assert not again.any()  # everything already present after restore


@pytest.mark.usefixtures("ray_session")
class TestPagedSeenStore:
    """The disk-paged exact store: after a delta snapshot, an actor's exact
    keys live ONLY in sorted on-disk runs (memmapped, cuckoo-gated probes);
    RAM holds just the keys added since.  Membership answers never change."""

    def test_paging_bounds_ram_and_keeps_membership(self, tmp_path):
        import ray

        from webcrawl_lowres_lang_ray.state.seen import (
            create_seen_shards,
            seen_filter_new,
            snapshot_all_to,
        )

        shards = create_seen_shards(3)
        wave1 = [_digest(i) for i in range(500)]
        assert seen_filter_new(shards, wave1).all()
        snapshot_all_to(
            shards, [str(tmp_path / f"d1-{s}.bin") for s in range(3)]
        )
        # the paged-store bound: zero exact keys in actor RAM after paging
        assert sum(ray.get([s.ram_key_count.remote() for s in shards])) == 0
        assert sum(ray.get([s.run_count.remote() for s in shards])) >= 1
        # membership is exact across the run files: members all present,
        # a disjoint probe set all absent (cuckoo FPs must be confirmed away)
        assert not seen_filter_new(shards, wave1).any()
        probes = [_digest(i) for i in range(10_000, 12_000)]
        assert seen_filter_new(shards, probes).all()  # marks wave2 seen
        snapshot_all_to(
            shards, [str(tmp_path / f"d2-{s}.bin") for s in range(3)]
        )
        assert sum(ray.get([s.ram_key_count.remote() for s in shards])) == 0
        # spans both runs + fresh keys in one batch
        mixed = wave1[::7] + probes[::5] + [_digest(i) for i in range(20_000, 20_050)]
        got = seen_filter_new(shards, mixed)
        expect = np.array(
            [False] * len(wave1[::7]) + [False] * len(probes[::5]) + [True] * 50
        )
        assert (got == expect).all()
        assert sum(ray.get([s.size.remote() for s in shards])) == 2550

    def test_probe_readonly_add_idempotent(self):
        import ray

        from webcrawl_lowres_lang_ray.state.seen import (
            create_seen_shards,
            seen_add,
            seen_probe_new,
        )

        shards = create_seen_shards(2)
        keys = [_digest(i) for i in range(300)]
        # probe mutates nothing: repeated probes return identical verdicts
        assert seen_probe_new(shards, keys).all()
        assert seen_probe_new(shards, keys).all()
        assert sum(ray.get([s.size.remote() for s in shards])) == 0
        # add is an idempotent set union (task-retry safety)
        assert seen_add(shards, keys) == 300
        assert seen_add(shards, keys) == 0
        assert sum(ray.get([s.size.remote() for s in shards])) == 300
        assert not seen_probe_new(shards, keys).any()

    def test_restore_from_is_paged(self, tmp_path):
        import ray

        from webcrawl_lowres_lang_ray.state.seen import (
            create_seen_shards,
            restore_all_from,
            seen_filter_new,
            snapshot_all_to,
        )

        shards = create_seen_shards(2)
        keys = [_digest(i) for i in range(400)]
        seen_filter_new(shards, keys)
        paths = [str(tmp_path / f"d-{s}.bin") for s in range(2)]
        snapshot_all_to(shards, paths)
        fresh = create_seen_shards(2)
        restore_all_from(fresh, [[p] for p in paths])
        # restored exact authority is the memmapped run, not actor RAM
        assert sum(ray.get([s.ram_key_count.remote() for s in fresh])) == 0
        assert not seen_filter_new(fresh, keys).any()
        assert seen_filter_new(fresh, [_digest(9_999_999)]).all()

    def test_budget_dropped_candidates_recrawlable(self):
        """oracle.py:106-112 order: the max_pages budget drops a candidate
        BEFORE seen-marking, so a raised-budget resume re-crawls it."""
        import pandas as pd

        from webcrawl_lowres_lang_ray.config import CrawlConfig
        from webcrawl_lowres_lang_ray.frontier import (
            _insert_driver,
            _prepare_candidates,
        )
        from webcrawl_lowres_lang_ray.state.seen import create_seen_shards

        cand = pd.DataFrame(
            {
                "url": [f"http://site{i}.example.com/p" for i in range(20)],
                "query_id": np.int64(0),
                "engine": "test",
                "ord1": np.arange(20, dtype=np.int64),
                "ord2": np.int64(0),
                "priority": np.int64(0),
            }
        )
        shards = create_seen_shards(2)
        cfg = CrawlConfig(max_pages=8, apply_robots=False)
        first = _insert_driver(_prepare_candidates(cand, cfg), shards, 0, cfg)
        assert len(first) == 8
        # resume with a raised budget: the 12 dropped rows were never
        # seen-marked, so they insert now; the 8 inserted ones stay deduped
        cfg2 = CrawlConfig(max_pages=0, apply_robots=False)
        second = _insert_driver(_prepare_candidates(cand, cfg2), shards, 8, cfg2)
        assert len(second) == 12
        assert set(second["url"]) == set(cand["url"]) - set(first["url"])


@pytest.mark.usefixtures("ray_session")
class TestRobotsCache:
    def test_caching_and_blocking(self, small_corpus):
        import os

        from webcrawl_lowres_lang_ray.sources.synth import load_robots
        from webcrawl_lowres_lang_ray.state.robots import (
            create_robots_actors,
            robots_blocked_mask,
        )
        import ray

        rules = load_robots(small_corpus)
        host = next(iter(rules))
        actors = create_robots_actors(os.path.join(small_corpus, "robots.parquet"), 2)
        urls = [
            f"https://{host}/private/x",
            f"https://{host}/public/x",
            "https://unknown.example.net/anything",
            f"https://{host}/private/y",
        ]
        mask = robots_blocked_mask(actors, urls)
        assert list(mask) == [True, False, False, True]
        # cache: the host's rules fetched once per owning shard despite 2 queries
        stats = ray.get([a.stats.remote() for a in actors])
        total_fetches = sum(s["fetches"] for s in stats)
        assert total_fetches <= 2  # one per distinct host routed


class TestPoliteness:
    def test_budget_per_wave(self):
        hb = HostBudget(2)
        rows = [(0, "a"), (1, "a"), (2, "a"), (3, "b")]
        assert hb.admit_order(rows) == [True, True, False, True]
        hb.new_wave()
        assert hb.try_admit("a")

    def test_matches_groupby_headk_semantics(self):
        import pandas as pd

        from webcrawl_lowres_lang_ray.frontier import _admit_driver

        rng = np.random.RandomState(7)
        df = pd.DataFrame(
            {
                "seq": np.arange(500),
                "host": [f"h{rng.randint(10)}" for _ in range(500)],
                "priority": np.int64(0),
            }
        )
        k = 3
        marked = _admit_driver(df.sample(frac=1, random_state=1), k)
        hb = HostBudget(k)
        expect = hb.admit_order(list(zip(marked["seq"], marked["host"])))
        assert list(marked["admit"]) == expect


class TestMapGroupsBlockIntegrity:
    def test_group_never_splits_under_small_block_cap(self, ray_session):
        """Pins the Ray invariant the streamed wave relies on: admission sets
        target_max_block_size=1MB (frontier.py _run_wave_streamed) so hot
        partitions split into several fetch/score tasks — but a groupby key
        group must STILL arrive at map_groups in one piece (politeness
        budgets are computed per whole host group).  A ~5 MB single group
        under a 1 MB cap must reach the UDF as exactly one call."""
        import pandas as pd
        import ray as _ray

        ctx = _ray.data.DataContext.get_current()
        prev = ctx.target_max_block_size
        ctx.target_max_block_size = 1 << 20
        try:
            n = 50_000
            df = pd.DataFrame(
                {
                    "g": np.r_[
                        np.zeros(n, dtype=np.int64), np.ones(1000, dtype=np.int64)
                    ],
                    "payload": ["x" * 100] * (n + 1000),
                }
            )
            parts = np.array_split(np.arange(len(df)), 8)
            ds = _ray.data.from_pandas([df.iloc[ix] for ix in parts])

            def fn(g: pd.DataFrame) -> pd.DataFrame:
                return pd.DataFrame(
                    {"g": [int(g["g"].iloc[0])], "rows": [len(g)]}
                )

            out = (
                ds.groupby("g")
                .map_groups(fn, batch_format="pandas")
                .to_pandas()
                .sort_values("g")
                .reset_index(drop=True)
            )
            assert list(out["g"]) == [0, 1]
            assert list(out["rows"]) == [n, 1000]
        finally:
            ctx.target_max_block_size = prev
