"""Tests for the round-4 relational/data-engineering tail: CDC snapshot
diff, distributed skyline, per-doc token entropy, audience-overlap
INTERSECT counts, and the FastSS deletion-neighborhood lev-1 join."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# SQL-oracle conformance (the same gate the driver runs, at sf0.001)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "name",
    ["snapshot_diff", "doc_token_entropy", "doc_skyline",
     "event_type_user_overlap", "name_fuzzy_pairs"],
)
def test_matches_duckdb_oracle(name):
    import duckdb

    import __ray_entry__ as e
    from scripts.check_correctness import to_pandas, value_hash

    con = duckdb.connect()
    for t in ("documents", "events", "orders", "customer"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    mine = to_pandas(e.queries()[name](SF))
    theirs = con.execute(e.oracle_sql()[name]).df()
    assert len(mine) == len(theirs)
    assert sorted(mine.columns) == sorted(theirs.columns)
    assert value_hash(mine) == value_hash(theirs)


# ---------------------------------------------------------------------------
# snapshot_diff
# ---------------------------------------------------------------------------


class TestSnapshotDiff:
    def _diff(self, old_rows, new_rows, **kw):
        import ray.data

        from webcrawl_lowres_lang_ray.stages.cdc import snapshot_diff

        old = ray.data.from_pandas(pd.DataFrame(old_rows))
        new = ray.data.from_pandas(pd.DataFrame(new_rows))
        out = snapshot_diff(old, new, "k", ["v"], parts=4, **kw).to_pandas()
        # an all-unchanged diff is EMPTY and an empty Dataset loses its
        # schema on to_pandas() — callers must guard before column access
        if len(out) == 0:
            return out
        return out.sort_values("k").reset_index(drop=True)

    def test_three_change_classes(self):
        out = self._diff(
            [{"k": 1, "v": "a"}, {"k": 2, "v": "b"}, {"k": 3, "v": "c"}],
            [{"k": 2, "v": "b"}, {"k": 3, "v": "C"}, {"k": 4, "v": "d"}],
        )
        got = dict(zip(out["k"], out["change"]))
        assert got == {1: "removed", 3: "changed", 4: "added"}

    def test_unchanged_rows_die_in_partition(self):
        out = self._diff([{"k": 1, "v": "a"}], [{"k": 1, "v": "a"}])
        assert len(out) == 0

    def test_include_unchanged_flag(self):
        out = self._diff(
            [{"k": 1, "v": "a"}], [{"k": 1, "v": "a"}], include_unchanged=True
        )
        assert list(out["change"]) == ["unchanged"]

    def test_null_semantics_is_distinct_from(self):
        out = self._diff(
            [{"k": 1, "v": None}, {"k": 2, "v": None}],
            [{"k": 1, "v": None}, {"k": 2, "v": "x"}],
        )
        got = dict(zip(out["k"], out["change"]))
        # NULL == NULL (unchanged, dropped); NULL vs value = changed
        assert got == {2: "changed"}

    def test_old_new_values_carried(self):
        out = self._diff([{"k": 1, "v": "a"}], [{"k": 1, "v": "z"}])
        assert out.loc[0, "old_v"] == "a" and out.loc[0, "new_v"] == "z"


# ---------------------------------------------------------------------------
# skyline
# ---------------------------------------------------------------------------


class TestSkyline:
    def test_local_matches_bruteforce_under_ties(self):
        from webcrawl_lowres_lang_ray.stages.skyline import (
            _local_skyline,
            _quadratic_skyline,
        )

        rng = np.random.default_rng(7)
        for _ in range(100):
            m = rng.integers(0, 5, size=(rng.integers(1, 50), 2)).astype(float)
            assert (_local_skyline(m) == _quadratic_skyline(m)).all()

    def test_duplicate_frontier_points_both_survive(self):
        from webcrawl_lowres_lang_ray.stages.skyline import _quadratic_skyline

        m = np.array([[5.0, 5.0], [5.0, 5.0], [1.0, 1.0]])
        assert list(_quadratic_skyline(m)) == [True, True, False]

    def test_distributed_end_to_end(self):
        import ray.data

        from webcrawl_lowres_lang_ray.stages.skyline import skyline

        rng = np.random.default_rng(3)
        df = pd.DataFrame(
            {"id": np.arange(500), "x": rng.random(500), "y": rng.random(500)}
        )
        ds = ray.data.from_pandas(df).repartition(8)
        got = skyline(ds, dims=["x", "y"], keep_cols=["id"])
        # brute force
        m = df[["x", "y"]].to_numpy()
        keep = []
        for k in range(len(m)):
            ge = (m >= m[k]).all(axis=1)
            gt = (m > m[k]).any(axis=1)
            ge[k] = False
            if not (ge & gt).any():
                keep.append(df["id"][k])
        assert sorted(got["id"]) == sorted(keep)

    def test_candidate_cap_raises(self):
        import ray.data

        from webcrawl_lowres_lang_ray.stages import skyline as sk

        df = pd.DataFrame({"x": np.arange(100.0), "y": -np.arange(100.0)})
        ds = ray.data.from_pandas(df)
        old = sk.SKYLINE_CANDIDATE_CAP
        sk.SKYLINE_CANDIDATE_CAP = 10
        try:
            with pytest.raises(ValueError, match="candidate set"):
                sk.skyline(ds, dims=["x", "y"])
        finally:
            sk.SKYLINE_CANDIDATE_CAP = old


# ---------------------------------------------------------------------------
# token entropy
# ---------------------------------------------------------------------------


class TestTokenEntropy:
    def test_known_values(self):
        from webcrawl_lowres_lang_ray.stages.textstats import token_entropy_batch

        b = pd.DataFrame(
            {"doc_id": [1, 2, 3], "text": ["a b a b", "x", "   "]}
        )
        out = token_entropy_batch(b).set_index("doc_id")
        assert out.loc[1, "entropy"] == pytest.approx(np.log(2))
        assert out.loc[2, "entropy"] == 0.0
        assert out.loc[3, "entropy"] == 0.0 and out.loc[3, "n_tokens"] == 0


# ---------------------------------------------------------------------------
# fuzzy lev-1 join
# ---------------------------------------------------------------------------


class TestFuzzyPairs:
    def test_lev1_mask_classes(self):
        from webcrawl_lowres_lang_ray.stages.fuzzy import _lev1_mask

        a = np.array(["abc", "abc", "abc", "abc", "ac", "abc"], dtype=object)
        b = np.array(["abd", "abc", "xyz", "abcd", "abc", "ba"], dtype=object)
        # substitution=1, equal=0, 3 subs, insertion=1, deletion=1, len-diff>1
        assert list(_lev1_mask(a, b)) == [True, False, False, True, True, False]

    def test_deletion_keys_cover_all_lev1_pairs(self):
        import itertools

        import ray.data

        from webcrawl_lowres_lang_ray.stages.fuzzy import fuzzy_pairs_lev1

        words = ["cat", "cut", "cart", "at", "dog", "dig", "cats", "ca"]

        def lev(s, t):
            dp = list(range(len(t) + 1))
            for i, cs in enumerate(s, 1):
                prev, dp[0] = dp[0], i
                for j, ct in enumerate(t, 1):
                    prev, dp[j] = dp[j], min(
                        dp[j] + 1, dp[j - 1] + 1, prev + (cs != ct)
                    )
            return dp[len(t)]

        want = sorted(
            tuple(sorted(p))
            for p in itertools.combinations(words, 2)
            if lev(*p) == 1
        )
        ds = ray.data.from_pandas(pd.DataFrame({"w": words * 3}))  # with dups
        got = fuzzy_pairs_lev1(ds, "w", parts=4).to_pandas()
        assert sorted(zip(got["w_a"], got["w_b"])) == want

    def test_transposition_is_not_lev1(self):
        import ray.data

        from webcrawl_lowres_lang_ray.stages.fuzzy import fuzzy_pairs_lev1

        ds = ray.data.from_pandas(pd.DataFrame({"w": ["ab", "ba"]}))
        assert len(fuzzy_pairs_lev1(ds, "w", parts=2).to_pandas()) == 0
