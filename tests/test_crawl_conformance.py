"""E2E conformance: the distributed Ray Data crawl == the single-threaded
oracle, bit-for-bit, on every ledger column (SURVEY.md §5 step 3).

Pinned invariants (north rule / input_hint):
* byte-identical extracted ``text`` per url,
* exact crawl ordering (``seq`` and ``wave``),
* identical URL-seen membership,
* identical NLP columns and rejection flags,
* determinism across reruns and across the driver/Ray admission-insertion
  code paths,
* kill-and-resume equals an uninterrupted run.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from webcrawl_lowres_lang_ray.config import CrawlConfig
from webcrawl_lowres_lang_ray.frontier import LEDGER_META_COLS, load_ledger, run_crawl
from webcrawl_lowres_lang_ray.oracle import run_oracle

CFG = CrawlConfig(per_host_per_wave=4)


def _oracle_df(corpus, cfg) -> pd.DataFrame:
    res = run_oracle(corpus, cfg)
    return (
        pd.DataFrame(res.ledger)[LEDGER_META_COLS]
        .sort_values("seq")
        .reset_index(drop=True)
    )


def _assert_ledger_equal(eng: pd.DataFrame, orc: pd.DataFrame):
    assert len(eng) == len(orc), f"row count {len(eng)} != {len(orc)}"
    for c in LEDGER_META_COLS:
        bad = (eng[c] != orc[c])
        assert not bad.any(), (
            f"column {c}: {int(bad.sum())} mismatches; first at seq "
            f"{eng.loc[bad.idxmax(), 'seq']}: {eng[c][bad].iloc[0]!r} != {orc[c][bad].iloc[0]!r}"
        )


@pytest.mark.usefixtures("ray_session")
class TestCrawlConformance:
    def test_ledger_matches_oracle(self, tiny_corpus, tmp_path):
        stats = run_crawl(tiny_corpus, str(tmp_path / "out"), CFG)
        eng = load_ledger(str(tmp_path / "out")).sort_values("seq").reset_index(drop=True)
        orc = _oracle_df(tiny_corpus, CFG)
        _assert_ledger_equal(eng, orc)
        assert stats.fetched > 0 and stats.failed > 0  # corpus exercises both
        # the M5 dispatch runs inside the crawl: non-html doc types appear,
        # and the stdlib pdfmini/docxmini kernels extract REAL text from
        # them (regression gate: M9/M10 must not fall back to the None path)
        pdf_rows = eng.loc[(eng["doc_type"] == "pdf") & eng["downloaded"]]
        docx_rows = eng.loc[(eng["doc_type"] == "docx") & eng["downloaded"]]
        assert len(pdf_rows) > 0 and (pdf_rows["text"].str.len() > 0).any()
        assert len(docx_rows) > 0 and (docx_rows["text"].str.len() > 0).any()

    def test_text_bytes_identical_to_golden(self, tiny_corpus, tmp_path):
        import glob
        import pyarrow.parquet as pq

        run_crawl(tiny_corpus, str(tmp_path / "out"), CFG)
        eng = load_ledger(str(tmp_path / "out"))
        golden = {}
        for f in glob.glob(tiny_corpus + "/pages/bucket=*.parquet"):
            t = pq.read_table(f, columns=["url", "text"])
            golden.update(zip(t["url"].to_pylist(), t["text"].to_pylist()))
        fetched = eng.loc[eng["downloaded"]]
        assert len(fetched) > 0
        for url, text in zip(fetched["url"], fetched["text"]):
            assert text == golden[url]

    def test_seen_membership_matches_oracle(self, tiny_corpus, tmp_path):
        run_crawl(tiny_corpus, str(tmp_path / "out"), CFG)
        eng = load_ledger(str(tmp_path / "out"))
        orc = run_oracle(tiny_corpus, CFG)
        assert set(eng["canon_sha1"]) == orc.seen

    def test_rerun_deterministic(self, tiny_corpus, tmp_path):
        run_crawl(tiny_corpus, str(tmp_path / "a"), CFG)
        run_crawl(tiny_corpus, str(tmp_path / "b"), CFG)
        a = load_ledger(str(tmp_path / "a"))
        b = load_ledger(str(tmp_path / "b"))
        _assert_ledger_equal(a, b)

    def test_resume_equals_uninterrupted(self, tiny_corpus, tmp_path):
        full_out = str(tmp_path / "full")
        run_crawl(tiny_corpus, full_out, CFG)
        # "kill" after 2 waves, then resume
        part_out = str(tmp_path / "part")
        run_crawl(tiny_corpus, part_out, CFG.replace(max_waves=2))
        stats = run_crawl(tiny_corpus, part_out, CFG, resume=True)
        assert stats.waves > 2
        _assert_ledger_equal(load_ledger(part_out), load_ledger(full_out))

    def test_ray_paths_equal_driver_paths(self, tiny_corpus, tmp_path, monkeypatch):
        import webcrawl_lowres_lang_ray.frontier as fr

        run_crawl(tiny_corpus, str(tmp_path / "drv"), CFG)
        # force the fully-distributed path for admission, insertion AND fetch
        monkeypatch.setattr(fr, "DRIVER_PATH_MAX_ROWS", 0)
        monkeypatch.setattr(fr, "SMALL_WAVE_MAX_ROWS", 0)
        run_crawl(tiny_corpus, str(tmp_path / "ray"), CFG)
        _assert_ledger_equal(
            load_ledger(str(tmp_path / "drv")), load_ledger(str(tmp_path / "ray"))
        )

    def test_model_cache_is_content_keyed(self, tiny_corpus):
        """warm_workers pre-builds scorer models under its own ray.put; the
        crawl's own lexicon ObjectRef must hit the same build (cache keys on
        lexicon CONTENT, not ref identity)."""
        import ray

        import webcrawl_lowres_lang_ray.frontier as fr
        from webcrawl_lowres_lang_ray.sources.synth import load_lexicon

        lex = load_lexicon(tiny_corpus)
        m1 = fr._get_model(ray.put(lex), CFG)
        m2 = fr._get_model(ray.put(dict(lex)), CFG)  # different ref, same content
        assert m1 is m2
        # the scorer's behavior depends on CrawlConfig → config is part of
        # the key: same lexicon under a different scoring config must NOT
        # reuse the model
        m3 = fr._get_model(ray.put(lex), CrawlConfig(lang_supported=False))
        assert m3 is not m1

    def test_wave_dispatch_tasks_equals_dataset(self, tiny_corpus, tmp_path, monkeypatch):
        """The raw-task scatter/gather dispatch of the driver-path wave
        (default) and the Dataset from_pandas->map_batches->to_pandas
        dispatch produce bit-for-bit identical ledgers."""
        import webcrawl_lowres_lang_ray.frontier as fr

        monkeypatch.setattr(fr, "SMALL_WAVE_MAX_ROWS", 0)  # force fan-out
        monkeypatch.setattr(fr, "_WAVE_DISPATCH", "tasks")
        run_crawl(tiny_corpus, str(tmp_path / "tasks"), CFG)
        monkeypatch.setattr(fr, "_WAVE_DISPATCH", "dataset")
        run_crawl(tiny_corpus, str(tmp_path / "dataset"), CFG)
        _assert_ledger_equal(
            load_ledger(str(tmp_path / "tasks")),
            load_ledger(str(tmp_path / "dataset")),
        )

    def test_wave_task_survives_worker_crash(self, tiny_corpus, tmp_path, monkeypatch):
        """Fault tolerance of the raw-task wave dispatch: a worker process
        dying mid-wave (os._exit, the crash Ray retries — unlike a Python
        exception) must not change the ledger.  Ledger partition writes are
        idempotent overwrites, so the retried task simply rewrites its
        partition — the multi-node story where worker loss is routine."""
        import ray

        import webcrawl_lowres_lang_ray.frontier as fr

        run_crawl(tiny_corpus, str(tmp_path / "clean"), CFG)

        marker = str(tmp_path / "died_once")

        @ray.remote(max_retries=3)
        def dying(fn, blk):
            import os as _os

            if not _os.path.exists(marker):
                with open(marker, "w"):
                    pass
                _os._exit(1)  # hard worker crash mid-task
            return fn(blk)

        monkeypatch.setattr(fr, "SMALL_WAVE_MAX_ROWS", 0)  # force fan-out
        monkeypatch.setattr(fr, "_WAVE_DISPATCH", "tasks")
        monkeypatch.setattr(fr, "_apply_wave_block", dying)
        run_crawl(tiny_corpus, str(tmp_path / "crashed"), CFG)
        assert (tmp_path / "died_once").exists(), "crash hook never fired"
        _assert_ledger_equal(
            load_ledger(str(tmp_path / "clean")),
            load_ledger(str(tmp_path / "crashed")),
        )

    def test_streamed_waves_keep_frontier_off_driver(self, tiny_corpus, tmp_path, monkeypatch):
        """With the streamed path forced, the pending frontier must never
        become a driver frame: _read_frontier is never called inside the
        crawl, and every Dataset->driver pull stays O(histogram)."""
        import ray.data

        import webcrawl_lowres_lang_ray.frontier as fr

        monkeypatch.setattr(fr, "DRIVER_PATH_MAX_ROWS", 0)

        def no_read(path):
            raise AssertionError(f"driver read the frontier: {path}")

        monkeypatch.setattr(fr, "_read_frontier", no_read)
        orig = ray.data.Dataset.to_pandas
        cap = 2048  # >> rank-bucket histogram, << any frontier/ledger frame

        def capped(self, *a, **k):
            df = orig(self, *a, **k)
            assert len(df) <= cap, f"driver pulled a {len(df)}-row frame"
            return df

        monkeypatch.setattr(ray.data.Dataset, "to_pandas", capped)
        stats = fr.run_crawl(tiny_corpus, str(tmp_path / "out"), CFG)
        assert stats.inserted > 50 and stats.fetched > 0

    def test_priority_reorders_admission(self, tiny_corpus, tmp_path):
        """Priority frontier hook: under a per-host budget of 1, a
        higher-priority seed on the same host is fetched in an earlier wave
        than a lower-seq seed; the oracle agrees bit-for-bit."""
        import glob
        import shutil

        import pyarrow as pa
        import pyarrow.parquet as pq

        from webcrawl_lowres_lang_ray.functions.urltools import host_batch

        corpus = str(tmp_path / "prio_corpus")
        shutil.copytree(tiny_corpus, corpus)
        # find one host with >= 2 pages; seed both its urls, the later one
        # with higher priority
        urls = []
        for f in glob.glob(corpus + "/pages/bucket=*.parquet"):
            urls.extend(pq.read_table(f, columns=["url"])["url"].to_pylist())
        by_host: dict[str, list[str]] = {}
        for u in sorted(urls):
            by_host.setdefault(host_batch(np.array([u], dtype=object))[0], []).append(u)
        host, pair = next((h, v[:2]) for h, v in sorted(by_host.items()) if len(v) >= 2)
        seeds = pa.table(
            {
                "seq": pa.array([0, 1], type=pa.int64()),
                "url": pa.array(pair, type=pa.string()),
                "query_id": pa.array([0, 0], type=pa.int64()),
                "engine": pa.array(["seed", "seed"], type=pa.string()),
                "priority": pa.array([0, 5], type=pa.int64()),
            }
        )
        pq.write_table(seeds, corpus + "/seeds.parquet")
        cfg = CFG.replace(per_host_per_wave=1, apply_robots=False, max_waves=3)
        run_crawl(corpus, str(tmp_path / "prio_out"), cfg)
        eng = load_ledger(str(tmp_path / "prio_out"))
        w = dict(zip(eng["url"], eng["wave"]))
        assert w[pair[1]] == 0, "high-priority seed must run in wave 0"
        assert w[pair[0]] > 0, "low-priority same-host seed must defer"
        _assert_ledger_equal(
            eng.sort_values("seq").reset_index(drop=True), _oracle_df(corpus, cfg)
        )

    def test_link_priority_conformance(self, tiny_corpus, tmp_path):
        """Non-default link_priority (links outrank waiting seeds) must stay
        bit-for-bit with the oracle — seeds default to priority 0 in BOTH
        (regression: the engine once backfilled seeds with link_priority)."""
        cfg = CFG.replace(link_priority=2, max_waves=5)
        run_crawl(tiny_corpus, str(tmp_path / "lp"), cfg)
        eng = load_ledger(str(tmp_path / "lp")).sort_values("seq").reset_index(drop=True)
        _assert_ledger_equal(eng, _oracle_df(tiny_corpus, cfg))

    def test_max_pages_caps_insertion(self, tiny_corpus, tmp_path):
        """max_pages = global seq budget, identical in engine and oracle."""
        cfg = CFG.replace(max_pages=40)
        run_crawl(tiny_corpus, str(tmp_path / "cap"), cfg)
        eng = load_ledger(str(tmp_path / "cap")).sort_values("seq").reset_index(drop=True)
        orc = _oracle_df(tiny_corpus, cfg)
        assert len(eng) == len(orc) <= 40
        _assert_ledger_equal(eng, orc)

    def test_ledger_dataset_pending_only_output(self, tiny_corpus, tmp_path):
        """A crawl stopped before any wave (max_waves=0) leaves a
        pending-only output; ledger_dataset must still produce the wave=-1
        rows instead of crashing on the empty partition list."""
        from webcrawl_lowres_lang_ray.pipelines.crawl_queries import ledger_dataset

        out = str(tmp_path / "pend")
        run_crawl(tiny_corpus, out, CFG.replace(max_waves=0))
        ds = ledger_dataset(out, columns=["seq", "url", "wave"])
        df = ds.to_pandas()
        assert len(df) > 0 and (df["wave"] == -1).all()
        full = load_ledger(out)
        assert len(full) == len(df)

    def test_politeness_budget_shapes_waves(self, tiny_corpus, tmp_path):
        s1 = run_crawl(tiny_corpus, str(tmp_path / "k1"), CFG.replace(per_host_per_wave=1))
        s8 = run_crawl(tiny_corpus, str(tmp_path / "k8"), CFG.replace(per_host_per_wave=8))
        assert s1.waves > s8.waves
        # membership (closure) is admission-order independent
        a = load_ledger(str(tmp_path / "k1"))
        b = load_ledger(str(tmp_path / "k8"))
        assert set(a["canon_sha1"]) == set(b["canon_sha1"])
