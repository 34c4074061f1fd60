"""S9 connector surface: pagination, empty-page break, 429 global stop,
Bing base64 decode round-trip, and connector-generated seeds feeding a crawl
that still matches the oracle."""

from __future__ import annotations

import pytest

from webcrawl_lowres_lang_ray.sources.search import (
    RATE_LIMITED,
    RESULTS_PER_PAGE,
    BingLikeConnector,
    SearchEngineType,
    SimulatedSearchConnector,
    collect_urls,
    write_seeds_from_connectors,
)

URLS = [f"https://h{i % 7}.example.org/p/{i}" for i in range(60)]


class TestConnectorShape:
    def test_pagination_and_exhaustion(self):
        c = SimulatedSearchConnector(URLS, max_results=25)
        p1 = c.search("kupu", 1)
        p2 = c.search("kupu", 2)
        p3 = c.search("kupu", 3)
        p4 = c.search("kupu", 4)
        assert len(p1) == len(p2) == RESULTS_PER_PAGE
        assert len(p3) == 5 and p4 == []  # 25 results -> 10,10,5,[]
        assert not set(p1) & set(p2)

    def test_deterministic_ranking(self):
        a = SimulatedSearchConnector(URLS).search("kupu", 1)
        b = SimulatedSearchConnector(URLS).search("kupu", 1)
        c = SimulatedSearchConnector(URLS).search("other", 1)
        assert a == b
        assert a != c  # ranking depends on the query

    def test_rate_limit_sentinel(self):
        c = SimulatedSearchConnector(URLS, rate_limit_after_pages=2)
        assert c.search("q", 1) != RATE_LIMITED
        assert c.search("q", 2) != RATE_LIMITED
        assert c.search("q", 3) == RATE_LIMITED

    def test_bing_wrap_and_decode_roundtrip(self):
        from webcrawl_lowres_lang_ray.functions.urltools import bing_base64_decode

        c = BingLikeConnector(URLS)
        wrapped = c.search("kupu", 1)
        assert all(u.startswith("https://www.bing.com/ck/a?") for u in wrapped)
        decoded = bing_base64_decode(wrapped)
        assert all(u in URLS for u in decoded) and len(decoded) == RESULTS_PER_PAGE


class TestCollectUrls:
    def test_loop_semantics_and_dedup(self):
        conns = {
            "google": SimulatedSearchConnector(URLS, SearchEngineType.GOOGLE, seed=1),
            "bing": BingLikeConnector(URLS, SearchEngineType.BING, seed=2),
        }
        rows = collect_urls(conns, ["kupu tahi", "kupu rua"], num_pages=2)
        assert rows, "connectors produced no seeds"
        urls = [r["url"] for r in rows]
        assert len(urls) == len(set(urls))  # first-wins dedup
        assert [r["seq"] for r in rows] == list(range(len(rows)))
        assert {r["engine"] for r in rows} == {"google", "bing"}
        assert all(u.startswith("https://h") for u in urls)  # bing decoded

    def test_429_stops_everything(self):
        conns = {
            "api": SimulatedSearchConnector(
                URLS, SearchEngineType.GOOGLE_API, rate_limit_after_pages=1
            ),
            "google": SimulatedSearchConnector(URLS, SearchEngineType.GOOGLE),
        }
        rows = collect_urls(conns, ["a", "b", "c"], num_pages=3)
        # one page from 'api', then 429 -> the WHOLE run stops: no 'google'
        # rows, no later queries (reference stop_event semantics)
        assert len(rows) == RESULTS_PER_PAGE
        assert {r["query_id"] for r in rows} == {0}


@pytest.mark.usefixtures("ray_session")
class TestConnectorSeededCrawl:
    def test_crawl_from_connector_seeds_matches_oracle(self, tiny_corpus, tmp_path):
        import shutil

        import pandas as pd

        from webcrawl_lowres_lang_ray.config import CrawlConfig
        from webcrawl_lowres_lang_ray.frontier import (
            LEDGER_META_COLS,
            load_ledger,
            run_crawl,
        )
        from webcrawl_lowres_lang_ray.oracle import run_oracle

        corpus = str(tmp_path / "conn_corpus")
        shutil.copytree(tiny_corpus, corpus)
        n = write_seeds_from_connectors(
            corpus, corpus + "/seeds.parquet", ["kupu tahi", "aroha nui"], num_pages=1
        )
        assert n > 0
        cfg = CrawlConfig(per_host_per_wave=4)
        run_crawl(corpus, str(tmp_path / "out"), cfg)
        eng = load_ledger(str(tmp_path / "out")).sort_values("seq").reset_index(drop=True)
        orc = (
            pd.DataFrame(run_oracle(corpus, cfg).ledger)[LEDGER_META_COLS]
            .sort_values("seq").reset_index(drop=True)
        )
        assert len(eng) == len(orc) > n
        for c in LEDGER_META_COLS:
            assert (eng[c] == orc[c]).all(), c
