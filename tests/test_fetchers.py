"""The fetch seam (sources/fetch.py): PageTableFetcher parity and a REAL
HTTP crawl through a local http.server — the live-fetch surface the
reference exercises with urllib (lrl-crawler.py:185-226), run end-to-end
against the wave machinery with ledger equality vs the simulated web."""

from __future__ import annotations

import glob
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pandas as pd
import pytest

from webcrawl_lowres_lang_ray.sources.fetch import HttpFetcher, PageTableFetcher


def _pages_df(corpus_dir: str) -> pd.DataFrame:
    files = sorted(glob.glob(f"{corpus_dir}/pages/*.parquet"))
    return pd.concat(
        [pd.read_parquet(f, columns=["url", "html", "content_type"]) for f in files],
        ignore_index=True,
    )


@pytest.fixture(scope="module")
def corpus_server(small_corpus):
    """Local HTTP mirror of the synthetic web: serves each page's html at
    its url's path?query with the page table's Content-Type header."""
    from urllib.parse import urlsplit

    df = _pages_df(small_corpus)
    routes = {}
    for u, h, ct in zip(df["url"], df["html"], df["content_type"]):
        parts = urlsplit(u)
        key = parts.path + (f"?{parts.query}" if parts.query else "")
        routes[key] = (bytes(h), ct)

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            hit = routes.get(self.path)
            if hit is None:
                self.send_error(404)
                return
            body, ct = hit
            self.send_response(200)
            if ct is not None:  # NULL content_type pages send NO header
                self.send_header("Content-Type", ct)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", small_corpus
    srv.shutdown()


class TestPageTableFetcher:
    def test_bucket_pruned_lookup(self, small_corpus):
        df = _pages_df(small_corpus)
        f = PageTableFetcher(f"{small_corpus}/pages")
        # find a bucket with pages by probing the partition files
        path0 = sorted(glob.glob(f"{small_corpus}/pages/bucket=*.parquet"))[0]
        bucket = int(path0.rsplit("=", 1)[1].split(".")[0])
        sub = pd.read_parquet(path0, columns=["url", "html"])
        got = f.fetch(bucket, sub["url"].head(5).tolist() + ["http://nowhere/x"])
        assert len(got) == 5
        u0 = sub["url"].iloc[0]
        assert bytes(got[u0][0]) == bytes(sub["html"].iloc[0])
        assert "http://nowhere/x" not in got

    def test_missing_bucket_is_empty(self, small_corpus):
        f = PageTableFetcher(f"{small_corpus}/pages")
        assert f.fetch(999, ["http://a/"]) == {}


class TestHttpFetcher:
    def test_fetch_and_miss(self, corpus_server):
        base, corpus = corpus_server
        df = _pages_df(corpus)
        f = HttpFetcher(base_url=base, timeout=5)
        urls = df["url"].head(3).tolist()
        got = f.fetch(0, urls + ["https://host001.example.org/definitely/404"])
        assert set(got) == set(urls)
        for u in urls:
            row = df[df["url"] == u].iloc[0]
            assert got[u][0] == bytes(row["html"])
            assert got[u][1] == row["content_type"]

    def test_connection_refused_is_failed_fetch(self):
        f = HttpFetcher(base_url="http://127.0.0.1:9", timeout=0.5)
        assert f.fetch(0, ["http://h/x"]) == {}

    def test_max_bytes_truncates(self, corpus_server):
        base, corpus = corpus_server
        df = _pages_df(corpus)
        u = df["url"].iloc[0]
        f = HttpFetcher(base_url=base, timeout=5, max_bytes=10)
        got = f.fetch(0, [u])
        assert len(got[u][0]) == 10


class TestHttpCrawlEndToEnd:
    def test_http_crawl_ledger_equals_table_crawl(
        self, ray_session, corpus_server, tmp_path
    ):
        """Full crawl through the LIVE local web server == full crawl
        against the page table, ledger bit-for-bit (url ordering, seen set,
        politeness, extraction — the whole invariant surface)."""
        from webcrawl_lowres_lang_ray.config import CrawlConfig
        from webcrawl_lowres_lang_ray.frontier import LEDGER_META_COLS, run_crawl
        from webcrawl_lowres_lang_ray.pipelines.crawl_queries import ledger_dataset

        base, corpus = corpus_server
        cfg = CrawlConfig(max_waves=4)

        def ledger(out_dir, fetcher):
            run_crawl(corpus, out_dir, cfg, fetcher=fetcher)
            return (
                ledger_dataset(out_dir, columns=LEDGER_META_COLS)
                .to_pandas()
                .sort_values("seq", kind="mergesort")
                .reset_index(drop=True)
            )

        want = ledger(str(tmp_path / "table"), None)
        got = ledger(str(tmp_path / "http"), HttpFetcher(base_url=base, timeout=10))
        pd.testing.assert_frame_equal(got, want)
        assert want["downloaded"].sum() > 50
