"""Pluggable search connectors — the reference's S9 extension point.

The reference bootstraps its frontier from web search engines
(search.py:38-326): an engine enum (enums.py:4-13), 10 results per page
(search.py:45,133,296), page-by-page pagination until an empty result page
(lrl-crawler.py:270-296 ``break``), a 429 rate-limit sentinel from the API
variants that stops the whole URL-generation run
(lrl-crawler.py:282-291 ``stop_event.set()``), and Bing's base64 redirect
decoding (search.py:148-192, ported at functions/urltools.py:54-88).

Live HTTP search is out of scope in this sandbox (no network), so the
pluggable surface is preserved and two deterministic connectors implement
it against the synthetic corpus:

* ``SimulatedSearchConnector`` — ranks the corpus's URLs for a query by a
  seeded content-independent hash (stable across runs/processes), pages of
  ``RESULTS_PER_PAGE``; an optional ``rate_limit_after_pages`` budget makes
  it return the 429 sentinel like the API connectors.
* ``BingLikeConnector`` — the same ranking, but every result is wrapped in
  a ``www.bing.com/ck/a?...&u=a1<base64>`` redirect so the consumer must run
  the M7 decoder, exercising the reference's Bing path end-to-end.

``collect_urls`` reproduces the reference's URL-generation loop semantics
(pagination, empty-page break, global 429 stop, per-engine url lists) and
returns rows shaped like ``seeds.parquet`` — the frontier bootstrap input.
"""

from __future__ import annotations

import base64
import hashlib
from dataclasses import dataclass
from enum import Enum

import pyarrow as pa
import pyarrow.parquet as pq

from .synth import corpus_page_urls
from ..functions.urltools import bing_base64_decode

RESULTS_PER_PAGE = 10  # reference search.py:45 (google), :133 (api), :296 (bing)
RATE_LIMITED = 429     # int sentinel, exactly as the reference returns it


class SearchEngineType(Enum):
    """enums.py:4-13 (the selenium variants are commented out there too)."""

    GOOGLE = "google"
    GOOGLE_API = "google_api"
    BING = "bing"
    BING_API = "bing_api"

    def __str__(self) -> str:
        return self.value


def _rank_key(query: str, url: str, seed: int) -> bytes:
    return hashlib.blake2b(
        f"{seed}:{query}:{url}".encode(), digest_size=8
    ).digest()


@dataclass
class SimulatedSearchConnector:
    """Deterministic stand-in with the reference connector call shape:
    ``search(query, page) -> list[str] | 429``.  Pages beyond the result
    set return [] (the caller's break condition)."""

    urls: list[str]
    engine: SearchEngineType = SearchEngineType.GOOGLE
    seed: int = 42
    max_results: int = 50
    rate_limit_after_pages: int | None = None
    _pages_served: int = 0

    def _ranked(self, query: str) -> list[str]:
        # one ranking per (connector, query) — page requests just slice it
        cache = self.__dict__.setdefault("_rank_cache", {})
        r = cache.get(query)
        if r is None:
            r = cache[query] = sorted(
                self.urls, key=lambda u: _rank_key(query, u, self.seed)
            )[: self.max_results]
        return r

    def search(self, query: str, page: int):
        if (
            self.rate_limit_after_pages is not None
            and self._pages_served >= self.rate_limit_after_pages
        ):
            return RATE_LIMITED
        self._pages_served += 1
        lo = (page - 1) * RESULTS_PER_PAGE
        return self._ranked(query)[lo : lo + RESULTS_PER_PAGE]


@dataclass
class BingLikeConnector(SimulatedSearchConnector):
    """Results come back as bing redirect URLs (u=a1<base64>) — the consumer
    must decode them (M7), as the reference does for the Bing engines."""

    engine: SearchEngineType = SearchEngineType.BING

    def search(self, query: str, page: int):
        res = super().search(query, page)
        if res == RATE_LIMITED:
            return res
        wrapped = []
        for u in res:
            enc = base64.b64encode(u.encode()).decode().rstrip("=")
            enc = enc.replace("/", "_").replace("+", "-")
            wrapped.append(f"https://www.bing.com/ck/a?!&&p=x&u=a1{enc}")
        return wrapped


def collect_urls(
    connectors: dict[str, "SimulatedSearchConnector"],
    queries: list[str],
    num_pages: int = 2,
) -> list[dict]:
    """The reference's gen-urls loop (lrl-crawler.py:258-300): for every
    (query, engine), walk pages 1..num_pages, break on an empty page, stop
    EVERYTHING on a 429 (stop_event semantics); Bing results are
    base64-decoded.  Returns seed rows (seq, url, query_id, engine) in
    deterministic (query, engine, rank) order, de-duplicated by url
    first-wins (insertion into the frontier re-checks the seen set anyway).
    """
    rows: list[dict] = []
    seen: set[str] = set()
    stopped = False
    seq = 0
    for qid, query in enumerate(queries):
        if stopped:
            break
        for name, conn in connectors.items():
            if stopped:
                break
            page = 1
            while page <= num_pages:
                res = conn.search(query, page)
                if res == RATE_LIMITED:
                    stopped = True  # stop_event.set(): the whole run ends
                    break
                if not res:
                    break
                if conn.engine in (SearchEngineType.BING, SearchEngineType.BING_API):
                    res = bing_base64_decode(res)
                for u in res:
                    if u not in seen:
                        seen.add(u)
                        rows.append(
                            {"seq": seq, "url": u, "query_id": qid, "engine": name}
                        )
                        seq += 1
                page += 1
    return rows


def write_seeds_from_connectors(
    corpus_dir: str,
    out_path: str,
    queries: list[str],
    num_pages: int = 2,
    seed: int = 42,
) -> int:
    """Generate a seeds.parquet via the connector loop over the corpus's own
    page table — a drop-in replacement for the synthesized seed list."""
    urls = corpus_page_urls(corpus_dir)
    connectors = {
        "google": SimulatedSearchConnector(urls, SearchEngineType.GOOGLE, seed),
        "bing": BingLikeConnector(urls, SearchEngineType.BING, seed + 1),
    }
    rows = collect_urls(connectors, queries, num_pages)
    tbl = pa.table(
        {
            "seq": pa.array([r["seq"] for r in rows], pa.int64()),
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "query_id": pa.array([r["query_id"] for r in rows], pa.int64()),
            "engine": pa.array([r["engine"] for r in rows], pa.string()),
        }
    )
    pq.write_table(tbl, out_path)
    return len(rows)
