"""webcrawl_lowres_lang_ray — a Ray-Data-native low-resource-language web-crawl
engine.

A from-scratch rebuild (NOT a port) of the capabilities of the reference
``davidbwaikato/webcrawl-lowres-lang`` (see /root/repo/SURVEY.md for the full
operator inventory with reference file:line citations), re-expressed as
``ray.data.Dataset`` pipelines:

- ``functions/``  — pure, vectorized per-batch kernels (extraction, tokenizing,
                    hashing, URL normalization, cosine language scoring).
- ``stages/``     — Dataset -> Dataset stage builders (map_batches wrappers,
                    actor-pool scorer, dedup / ANN / lexicon pipelines).
- ``state/``      — Ray actors holding mutable crawl state (sharded URL-seen
                    cuckoo filters, robots cache, per-host politeness buckets).
- ``sources/``    — synthetic deterministic corpus generator + parquet IO
                    helpers (the sandbox stand-in for live fetching).
- ``frontier.py`` — the wave-based crawl scheduler (the reference's
                    search/download/NLP loop, lrl-crawler.py:571-660).
- ``oracle.py``   — single-threaded pure-Python reference oracle used by the
                    conformance tests (SURVEY.md §5).
- ``report.py``   — the stats/aggregation suite (reference sql.py:337-1044,
                    display.py:7-198).
"""

__version__ = "0.1.0"
