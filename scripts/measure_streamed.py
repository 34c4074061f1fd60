"""Measure one sf0.1 crawl at a given CPU count, optionally forcing the
fully-streamed wave path (DRIVER_PATH_MAX_ROWS=0).  Fresh process per run:

    python scripts/measure_streamed.py [--streamed] [--cpus 32] [--pages 300000]

Prints one JSON line with wall time, urls/s and per-wave sections.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--streamed", action="store_true")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--pages", type=int, default=300_000)
    ap.add_argument(
        "--hash",
        action="store_true",
        help="append an order-insensitive md5 of the ledger's key columns "
        "(seq, url_hash, downloaded) — lets two runs prove determinism",
    )
    args = ap.parse_args()

    import ray

    ray.init(address="local", num_cpus=args.cpus, include_dashboard=False)
    from webcrawl_lowres_lang_ray import frontier
    from webcrawl_lowres_lang_ray.config import CrawlConfig
    from webcrawl_lowres_lang_ray.sources.synth import corpus_dir_for_pages

    corpus = corpus_dir_for_pages(args.pages)
    if args.streamed:
        frontier.DRIVER_PATH_MAX_ROWS = 0
    out_dir = "/tmp/wllr_measure/out"
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    # bench.py's throughput-phase config (generous politeness + wave cap)
    cfg = CrawlConfig(per_host_per_wave=256, max_waves=8)
    # untimed setup: build the scorer model in every worker (same warmup as
    # bench.py — steady-state throughput is the metric; cfg is part of the
    # model cache key, so warm with the cfg the crawl will use)
    frontier.warm_workers(corpus, cfg=cfg)
    t0 = time.time()
    stats = frontier.run_crawl(corpus, out_dir, cfg)
    dt = time.time() - t0
    out = {
        "streamed": args.streamed,
        "cpus": args.cpus,
        "pages": args.pages,
        "sec": round(dt, 2),
        "inserted": stats.inserted,
        "fetched": stats.fetched,
        "urls_per_sec": round(stats.inserted / dt, 1),
        "waves": stats.waves,
        "per_wave": stats.per_wave,
    }
    if args.hash:
        import hashlib

        import pandas as pd

        import glob

        files = sorted(
            glob.glob(
                os.path.join(out_dir, "ledger", "**", "*.parquet"), recursive=True
            )
        )
        led = pd.concat(
            [pd.read_parquet(f, columns=["seq", "url_hash", "downloaded"]) for f in files],
            ignore_index=True,
        ).sort_values("seq", kind="mergesort")
        out["ledger_rows"] = int(len(led))
        out["ledger_md5"] = hashlib.md5(
            led.to_csv(index=False).encode()
        ).hexdigest()
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
