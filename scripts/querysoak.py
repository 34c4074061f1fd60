"""Per-query input-scaling soak (VERDICT r4 ask #6): run every
table-driven queries() entry at sf0.1 and at the synthesized sf1 table
set (scripts/make_sf1.py) and report per-query wall time at both scales
plus time_ratio and vs_linear (= time_ratio / size factor).

Queries whose callables live in pipelines.crawl_queries are excluded:
they draw from synthetic crawl corpora (not the sf tables) and their
10x behavior is tracked by SOAK.json (1M-page crawl), GRAPHSOAK.json
(1M->4M-edge graph tail) and OPSOAK10X.json (500k-doc operator cells).

Each query runs lo-then-hi back to back so VM weather hits both sides
of the ratio; re-measure any suspicious cell in a fresh session before
believing it (see BASELINE.md's weather protocol).

Usage: python scripts/querysoak.py [--factor 10] [--lo DIR] [--hi DIR]
                                   [--out QUERYSOAK.json] [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def arg(flag: str, default: str) -> str:
    if flag in sys.argv:
        return sys.argv[sys.argv.index(flag) + 1]
    return default


def main() -> None:
    lo_dir = arg("--lo", "/root/testdata/sf0.1")
    hi_dir = arg("--hi", "/tmp/wllr_sf1/sf1")
    factor = float(arg("--factor", "10"))
    out_path = arg("--out", os.path.join(REPO, "QUERYSOAK.json"))
    skip_flags = {"--lo", "--hi", "--factor", "--out"}
    only = set()
    skip_next = False
    for a in sys.argv[1:]:
        if skip_next:
            skip_next = False
            continue
        if a in skip_flags:
            skip_next = True
            continue
        only.add(a)

    import pandas as pd
    import ray

    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    from webcrawl_lowres_lang_ray.raylog import install_empty_schema_filter

    install_empty_schema_filter()
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.preserve_order = False

    import __ray_entry__ as entrymod
    from scripts.check_correctness import to_pandas

    # spin up workers before the first timed cell (first-touch startup
    # otherwise lands entirely on the first query's lo_sec)
    import ray.data as rd

    rd.range(100_000).map_batches(lambda b: b).materialize()

    qs = entrymod.queries()
    results: dict[str, dict] = {}
    n_skipped = 0
    for name, fn in qs.items():
        mod = getattr(fn, "__module__", "") or ""
        if mod.endswith("crawl_queries"):
            n_skipped += 1
            continue
        if only and name not in only:
            continue
        cell: dict = {}
        try:
            t0 = time.time()
            lo = to_pandas(fn(lo_dir))
            cell["lo_sec"] = round(time.time() - t0, 3)
            cell["lo_rows"] = int(len(lo))
            del lo
            t0 = time.time()
            hi = to_pandas(fn(hi_dir))
            cell["hi_sec"] = round(time.time() - t0, 3)
            cell["hi_rows"] = int(len(hi))
            del hi
        except Exception as e:  # keep soaking; record the failure
            cell["err"] = f"{type(e).__name__}: {e}"
            results[name] = cell
            print(f"FAIL {name}: {cell['err']}", flush=True)
            continue
        if cell["lo_sec"] > 0:
            cell["time_ratio"] = round(cell["hi_sec"] / cell["lo_sec"], 2)
            cell["vs_linear"] = round(cell["time_ratio"] / factor, 2)
        results[name] = cell
        print(
            f"{name}: lo {cell['lo_sec']}s/{cell['lo_rows']}r "
            f"hi {cell['hi_sec']}s/{cell['hi_rows']}r "
            f"vs_linear={cell.get('vs_linear')}",
            flush=True,
        )
        # persist progressively so a killed run keeps its completed cells
        with open(out_path, "w") as fh:
            json.dump(
                {
                    "metric": "query_input_scaling_soak",
                    "lo_dir": lo_dir,
                    "hi_dir": hi_dir,
                    "factor": factor,
                    "cpus": int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                    "queries": results,
                    "skipped_crawl_family": n_skipped,
                },
                fh,
                indent=1,
            )
    ray.shutdown()
    vs = [
        c["vs_linear"]
        for c in results.values()
        if isinstance(c.get("vs_linear"), (int, float))
    ]
    print(
        json.dumps(
            {
                "queries_timed": len(vs),
                "max_vs_linear": max(vs) if vs else None,
                "super_linear": sorted(
                    n
                    for n, c in results.items()
                    if isinstance(c.get("vs_linear"), (int, float))
                    and c["vs_linear"] > 1.2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
