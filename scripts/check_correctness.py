"""Local stand-in for the driver's correctness gate: runs every queries()
entry at a given sf and compares against oracle_sql() via DuckDB
(row count + column names + order-insensitive value hash).

Usage: python scripts/check_correctness.py [--write] [sf_dir] [query ...]

With --write, also records every entry (SQL-checked AND rows-only) into
CORRECTNESS_FULL.json at the repo root — the committed full-surface
artifact covering the queries the driver's 50-row prefix cannot reach.
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    raise TypeError(type(res))


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    rows = df.astype(str).apply(lambda r: "\x1f".join(r), axis=1).tolist() if len(df) else []
    return hashlib.md5("\n".join(sorted(rows)).encode()).hexdigest()


def main():
    argv = [a for a in sys.argv[1:] if a != "--write"]
    write = "--write" in sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import ray

    ray.init(
        address="local", num_cpus=8, include_dashboard=False,
        ignore_reinit_error=True, logging_level="ERROR",
    )
    from webcrawl_lowres_lang_ray.raylog import install_empty_schema_filter
    install_empty_schema_filter()
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.preserve_order = False

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    failures = 0
    results: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            results[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "spark_rows": None,
                             "oracle_rows": None,
                             "err": f"{type(e).__name__}: {e}"}
            continue
        el = time.time() - t0
        sql = sqls.get(name)
        if sql is None:
            print(f"rows-only {name}: {len(mine)} rows, cols={list(mine.columns)[:6]}..., {el:.1f}s")
            results[name] = {"rows_match": None, "schema_match": None,
                             "hash_match": None, "spark_rows": int(len(mine)),
                             "oracle_rows": None, "err": "no_oracle",
                             "sec": round(el, 2)}
            continue
        try:
            theirs = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: SQL raised {e}")
            failures += 1
            results[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "spark_rows": int(len(mine)),
                             "oracle_rows": None, "err": f"sql: {e}"}
            continue
        ok_rows = len(mine) == len(theirs)
        ok_cols = sorted(mine.columns) == sorted(theirs.columns)
        ok_hash = value_hash(mine) == value_hash(theirs) if ok_rows and ok_cols else False
        status = "OK  " if (ok_rows and ok_cols and ok_hash) else "FAIL"
        if status == "FAIL":
            failures += 1
        results[name] = {"rows_match": bool(ok_rows), "schema_match": bool(ok_cols),
                         "hash_match": bool(ok_hash), "spark_rows": int(len(mine)),
                         "oracle_rows": int(len(theirs)), "err": None,
                         "sec": round(el, 2)}
        print(f"{status} {name}: rows {len(mine)}/{len(theirs)} cols_ok={ok_cols} hash_ok={ok_hash} ({el:.1f}s)")
        if status == "FAIL" and ok_rows and ok_cols:
            m = mine[sorted(mine.columns)].copy()
            t = theirs[sorted(theirs.columns)].copy()
            key = sorted(mine.columns)[0]
            m = m.sort_values(list(m.columns)).reset_index(drop=True)
            t = t.sort_values(list(t.columns)).reset_index(drop=True)
            diff = (m.astype(str) != t.astype(str)).any(axis=1)
            print("   first diffs:")
            print(pd.concat([m.loc[diff].head(3).add_suffix("_ray"),
                             t.loc[diff].head(3).add_suffix("_sql")], axis=1).to_string())
    ray.shutdown()
    if write:
        import json

        out_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "CORRECTNESS_FULL.json",
        )
        with open(out_path, "w") as f:
            json.dump({"sf_dir": sf_dir, "results": results}, f, indent=1)
        print("wrote", out_path, f"({len(results)} entries)")
    print("FAILURES:", failures)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
