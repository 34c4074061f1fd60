"""General distributed hash join — the reusable big-x-big equi-join the
per-query pipelines otherwise hand-roll (broadcast joins stay the right
call for SMALL sides; this is for two datasets that both exceed worker
memory).

Plan (the tagged-union partition join, same exchange shape as
``dedup._attach_sig``): each side tags its rows, both union into ONE
key-hash partitioned groupby, and each partition runs a vectorized pandas
merge on its slice.  Every row moves exactly once; there is no driver
materialization and no secondary shuffle.

Skew note: a single hot key lands in one partition — pre-salt hot keys
(``windows.salted_sum`` pattern) or broadcast the dimension side when it
fits.  Partitioning assumption (documented like every partition-key op
here): one partition's rows fit in a worker; raise ``parts`` to shrink
partitions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data


def hash_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    left_key: str,
    right_key: str | None = None,
    how: str = "inner",
    parts: int = 64,
    suffixes: tuple[str, str] = ("", "_r"),
) -> "ray.data.Dataset":
    """Equi-join two Datasets on a key column.  ``how`` is 'inner' or
    'left' (pandas semantics inside each partition).  Key columns are
    hash-partitioned identically on both sides, so each partition holds
    every row of its keys from BOTH inputs."""
    right_key = right_key or left_key
    # column lists + integer/bool dtypes recorded BEFORE the union: the
    # mixed-schema union NaN-fills each side's missing columns through the
    # shuffle, silently widening int64 -> float64 — restored per partition
    import pyarrow as pa

    def _cols_and_casts(ds: "ray.data.Dataset"):
        sch = ds.schema()
        cols = list(sch.names)
        casts = {
            n: ("int64" if pa.types.is_integer(t) else "bool")
            for n, t in zip(sch.names, sch.types)
            if pa.types.is_integer(t) or pa.types.is_boolean(t)
        }
        return cols, casts

    lcols, lcasts = _cols_and_casts(left)
    rcols, rcasts = _cols_and_casts(right)

    def tag(side: int, key: str):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            b["__side"] = np.int64(side)
            b["__jp"] = (
                pd.util.hash_array(b[key].to_numpy()) % np.uint64(parts)
            ).astype(np.int64)
            return b

        return fn

    lt = left.map_batches(tag(0, left_key), batch_format="pandas")
    rt = right.map_batches(tag(1, right_key), batch_format="pandas")

    def join_part(g: pd.DataFrame) -> pd.DataFrame:
        # reindex, not select: a partition holding rows from only one side
        # never saw the other side's columns in its concatenated blocks
        lg = g[g["__side"] == 0].reindex(columns=lcols).astype(lcasts)
        rg = g[g["__side"] == 1].reindex(columns=rcols).astype(rcasts)
        return lg.merge(
            rg,
            left_on=left_key,
            right_on=right_key,
            how=how,
            suffixes=suffixes,
        )

    return lt.union(rt).groupby("__jp").map_groups(join_part, batch_format="pandas")
