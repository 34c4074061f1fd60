"""Combiner-pattern grouped aggregation — the repo's general grouped-agg
operator.

ray.data's ``groupby().aggregate`` sort-shuffles every raw row and pays
per-group dispatch (~ms per group — prohibitive beyond ~10^4 groups).
``combiner_agg`` instead:

1. per-batch vectorized pandas partials — the exchange carries one row per
   key per batch, never raw rows (the combiner / partial-aggregation
   pattern);
2. hash-partition the partials by key (``parts`` groups, so a run does
   O(parts) group dispatches total);
3. one vectorized pandas merge per partition.

Deterministic for fixed input partitioning; callers round floats that
survive the reduction (summation order differs from a serial fold).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

Spec = tuple[str, str | None, str]  # (alias, col, how: sum|count|mean|min|max)


def combiner_agg(
    ds: "ray.data.Dataset",
    keys: list[str],
    spec: list[Spec],
    parts: int = 32,
) -> "ray.data.Dataset":
    def _empty_partial(b: pd.DataFrame) -> pd.DataFrame:
        # typed empty frame (an all-zero-column block would trip schema
        # reconciliation warnings in the streaming executor)
        data = {
            k: (b[k] if k in b.columns else pd.Series(dtype=object)) for k in keys
        }
        data["__cnt"] = pd.Series(dtype="int64")
        for alias, col, how in spec:
            vdt = b[col].dtype if (col and col in b.columns) else np.float64
            if how in ("sum", "mean"):
                data[f"__s_{alias}"] = pd.Series(dtype=vdt)
            elif how == "min":
                data[f"__mn_{alias}"] = pd.Series(dtype=vdt)
            elif how == "max":
                data[f"__mx_{alias}"] = pd.Series(dtype=vdt)
        data["__part"] = pd.Series(dtype="int64")
        return pd.DataFrame(data)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return _empty_partial(b)
        g = b.groupby(keys, sort=False, observed=True)
        out = g.size().rename("__cnt").reset_index()
        gi = out.set_index(keys).index
        for alias, col, how in spec:
            if how in ("sum", "mean"):
                out[f"__s_{alias}"] = g[col].sum().reindex(gi).to_numpy()
            elif how == "min":
                out[f"__mn_{alias}"] = g[col].min().reindex(gi).to_numpy()
            elif how == "max":
                out[f"__mx_{alias}"] = g[col].max().reindex(gi).to_numpy()
        out["__part"] = (
            pd.util.hash_pandas_object(out[keys], index=False) % parts
        ).astype(np.int64)
        return out

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        gg = g.groupby(keys, sort=False)
        res = gg["__cnt"].sum().rename("__cnt").reset_index()
        gi = res.set_index(keys).index
        for alias, col, how in spec:
            if how == "sum":
                res[alias] = gg[f"__s_{alias}"].sum().reindex(gi).to_numpy()
            elif how == "mean":
                res[alias] = (
                    gg[f"__s_{alias}"].sum().reindex(gi) / res["__cnt"].to_numpy()
                ).to_numpy()
            elif how == "count":
                res[alias] = res["__cnt"].to_numpy()
            elif how == "min":
                res[alias] = gg[f"__mn_{alias}"].min().reindex(gi).to_numpy()
            elif how == "max":
                res[alias] = gg[f"__mx_{alias}"].max().reindex(gi).to_numpy()
        return res[keys + [a for a, _, _ in spec]]

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("__part")
        .map_groups(merge, batch_format="pandas")
    )
