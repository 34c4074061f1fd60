"""Distributed BM25 ranked search (Robertson/Spärck Jones; the Lucene
scoring function) — the retrieval primitive over a crawled corpus:
score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)).

Two-phase plan, both streaming:
1. stats pass — one map_batches computes per-doc (dl, tf_t ...) for the
   QUERY terms only (never a full postings index), materialized once;
   corpus constants (N, avgdl, df_t) fold from tiny per-batch partials.
2. score pass — constants broadcast via ray.put; each batch scores
   vectorized and emits its local top-k, the driver merges k·n_batches
   rows.  Nothing quadratic, no global sort."""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data

from .textstats import round_half_away

K1 = 1.2
B = 0.75


def _term_stats_batch(
    b: pd.DataFrame, terms: list[str], text_col: str, id_col: str
) -> pd.DataFrame:
    toks = b[text_col].str.split(" ").to_numpy(object)
    lens = np.fromiter((len(t) for t in toks), np.int64, len(toks))
    row = np.repeat(np.arange(len(b), dtype=np.int64), lens)
    flat_w = np.concatenate([np.asarray(t, object) for t in toks]) if len(b) else np.array([], object)
    nonempty = flat_w != ""
    row, flat_w = row[nonempty], flat_w[nonempty]
    out = pd.DataFrame({id_col: b[id_col].to_numpy(np.int64)})
    out["dl"] = np.bincount(row, minlength=len(b)).astype(np.int64)
    for i, t in enumerate(terms):
        out[f"tf{i}"] = np.bincount(
            row[flat_w == t], minlength=len(b)
        ).astype(np.int64)
    return out


def bm25_topk(
    ds: "ray.data.Dataset",
    terms: list[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_dp: int = 5,
) -> pd.DataFrame:
    """Top-k docs by BM25 over whitespace tokens.  Returns
    (id, score) ordered by (-score, id); ties broken on the ROUNDED
    score so an independent engine reproduces the cut exactly."""
    stats = ds.select_columns([id_col, text_col]).map_batches(
        lambda b: _term_stats_batch(b, terms, text_col, id_col),
        batch_format="pandas",
    ).materialize()

    def fold(b: pd.DataFrame) -> pd.DataFrame:
        r = {"n": np.int64(len(b)), "sum_dl": b["dl"].sum()}
        for i in range(len(terms)):
            r[f"df{i}"] = np.int64((b[f"tf{i}"] > 0).sum())
        return pd.DataFrame([r])

    parts = stats.map_batches(fold, batch_format="pandas").to_pandas()
    n = int(parts["n"].sum())
    avgdl = float(parts["sum_dl"].sum()) / max(n, 1)
    idf = np.array(
        [
            np.log(1.0 + (n - df + 0.5) / (df + 0.5))
            for df in (int(parts[f"df{i}"].sum()) for i in range(len(terms)))
        ]
    )
    const_ref = ray.put((idf, avgdl))

    def score(b: pd.DataFrame) -> pd.DataFrame:
        idf_, avgdl_ = ray.get(const_ref)
        dl = b["dl"].to_numpy(np.float64)
        denom_dl = K1 * (1.0 - B + B * dl / avgdl_)
        s = np.zeros(len(b))
        for i in range(len(idf_)):
            tf = b[f"tf{i}"].to_numpy(np.float64)
            s += idf_[i] * tf * (K1 + 1.0) / (tf + denom_dl)
        s = round_half_away(s, round_dp)
        ids = b[id_col].to_numpy(np.int64)
        order = np.lexsort((ids, -s))[:k]
        return pd.DataFrame({id_col: ids[order], "score": s[order]})

    allp = stats.map_batches(score, batch_format="pandas").to_pandas()
    allp = allp.sort_values(
        ["score", id_col], ascending=[False, True], kind="mergesort"
    )
    return allp.head(k).reset_index(drop=True)
