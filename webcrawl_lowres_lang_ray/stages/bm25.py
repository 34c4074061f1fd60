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


def _int_hash_vecs(texts, dim: int = 256):
    """Per-doc UNNORMALIZED integer hashing-trick vectors as (doc_row,
    bucket, v) triples plus per-doc sum-of-squares — exact int64, so the
    downstream cosine rank key (dot / sqrt(ssq)) is ONE deterministic
    IEEE expression an independent SQL engine reproduces bit-for-bit
    (the float-sum-order trap of normalized vectors never arises)."""
    from ..functions.embed import _token_hash
    from ..functions.tokenize import tokenize_filtered

    rows, buckets, signs = [], [], []
    for i, t in enumerate(texts):
        for tok in tokenize_filtered(t if isinstance(t, str) else ""):
            h, s = _token_hash(tok)
            rows.append(i)
            buckets.append(h % dim)
            signs.append(s)
    f = pd.DataFrame(
        {
            "r": np.array(rows, dtype=np.int64),
            "b": np.array(buckets, dtype=np.int64),
            "s": np.array(signs, dtype=np.int64),
        }
    )
    v = f.groupby(["r", "b"], sort=False)["s"].sum().reset_index(name="v")
    ssq = v.groupby("r", sort=False)["v"].apply(lambda x: int((x ** 2).sum()))
    return v, ssq


def hybrid_rrf_topk(
    ds: "ray.data.Dataset",
    terms: list[str],
    k: int = 10,
    k_cand: int = 50,
    rrf_k: int = 60,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pd.DataFrame:
    """Hybrid retrieval by Reciprocal Rank Fusion (Cormack et al. 2009):
    fuse the BM25 lexical top-``k_cand`` with the hashing-embedding
    cosine top-``k_cand`` as Σ 1/(rrf_k + rank), missing-from-a-list
    contributes nothing.  Both candidate lists come from per-batch local
    top-k partials (no global sort); the semantic score ranks on
    dot/sqrt(ssq) from EXACT integer dot products against the broadcast
    query vector, so ranks reproduce in SQL."""
    lex = bm25_topk(ds, terms, k=k_cand, text_col=text_col, id_col=id_col)
    lex = lex.reset_index(drop=True)
    lex["rank_lex"] = np.arange(1, len(lex) + 1, dtype=np.int64)

    qv_df, _ = _int_hash_vecs([" ".join(terms)])
    qv = np.zeros(256, dtype=np.int64)
    qv[qv_df["b"].to_numpy()] = qv_df["v"].to_numpy()
    qv_ref = ray.put(qv)

    def sem_partial(b: pd.DataFrame) -> pd.DataFrame:
        q = ray.get(qv_ref)
        v, ssq = _int_hash_vecs(b[text_col].to_numpy(object))
        dot = (
            (v["v"] * q[v["b"].to_numpy()])
            .groupby(v["r"], sort=False)
            .sum()
        )
        ids = b[id_col].to_numpy(np.int64)
        score = np.zeros(len(b))
        nz = ssq.index.to_numpy(np.int64)
        d = np.zeros(len(b))
        d[dot.index.to_numpy(np.int64)] = dot.to_numpy(np.float64)
        s2 = np.zeros(len(b))
        s2[nz] = ssq.to_numpy(np.float64)
        ok = s2 > 0
        score[ok] = d[ok] / np.sqrt(s2[ok])
        order = np.lexsort((ids, -score))[:k_cand]
        return pd.DataFrame({id_col: ids[order], "sem": score[order]})

    sem = (
        ds.select_columns([id_col, text_col])
        .map_batches(sem_partial, batch_format="pandas")
        .to_pandas()
        .sort_values(["sem", id_col], ascending=[False, True], kind="mergesort")
        .head(k_cand)
        .reset_index(drop=True)
    )
    sem["rank_sem"] = np.arange(1, len(sem) + 1, dtype=np.int64)

    fused = lex[[id_col, "rank_lex"]].merge(
        sem[[id_col, "rank_sem"]], on=id_col, how="outer"
    )
    rrf = np.zeros(len(fused))
    rl = fused["rank_lex"].to_numpy(np.float64)
    rs = fused["rank_sem"].to_numpy(np.float64)
    rrf += np.where(np.isnan(rl), 0.0, 1.0 / (rrf_k + rl))
    rrf += np.where(np.isnan(rs), 0.0, 1.0 / (rrf_k + rs))
    fused["rrf"] = round_half_away(rrf, 8)
    fused["rank_lex"] = fused["rank_lex"].fillna(0).astype(np.int64)
    fused["rank_sem"] = fused["rank_sem"].fillna(0).astype(np.int64)
    out = fused.sort_values(
        ["rrf", id_col], ascending=[False, True], kind="mergesort"
    ).head(k)
    out[id_col] = out[id_col].astype(np.int64)
    return out.reset_index(drop=True)
