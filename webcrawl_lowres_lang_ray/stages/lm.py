"""Hashed n-gram language-model perplexity scoring — the CCNet-style
"score every document against a target-domain LM and keep the
low-perplexity tail" quality filter (Wenzek et al. 2020 §3.3 use KenLM;
this is the hashed bigram equivalent buildable from the stdlib + numpy).

Model: word bigrams hashed into ``2^16`` buckets (same hashing convention
as the DSIR stage, ``curation._bigram_buckets``); add-one smoothing over
the bucket vocabulary:

    p(w_i | w_{i-1}) = (c(prev, w) + 1) / (c_ctx(prev) + V)

Per-doc score is the average negative log2 probability over the doc's
bigrams (``xent``, bits/bigram) and ``ppl = 2^xent``.

Scale shape (the DSIR/sketch pattern): training counts are MERGEABLE
per-batch partials — each batch ships one sparse (bigram-id, count) frame,
summed by a bounded combiner groupby; the fitted model (<= V context
counts + observed-bigram dict, bounded by the hashed vocab, ~MBs) is
``ray.put`` once and scoring is an embarrassingly-parallel map_batches.
Raw text never rides an exchange.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data

_LM_BUCKETS = 1 << 16


def _bigram_ids(text: str, buckets: int = _LM_BUCKETS) -> np.ndarray:
    """(n-1,) int64 of ``prev_bucket * buckets + cur_bucket`` composite ids
    for the doc's word bigram stream (hash each word once, pair by shift)."""
    ws = text.split()
    if len(ws) < 2:
        return np.zeros(0, dtype=np.int64)
    wb = (
        pd.util.hash_array(np.array(ws, dtype=object)) % np.uint64(buckets)
    ).astype(np.int64)
    return wb[:-1] * buckets + wb[1:]


def train_bigram_lm(
    docs: "ray.data.Dataset",
    text_col: str = "text",
    mask_fn=None,
    buckets: int = _LM_BUCKETS,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fit hashed-bigram counts on ``docs`` rows passing ``mask_fn``.

    Returns ``(joint_ids, joint_cnt, ctx)``: a SORTED sparse composite-id ->
    count table (bounded by observed bigrams, in practice by the corpus; a
    vectorized ``searchsorted`` serves lookups) plus the dense (buckets,)
    context marginal.  Built from mergeable per-batch partials: the
    exchange carries one sparse (id, count) frame per batch.
    """

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        sel = b[mask_fn(b)] if mask_fn is not None else b
        ids_all = [
            _bigram_ids(t, buckets) for t in sel[text_col] if isinstance(t, str)
        ]
        ids_all = [a for a in ids_all if len(a)]
        if not ids_all:
            return pd.DataFrame(
                {"bid": pd.Series(dtype="int64"), "cnt": pd.Series(dtype="int64")}
            )
        uniq, cnt = np.unique(np.concatenate(ids_all), return_counts=True)
        return pd.DataFrame({"bid": uniq, "cnt": cnt.astype(np.int64)})

    # driver-side merge of the sparse partials (the DSIR/sketch pattern —
    # one bounded frame per batch; a distributed combiner groupby would only
    # pay off once observed-bigram cardinality approaches buckets^2)
    parts = docs.map_batches(partial, batch_format="pandas").to_pandas()
    merged = (
        parts.groupby("bid", sort=True)["cnt"].sum()
        if len(parts)
        else pd.Series(dtype="int64")
    )
    joint_ids = merged.index.to_numpy(np.int64)
    joint_cnt = merged.to_numpy(np.int64)
    ctx = np.zeros(buckets, dtype=np.int64)
    if len(joint_ids):
        np.add.at(ctx, joint_ids // buckets, joint_cnt)
    return joint_ids, joint_cnt, ctx


def lm_perplexity(
    docs: "ray.data.Dataset",
    target_lang: str = "en",
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    buckets: int = _LM_BUCKETS,
    round_dp: int = 4,
) -> "ray.data.Dataset":
    """Score every document's bits-per-bigram cross-entropy under an
    add-one-smoothed hashed-bigram LM trained on the ``target_lang`` subset.

    Output: ``(doc_id, n_bigrams, xent, ppl)`` — docs with < 2 words get
    ``xent = ppl = 0`` (no evidence), matching the "skip short docs"
    convention of CCNet's LM filter.
    """
    joint_ids, joint_cnt, ctx = train_bigram_lm(
        docs, text_col, lambda b: b[lang_col] == target_lang, buckets
    )
    model_ref = ray.put((joint_ids, joint_cnt, ctx))
    log2 = np.log(2.0)

    def score(b: pd.DataFrame) -> pd.DataFrame:
        jids, jcnt, c = ray.get(model_ref)
        n = np.zeros(len(b), dtype=np.int64)
        xent = np.zeros(len(b), dtype=np.float64)
        for i, t in enumerate(b[text_col]):
            ids = _bigram_ids(t, buckets)
            if not len(ids):
                continue
            # vectorized sparse lookup: binary-search the sorted id table
            pos = np.searchsorted(jids, ids)
            posc = np.minimum(pos, max(len(jids) - 1, 0))
            hit = (pos < len(jids)) & (jids[posc] == ids) if len(jids) else np.zeros(len(ids), dtype=bool)
            jc = np.where(hit, jcnt[posc] if len(jids) else 0, 0).astype(np.float64)
            cc = c[ids // buckets].astype(np.float64)
            logp = np.log((jc + 1.0) / (cc + buckets))
            n[i] = len(ids)
            xent[i] = float(-logp.mean() / log2)
        from .textstats import round_half_away

        out = pd.DataFrame(
            {
                id_col: b[id_col].to_numpy(np.int64),
                "n_bigrams": n,
                "xent": round_half_away(xent, round_dp),
                "ppl": round_half_away(
                    np.where(n > 0, np.exp2(xent), 0.0), round_dp
                ),
            }
        )
        return out

    return docs.select_columns([id_col, text_col, lang_col]).map_batches(
        score, batch_format="pandas"
    )
