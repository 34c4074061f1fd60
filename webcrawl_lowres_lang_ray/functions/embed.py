"""Deterministic text -> embedding bridge (hashing-trick vectorizer).

A large-scale training-data pipeline needs embeddings over raw text columns
without shipping a model into every worker: the hashing trick (feature
hashing, Weinberger et al. 2009) maps each token to one of ``dim`` buckets
with a +-1 sign, accumulates token counts, and l2-normalizes — fully
deterministic, no vocabulary state, vectorized per batch.  The output
column is the same ``list<float>`` shape as the provided embeddings table,
so every downstream embedding operator (brute/SRP/IVF ANN, SRP-bucketed
near-dup) runs on it unchanged.

Hash convention (round 4): bucket = first 4 hex chars of md5(token) mod
``dim``; sign = -1 iff the 5th hex nibble's top bit is set.  md5 is the
one hash both numpy-side code and DuckDB compute identically, which makes
the WHOLE text->embed->cosine-pair pipeline SQL-oracle-checkable
(SQL_DOC_EMBED_NEARDUP) — tokenizer, vectorizer and similarity join all
reproduced in one DuckDB query.
"""

from __future__ import annotations

import hashlib

import numpy as np

from .tokenize import tokenize_filtered

# token -> (bucket_base, sign) memo; Zipf streams hit ~1 (same pattern as
# tokenize._FILTER_MEMO).  bucket_base is the raw 16-bit value so one memo
# serves every ``dim``.
_HASH_MEMO: dict[str, tuple[int, float]] = {}
_HASH_MEMO_MAX = 1 << 18


def _token_hash(tok: str) -> tuple[int, float]:
    r = _HASH_MEMO.get(tok)
    if r is None:
        hx = hashlib.md5(tok.encode()).hexdigest()
        r = (int(hx[:4], 16), -1.0 if int(hx[4], 16) >= 8 else 1.0)
        if len(_HASH_MEMO) < _HASH_MEMO_MAX:
            _HASH_MEMO[tok] = r
    return r


def hashing_embed(text: str, dim: int = 256) -> np.ndarray:
    """One document -> l2-normalized float64[dim] (signed feature hashing)."""
    toks = tokenize_filtered(text)
    vec = np.zeros(dim, dtype=np.float64)
    if toks:
        hs = [_token_hash(t) for t in toks]
        idx = np.fromiter((h % dim for h, _ in hs), dtype=np.int64, count=len(hs))
        sign = np.fromiter((s for _, s in hs), dtype=np.float64, count=len(hs))
        np.add.at(vec, idx, sign)
        n = np.linalg.norm(vec)
        if n > 0:
            vec /= n
    return vec


def hashing_embed_batch(texts, dim: int = 256) -> list[np.ndarray]:
    return [hashing_embed(t, dim) for t in texts]


class HashingEmbedStage:
    """Actor-pool stage: add an ``embedding`` list<float> column from a text
    column.  Stateless math, but the actor form keeps the per-batch overhead
    amortized and mirrors how a learned encoder would slot in."""

    def __init__(self, text_col: str = "text", dim: int = 256):
        self.text_col = text_col
        self.dim = dim

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        # plain lists, NOT ndarrays: an object column of ndarrays gets
        # auto-cast to Ray's Arrow tensor-extension type, whose pandas
        # round-trip needs TensorDtype registered in the worker — whether it
        # is depends on that worker's task history (order-dependent
        # "format number ... not recognized" failures).  Lists become Arrow
        # list<double>, the same shape the embeddings parquet table reads as.
        batch["embedding"] = [
            v.tolist() for v in hashing_embed_batch(batch[self.text_col], self.dim)
        ]
        return batch
