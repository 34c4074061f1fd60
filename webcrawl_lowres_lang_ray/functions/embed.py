"""Deterministic text -> embedding bridge (hashing-trick vectorizer).

A large-scale training-data pipeline needs embeddings over raw text columns
without shipping a model into every worker: the hashing trick (feature
hashing, Weinberger et al. 2009) maps each token to one of ``dim`` buckets
with a +-1 sign, accumulates token counts, and l2-normalizes — fully
deterministic (pandas SipHash with its fixed key; no Python hash()), no
vocabulary state, vectorized per batch.  The output column is the same
``list<float>`` shape as the provided embeddings table, so every downstream
embedding operator (brute/SRP/IVF ANN, SRP-bucketed near-dup) runs on it
unchanged.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .tokenize import tokenize_filtered


def hashing_embed(text: str, dim: int = 256) -> np.ndarray:
    """One document -> l2-normalized float64[dim] (signed feature hashing)."""
    toks = tokenize_filtered(text)
    vec = np.zeros(dim, dtype=np.float64)
    if toks:
        h = pd.util.hash_array(np.asarray(toks, dtype=object))
        idx = (h % np.uint64(dim)).astype(np.int64)
        sign = np.where((h >> np.uint64(63)) & np.uint64(1), -1.0, 1.0)
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
