"""Trained document classifiers + heuristic filter batteries.

Two LLM-data-pipeline staples the reference lacks but any 100 TB curation
run needs (CCNet / LLaMA-style pipelines train exactly this shape of model
to score web text against a high-quality reference corpus):

* ``nb_train`` / ``nb_classify`` — multinomial Naive Bayes over hashed
  unigram buckets (the fastText-linear-classifier analog that fits this
  sandbox).  Training is ONE streaming pass emitting mergeable per-class
  bincount partials (C x 2^16 int64 — the combiner-sketch shape; nothing
  per-row crosses the exchange), summed on the driver, quantized to
  integer micro-units, and broadcast once via ``ray.put``.  Scoring is an
  actor-free ``map_batches`` doing one ``W[:, ids].sum`` per doc.  The
  md5-prefix bucket convention + micro-unit quantization make the whole
  thing bit-for-bit SQL-checkable (SQL_DOC_NB_LANGID) — same trick as
  DSIR (stages/curation.py:dsir_log_weights).

* ``c4_flags_batch`` — the C4 corpus heuristics (Raffel et al. 2020,
  "Exploring the Limits of Transfer Learning", §2.2) adapted to doc level:
  word-count band, mean-word-length band, brace / "lorem ipsum" /
  "javascript" markers.  Pure per-row string predicates, fully
  SQL-expressible (SQL_DOC_C4_FILTER).

Scale notes: the NB model is C x 65536 x 8 B (~2.6 MB at C=5) — broadcast
once per job, read zero-copy in every scoring task; the training exchange
carries one (C x 2^16) blob per input block regardless of corpus size.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import ray

NB_BUCKETS = 1 << 16


def _unigram_buckets(text, buckets: int = NB_BUCKETS) -> np.ndarray:
    """Hashed word-unigram bucket ids: first 16 bits (4 hex chars) of
    md5(word) — DuckDB reproduces this exactly with substr(md5(w),1,4)."""
    ws = text.split() if isinstance(text, str) else []
    if not ws:
        return np.zeros(0, dtype=np.int64)
    shift = 128 - (buckets - 1).bit_length()
    return np.fromiter(
        (int.from_bytes(hashlib.md5(w.encode()).digest(), "big") >> shift for w in ws),
        dtype=np.int64,
        count=len(ws),
    )


def _quantize_micro(x: np.ndarray) -> np.ndarray:
    """round-half-away-from-zero to integer 1e-6 units (DuckDB
    CAST(ROUND(1e6*x) AS BIGINT) parity)."""
    v = 1e6 * x
    return (np.floor(np.abs(v) + 0.5) * np.sign(v)).astype(np.int64)


def nb_train(
    docs: "ray.data.Dataset",
    classes: list[str],
    label_col: str = "lang",
    text_col: str = "text",
    buckets: int = NB_BUCKETS,
) -> tuple[np.ndarray, np.ndarray]:
    """One streaming pass -> (priors_q [C], weights_q [C x buckets]) in
    integer micro-units.  Per-batch partial = per-class gram bincount blob
    + per-class doc count; mergeable by summation (combiner pattern —
    the exchange carries C fixed-size blobs per block, never rows)."""
    cls_index = {c: i for i, c in enumerate(classes)}
    C = len(classes)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        cnt = np.zeros((C, buckets), dtype=np.int64)
        nd = np.zeros(C, dtype=np.int64)
        labels = b[label_col].to_numpy()
        for i, t in enumerate(b[text_col]):
            ci = cls_index.get(labels[i])
            if ci is None:
                continue
            nd[ci] += 1
            ids = _unigram_buckets(t, buckets)
            if len(ids):
                cnt[ci] += np.bincount(ids, minlength=buckets)
        return pd.DataFrame({"cnt": [cnt.tobytes()], "nd": [nd.tobytes()]})

    # large train batches: each partial is a fixed C x 2^16 blob (~2.6 MB
    # at C=5) regardless of rows, so bigger batches mean fewer blobs on
    # the exchange — at billions of docs this plus a tree-reduce of the
    # partials keeps the merge off the driver's critical path
    parts = docs.map_batches(
        partial, batch_format="pandas", batch_size=8192
    ).to_pandas()
    cnt = np.zeros((C, buckets), dtype=np.int64)
    nd = np.zeros(C, dtype=np.int64)
    for blob in parts["cnt"]:
        cnt += np.frombuffer(blob, dtype=np.int64).reshape(C, buckets)
    for blob in parts["nd"]:
        nd += np.frombuffer(blob, dtype=np.int64)

    nd_total = float(nd.sum())
    # math.log (libm), element by element: the same doubles DuckDB's ln()
    # produces — np.log may differ in the last ulp and break the oracle.
    priors = np.fromiter(
        (math.log(n / nd_total) for n in nd.tolist()), dtype=np.float64, count=C
    )
    tot = cnt.sum(axis=1)  # gram instances per class
    weights = np.empty((C, buckets), dtype=np.float64)
    for ci in range(C):
        den = float(tot[ci]) + buckets
        row = cnt[ci]
        weights[ci] = np.fromiter(
            (math.log((v + 1.0) / den) for v in row.tolist()),
            dtype=np.float64,
            count=buckets,
        )
    return _quantize_micro(priors), _quantize_micro(weights)


def nb_classify(
    docs: "ray.data.Dataset",
    classes: list[str],
    priors_q: np.ndarray,
    weights_q: np.ndarray,
    id_col: str = "doc_id",
    label_col: str = "lang",
    text_col: str = "text",
    buckets: int = NB_BUCKETS,
    round_dp: int = 4,
) -> "ray.data.Dataset":
    """Score every doc against the broadcast model; argmax class with
    lexicographically-smallest tie-break (classes must be sorted), margin
    = (best - runner-up) log-prob in 1e-6 units, reported /1e6 @4dp."""
    from .textstats import round_half_away

    assert list(classes) == sorted(classes), "classes must be sorted for tie-break"
    model_ref = ray.put((priors_q, weights_q))

    def score(b: pd.DataFrame) -> pd.DataFrame:
        pq, W = ray.get(model_ref)
        n = len(b)
        pred = np.empty(n, dtype=object)
        margin = np.zeros(n, dtype=np.int64)
        for i, t in enumerate(b[text_col]):
            ids = _unigram_buckets(t, buckets)
            s = pq + (W[:, ids].sum(axis=1) if len(ids) else 0)
            best = int(np.argmax(s))  # first max -> lex-smallest class
            pred[i] = classes[best]
            if len(s) > 1:
                margin[i] = s[best] - np.partition(s, -2)[-2]
        out = pd.DataFrame(
            {
                id_col: b[id_col].to_numpy(),
                "pred_lang": pred,
                "margin": round_half_away(margin / 1e6, round_dp),
                "is_correct": (
                    pred == b[label_col].to_numpy().astype(object)
                ).astype(np.int64),
            }
        )
        return out

    return docs.map_batches(score, batch_format="pandas")


# ---------------------------------------------------------------- C4 ----

_C4_MIN_WORDS, _C4_MAX_WORDS = 50, 100_000
_C4_MIN_MWL, _C4_MAX_MWL = 3.0, 10.0
_C4_MARKERS = ("{", "lorem ipsum", "javascript")


def c4_flags_batch(
    b: pd.DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pd.DataFrame:
    """Doc-level C4 heuristic flags + keep decision (see module doc)."""
    from .textstats import round_half_away

    n = len(b)
    n_words = np.zeros(n, dtype=np.int64)
    mwl = np.zeros(n, dtype=np.float64)
    marker = np.zeros(n, dtype=np.int64)
    for i, t in enumerate(b[text_col]):
        if not isinstance(t, str) or not t:
            continue
        ws = t.split()
        n_words[i] = len(ws)
        if ws:
            mwl[i] = sum(len(w) for w in ws) / len(ws)
        low = t.lower()
        marker[i] = int(any(m in low for m in _C4_MARKERS))
    mwl_r = round_half_away(mwl, 4)
    # band-check the ROUNDED value: it's the value both the output column
    # and the SQL oracle see, so the keep bit can't straddle a 4dp boundary
    keep = (
        (n_words >= _C4_MIN_WORDS)
        & (n_words <= _C4_MAX_WORDS)
        & (mwl_r >= _C4_MIN_MWL)
        & (mwl_r <= _C4_MAX_MWL)
        & (marker == 0)
    ).astype(np.int64)
    return pd.DataFrame(
        {
            id_col: b[id_col].to_numpy(),
            "n_words": n_words,
            "mean_word_len": mwl_r,
            "has_marker": marker,
            "keep_doc": keep,
        }
    )
