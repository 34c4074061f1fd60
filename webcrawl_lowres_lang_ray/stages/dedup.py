"""Deduplication operators over a text Dataset.

The reference's dedup surface (SURVEY.md §2.7): exact content dedup by
SHA-256 ``file_hash`` with first-wins clone (sql.py:167-172,
lrl-crawler.py:116-147) and URL dedup by hash (sql.py:180-189).  This module
provides the training-data-pipeline generalizations as Ray Data pipelines:

* ``exact_dedup``     — hash-partition + per-group first (hash column added
                        vectorized, groupby(hash).map_groups head-1);
* ``minhash_lsh``     — word-shingle -> 64-perm MinHash -> banded LSH
                        (emit (band, band_hash, doc) rows, groupby bucket,
                        intra-bucket candidate pairs, similarity estimate);
* ``simhash``         — 64-bit SimHash fingerprints + near-dup pairs by
                        Hamming distance (bucketed by 4 x 16-bit blocks:
                        two docs within distance d<=3 share >=1 block);
* ``ngram_jaccard_pairs`` — exact n-gram Jaccard verification for candidate
                        pairs (the verify step after LSH).

All hashing is content-derived (blake2b) — deterministic across processes
and runs, no Python ``hash()``.
"""

from __future__ import annotations

import hashlib
from itertools import combinations

import numpy as np
import pandas as pd

import ray.data
from ray.data.aggregate import Count, Min

_MERSENNE = (1 << 61) - 1
_N_PERM = 64


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Word k-shingles -> uint64 hashes (blake2b, deterministic)."""
    words = text.split()
    if len(words) < k:
        shingles = [" ".join(words)] if words else []
    else:
        shingles = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    out = np.empty(len(shingles), dtype=np.uint64)
    for i, s in enumerate(shingles):
        out[i] = int.from_bytes(
            hashlib.blake2b(s.encode(), digest_size=8).digest(), "little"
        )
    return out


def _perm_params(n_perm: int = _N_PERM, seed: int = 1234) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=n_perm, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERSENNE, size=n_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def minhash_signature(text: str, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    sh = _shingle_hashes(text)
    if len(sh) == 0:
        return np.full(len(a), np.uint64(_MERSENNE), dtype=np.uint64)
    # (a * x + b) mod p, vectorized over perms x shingles
    prod = (a[:, None] * (sh[None, :] % _MERSENNE)) % _MERSENNE
    vals = (prod + b[:, None]) % _MERSENNE
    return vals.min(axis=1).astype(np.uint64)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def add_content_hash(ds: "ray.data.Dataset", text_col: str, out_col: str = "content_md5") -> "ray.data.Dataset":
    def fn(b: pd.DataFrame) -> pd.DataFrame:
        b[out_col] = [
            hashlib.md5(t.encode()).hexdigest() for t in b[text_col]
        ]
        return b

    return ds.map_batches(fn, batch_format="pandas")


def exact_dedup_stats(
    ds: "ray.data.Dataset", text_col: str = "text", id_col: str = "doc_id"
) -> "ray.data.Dataset":
    """Per content-hash group: keeper (min id) + multiplicity.

    Equivalent of the reference's first-wins content dedup: the min-id row is
    the one that would be NLP-scored; the rest clone (lrl-crawler.py:421-428).
    """
    hashed = add_content_hash(ds.select_columns([id_col, text_col]), text_col)
    return (
        hashed.groupby("content_md5")
        .aggregate(Min(id_col, alias_name="keeper"), Count(alias_name="n"))
    )


def exact_dedup_keep_first(
    ds: "ray.data.Dataset", text_col: str = "text", id_col: str = "doc_id"
) -> "ray.data.Dataset":
    """Drop duplicate-content rows, keeping the min-id row per hash group."""
    hashed = add_content_hash(ds, text_col)

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(id_col, kind="mergesort").head(1)

    return hashed.groupby("content_md5").map_groups(first, batch_format="pandas")


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

def minhash_lsh_pairs(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    bands: int = 16,
    rows_per_band: int = 4,
    threshold: float = 0.5,
) -> "ray.data.Dataset":
    """Candidate near-dup pairs with MinHash-estimated Jaccard >= threshold.

    shingle -> minhash (per batch, vectorized) -> explode (band, band_hash)
    rows -> groupby bucket -> intra-bucket pairs -> estimate from signature
    agreement -> dedup pairs.  Returns (id_a, id_b, est_jaccard) sorted ids.
    """
    a, b = _perm_params(bands * rows_per_band)

    def sig_stage(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for did, text in zip(batch[id_col], batch[text_col]):
            sig = minhash_signature(text, a, b)
            for band in range(bands):
                chunk = sig[band * rows_per_band : (band + 1) * rows_per_band]
                bh = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
                rows.append((int(did), band, bh, sig.tobytes()))
        return pd.DataFrame(rows, columns=[id_col, "band", "band_hash", "sig"])

    banded = ds.select_columns([id_col, text_col]).map_batches(
        sig_stage, batch_format="pandas"
    )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame(columns=["id_a", "id_b", "est_jaccard"])
        out = []
        recs = sorted(zip(g[id_col], g["sig"]))
        for (ida, sa), (idb, sb) in combinations(recs, 2):
            if ida == idb:
                continue
            va = np.frombuffer(sa, dtype=np.uint64)
            vb = np.frombuffer(sb, dtype=np.uint64)
            est = float((va == vb).mean())
            if est >= threshold:
                out.append((min(ida, idb), max(ida, idb), round(est, 4)))
        return pd.DataFrame(out, columns=["id_a", "id_b", "est_jaccard"])

    pairs = banded.groupby(["band", "band_hash"]).map_groups(
        bucket_pairs, batch_format="pandas"
    )

    # a pair can surface from several bands — keep one row per pair
    def dedup_pair(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return pairs.groupby(["id_a", "id_b"]).map_groups(dedup_pair, batch_format="pandas")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (blake2b token hashes)."""
    acc = np.zeros(64, dtype=np.int64)
    for w in text.split():
        h = int.from_bytes(hashlib.blake2b(w.encode(), digest_size=8).digest(), "little")
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits.astype(bool), 1, -1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def add_simhash(ds: "ray.data.Dataset", text_col: str = "text") -> "ray.data.Dataset":
    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        batch["simhash"] = np.array(
            [np.uint64(simhash64(t)) for t in batch[text_col]], dtype=np.uint64
        )
        return batch

    return ds.map_batches(fn, batch_format="pandas")


def simhash_neardup_pairs(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> "ray.data.Dataset":
    """Near-dup pairs by SimHash Hamming distance <= max_hamming.

    Pigeonhole bucketing: split the 64-bit hash into 4 x 16-bit blocks; any
    pair within distance 3 agrees on at least one block, so candidate
    generation is 4 groupbys (emitted as exploded block rows), verification
    is an exact popcount inside each bucket.
    """
    withhash = add_simhash(ds.select_columns([id_col, text_col]), text_col)

    def explode_blocks(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for did, sh in zip(batch[id_col], batch["simhash"]):
            sh = int(sh)
            for blk in range(4):
                rows.append((int(did), blk, (sh >> (16 * blk)) & 0xFFFF, np.uint64(sh)))
        return pd.DataFrame(rows, columns=[id_col, "block", "block_val", "simhash"])

    blocks = withhash.map_batches(explode_blocks, batch_format="pandas")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame(columns=["id_a", "id_b", "hamming"])
        out = []
        recs = sorted(zip(g[id_col], g["simhash"]))
        for (ida, ha), (idb, hb) in combinations(recs, 2):
            if ida == idb:
                continue
            d = bin(int(ha) ^ int(hb)).count("1")
            if d <= 3:
                out.append((min(ida, idb), max(ida, idb), d))
        return pd.DataFrame(out, columns=["id_a", "id_b", "hamming"])

    pairs = blocks.groupby(["block", "block_val"]).map_groups(
        bucket_pairs, batch_format="pandas"
    )
    return pairs.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# exact n-gram Jaccard (verification / small-scale oracle)
# ---------------------------------------------------------------------------

def ngram_jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    sa = set(_shingle_hashes(text_a, k).tolist())
    sb = set(_shingle_hashes(text_b, k).tolist())
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)
