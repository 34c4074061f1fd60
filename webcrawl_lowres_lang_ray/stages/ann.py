"""Similarity search over an embedding column (list<float>).

* ``brute_force_topk`` — the exact baseline: the (small) query matrix is
  ``ray.put`` once and every batch does one numpy matmul against it — a
  broadcast join, no shuffle.  Top-k is per-batch partial top-k followed by
  a tiny driver-side merge (the classic distributed top-k combiner).
* ``srp_lsh_topk``     — the scale path: signed-random-projection LSH.
  An indexing pass assigns each vector a b-bit signature bucket (seeded
  hyperplanes, deterministic); the query probes its own bucket plus all
  buckets within Hamming distance <= ``probe_hamming``, computing exact
  cosine only on candidates.  Recall vs the brute-force baseline is
  asserted in tests.
"""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd

import ray
import ray.data

from .textstats import round_half_away


def _batch_matrix(batch: pd.DataFrame, vec_col: str) -> np.ndarray:
    return np.stack([np.asarray(v, dtype=np.float64) for v in batch[vec_col]])


def _cosine_scores(mat: np.ndarray, q: np.ndarray) -> np.ndarray:
    qn = q / np.linalg.norm(q)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    return (mat @ qn) / norms


def brute_force_topk(
    ds: "ray.data.Dataset",
    query_vec: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 5,
) -> pd.DataFrame:
    """Exact cosine top-k. Returns (id, score) ordered by (-score, id)."""
    q_ref = ray.put(np.asarray(query_vec, dtype=np.float64))

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        q = ray.get(q_ref)
        mat = _batch_matrix(batch, vec_col)
        scores = round_half_away(_cosine_scores(mat, q), round_dp)
        order = np.lexsort((batch[id_col].to_numpy(), -scores))[:k]
        return pd.DataFrame(
            {id_col: batch[id_col].to_numpy()[order], "score": scores[order]}
        )

    partials = ds.select_columns([id_col, vec_col]).map_batches(
        partial, batch_format="pandas"
    )
    allp = partials.to_pandas()  # <= k rows per batch — tiny
    allp = allp.sort_values(["score", id_col], ascending=[False, True], kind="mergesort")
    return allp.head(k).reset_index(drop=True)


# ---------------------------------------------------------------------------
# SRP-LSH
# ---------------------------------------------------------------------------

def _srp_planes(dim: int, bits: int, table: int, seed: int = 99) -> np.ndarray:
    rng = np.random.RandomState(seed + 1000 * table)
    return rng.normal(size=(bits, dim))


def _signature(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (mat @ planes.T) > 0
    out = np.zeros(len(mat), dtype=np.int64)
    for j in range(planes.shape[0]):
        out |= bits[:, j].astype(np.int64) << j
    return out


def build_srp_index(
    ds: "ray.data.Dataset",
    dim: int,
    bits: int = 8,
    n_tables: int = 4,
    vec_col: str = "embedding",
    seed: int = 99,
) -> "ray.data.Dataset":
    """Indexing pass: n_tables signature columns sig0..sigL-1 (deterministic
    hyperplanes; L independent tables is the standard SRP recall lever)."""
    planes = [_srp_planes(dim, bits, t, seed) for t in range(n_tables)]
    planes_ref = ray.put(planes)

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        mat = _batch_matrix(batch, vec_col)
        pls = ray.get(planes_ref)
        for t, pl in enumerate(pls):
            batch[f"sig{t}"] = _signature(mat, pl)
        return batch

    return ds.map_batches(fn, batch_format="pandas")


def _probe_set(qsig: int, bits: int, probe_hamming: int) -> set[int]:
    sigs = {qsig}
    for dist in range(1, probe_hamming + 1):
        for flip in itertools.combinations(range(bits), dist):
            s = qsig
            for f in flip:
                s ^= 1 << f
            sigs.add(s)
    return sigs


def srp_lsh_topk(
    indexed: "ray.data.Dataset",
    query_vec: np.ndarray,
    dim: int,
    k: int = 10,
    bits: int = 8,
    n_tables: int = 4,
    probe_hamming: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 99,
    round_dp: int = 5,
) -> pd.DataFrame:
    """Multi-table multi-probe SRP-LSH top-k over a build_srp_index index.

    A row is a candidate if it matches the query's probe set in ANY table
    (union of tables); exact cosine is computed only on candidates."""
    q = np.asarray(query_vec, dtype=np.float64)
    probe_sets = []
    for t in range(n_tables):
        planes = _srp_planes(dim, bits, t, seed)
        qsig = int(_signature(q[None, :], planes)[0])
        probe_sets.append(_probe_set(qsig, bits, probe_hamming))
    probes_ref = ray.put(probe_sets)

    def cand_filter(batch: pd.DataFrame) -> pd.DataFrame:
        ps = ray.get(probes_ref)
        mask = np.zeros(len(batch), dtype=bool)
        for t, sigs in enumerate(ps):
            mask |= batch[f"sig{t}"].isin(list(sigs)).to_numpy()
        return batch.loc[mask]

    cands = indexed.map_batches(cand_filter, batch_format="pandas")
    q_ref = ray.put(q)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        qq = ray.get(q_ref)
        mat = _batch_matrix(batch, vec_col)
        scores = round_half_away(_cosine_scores(mat, qq), round_dp)
        order = np.lexsort((batch[id_col].to_numpy(), -scores))[:k]
        return pd.DataFrame(
            {id_col: batch[id_col].to_numpy()[order], "score": scores[order]}
        )

    allp = cands.map_batches(partial, batch_format="pandas").to_pandas()
    if len(allp) == 0:
        return pd.DataFrame({id_col: [], "score": []})
    allp = allp.sort_values(["score", id_col], ascending=[False, True], kind="mergesort")
    return allp.head(k).reset_index(drop=True)
