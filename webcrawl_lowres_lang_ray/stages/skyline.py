"""Distributed skyline (Pareto frontier) — "which documents are not
dominated on (length, lexical diversity)" and every other
multi-criteria data-selection question (quality vs toxicity, size vs
perplexity).  Börzsönyi et al., ICDE 2001: a point is IN the skyline
iff no other point is >= on every dimension and > on at least one
(maximization on all dims here; negate a column to minimize).

Plan: a LOCAL skyline per block (map_batches — dominance is closed
under subsetting, so a locally-dominated point is globally dominated
and dies before the exchange), then one exact quadratic pass over the
surviving candidates.  Skylines are tiny in practice (O(log^(d-1) N)
expected for independent dims), so the candidate set fits the driver;
a loud cap guards the pathological all-points-on-the-frontier case.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

SKYLINE_CANDIDATE_CAP = 2_000_000


def _local_skyline(m: np.ndarray) -> np.ndarray:
    """Boolean mask of non-dominated rows of an (n, d) float matrix,
    maximization on every column.  Sort-scan: order by col0 desc (ties:
    col1 desc, ...), then a row can only be dominated by an EARLIER row;
    for d == 2 a strict running max on col1 decides in O(n log n).
    For d > 2 fall back to a vectorized one-vs-earlier pass."""
    n, d = m.shape
    if n == 0:
        return np.zeros(0, dtype=bool)
    keep = np.ones(n, dtype=bool)
    if d == 2:
        # strict-dominance prefilter (no false drops): sort by x desc,
        # drop any row whose y is strictly below the max y among rows
        # with STRICTLY larger x (both dims strictly better -> dominated).
        # Equal-x ties are left for the quadratic re-verify below.
        order = np.lexsort((-m[:, 1], -m[:, 0]))
        s = m[order]
        x, y = s[:, 0], s[:, 1]
        new_x = np.r_[True, x[1:] != x[:-1]]
        gid = np.cumsum(new_x) - 1
        ngroups = gid[-1] + 1
        gmax = np.full(ngroups, -np.inf)
        np.maximum.at(gmax, gid, y)
        # exclusive running max over earlier (strictly larger-x) groups
        prev = np.r_[-np.inf, np.maximum.accumulate(gmax)[:-1]]
        pre = y >= prev[gid]
        cand = order[pre]
        keep[:] = False
        keep[cand[_quadratic_skyline(m[cand])]] = True
    else:
        keep = _quadratic_skyline(m)
    return keep


def _quadratic_skyline(m: np.ndarray) -> np.ndarray:
    n = len(m)
    keep = np.ones(n, dtype=bool)
    for k in range(n):
        ge = (m >= m[k]).all(axis=1)
        gt = (m > m[k]).any(axis=1)
        ge[k] = False
        if (ge & gt).any():
            keep[k] = False
    return keep


def skyline(
    ds: "ray.data.Dataset",
    dims: list[str],
    keep_cols: list[str] | None = None,
) -> pd.DataFrame:
    """Pareto frontier of ``ds`` maximizing every column in ``dims``.
    Returns a small DataFrame (skylines are; the cap raises loudly
    otherwise) with ``keep_cols + dims``."""
    keep_cols = keep_cols or []
    cols = list(dict.fromkeys(keep_cols + dims))

    def local(b: pd.DataFrame) -> pd.DataFrame:
        m = b[dims].to_numpy(np.float64)
        return b.loc[_local_skyline(m), cols]

    # materialize once: count() would otherwise execute the whole upstream
    # pipeline, and the to_pandas() below would execute it a second time
    cand = ds.map_batches(local, batch_format="pandas").materialize()
    n = cand.count()
    if n > SKYLINE_CANDIDATE_CAP:
        raise ValueError(
            f"skyline candidate set {n} exceeds cap {SKYLINE_CANDIDATE_CAP}: "
            "dimensions are anti-correlated enough that the frontier is not "
            "small — pre-bucket a dimension or raise SKYLINE_CANDIDATE_CAP"
        )
    cf = cand.to_pandas()
    m = cf[dims].to_numpy(np.float64)
    return cf.loc[_quadratic_skyline(m)].reset_index(drop=True)
