"""Mergeable sketches — the approximate scale path for quantiles and
distinct counts.

Exact grouped quantiles (stages/windows.py:grouped_quantiles) must co-locate
each group's full value multiset; exact distinct counts must shuffle every
key.  At 100 TB both are sketch jobs:

* ``TDigest``      — merging t-digest (Dunning): bounded centroid count,
                     accurate at the tails.  Built per batch inside
                     map_batches (the combiner), merged per group — the
                     exchange carries centroids, never values.
* ``HyperLogLog``  — dense HLL with 2^p registers; register arrays max-merge,
                     so per-batch partials combine associatively.

Both are deterministic for a fixed input partitioning given sorted merge
order; accuracy (not bit-equality) is the contract, pinned by tests against
the exact oracles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data


class TDigest:
    """Merging t-digest over float64 values (k1 scale function ~ Dunning's
    clustering by quantile limit)."""

    def __init__(self, compression: float = 200.0):
        self.compression = compression
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)

    def add(self, values: np.ndarray) -> "TDigest":
        if len(values):
            self.means = np.concatenate([self.means, values.astype(np.float64)])
            self.weights = np.concatenate(
                [self.weights, np.ones(len(values), dtype=np.float64)]
            )
            self._compress()
        return self

    def merge(self, other: "TDigest") -> "TDigest":
        self.means = np.concatenate([self.means, other.means])
        self.weights = np.concatenate([self.weights, other.weights])
        self._compress()
        return self

    def _compress(self) -> None:
        if len(self.means) <= self.compression:
            order = np.argsort(self.means, kind="mergesort")
            self.means, self.weights = self.means[order], self.weights[order]
            return
        order = np.argsort(self.means, kind="mergesort")
        means, weights = self.means[order], self.weights[order]
        total = weights.sum()
        # q-limit boundaries: centroid i may absorb until its cumulative
        # quantile crosses the next k-boundary (k = compression/2 slices of
        # the arcsine scale, denser at the tails)
        k_limit = int(self.compression)
        out_m, out_w = [], []
        qa = 0.0
        cur_m, cur_w = means[0] * weights[0], weights[0]
        # next quantile boundary via arcsine spacing
        def limit(q):
            k = np.ceil(k_limit * (np.arcsin(2 * min(max(q, 0.0), 1.0) - 1) / np.pi + 0.5) + 1e-9)
            return (np.sin(np.pi * (k / k_limit - 0.5)) + 1) / 2

        bound = limit(qa + cur_w / total)
        for m, w in zip(means[1:], weights[1:]):
            if (qa + (cur_w + w) / total) <= bound + 1e-12:
                cur_m += m * w
                cur_w += w
            else:
                out_m.append(cur_m / cur_w)
                out_w.append(cur_w)
                qa += cur_w / total
                cur_m, cur_w = m * w, w
                bound = limit(qa + w / total)
        out_m.append(cur_m / cur_w)
        out_w.append(cur_w)
        self.means = np.asarray(out_m)
        self.weights = np.asarray(out_w)

    def quantile(self, q: float) -> float:
        if len(self.means) == 0:
            return float("nan")
        if len(self.means) == 1:
            return float(self.means[0])
        cum = np.cumsum(self.weights) - self.weights / 2
        target = q * self.weights.sum()
        return float(np.interp(target, cum, self.means))

    def to_arrays(self) -> tuple[np.ndarray, np.ndarray]:
        return self.means, self.weights

    @classmethod
    def from_arrays(cls, means, weights, compression: float = 200.0) -> "TDigest":
        d = cls(compression)
        d.means = np.asarray(means, dtype=np.float64)
        d.weights = np.asarray(weights, dtype=np.float64)
        return d


def approx_grouped_quantiles(
    ds: "ray.data.Dataset",
    group_col: str,
    value_col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.9),
    compression: float = 200.0,
    round_dp: int = 4,
) -> "ray.data.Dataset":
    """Per-group approximate quantiles: per-batch t-digests (combiner) ->
    per-group centroid merge.  The exchange carries O(compression) centroids
    per group per batch instead of the raw values."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for key, sub in b.groupby(group_col, sort=False):
            d = TDigest(compression).add(sub[value_col].to_numpy(np.float64))
            m, w = d.to_arrays()
            rows.append((key, list(m), list(w)))
        return pd.DataFrame(rows, columns=[group_col, "c_means", "c_weights"])

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        d = TDigest(compression)
        for m, w in zip(g["c_means"], g["c_weights"]):
            d.merge(TDigest.from_arrays(m, w, compression))
        row = {group_col: g[group_col].iloc[0]}
        for q in qs:
            row[f"q{int(q * 100)}"] = round(d.quantile(q), round_dp)
        return pd.DataFrame([row])

    return (
        ds.select_columns([group_col, value_col])
        .map_batches(partial, batch_format="pandas")
        .groupby(group_col)
        .map_groups(merge, batch_format="pandas")
    )


class HyperLogLog:
    """Dense HLL over 64-bit hashes, 2^p registers, max-mergeable."""

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, h: np.ndarray) -> "HyperLogLog":
        if len(h) == 0:
            return self
        h = h.astype(np.uint64)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)
        # rank = leading zeros of remaining bits + 1
        lz = np.zeros(len(rest), dtype=np.uint8)
        cur = rest.copy()
        mask = np.uint64(1 << 63)
        for r in range(1, 64 - self.p + 2):
            top = (cur & mask) != 0
            lz[(lz == 0) & top] = r
            cur = cur << np.uint64(1)
        np.maximum.at(self.registers, idx, lz)
        return self

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        inv = np.power(2.0, -self.registers.astype(np.float64))
        e = alpha * m * m / inv.sum()
        zeros = int((self.registers == 0).sum())
        if e <= 2.5 * m and zeros:
            e = m * np.log(m / zeros)  # linear counting small-range fix
        return float(e)


def approx_distinct(
    ds: "ray.data.Dataset",
    key_col: str,
    group_col: str | None = None,
    p: int = 12,
) -> pd.DataFrame:
    """Approximate COUNT(DISTINCT key) [per group]: per-batch HLL register
    arrays (combiner) max-merged — the exchange carries 2^p bytes per group
    per batch, never keys.  ~1.04/sqrt(2^p) relative error (~1.6% at p=12)."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        if group_col is None:
            groups = [("", b)]
        else:
            groups = list(b.groupby(group_col, sort=False))
        for key, sub in groups:
            h = pd.util.hash_array(sub[key_col].to_numpy()).astype(np.uint64)
            hll = HyperLogLog(p).add_hashes(h)
            rows.append((key, hll.registers.tobytes()))
        return pd.DataFrame(rows, columns=["__g", "regs"])

    partials = ds.map_batches(partial, batch_format="pandas")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        hll = HyperLogLog(p)
        for blob in g["regs"]:
            o = HyperLogLog(p)
            o.registers = np.frombuffer(blob, dtype=np.uint8).copy()
            hll.merge(o)
        return pd.DataFrame(
            [{"__g": g["__g"].iloc[0], "approx_distinct": int(round(hll.estimate()))}]
        )

    out = partials.groupby("__g").map_groups(merge, batch_format="pandas").to_pandas()
    if group_col is None:
        return out.drop(columns=["__g"])
    return out.rename(columns={"__g": group_col}).sort_values(group_col).reset_index(drop=True)


class CountMinSketch:
    """Count-Min sketch (Cormode & Muthukrishnan 2005): ``depth`` rows of
    ``width`` counters; point estimate = min over rows (never underestimates).
    Keys are hashed ONCE with pd.util.hash_array (SipHash, fixed key —
    process-stable); each depth row derives its index by mixing that uint64
    through a splitmix64 finalizer with a per-row constant — fully
    vectorized, no per-row Python.  Cell-wise ADD-mergeable, so per-batch
    partials combine associatively."""

    def __init__(self, width: int = 2048, depth: int = 4):
        self.width = width
        self.depth = depth
        self.table = np.zeros((depth, width), dtype=np.int64)

    def _row_indexes(self, keys: np.ndarray) -> np.ndarray:
        """(depth, n) int64 table indexes from one base hash per key."""
        base = pd.util.hash_array(np.asarray(keys))
        out = np.empty((self.depth, len(base)), dtype=np.int64)
        for r in range(self.depth):
            # row constant reduced mod 2^64 in Python ints (a numpy scalar
            # multiply would raise an overflow warning; array ops wrap)
            z = base + np.uint64((0x9E3779B97F4A7C15 * (r + 1)) & 0xFFFFFFFFFFFFFFFF)
            z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            out[r] = ((z ^ (z >> np.uint64(31))) % np.uint64(self.width)).astype(
                np.int64
            )
        return out

    def add_keys(self, keys: np.ndarray, counts: np.ndarray | None = None) -> "CountMinSketch":
        if len(keys) == 0:
            return self
        if counts is None:
            counts = np.ones(len(keys), dtype=np.int64)
        idx = self._row_indexes(keys)
        for r in range(self.depth):
            np.add.at(self.table[r], idx[r], counts)
        return self

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        self.table += other.table
        return self

    def estimate(self, keys: np.ndarray) -> np.ndarray:
        if len(keys) == 0:
            return np.zeros(0, dtype=np.int64)
        idx = self._row_indexes(keys)
        est = np.full(len(keys), np.iinfo(np.int64).max, dtype=np.int64)
        for r in range(self.depth):
            np.minimum(est, self.table[r][idx[r]], out=est)
        return est


def approx_heavy_hitters(
    ds: "ray.data.Dataset",
    key_col: str,
    k: int = 10,
    width: int = 2048,
    depth: int = 4,
) -> pd.DataFrame:
    """Approximate top-k keys by frequency: per-batch (CMS partial +
    local-top-k candidate set) — the exchange carries depth*width counters
    and <= k candidate keys per batch, never raw rows.  Candidates are
    re-estimated against the MERGED sketch, so a key that is top-k globally
    but not in any single batch can be missed only if it is also outside
    every batch's local top-3k (the standard candidate-union caveat,
    documented); CMS never underestimates, so ranking errors are one-sided.
    Returns (key, approx_count) sorted by (-count, key)."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        keys = b[key_col].to_numpy()
        cms = CountMinSketch(width, depth).add_keys(keys)
        vc = b[key_col].value_counts().head(3 * k)
        # candidates ride as a LIST cell (arrow list column), so the key
        # dtype survives the exchange — int64 user ids stay int64, no str()
        return pd.DataFrame(
            {
                "sketch": [cms.table.tobytes()],
                "cands": [vc.index.to_numpy()],
            }
        )

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    merged = CountMinSketch(width, depth)
    cand_lists = []
    for blob, cs in zip(parts["sketch"], parts["cands"]):
        o = CountMinSketch(width, depth)
        o.table = np.frombuffer(blob, dtype=np.int64).reshape(depth, width).copy()
        merged.merge(o)
        if len(cs):
            cand_lists.append(np.asarray(cs))
    if not cand_lists:
        return pd.DataFrame({key_col: [], "approx_count": []})
    cand_arr = np.unique(np.concatenate(cand_lists))
    # estimate() must hash the candidates with the dtype the partials used
    # (pd.util.hash_array is dtype-sensitive); np.unique/concatenate keep it
    est = merged.estimate(cand_arr)
    out = pd.DataFrame({key_col: cand_arr, "approx_count": est})
    return (
        out.sort_values(["approx_count", key_col], ascending=[False, True], kind="mergesort")
        .head(k)
        .reset_index(drop=True)
    )


def approx_pair_overlap(
    ds: "ray.data.Dataset",
    key_col: str,
    group_col: str,
    p: int = 14,
) -> pd.DataFrame:
    """Approximate pairwise set-intersection sizes by HLL
    inclusion-exclusion: |A∩B| ≈ est(A) + est(B) − est(A∪B), where the
    union sketch is the register-wise max of the two group sketches —
    the Theta/HLL answer to "how many distinct users did BOTH X and Y"
    when the groups are too big to exchange raw keys.  One combiner
    exchange carries 2^p-byte register blobs per (group, batch); the
    driver folds one sketch per group (groups are bounded — event
    types, sources) and intersects pairwise.  Signed error: unlike the
    exact operator, estimates can go slightly negative on tiny
    overlaps; clamped at 0."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for key, sub in b.groupby(group_col, sort=False):
            h = pd.util.hash_array(sub[key_col].to_numpy()).astype(np.uint64)
            rows.append((key, HyperLogLog(p).add_hashes(h).registers.tobytes()))
        return pd.DataFrame(rows, columns=["__g", "regs"])

    partials = ds.map_batches(partial, batch_format="pandas")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        hll = HyperLogLog(p)
        for blob in g["regs"]:
            o = HyperLogLog(p)
            o.registers = np.frombuffer(blob, dtype=np.uint8).copy()
            hll.merge(o)
        return pd.DataFrame(
            [{"__g": g["__g"].iloc[0], "regs": hll.registers.tobytes()}]
        )

    folded = (
        partials.groupby("__g").map_groups(merge, batch_format="pandas").to_pandas()
    )
    sketches = {}
    for _, r in folded.iterrows():
        h = HyperLogLog(p)
        h.registers = np.frombuffer(r["regs"], dtype=np.uint8).copy()
        sketches[r["__g"]] = h
    keys = sorted(sketches)
    rows = []
    for i, a in enumerate(keys):
        for b in keys[i + 1 :]:
            u = HyperLogLog(p)
            np.maximum(
                sketches[a].registers, sketches[b].registers, out=u.registers
            )
            inter = (
                sketches[a].estimate() + sketches[b].estimate() - u.estimate()
            )
            rows.append(
                {
                    group_col + "_a": a,
                    group_col + "_b": b,
                    "approx_overlap": int(round(max(inter, 0.0))),
                }
            )
    return pd.DataFrame(rows)
