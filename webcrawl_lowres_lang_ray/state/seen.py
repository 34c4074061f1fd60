"""Sharded URL-seen set — cuckoo-filter actors over a DISK-PAGED exact store.

The reference's URL-seen check is a SQLite ``url_hash IN (...)`` existence
probe before insert (sql.py:180-189, used by insert_urls_many
sql.py:213-246).  The rebuild shards the seen set across Ray actors keyed by
``hash(digest) % num_shards`` (north rule: sharded cuckoo filter, SHA-1
canonical-URL keys):

* ``CuckooFilter`` — a real partial-key cuckoo filter (numpy table,
  4-slot buckets, 16-bit fingerprints): answers "definitely new" without
  touching the exact store.  No false negatives; bounded false positives
  (property-tested).
* ``SeenShard`` — actor owning one shard.  The exact authority is PAGED:
  - ``recent``: the in-RAM key set holds ONLY keys added since the last
    delta snapshot (one politeness wave's worth);
  - ``runs``: every earlier key lives in sorted immutable run files on disk
    (the per-wave delta snapshots double as the runs), mapped with
    ``np.memmap`` so the OS page cache decides residency.  A probe touches
    a run only when the cuckoo filter says "maybe" — at the north rule's
    10^10-URL scale the filter (~4.5 bytes/key) stays in RAM while the
    ~200 GB of exact keys stay on disk, and the filter's ~1e-4 FP rate
    means ~one binary search per 10^4 genuinely-new keys.

Retry-safe protocol (streamed insertion path, frontier._insert_streamed):
``probe_new`` is READ-ONLY, so a Ray task retry that re-probes returns the
same verdicts; keys are registered via ``add_blob`` only from the seq-assign
tasks for rows that actually inserted (idempotent: re-adding a key is a set
union).  This also matches the oracle's ``max_pages`` semantics
(oracle.py:102-112): a candidate dropped by the insertion budget is never
seen-marked, so raising the budget on resume re-crawls it.

The crawl probes each candidate digest at most once per wave (candidates
are pre-deduplicated within the wave), so RPC arrival order cannot affect
membership — determinism holds under any actor scheduling.
"""

from __future__ import annotations

import os

import numpy as np
import ray

_EVICTION_LIMIT = 500
KEY_LEN = 20
_V20 = np.dtype("V20")


def as_digest_matrix(digests) -> np.ndarray:
    """Normalize digests to an (n, 20) uint8 matrix.

    Accepts a list of 20-byte keys, a V20 numpy array, or an (n, 20) uint8
    matrix (returned as-is).  Hex-string columns are converted upstream by
    ``functions.hashing.hex_to_digests`` (one ``bytes.fromhex`` for the whole
    column — no per-row Python)."""
    if isinstance(digests, np.ndarray):
        if digests.dtype == np.uint8:
            return digests.reshape(-1, KEY_LEN)
        if digests.dtype == _V20:
            return digests.view(np.uint8).reshape(-1, KEY_LEN)
    if isinstance(digests, (bytes, bytearray, memoryview)):
        return np.frombuffer(digests, dtype=np.uint8).reshape(-1, KEY_LEN)
    return np.frombuffer(b"".join(digests), dtype=np.uint8).reshape(-1, KEY_LEN)


class CuckooFilter:
    """Partial-key cuckoo filter over 20-byte digests (4 slots/bucket)."""

    def __init__(self, capacity: int = 1 << 16):
        nbuckets = 1 << max(4, int(np.ceil(np.log2(max(16, capacity) / 4 * 1.1))))
        self.nbuckets = nbuckets
        self.mask = nbuckets - 1
        self.table = np.zeros((nbuckets, 4), dtype=np.uint16)
        self.stash: set[int] = set()  # overflow (never loses a key)
        self.count = 0
        self._rng = np.random.RandomState(0xC0FFEE)  # deterministic evictions

    @staticmethod
    def _mix_digests(digests) -> np.ndarray:
        """Vectorized full-digest mixer: every one of the 20 bytes feeds the
        result (digests sharing a short prefix must not become guaranteed
        mutual false positives — the adversarial inputs the FP-rate property
        probes with).  Three overlapping uint64 lanes xor-combined through a
        splitmix64-style finalizer; fixed constants, so filter state is
        reproducible across processes."""
        arr = as_digest_matrix(digests)
        a = arr[:, 0:8].copy().view("<u8").ravel()
        b = arr[:, 8:16].copy().view("<u8").ravel()
        c = arr[:, 12:20].copy().view("<u8").ravel()

        def mix(x: np.ndarray) -> np.ndarray:
            x = x.copy()
            x ^= x >> np.uint64(33)
            x *= np.uint64(0xFF51AFD7ED558CCD)
            x ^= x >> np.uint64(33)
            x *= np.uint64(0xC4CEB9FE1A85EC53)
            x ^= x >> np.uint64(33)
            return x

        return mix(a) ^ mix(b * np.uint64(0x9E3779B97F4A7C15)) ^ mix(
            c * np.uint64(0xD6E8FEB86659FD93)
        )

    def _decompose_batch(self, digests):
        m = self._mix_digests(digests)
        fp = (m & np.uint64(0xFFFF)).astype(np.int64)
        fp[fp == 0] = 1
        i1 = ((m >> np.uint64(16)).astype(np.int64)) & self.mask
        i2 = (i1 ^ (fp * 0x5BD1)) & self.mask
        return fp, i1, i2

    def _decompose(self, digest: bytes) -> tuple[int, int, int]:
        fp, i1, i2 = self._decompose_batch([digest])
        return int(fp[0]), int(i1[0]), int(i2[0])

    def _place(self, fp: int, i1: int, i2: int) -> None:
        for idx in (i1, i2):
            row = self.table[idx]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                self.count += 1
                return
        # evict loop
        idx = i1 if self._rng.randint(2) else i2
        cur = fp
        for _ in range(_EVICTION_LIMIT):
            slot = self._rng.randint(4)
            cur, self.table[idx][slot] = int(self.table[idx][slot]), cur
            idx = (idx ^ (cur * 0x5BD1)) & self.mask
            row = self.table[idx]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = cur
                self.count += 1
                return
        self.stash.add(cur)
        self.count += 1

    def add(self, digest: bytes) -> None:
        fp, i1, i2 = self._decompose(digest)
        self._place(fp, i1, i2)

    def add_many(self, digests) -> None:
        """Batch insert: one vectorized decomposition, then placements."""
        mat = as_digest_matrix(digests)
        if not len(mat):
            return
        fps, i1s, i2s = self._decompose_batch(mat)
        for k in range(len(mat)):
            self._place(int(fps[k]), int(i1s[k]), int(i2s[k]))

    def might_contain(self, digest: bytes) -> bool:
        fp, i1, i2 = self._decompose(digest)
        return (
            bool((self.table[i1] == fp).any())
            or bool((self.table[i2] == fp).any())
            or fp in self.stash
        )

    def might_contain_many(self, digests) -> np.ndarray:
        """Vectorized membership: one table gather per bucket choice."""
        mat = as_digest_matrix(digests)
        if not len(mat):
            return np.zeros(0, dtype=bool)
        fp, i1, i2 = self._decompose_batch(mat)
        hit = (self.table[i1] == fp[:, None]).any(axis=1)
        hit |= (self.table[i2] == fp[:, None]).any(axis=1)
        if self.stash:
            hit |= np.isin(fp, np.fromiter(self.stash, dtype=np.int64))
        return hit


def _load_run(path: str) -> np.ndarray | None:
    """A run file as a memory-mapped sorted V20 array (disk-paged: the OS
    page cache owns residency; a probe faults in only the touched pages)."""
    size = os.path.getsize(path)
    if size == 0:
        return None
    return np.memmap(path, dtype=_V20, mode="r")


@ray.remote(num_cpus=0)  # lightweight RPC state actor: microsecond lookups, no compute slot
class SeenShard:
    """One shard of the URL-seen set (cuckoo gate + paged exact authority).

    RAM holds the cuckoo filter plus only the keys added since the last
    delta snapshot (``recent``); every older key lives in a sorted on-disk
    run (the snapshot deltas themselves).  ``probe_new`` is read-only;
    ``add_blob`` is idempotent — together the retry-safe protocol the
    streamed insertion path relies on."""

    def __init__(self, shard_id: int, capacity: int = 1 << 16):
        self.shard_id = shard_id
        self.recent: set[bytes] = set()
        self.runs: list[np.ndarray] = []
        self._run_paths: list[str] = []
        self._nrun_keys = 0
        self.cuckoo = CuckooFilter(capacity)

    # -- internals ----------------------------------------------------------

    def _present_mask(self, keys: np.ndarray) -> np.ndarray:
        """True where the key IS already seen.  Exact: the cuckoo gate has no
        false negatives, so only its "maybe" rows pay a run binary-search /
        recent-set probe."""
        n = len(keys)
        present = np.zeros(n, dtype=bool)
        maybe = self.cuckoo.might_contain_many(keys)
        if not maybe.any():
            return present
        sub = keys.view(_V20).ravel()[maybe]
        hit = np.zeros(len(sub), dtype=bool)
        for run in self.runs:
            miss = np.flatnonzero(~hit)
            if not len(miss):
                break
            q = sub[miss]
            idx = np.searchsorted(run, q)
            idxc = np.minimum(idx, len(run) - 1)
            found = (idx < len(run)) & (run[idxc] == q)
            hit[miss[found]] = True
        if self.recent:
            recent = self.recent
            for j in np.flatnonzero(~hit):
                if sub[j].tobytes() in recent:
                    hit[j] = True
        present[np.flatnonzero(maybe)] = hit
        return present

    def _register_new(self, keys: np.ndarray) -> None:
        mat = keys.reshape(-1, KEY_LEN)
        self._maybe_grow(len(mat))
        blob = mat.tobytes()
        self.recent.update(
            blob[i : i + KEY_LEN] for i in range(0, len(blob), KEY_LEN)
        )
        self.cuckoo.add_many(mat)

    def _maybe_grow(self, incoming: int) -> None:
        """Keep the cuckoo under ~80% load: past that, inserts degrade into
        eviction storms (hundreds of displacement hops per add).  Rehash
        re-adds every run (sequential scan of the memmaps) plus the recent
        set — O(total keys), amortized geometric."""
        total = self._nrun_keys + len(self.recent)
        cap = self.cuckoo.nbuckets * 4
        if total + incoming <= 0.8 * cap:
            return
        target = max(cap * 2, int((total + incoming) * 2))
        self.cuckoo = CuckooFilter(target)
        for run in self.runs:
            self.cuckoo.add_many(np.asarray(run))
        if self.recent:
            self.cuckoo.add_many(sorted(self.recent))

    # -- retry-safe split API (blob in, mask out) ---------------------------

    def probe_new(self, blob: bytes) -> np.ndarray:
        """READ-ONLY: True where the digest is NOT yet seen.  Safe under Ray
        task retry — a re-executed probe returns the original verdicts."""
        keys = np.frombuffer(blob, dtype=np.uint8).reshape(-1, KEY_LEN)
        return ~self._present_mask(keys)

    def add_blob(self, blob: bytes) -> int:
        """Register digests as seen.  Idempotent: re-adding is a set union,
        so a retried caller cannot corrupt state.  Returns keys newly added."""
        keys = np.frombuffer(blob, dtype=np.uint8).reshape(-1, KEY_LEN)
        fresh = ~self._present_mask(keys)
        if fresh.any():
            self._register_new(keys[fresh])
        return int(fresh.sum())

    # -- legacy combined API (tests / small driver-side batches) ------------

    def contains_and_add(self, digests) -> np.ndarray:
        """Atomic probe+add: True where the digest was NEW (now added)."""
        keys = as_digest_matrix(digests)
        present = self._present_mask(keys)
        new = ~present
        if new.any():
            self._register_new(keys[new])
        return new

    def contains(self, digests) -> np.ndarray:
        return self._present_mask(as_digest_matrix(digests))

    def size(self) -> int:
        return self._nrun_keys + len(self.recent)

    def ram_key_count(self) -> int:
        """Exact keys currently held in actor RAM (the paged-store bound:
        only keys added since the last delta snapshot)."""
        return len(self.recent)

    def run_count(self) -> int:
        return len(self.runs)

    # -- snapshots (full-blob legacy + incremental paged) -------------------

    def snapshot(self) -> bytes:
        """Deterministic serialization of the full exact key set (sorted
        concat, merged across runs + recent)."""
        parts = [np.asarray(run) for run in self.runs]
        if self.recent:
            parts.append(np.frombuffer(b"".join(sorted(self.recent)), dtype=_V20))
        if not parts:
            return b""
        return np.sort(np.concatenate(parts)).tobytes()

    def restore(self, blob: bytes, key_len: int = KEY_LEN) -> int:
        arr = np.sort(np.frombuffer(blob, dtype=np.dtype(f"V{key_len}")))
        self.recent = set()
        self.runs = [arr] if len(arr) else []
        self._run_paths = []
        self._nrun_keys = len(arr)
        self.cuckoo = CuckooFilter(max(1 << 16, 2 * len(arr)))
        self.cuckoo.add_many(arr.view(np.uint8).reshape(-1, key_len))
        return len(arr)

    def snapshot_delta_to(self, path: str) -> str:
        """Write the keys added since the previous delta (sorted concat) from
        the actor itself — incremental, blobs never visit the driver — then
        PAGE THEM OUT: the delta file becomes a sorted on-disk run and the
        RAM copy is dropped.  After this call the actor's exact-key RAM is
        empty; membership answers are unchanged (cuckoo gate -> run probe)."""
        blob = b"".join(sorted(self.recent))
        with open(path + ".tmp", "wb") as f:
            f.write(blob)
        os.replace(path + ".tmp", path)
        if blob:
            run = _load_run(path)
            self.runs.append(run)
            self._run_paths.append(path)
            self._nrun_keys += len(run)
        self.recent = set()
        return path

    def restore_from(self, paths: list[str], key_len: int = KEY_LEN) -> int:
        """Rebuild from delta files (one per checkpointed wave): each becomes
        a paged run; the cuckoo filter is rebuilt by one sequential scan."""
        self.recent = set()
        self.runs = []
        self._run_paths = []
        self._nrun_keys = 0
        for path in paths:
            run = _load_run(path)
            if run is not None:
                self.runs.append(run)
                self._run_paths.append(path)
                self._nrun_keys += len(run)
        self.cuckoo = CuckooFilter(max(1 << 16, 2 * self._nrun_keys))
        for run in self.runs:
            self.cuckoo.add_many(np.asarray(run))
        return self._nrun_keys


def create_seen_shards(num_shards: int, capacity_hint: int = 1 << 16):
    return [
        SeenShard.remote(i, capacity_hint) for i in range(num_shards)
    ]


def shard_of_digest(digest: bytes, num_shards: int) -> int:
    """Route by the digest's trailing 4 bytes (leading bytes drive the cuckoo
    bucket index — using different bytes keeps shard routing and filter
    placement independent)."""
    return int.from_bytes(digest[-4:], "little") % num_shards


def matrix_shard_ids(mat: np.ndarray, num_shards: int) -> np.ndarray:
    """Vectorized ``shard_of_digest`` over an (n, 20) digest matrix."""
    return (
        mat[:, -4:].copy().view("<u4").ravel() % np.uint32(num_shards)
    ).astype(np.int64)


def _shard_blobs(digests, num_shards: int):
    """Group a digest batch by owning shard; one contiguous bytes blob per
    shard (the RPC payload — no per-row Python, no list-of-bytes pickling)."""
    mat = as_digest_matrix(digests)
    sid = matrix_shard_ids(mat, num_shards)
    out = []
    for s in range(num_shards):
        idxs = np.flatnonzero(sid == s)
        if len(idxs):
            out.append((s, idxs, mat[idxs].tobytes()))
    return mat, out


def seen_probe_new(shards, digests) -> np.ndarray:
    """READ-ONLY batch probe across shards; True where the digest is unseen.
    Safe to call from retryable Ray Data tasks (no state mutation)."""
    mat, groups = _shard_blobs(digests, len(shards))
    out = np.zeros(len(mat), dtype=bool)
    futures = [shards[s].probe_new.remote(blob) for s, _, blob in groups]
    for (_, idxs, _), res in zip(groups, ray.get(futures)):
        out[idxs] = res
    return out


def seen_add(shards, digests) -> int:
    """Idempotent batch add across shards (keys that actually inserted)."""
    _, groups = _shard_blobs(digests, len(shards))
    return sum(ray.get([shards[s].add_blob.remote(blob) for s, _, blob in groups]))


def seen_filter_new(shards, digests) -> np.ndarray:
    """Atomic batch contains_and_add across shards; True where digest was new.

    Each digest must appear at most once in ``digests`` (callers pre-dedup
    within the batch/wave) — this keeps the result independent of shard RPC
    ordering.  Driver-side convenience; the streamed path uses the
    probe/add split instead (retry-safety + max_pages semantics).
    """
    mat, groups = _shard_blobs(digests, len(shards))
    out = np.zeros(len(mat), dtype=bool)
    futures = [shards[s].contains_and_add.remote(blob) for s, _, blob in groups]
    for (_, idxs, _), res in zip(groups, ray.get(futures)):
        out[idxs] = res
    return out


def snapshot_all(shards) -> list[bytes]:
    return ray.get([s.snapshot.remote() for s in shards])


def restore_all(shards, blobs: list[bytes]) -> list[int]:
    return ray.get([s.restore.remote(b) for s, b in zip(shards, blobs)])


def snapshot_all_to(shards, paths: list[str]) -> list[str]:
    """Actor-side incremental snapshot writes (blobs never on the driver);
    each shard pages its RAM keys out to the new run file."""
    return ray.get([s.snapshot_delta_to.remote(p) for s, p in zip(shards, paths)])


def restore_all_from(shards, per_shard_paths: list[list[str]]) -> list[int]:
    """per_shard_paths[i] = every delta file for shard i, in any order."""
    return ray.get(
        [s.restore_from.remote(ps) for s, ps in zip(shards, per_shard_paths)]
    )
