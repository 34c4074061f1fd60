"""Sharded URL-seen set — cuckoo-filter actors with an exact confirm store.

The reference's URL-seen check is a SQLite ``url_hash IN (...)`` existence
probe before insert (sql.py:180-189, used by insert_urls_many
sql.py:213-246).  The rebuild shards the seen set across Ray actors keyed by
``hash(digest) % num_shards`` (north rule: sharded cuckoo filter, SHA-1
canonical-URL keys):

* ``CuckooFilter`` — a real partial-key cuckoo filter (numpy table,
  4-slot buckets, 16-bit fingerprints): answers "definitely new" without
  touching the exact store.  At 10^10-URL scale the filter (~4.5 bytes/key)
  stays in RAM while the exact store pages from disk; in this sandbox the
  exact store is an in-memory set and the filter is the documented,
  property-tested scale path (no false negatives; bounded false positives).
* ``SeenShard`` — actor owning one shard: ``contains_and_add`` is atomic per
  shard (the reference's check-then-insert race, SURVEY.md §4, cannot
  happen), ``snapshot``/``restore`` serialize the exact key set for
  per-partition checkpoint lineage (north rule).

The crawl inserts each candidate digest at most once per wave (candidates
are pre-deduplicated within the wave), so RPC arrival order cannot affect
membership — determinism holds under any actor scheduling.
"""

from __future__ import annotations

import numpy as np
import ray

_EVICTION_LIMIT = 500


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
    def _mix_digests(digests: list[bytes]) -> np.ndarray:
        """Vectorized full-digest mixer: every one of the 20 bytes feeds the
        result (digests sharing a short prefix must not become guaranteed
        mutual false positives — the adversarial inputs the FP-rate property
        probes with).  Three overlapping uint64 lanes xor-combined through a
        splitmix64-style finalizer; fixed constants, so filter state is
        reproducible across processes."""
        arr = np.frombuffer(b"".join(digests), dtype=np.uint8).reshape(-1, 20)
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

    def _decompose_batch(self, digests: list[bytes]):
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

    def add_many(self, digests: list[bytes]) -> None:
        """Batch insert: one vectorized decomposition, then placements."""
        if not digests:
            return
        fps, i1s, i2s = self._decompose_batch(digests)
        for k in range(len(digests)):
            self._place(int(fps[k]), int(i1s[k]), int(i2s[k]))

    def might_contain(self, digest: bytes) -> bool:
        fp, i1, i2 = self._decompose(digest)
        return (
            bool((self.table[i1] == fp).any())
            or bool((self.table[i2] == fp).any())
            or fp in self.stash
        )


@ray.remote(num_cpus=0)  # lightweight RPC state actor: microsecond lookups, no compute slot
class SeenShard:
    """One shard of the URL-seen set (exact authority + cuckoo fast path)."""

    def __init__(self, shard_id: int, capacity: int = 1 << 16):
        self.shard_id = shard_id
        self.exact: set[bytes] = set()
        self.cuckoo = CuckooFilter(capacity)
        # keys added since the last delta snapshot (incremental checkpoints:
        # a wave's snapshot cost is O(new keys), not O(total seen) — at
        # 10^10 keys a full re-serialization per wave would dominate)
        self._new_since_snapshot: list[bytes] = []

    def _maybe_grow(self, incoming: int) -> None:
        """Keep the cuckoo under ~80% load: past that, inserts degrade into
        eviction storms (hundreds of displacement hops per add).  The exact
        store is the rehash source, so growth is a straight re-add."""
        cap = self.cuckoo.nbuckets * 4
        if len(self.exact) + incoming <= 0.8 * cap:
            return
        target = max(cap * 2, int((len(self.exact) + incoming) * 2))
        self.cuckoo = CuckooFilter(target)
        self.cuckoo.add_many(list(self.exact))

    def contains_and_add(self, digests: list[bytes]) -> np.ndarray:
        """Returns a bool array: True where the digest was NEW (now added).

        The exact set is probed directly (it is in memory here); the cuckoo
        filter is still MAINTAINED because it is the documented deployment
        path for a paged exact store — there ``might_contain`` gates the
        disk probe, and the filter must already hold every key."""
        self._maybe_grow(len(digests))
        out = np.empty(len(digests), dtype=bool)
        exact = self.exact
        new_keys: list[bytes] = []
        for i, d in enumerate(digests):
            if d in exact:
                out[i] = False
            else:
                exact.add(d)
                new_keys.append(d)
                out[i] = True
        self._new_since_snapshot.extend(new_keys)
        self.cuckoo.add_many(new_keys)
        return out

    def contains(self, digests: list[bytes]) -> np.ndarray:
        return np.array([d in self.exact for d in digests], dtype=bool)

    def size(self) -> int:
        return len(self.exact)

    def snapshot(self) -> bytes:
        """Deterministic serialization of the exact key set (sorted concat)."""
        return b"".join(sorted(self.exact))

    def restore(self, blob: bytes, key_len: int = 20) -> int:
        self.exact = {blob[i : i + key_len] for i in range(0, len(blob), key_len)}
        self.cuckoo = CuckooFilter(max(1 << 16, 2 * len(self.exact)))
        self.cuckoo.add_many(list(self.exact))
        return len(self.exact)

    def snapshot_delta_to(self, path: str) -> str:
        """Write the keys added since the previous delta (sorted concat) from
        the actor itself — incremental, and blobs never visit the driver."""
        import os

        blob = b"".join(sorted(self._new_since_snapshot))
        self._new_since_snapshot = []
        with open(path + ".tmp", "wb") as f:
            f.write(blob)
        os.replace(path + ".tmp", path)
        return path

    def restore_from(self, paths: list[str], key_len: int = 20) -> int:
        """Rebuild from the union of delta files (one per checkpointed wave)."""
        keys: set[bytes] = set()
        for path in paths:
            with open(path, "rb") as f:
                blob = f.read()
            keys.update(
                blob[i : i + key_len] for i in range(0, len(blob), key_len)
            )
        self.exact = keys
        self._new_since_snapshot = []
        self.cuckoo = CuckooFilter(max(1 << 16, 2 * len(keys)))
        self.cuckoo.add_many(list(keys))
        return len(keys)


def create_seen_shards(num_shards: int, capacity_hint: int = 1 << 16):
    return [
        SeenShard.remote(i, capacity_hint) for i in range(num_shards)
    ]


def shard_of_digest(digest: bytes, num_shards: int) -> int:
    """Route by the digest's trailing 4 bytes (leading bytes drive the cuckoo
    bucket index — using different bytes keeps shard routing and filter
    placement independent)."""
    return int.from_bytes(digest[-4:], "little") % num_shards


def seen_filter_new(shards, digests: list[bytes]) -> np.ndarray:
    """Batch contains_and_add across shards; True where digest was new.

    Each digest must appear at most once in ``digests`` (callers pre-dedup
    within the batch/wave) — this keeps the result independent of shard RPC
    ordering.
    """
    n = len(digests)
    if n == 0:
        return np.zeros(0, dtype=bool)
    num_shards = len(shards)
    by_shard: list[list[int]] = [[] for _ in range(num_shards)]
    for i, d in enumerate(digests):
        by_shard[shard_of_digest(d, num_shards)].append(i)
    futures = []
    idx_lists = []
    for s, idxs in enumerate(by_shard):
        if idxs:
            futures.append(shards[s].contains_and_add.remote([digests[i] for i in idxs]))
            idx_lists.append(idxs)
    out = np.zeros(n, dtype=bool)
    for idxs, res in zip(idx_lists, ray.get(futures)):
        out[np.asarray(idxs, dtype=np.int64)] = res
    return out


def snapshot_all(shards) -> list[bytes]:
    return ray.get([s.snapshot.remote() for s in shards])


def restore_all(shards, blobs: list[bytes]) -> list[int]:
    return ray.get([s.restore.remote(b) for s, b in zip(shards, blobs)])


def snapshot_all_to(shards, paths: list[str]) -> list[str]:
    """Actor-side incremental snapshot writes (blobs never on the driver)."""
    return ray.get([s.snapshot_delta_to.remote(p) for s, p in zip(shards, paths)])


def restore_all_from(shards, per_shard_paths: list[list[str]]) -> list[int]:
    """per_shard_paths[i] = every delta file for shard i, in any order."""
    return ray.get(
        [s.restore_from.remote(ps) for s, ps in zip(shards, per_shard_paths)]
    )
