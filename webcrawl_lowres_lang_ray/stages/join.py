"""General distributed hash join — the reusable big-x-big equi-join the
per-query pipelines otherwise hand-roll (broadcast joins stay the right
call for SMALL sides; this is for two datasets that both exceed worker
memory).

Plan (the tagged-union partition join, same exchange shape as
``dedup._attach_sig``): each side tags its rows, both union into ONE
key-hash partitioned groupby, and each partition runs a vectorized pandas
merge on its slice.  Every row moves exactly once; there is no driver
materialization and no secondary shuffle.

Skew note: a single hot key lands in one partition — pre-salt hot keys
(``windows.salted_sum`` pattern) or broadcast the dimension side when it
fits.  Partitioning assumption (documented like every partition-key op
here): one partition's rows fit in a worker; raise ``parts`` to shrink
partitions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data


def hash_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    left_key: str,
    right_key: str | None = None,
    how: str = "inner",
    parts: int = 64,
    suffixes: tuple[str, str] = ("", "_r"),
) -> "ray.data.Dataset":
    """Equi-join two Datasets on a key column.  ``how`` is 'inner',
    'left' or 'outer' (pandas semantics inside each partition — globally
    correct because key columns are hash-partitioned identically on both
    sides, so each partition holds every row of its keys from BOTH
    inputs; an unmatched key's rows still reach their partition and
    survive a left/outer merge there).  NaN-widening of int columns on
    the unmatched side is the caller's to coalesce."""
    right_key = right_key or left_key
    # column lists + integer/bool dtypes recorded BEFORE the union: the
    # mixed-schema union NaN-fills each side's missing columns through the
    # shuffle, silently widening int64 -> float64 — restored per partition
    import pyarrow as pa

    def _cols_and_casts(ds: "ray.data.Dataset"):
        # upstream map_batches stages surface pandas block schemas (numpy
        # dtypes) instead of pyarrow types — handle both
        def is_int(t):
            return (
                pa.types.is_integer(t)
                if isinstance(t, pa.DataType)
                else np.issubdtype(t, np.integer)
            )

        def is_bool(t):
            return (
                pa.types.is_boolean(t)
                if isinstance(t, pa.DataType)
                else np.issubdtype(t, np.bool_)
            )

        sch = ds.schema()
        cols = list(sch.names)
        casts = {
            n: ("int64" if is_int(t) else "bool")
            for n, t in zip(sch.names, sch.types)
            if is_int(t) or is_bool(t)
        }
        return cols, casts

    lcols, lcasts = _cols_and_casts(left)
    rcols, rcasts = _cols_and_casts(right)

    def tag(side: int, key: str):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            b["__side"] = np.int64(side)
            b["__jp"] = (
                pd.util.hash_array(b[key].to_numpy()) % np.uint64(parts)
            ).astype(np.int64)
            return b

        return fn

    lt = left.map_batches(tag(0, left_key), batch_format="pandas")
    rt = right.map_batches(tag(1, right_key), batch_format="pandas")

    def join_part(g: pd.DataFrame) -> pd.DataFrame:
        # reindex, not select: a partition holding rows from only one side
        # never saw the other side's columns in its concatenated blocks
        lg = g[g["__side"] == 0].reindex(columns=lcols).astype(lcasts)
        rg = g[g["__side"] == 1].reindex(columns=rcols).astype(rcasts)
        return lg.merge(
            rg,
            left_on=left_key,
            right_on=right_key,
            how=how,
            suffixes=suffixes,
        )

    return lt.union(rt).groupby("__jp").map_groups(join_part, batch_format="pandas")


def salted_hash_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    left_key: str,
    right_key: str | None = None,
    hot_keys: tuple = (),
    salt_n: int = 8,
    parts: int = 64,
    suffixes: tuple[str, str] = ("", "_r"),
) -> "ray.data.Dataset":
    """``hash_join`` with HOT-KEY SALTING (inner join): a hot key's left
    rows spread over ``salt_n`` sub-partitions (salt = row position mod
    salt_n — any assignment yields the same join SET), while the right
    side's rows for that key replicate once per salt, so no single
    partition holds a hot key's full row set.  The standard skew-join:
    replicate the small side of the hot key, never its big side.

    ``hot_keys`` is the (small, driver-known) set of skewed key values —
    in practice the output of a heavy-hitter pass
    (``sketch.approx_heavy_hitters``).  Non-hot keys take the plain
    single-salt path, so the exchange grows only by
    ``len(hot_keys) x salt_n`` replicated right rows."""
    right_key = right_key or left_key
    import pyarrow as pa

    def _cols_and_casts(ds: "ray.data.Dataset"):
        # upstream map_batches stages surface pandas block schemas (numpy
        # dtypes) instead of pyarrow types — handle both
        def is_int(t):
            return (
                pa.types.is_integer(t)
                if isinstance(t, pa.DataType)
                else np.issubdtype(t, np.integer)
            )

        def is_bool(t):
            return (
                pa.types.is_boolean(t)
                if isinstance(t, pa.DataType)
                else np.issubdtype(t, np.bool_)
            )

        sch = ds.schema()
        cols = list(sch.names)
        casts = {
            n: ("int64" if is_int(t) else "bool")
            for n, t in zip(sch.names, sch.types)
            if is_int(t) or is_bool(t)
        }
        return cols, casts

    lcols, lcasts = _cols_and_casts(left)
    rcols, rcasts = _cols_and_casts(right)
    hot = set(hot_keys)

    def tag_left(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        keys = b[left_key].to_numpy()
        is_hot = np.isin(keys, list(hot)) if hot else np.zeros(len(b), dtype=bool)
        salt = np.where(is_hot, np.arange(len(b), dtype=np.int64) % salt_n, 0)
        b["__salt"] = salt
        b["__side"] = np.int64(0)
        b["__jp"] = (
            (pd.util.hash_array(keys) + np.uint64(0x9E37) * salt.astype(np.uint64))
            % np.uint64(parts)
        ).astype(np.int64)
        return b

    def tag_right(b: pd.DataFrame) -> pd.DataFrame:
        keys = b[right_key].to_numpy()
        is_hot = np.isin(keys, list(hot)) if hot else np.zeros(len(b), dtype=bool)
        cold = b[~is_hot].copy()
        cold["__salt"] = np.int64(0)
        frames = [cold]
        hot_rows = b[is_hot]
        for s in range(salt_n):
            rep = hot_rows.copy()
            rep["__salt"] = np.int64(s)
            frames.append(rep)
        out = pd.concat(frames, ignore_index=True)
        out["__side"] = np.int64(1)
        kk = out[right_key].to_numpy()
        out["__jp"] = (
            (
                pd.util.hash_array(kk)
                + np.uint64(0x9E37) * out["__salt"].to_numpy(np.int64).astype(np.uint64)
            )
            % np.uint64(parts)
        ).astype(np.int64)
        return out

    lt = left.map_batches(tag_left, batch_format="pandas")
    rt = right.map_batches(tag_right, batch_format="pandas")

    # the merge keys INCLUDE the salt: two salts of one key can hash into
    # the same partition, and matching on (key, salt) keeps each left row
    # paired with exactly one replica of each right row — no dedup that
    # would eat legitimately-duplicated right rows
    def join_part(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["__side"] == 0].reindex(columns=lcols + ["__salt"]).astype(lcasts)
        rg = g[g["__side"] == 1].reindex(columns=rcols + ["__salt"]).astype(rcasts)
        merged = lg.merge(
            rg,
            left_on=[left_key, "__salt"],
            right_on=[right_key, "__salt"],
            how="inner",
            suffixes=suffixes,
        )
        return merged.drop(columns="__salt")

    return lt.union(rt).groupby("__jp").map_groups(join_part, batch_format="pandas")


def bloom_filtered_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    left_key: str,
    right_key: str | None = None,
    parts: int = 64,
    suffixes: tuple[str, str] = ("", "_r"),
) -> "ray.data.Dataset":
    """``hash_join`` with a BLOOM PRE-FILTER on the big side — the classic
    selective-join optimization: when the right side matches only a small
    fraction of left keys, most left rows would ride the exchange just to
    find no partner.  A mergeable Bloom bitmap of the right keys (128 KiB,
    built from per-batch partial bitmaps — ``curation.bloom_build``)
    broadcasts once via ``ray.put``; a ``map_batches`` filter drops left
    rows whose key is definitely absent BEFORE the shuffle.  One-sided
    error makes this transparent: false positives just ride the exchange
    and fall out of the exact partition merge, so results equal the plain
    join exactly.

    Keys are bloomed through their md5-hex string form on both sides
    (dtype-independent)."""
    import hashlib

    import ray as _ray

    from .curation import _BLOOM_BITS, bloom_build, bloom_probe

    right_key = right_key or left_key
    md5 = hashlib.md5

    def keyhash(col):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {"__kh": [md5(str(v).encode()).hexdigest() for v in b[col]]}
            )

        return fn

    bitmap_blob = bloom_build(
        right.select_columns([right_key]).map_batches(
            keyhash(right_key), batch_format="pandas"
        ),
        "__kh",
    )
    bitmap_ref = _ray.put(np.frombuffer(bitmap_blob, dtype=np.uint8))

    def prefilter(b: pd.DataFrame) -> pd.DataFrame:
        bm = _ray.get(bitmap_ref)
        hexes = [md5(str(v).encode()).hexdigest() for v in b[left_key]]
        keep = bloom_probe(bm, hexes, _BLOOM_BITS)
        return b[keep].reset_index(drop=True)

    return hash_join(
        left.map_batches(prefilter, batch_format="pandas"),
        right,
        left_key=left_key,
        right_key=right_key,
        parts=parts,
        suffixes=suffixes,
    )


def auto_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    left_key: str,
    right_key: str | None = None,
    how: str = "inner",
    parts: int = 64,
    suffixes: tuple[str, str] = ("", "_r"),
    broadcast_max_rows: int = 100_000,
    skew_sample: int = 50_000,
    skew_frac: float = 0.2,
    salt_n: int = 8,
    explain: bool = False,
):
    """Join-strategy auto-dispatch — the planner step a declarative engine
    does for you, expressed over this module's three physical joins:

    * right side <= ``broadcast_max_rows`` and how in (inner, left):
      **broadcast** — the right frame is ``ray.put`` once and every left
      batch merges against it locally; zero exchanges (the Spark
      broadcast-hash-join regime).  Outer joins never broadcast (right-only
      rows would need global dedup).
    * else, if a bounded sample of left keys shows one key carrying more
      than ``skew_frac`` of rows: **salted** — ``salted_hash_join`` spreads
      the hot key over ``salt_n`` sub-partitions.
    * else: the plain tagged-union partition **hash** join.

    The decision inputs are one cheap ``count()`` of the (small) right side
    and one bounded left sample — nothing scans the big side twice.  All
    three paths produce identical rows (pinned in tests/test_stages.py);
    pass ``explain=True`` to get ``(dataset, strategy)`` back."""
    import ray as _ray

    right_key = right_key or left_key
    n_right = right.count()
    if n_right <= broadcast_max_rows and how in ("inner", "left"):
        rdf = right.to_pandas()
        ref = _ray.put(rdf)

        def bjoin(b: pd.DataFrame) -> pd.DataFrame:
            r = _ray.get(ref)
            return b.merge(
                r, left_on=left_key, right_on=right_key, how=how, suffixes=suffixes
            )

        out = left.map_batches(bjoin, batch_format="pandas")
        return (out, "broadcast") if explain else out

    strategy, hot = "hash", ()
    if how == "inner":
        sample = left.limit(skew_sample).to_pandas()
        if len(sample):
            vc = sample[left_key].value_counts(sort=True)
            hot = tuple(vc.index[(vc / len(sample)) > skew_frac])
            if hot:
                strategy = "salted"
    if strategy == "salted":
        out = salted_hash_join(
            left, right, left_key=left_key, right_key=right_key,
            hot_keys=hot, salt_n=salt_n, parts=parts, suffixes=suffixes,
        )
    else:
        out = hash_join(
            left, right, left_key=left_key, right_key=right_key,
            how=how, parts=parts, suffixes=suffixes,
        )
    return (out, strategy) if explain else out
