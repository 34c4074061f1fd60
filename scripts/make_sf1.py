"""Deterministic sf1-shaped table set, synthesized as a 10x expansion of
the driver's sf0.1 tables (VERDICT r4 ask #6: a query bench point one
order of magnitude above the current corpus — no sf1 dir exists under
/root/testdata, and the brief says to synthesize deterministically).

Construction keeps every query's workload CHARACTER while scaling its
volume exactly linearly, so time-vs-10x ratios are attributable to the
engine rather than to output-volume blowups:

- Replica r (r = 0..9) of each fact/dim table offsets every key column
  by r * stride, with ONE stride per key DOMAIN (custkey stride shared
  by customer.c_custkey, orders.o_custkey and events.user_id; orderkey
  stride shared by orders and lineitem; ...) so all intra-replica join
  relationships are bit-identical to sf0.1 and nothing joins across
  replicas.
- Name columns (c_name, s_name) get a per-replica suffix "~rr" for
  r >= 1: within-replica edit distances are preserved (both sides of a
  pair get the same suffix) while cross-replica distances are >= 2, so
  lev-1 fuzzy-pair volume scales exactly 10x instead of quadratically.
- documents.text gets a per-replica seeded substitution cipher
  (bijective char map, whitespace fixed): length, token boundaries and
  the exact substring-equality structure within a replica are preserved
  bit-for-bit (so every char-gram / shingle / token / dup statistic per
  replica equals sf0.1's), while no >=16-char window can match across
  replicas, so every dedup family's output scales exactly 10x and
  n_chars needs no recompute.
- embeddings get a per-replica Rademacher sign flip (seeded by r):
  norms and all within-replica cosines are exactly preserved, while
  cross-replica cosines decorrelate, so near-dup pair volume scales
  exactly 10x.
- region/nation are genuinely fixed dimensions and are copied as-is.

Usage: python scripts/make_sf1.py [src_dir] [out_dir] [factor]
Default: /root/testdata/sf0.1 -> /tmp/wllr_sf1/sf1, factor 10.
"""

from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/wllr_sf1/sf1"
FACTOR = int(sys.argv[3]) if len(sys.argv) > 3 else 10

# one stride per key DOMAIN (shared across tables referencing it)
STRIDES = {
    "custkey": 15_000,   # c_custkey, o_custkey, user_id
    "orderkey": 150_000, # o_orderkey, l_orderkey
    "partkey": 20_000,   # p_partkey, l_partkey
    "suppkey": 1_000,    # s_suppkey, l_suppkey
    "eventkey": 100_000, # event_id
    "dockey": 5_000,     # doc_id
    "veckey": 2_000,     # vec_id
}

KEY_DOMAIN = {
    "c_custkey": "custkey",
    "o_custkey": "custkey",
    "user_id": "custkey",
    "o_orderkey": "orderkey",
    "l_orderkey": "orderkey",
    "p_partkey": "partkey",
    "l_partkey": "partkey",
    "s_suppkey": "suppkey",
    "l_suppkey": "suppkey",
    "event_id": "eventkey",
    "doc_id": "dockey",
    "vec_id": "veckey",
}

NAME_COLS = {"c_name", "s_name"}
COPY_TABLES = ["region", "nation"]
SCALE_TABLES = [
    "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings",
]

# documents.text transform: a per-replica SUBSTITUTION CIPHER, not a salt.
# QUERYSOAK forensics (r5): suffixing "~rr" onto every token lengthened
# tokens ~50%, so a 16-char winnow window spanned ~1.6 tokens instead of
# ~2.3 — on this small-vocab corpus that inflated WITHIN-replica collision
# volume 48x (r0: 143,722 distinct fps / 912k candidate pairs; salted r5:
# 12,553 fps / 44.0M pairs), blowing winnow_neardup output up 2,551x.
# A seeded bijective char map (lowercase perm; uppercase derived from it so
# case-folding equality is preserved; digits perm; whitespace/punct fixed)
# preserves length, token boundaries, and the EXACT substring-equality
# structure within a replica — shingle/token/exact-substring statistics
# are bit-identical to sf0.1 per replica; winnow's min-hash SELECTION is
# re-randomized (hash values change) so its per-replica volume matches
# statistically (measured ±15%) rather than bitwise — while a
# cross-replica 16-char match needs ~14 independent letter coincidences
# under two unrelated permutations (~26^-14: never; measured overlap 0).
_LOWER = "abcdefghijklmnopqrstuvwxyz"
_DIGIT = "0123456789"


def _cipher_table(r: int) -> dict[int, int]:
    rng = np.random.RandomState(2000 + r)
    low = "".join(rng.permutation(list(_LOWER)))
    dig = "".join(rng.permutation(list(_DIGIT)))
    tbl = {ord(a): ord(b) for a, b in zip(_LOWER, low)}
    tbl.update({ord(a.upper()): ord(b.upper()) for a, b in zip(_LOWER, low)})
    tbl.update({ord(a): ord(b) for a, b in zip(_DIGIT, dig)})
    return tbl


def replica(tbl: pa.Table, table: str, r: int) -> pa.Table:
    if r == 0:
        return tbl
    suf = f"~{r}{r}"
    cols = {}
    for name in tbl.column_names:
        col = tbl.column(name)
        dom = KEY_DOMAIN.get(name)
        if dom is not None:
            off = pa.scalar(r * STRIDES[dom], type=col.type)
            import pyarrow.compute as pc

            cols[name] = pc.add(col, off)
        elif name in NAME_COLS:
            cols[name] = pa.array(
                [v + suf for v in col.to_pylist()], type=col.type
            )
        elif table == "documents" and name == "text":
            tbl_map = _cipher_table(r)
            cols[name] = pa.array(
                [v.translate(tbl_map) for v in col.to_pylist()], type=col.type
            )
        elif table == "embeddings" and name == "embedding":
            arrs = np.asarray(col.to_pylist(), dtype=np.float32)
            rng = np.random.RandomState(1000 + r)
            signs = (rng.randint(0, 2, arrs.shape[1]) * 2 - 1).astype(np.float32)
            flipped = arrs * signs[None, :]
            cols[name] = pa.array(flipped.tolist(), type=col.type)
        else:
            cols[name] = col
    return pa.table({n: cols[n] for n in tbl.column_names})


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    for t in COPY_TABLES:
        shutil.copyfile(
            os.path.join(SRC, f"{t}.parquet"), os.path.join(OUT, f"{t}.parquet")
        )
        print(f"{t}: copied")
    for t in SCALE_TABLES:
        src = pq.read_table(os.path.join(SRC, f"{t}.parquet"))
        out_path = os.path.join(OUT, f"{t}.parquet")
        writer = pq.ParquetWriter(out_path, src.schema)
        n = 0
        for r in range(FACTOR):
            rep = replica(src, t, r)
            writer.write_table(rep)
            n += rep.num_rows
        writer.close()
        print(f"{t}: {src.num_rows} -> {n} rows")


if __name__ == "__main__":
    main()
