"""Deterministically scale a driver sf directory by an integer factor.

Usage: python scripts/make_scaled_sf.py OUT_DIR [--base /root/testdata/sf0.1]
                                               [--factor 10]

Produces a full 10-table directory of the exact driver schema with
``factor``x the rows, suitable for check_oracles.py / bench-style runs at
sf1 (base sf0.1, factor 10) or sf10 (factor 100).  Everything is
deterministic (no wall clock, no unseeded RNG), so two runs produce
byte-identical tables.

Design (replica r = 0 is the base verbatim; r > 0 are derived):

- Key offsets keep every foreign key consistent WITHIN its replica and
  collision-free ACROSS replicas, and stay far below the 1e8 / 1e7
  planting offsets used by minhash_pairs / embedding_neardup
  (plant_text_dups adds 1e8 to doc_id; plant_embedding_neardups adds 1e7
  to vec_id) so planted ids never collide with real ids up to factor 100.
- documents: every 3rd word of replica r is prefixed ``r{r}x``.  That
  (a) keeps roughly two thirds of the planted KG mentions matchable, so
  the KG oracle load really scales, (b) destroys all shared 13-grams and
  most shared shingles across replicas (the salt words differ per
  replica), so the dedup families scale linearly instead of every doc
  becoming a near-duplicate of its factor-1 siblings — the measured
  Theta(n^2) LSH hazard shape.  ``n_chars`` is recomputed.
- embeddings: replica r > 0 mixes in a seeded unit-noise direction at
  0.8 relative magnitude (cosine vs base ~0.78 < the 0.9 near-dup
  threshold), so replicas are NOT near-duplicates of each other and the
  pair structure scales linearly.
- region / nation are dimension tables and stay as-is.

Tables are written replica-by-replica through a ParquetWriter (one row
group per replica chunk), so factor-100 lineitem (60M rows) streams
instead of materializing.
"""

from __future__ import annotations

import argparse
import os
import re
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# per-replica int64 key offsets; max base keys are well below each step
# (sf0.1: custkey<=15000, orderkey<=600000, partkey<=20000, suppkey<=1000,
#  event_id<=100000, user_id<=~15000, doc_id<=4999, vec_id<=1999)
OFFSETS = {
    "customer": {"c_custkey": 1_000_000},
    "supplier": {"s_suppkey": 100_000},
    "part": {"p_partkey": 1_000_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    "lineitem": {
        "l_orderkey": 10_000_000,
        "l_partkey": 1_000_000,
        "l_suppkey": 100_000,
    },
    "events": {"event_id": 10_000_000, "user_id": 1_000_000},
    # documents stays under 1e6 even at factor 100: the blocklist query's
    # Python side enumerates range(0, 1_000_000, 7) while its SQL side is
    # an unbounded doc_id % 7 — ids past 1e6 would diverge the two
    "documents": {"doc_id": 10_000},
    "embeddings": {"vec_id": 100_000},
}

_WORD = re.compile(r"\S+")


def _salt_every_third(text: str, tag: str) -> str:
    words = text.split(" ")
    for i in range(0, len(words), 3):
        words[i] = tag + words[i]
    return " ".join(words)


def _shift_keys(t: pa.Table, name: str, r: int) -> pa.Table:
    for col, step in OFFSETS.get(name, {}).items():
        idx = t.schema.get_field_index(col)
        shifted = pc.add(
            pc.cast(t.column(col), pa.int64()), pa.scalar(r * step)
        )
        t = t.set_column(idx, col, pc.cast(shifted, t.schema.field(idx).type))
    return t


def _replica(t: pa.Table, name: str, r: int) -> pa.Table:
    if r == 0:
        return t
    t = _shift_keys(t, name, r)
    if name == "documents":
        tag = f"r{r}x"
        texts = t.column("text").to_pylist()
        salted = [
            None if tx is None else _salt_every_third(tx, tag)
            for tx in texts
        ]
        arr = pa.array(salted, type=pa.string())
        t = t.set_column(t.schema.get_field_index("text"), "text", arr)
        if "n_chars" in t.schema.names:
            n = pa.array(
                [None if s is None else len(s) for s in salted],
                type=t.schema.field("n_chars").type,
            )
            t = t.set_column(t.schema.get_field_index("n_chars"), "n_chars", n)
    elif name == "embeddings":
        col = t.column("embedding")
        fixed = pa.ListArray.from_arrays  # noqa: F841 (doc aid)
        vals = col.combine_chunks()
        lists = vals.to_pylist()
        rng = np.random.RandomState(1000 + r)
        out = []
        for v in lists:
            if v is None:
                out.append(None)
                continue
            a = np.asarray(v, dtype=np.float64)
            g = rng.standard_normal(len(a))
            gn = np.linalg.norm(g)
            an = np.linalg.norm(a)
            if gn > 0 and an > 0:
                a = a + 0.8 * an * (g / gn)
            out.append(a.astype(np.float32))
        arr = pa.array(
            [None if v is None else v.tolist() for v in out],
            type=t.schema.field("embedding").type,
        )
        t = t.set_column(
            t.schema.get_field_index("embedding"), "embedding", arr
        )
    return t


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    tables = [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]
    for name in tables:
        src = f"{args.base}/{name}.parquet"
        dst = f"{args.out_dir}/{name}.parquet"
        base = pq.read_table(src)
        if name in ("region", "nation"):
            pq.write_table(base, dst)
            print(f"{name}: {base.num_rows} rows (dimension, copied)")
            continue
        writer = pq.ParquetWriter(dst, base.schema)
        try:
            for r in range(args.factor):
                writer.write_table(_replica(base, name, r))
        finally:
            writer.close()
        print(f"{name}: {base.num_rows * args.factor} rows "
              f"({args.factor} replicas)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
