"""Probe Ray Data's HASH_SHUFFLE strategy on this Ray version.

Why this exists: hash-partitioned groupby exchanges would remove the
sort path's partition-bound SAMPLING (the documented 2-3x same-code
variance in minhash_clusters / kg_pagerank / pricing_summary) and
measured 3.6x faster on a 2M-row / 50k-group map_groups.  The engine
still defaults to sort shuffle because Ray 2.49.2's hash path has a
poison-block bug, demonstrated by this script:

  1. map_groups emits zero-row ZERO-SCHEMA blocks for empty hash
     partitions (the sort path emits the same empties, but there they
     are merely the long-known cosmetic "different schema (.)" log).
  2. A DOWNSTREAM hash exchange's aggregator concatenates whatever its
     partition received; a partition that received only those
     schema-less empties finalizes a column-less table and
     block.sort_by(key) raises
     "ArrowInvalid: No match for FieldRef.Name(shard) in  ".

Chained groupbys (pagerank / label-propagation rounds, star-clustering
rounds, pair-dedup -> clustering) crash flakily — whichever run lands an
all-empty partition.  Run this after any Ray upgrade; if both legs pass
repeatedly, DEDUCE_RAY_HASH_SHUFFLE=1 (see deduce_ray/raytune.py) is
worth re-benchmarking as the default.

Exit code: 0 if the chained exchange survived N repeats (bug gone),
1 if it crashed (bug still present; keep the sort default).
"""

from __future__ import annotations

import os
import sys
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 5

    import pandas as pd
    import pyarrow as pa
    import ray
    from ray.data.context import DataContext, ShuffleStrategy

    ray.init(
        address="local", num_cpus=8, include_dashboard=False,
        logging_level="ERROR",
    )
    ctx = DataContext.get_current()
    ctx.op_resource_reservation_enabled = False
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    # the same small-budget knobs raytune.py applies under
    # DEDUCE_RAY_HASH_SHUFFLE=1: without them the upstream defaults
    # (200 partitions, CPU-reserving aggregators, 300 s grace wait)
    # STALL outright at small num_cpus
    ctx.default_hash_shuffle_parallelism = 16
    ctx.max_hash_shuffle_aggregators = 8
    ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.02
    ctx.min_hash_shuffle_aggregator_wait_time_in_s = 1

    n_shards = 32
    t = pa.table(
        {
            "shard": pa.array(
                [zlib.crc32(c.encode()) % n_shards for c in "abcdef"],
                pa.int64(),
            ),
            "pred": pa.array(["p"] * 6),
            "obj": pa.array(list("abcdef")),
            "val": pa.array([1.0] * 6),
        }
    )
    src = ray.data.from_arrow(t).materialize()

    def merge(df: pd.DataFrame) -> pa.Table:
        g = (
            df.groupby(["pred", "obj"], sort=False)
            .agg(shard=("shard", "first"), val=("val", "sum"))
            .reset_index()
        )
        return pa.table(
            {
                "shard": pa.array(g["shard"], pa.int64()),
                "pred": pa.array(g["pred"]),
                "obj": pa.array(g["obj"]),
                "val": pa.array(g["val"], pa.float64()),
            }
        )

    crashed = 0
    empties = 0
    for i in range(repeats):
        mid = (
            src.groupby("shard")
            .map_groups(merge, batch_format="pandas")
            .materialize()
        )
        # leg 1 evidence: count the schema-less empties map_groups emitted
        for bundle in mid.iter_internal_ref_bundles():
            for ref, _meta in bundle.blocks:
                b = ray.get(ref)
                cols = (
                    list(b.columns)
                    if isinstance(b, pd.DataFrame)
                    else b.schema.names
                )
                if not cols:
                    empties += 1
        # leg 2: chain a second hash exchange over those blocks
        try:
            out = (
                mid.groupby("shard")
                .map_groups(lambda g: g, batch_format="pandas")
                .materialize()
            )
            print(f"run {i}: chained exchange OK ({out.count()} rows)")
        except Exception as exc:  # noqa: BLE001 — report and keep probing
            crashed += 1
            print(f"run {i}: chained exchange CRASHED: {str(exc)[:120]}")

    print(
        f"\n{repeats} runs: {crashed} crashes; "
        f"{empties} schema-less empty blocks emitted by map_groups"
    )
    ray.shutdown()
    if crashed:
        print("bug still present — keep the sort-shuffle default")
        return 1
    if empties:
        print(
            "no crash this time, but schema-less empties still exist — "
            "the crash is partition-placement dependent; keep the default"
        )
        return 1
    print("clean: hash shuffle worth re-benchmarking as default")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
