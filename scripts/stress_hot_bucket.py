"""Adversarial hot-bucket stress for the LSH dedup family.

The input shape that used to take the engine down: mass-duplicated
boilerplate (>=100k byte-identical copies of one text among 2M docs).
Exact duplicates share EVERY minhash band bucket, so before the
exact-dup pre-collapse (ops/dedup.py collapse_exact_dups) the verify
shard faced ~5e9 candidate pairs per band and died.  With collapse the
LSH stage sees each distinct text once, the 100k-copy group expands as
a logged star (connectivity preserved), and — with the signature-only
bucket shuffle (band rows carry 20 bytes, signatures ride the verify
step once per touched id, never once per band row) — the 2M-doc run
completes in ~1-2 minutes on the 32-cpu sandbox (measured 2026-08-18:
pairs 121 s under load, 64.8 s on a re-run; clusters ~1-2 s, all
copies flagged, one cluster; the old payload-per-band-row design was
still running at 570 s).

Run:  python scripts/stress_hot_bucket.py [n_docs] [n_copies]
Emits one JSON line with wall time, pair counts, and cluster check.
"""

from __future__ import annotations

import json
import os
import sys
import time

# importable regardless of invocation directory (sys.path[0] is scripts/)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_copies = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    assert n_docs % n_copies == 0
    stride = n_docs // n_copies  # ids divisible by stride are the copies

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    import ray.data

    from deduce_ray.ops.dedup import minhash_lsh_pairs, neardup_clusters
    from deduce_ray.raytune import tune_data_context

    tune_data_context()

    boiler = (
        "permission is hereby granted free of charge to any person "
        "obtaining a copy of this software and associated documentation"
    )

    def synth(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy(zero_copy_only=False)
        texts = [
            boiler
            if i % stride == 0
            else f"unique document {i} alpha{i % 97} beta{i % 89} "
            f"gamma{i % 83} delta{i % 79} epsilon{i % 73} zeta{i % 71}"
            for i in ids
        ]
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
            }
        )

    docs = ray.data.range(n_docs).map_batches(synth, batch_format="pyarrow")

    t0 = time.perf_counter()
    # expand_cap: output-changing caps are OFF by default (oracle-exact
    # configurations); the stress corpus is exactly the mass-duplication
    # shape where the quadratic OUTPUT must degrade to a logged star
    pairs = minhash_lsh_pairs(
        docs, threshold=0.5, verify="signature", expand_cap=8192
    )
    pairs = pairs.materialize()
    n_pairs = pairs.count()
    pairs_sec = time.perf_counter() - t0

    # the boilerplate group must be fully flagged: every copy appears in
    # at least one pair (the star guarantees rep->member edges)
    import pyarrow.compute as pc

    def copies_only(t: pa.Table) -> pa.Table:
        a = t.column("id_a").to_numpy(zero_copy_only=False)
        b = t.column("id_b").to_numpy(zero_copy_only=False)
        keep = (a % stride == 0) & (b % stride == 0)
        return t.filter(pa.array(keep))

    flagged = set()
    for bt in pairs.map_batches(copies_only, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        flagged.update(bt.column("id_a").to_pylist())
        flagged.update(bt.column("id_b").to_pylist())
    all_copies_flagged = len(flagged) == n_copies

    t1 = time.perf_counter()
    labels = neardup_clusters(pairs)
    n_boiler_clusters = (
        labels.map_batches(
            lambda t: t.filter(
                pa.array(
                    t.column("doc_id").to_numpy(zero_copy_only=False) % stride
                    == 0
                )
            ).select(["cluster_id"]),
            batch_format="pyarrow",
        )
        .unique("cluster_id")
    )
    clusters_sec = time.perf_counter() - t1

    print(
        json.dumps(
            {
                "n_docs": n_docs,
                "n_copies": n_copies,
                "pairs_sec": round(pairs_sec, 2),
                "n_pairs": n_pairs,
                "all_copies_flagged": all_copies_flagged,
                "boiler_cluster_count": len(n_boiler_clusters),
                "clusters_sec": round(clusters_sec, 2),
            }
        )
    )
    assert all_copies_flagged
    assert len(n_boiler_clusters) == 1
    ray.shutdown()


if __name__ == "__main__":
    main()
