"""Scale stress for the incremental dedup store: two large overlapping
ingests, measuring wall time and verifying cross-ingest drop counts.

Batch 1 is the sf corpus replicated R times with per-(replica, row)
unique texts; batch 2 repeats half of batch 1's replicas (every row must
drop) plus as many new replicas (every row must survive).  Both batches
are MATERIALIZED to parquet first and ingested from disk — the store
consumes its input twice (hash pass + filter pass), and a real ingest
reads a corpus from storage, not a 2R-way union of tiny pipelines.

Run:  python scripts/stress_dedup_store.py [sf_dir] [replicate] [n_shards] [kind]

``kind`` is ``exact`` (default, DedupStore) or ``simhash``
(SimHashStore: batch 2's repeats are hamming-0 near-dups, so survivor
counts are identical and the same asserts apply).
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    n_shards = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    kind = sys.argv[4] if len(sys.argv) > 4 else "exact"

    import pyarrow as pa
    import ray

    from deduce_ray.raytune import tune_data_context
    from deduce_ray.state import DedupStore, SimHashStore

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    tune_data_context()

    base = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    n_base = base.count()
    half = replicate // 2

    def replicas(tags: list[int], start_id: int):
        # text is unique per (replica tag, BASE doc id) — the base corpus
        # contains duplicate texts, so the mutation must carry row
        # identity, and reusing the base id lets a repeated tag reproduce
        # batch 1's texts exactly.  One map_batches fans each block out R
        # ways.  The exact store only needs a byte difference (cheap
        # suffix); the simhash store needs replicas that are NOT near
        # each other, so every word gets tagged (disjoint word sets ->
        # independent signatures).
        def f(b: pa.Table) -> pa.Table:
            base_ids = b.column("doc_id").to_pylist()
            texts = b.column("text").to_pylist()
            out_ids, out_texts = [], []
            for tag in tags:
                out_ids.extend(start_id + tag * n_base + i for i in base_ids)
                if kind == "simhash":
                    out_texts.extend(
                        " ".join(f"{w}_{tag}x{i}" for w in t.split())
                        for t, i in zip(texts, base_ids)
                    )
                else:
                    out_texts.extend(
                        f"{t} #r{tag}-{i}" for t, i in zip(texts, base_ids)
                    )
            return pa.table(
                {
                    "doc_id": pa.array(out_ids, type=pa.int64()),
                    "text": pa.array(out_texts),
                }
            )

        return base.map_batches(f, batch_format="pyarrow")

    work = f"/tmp/dedup_store_stress_{os.getpid()}"
    shutil.rmtree(work, ignore_errors=True)
    b1_dir, b2_dir = f"{work}/batch1", f"{work}/batch2"
    replicas(list(range(replicate)), 0).write_parquet(b1_dir)
    replicas(
        list(range(half)) + list(range(replicate, replicate + half)),
        10_000_000_000,
    ).write_parquet(b2_dir)
    batch1 = ray.data.read_parquet(b1_dir)
    batch2 = ray.data.read_parquet(b2_dir)

    if kind == "simhash":
        store = SimHashStore.create(f"{work}/store", n_shards=n_shards)
    else:
        store = DedupStore.create(f"{work}/store", n_shards=n_shards)
    try:
        t0 = time.time()
        s1 = store.ingest(batch1, "b1").count()
        t1 = time.time() - t0
        t0 = time.time()
        s2 = store.ingest(batch2, "b2").count()
        t2 = time.time() - t0
        st = store.stats()
        recorded = st["n_docs"] if kind == "simhash" else st["n_hashes"]
        n1, n2 = replicate * n_base, 2 * half * n_base
        print(
            f"batch1: {n1} docs -> {s1} survivors in {t1:.1f}s "
            f"({n1 / t1:.0f} docs/s)"
        )
        print(
            f"batch2: {n2} docs -> {s2} survivors in {t2:.1f}s "
            f"({n2 / t2:.0f} docs/s); store {recorded} docs recorded / "
            f"{st['n_files']} files"
        )
        assert s1 == n1, "batch1 texts are all-unique: every row survives"
        assert s2 == half * n_base, "batch2: repeated half drops, new half stays"
        assert recorded == n1 + half * n_base
        print("OK")
    finally:
        shutil.rmtree(work, ignore_errors=True)
        ray.shutdown()


if __name__ == "__main__":
    main()
