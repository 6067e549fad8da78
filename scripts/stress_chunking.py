"""Scale stress for training-window prep: chunk_documents + pack_chunks
over a replicated corpus.

Checks the conservation invariant at scale (total packed words ==
total chunk words == sum of per-doc word counts) and reports
throughput.  Usage: python scripts/stress_chunking.py [replicate] [cpus]
Defaults: 256 replicas of sf0.1 documents (~1.28M docs), 16 CPUs.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    replicate = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus, include_dashboard=False,
                 log_to_driver=False)
    from deduce_ray.raytune import tune_data_context

    tune_data_context()

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from deduce_ray.ops.chunking import chunk_documents, pack_chunks

    full = pq.read_table(
        "/root/testdata/sf0.1/documents.parquet", columns=["doc_id", "text"]
    )
    blocks = []
    for r in range(replicate):
        t = pa.table(
            {
                "doc_id": pa.compute.add(full.column("doc_id"), r * 10_000_000),
                "text": full.column("text"),
            }
        )
        for i in range(0, t.num_rows, 4096):
            blocks.append(t.slice(i, 4096))
    ds = ray.data.from_arrow(blocks)
    n_docs = ds.count()

    t0 = time.time()
    chunks = chunk_documents(ds, window=32, stride=24)
    packs = pack_chunks(chunks, max_words=512)
    agg = packs.map_batches(
        lambda b: pa.table(
            {
                "packs": pa.array([b.num_rows]),
                "words": pa.array([pa.compute.sum(b.column("n_words")).as_py() or 0]),
            }
        ),
        batch_format="pyarrow",
    ).to_pandas()
    n_packs = int(agg["packs"].sum())
    n_words = int(agg["words"].sum())
    elapsed = time.time() - t0

    # independent word count over the raw corpus (overlap words count
    # once here; stride < window duplicates (window-stride) per interior
    # chunk, so equality holds only for the chunk-level total)
    from deduce_ray.ops.textstats import split_words

    base_words = sum(
        len(split_words(t or ""))
        for t in full.column("text").to_pylist()
    ) * replicate
    # chunk-level expected total: per doc, sum over windows
    from deduce_ray.ops.chunking import window_spans

    per_doc = [
        sum(e - s for s, e in window_spans(len(split_words(t or "")), 32, 24))
        for t in full.column("text").to_pylist()
    ]
    expect = sum(per_doc) * replicate

    print(
        f"{n_docs} docs -> {n_packs} packs / {n_words} words in "
        f"{elapsed:.1f}s ({n_docs / elapsed:.0f} docs/s; corpus "
        f"{base_words} raw words)"
    )
    if n_words != expect:
        print(f"FAIL: packed words {n_words} != expected {expect}")
        return 1
    print("OK (conservation exact)")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
