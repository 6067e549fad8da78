"""Adversarial stress for substring dedup: mass-duplicated boilerplate.

The pathological input for any LSH/all-pairs design — N documents
sharing one verbatim header — is LINEAR here by construction: a hot
gram contributes one (hash, doc, pos) row per occurrence, the
shard-local nunique is a single vectorized pass, and span emission is
one row per document.  This script proves it: 1M docs, 200k of which
share a 40-word license header (plus unique bodies), must complete in
about a minute on 32 CPUs (measured: 67 s, a ~63M-row gram exchange)
and flag exactly the 200k headers.

Run: python scripts/stress_dup_spans.py [n_docs] [n_dup] [num_cpus]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_dup = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    num_cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    import numpy as np
    import pyarrow as pa
    import ray

    from deduce_ray.raytune import tune_data_context

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False)
    tune_data_context()

    header = " ".join(f"license{i} term{i}" for i in range(20))  # 40 words

    def make_docs(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy()
        texts = []
        for i in ids:
            body = " ".join(f"u{i}w{j}" for j in range(30))
            if i < n_dup:
                texts.append(header + " " + body)
            else:
                texts.append(body)
        return pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                         "text": pa.array(texts, type=pa.string())})

    from deduce_ray.ops.substring import duplicated_ngram_spans

    docs = ray.data.range(n_docs).map_batches(
        make_docs, batch_format="pyarrow", batch_size=32_768
    )
    t0 = time.time()
    spans = duplicated_ngram_spans(docs, n=13)
    # pull only counts — the result is one span row per duplicated doc
    n_spans = spans.count()
    dt = time.time() - t0
    assert n_spans == n_dup, f"expected {n_dup} span rows, got {n_spans}"
    print(
        f"dup_spans stress: {n_docs} docs ({n_dup} sharing a 40-word "
        f"header) -> {n_spans} spans in {dt:.1f}s "
        f"({n_docs / dt:.0f} docs/s)"
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
