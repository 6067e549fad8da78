"""Resumable bucketed parquet sink (deduce_ray/sinks.py)."""

import json

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from deduce_ray.sinks import _bucket_of, write_parquet_resumable


def _corpus(n=200, start=0):
    ids = np.arange(start, start + n, dtype=np.int64)
    return pa.table(
        {
            "doc_id": ids,
            "text": [f"document number {i} body" for i in ids],
        }
    )


def _read_all(out_dir):
    import glob

    parts = sorted(glob.glob(f"{out_dir}/part-*.parquet"))
    return pa.concat_tables([pq.read_table(p) for p in parts])


class TestBucketRouting:
    def test_deterministic_and_uniform(self):
        ids = np.arange(100_000, dtype=np.int64)
        b1 = _bucket_of(ids, 64)
        b2 = _bucket_of(ids.copy(), 64)
        assert (b1 == b2).all()
        counts = np.bincount(b1, minlength=64)
        # splitmix64 over 100k ids: every bucket within 20% of uniform
        assert counts.min() > 100_000 / 64 * 0.8
        assert counts.max() < 100_000 / 64 * 1.2

    def test_structured_ids_still_uniform(self):
        # ids stepping by the bucket count: bare modulo would collapse
        # everything into one bucket
        ids = np.arange(0, 64 * 10_000, 64, dtype=np.int64)
        counts = np.bincount(_bucket_of(ids, 64), minlength=64)
        assert counts.min() > 0
        assert counts.max() < len(ids) * 0.05

    def test_input_not_mutated(self):
        ids = np.arange(100, dtype=np.int64)
        orig = ids.copy()
        _bucket_of(ids, 8)
        assert (ids == orig).all()


class TestWriteResumable:
    def test_roundtrip_all_rows(self, ray_session, tmp_path):
        import ray

        tbl = _corpus(500)
        summary = write_parquet_resumable(
            ray.data.from_arrow(tbl), tmp_path, n_buckets=16
        )
        assert summary["buckets_skipped"] == 0
        assert summary["rows"] == 500
        assert summary["rows_total"] == 500
        out = _read_all(tmp_path).sort_by("doc_id")
        assert out.column("doc_id").to_pylist() == list(range(500))
        assert out.column("text").to_pylist() == tbl.column("text").to_pylist()
        # one manifest per written bucket, each complete with a content hash
        manifests = list((tmp_path / "_manifests").glob("part-*.json"))
        assert len(manifests) == summary["buckets_written"]
        m = json.loads(manifests[0].read_text())
        assert m["complete"] and len(m["ids_sha256"]) == 64

    def test_resume_skips_completed_buckets(self, ray_session, tmp_path):
        import ray

        tbl = _corpus(400)
        write_parquet_resumable(ray.data.from_arrow(tbl), tmp_path, n_buckets=8)

        # simulate a crashed earlier run: delete half the manifests AND
        # their data files, then corrupt a surviving data file's mtime
        # sentinel to prove resume does not rewrite it
        manifests = sorted((tmp_path / "_manifests").glob("part-*.json"))
        kept = manifests[: len(manifests) // 2]
        for mf in manifests[len(manifests) // 2 :]:
            bucket = json.loads(mf.read_text())["bucket"]
            mf.unlink()
            (tmp_path / f"part-{bucket:05d}.parquet").unlink()
        sentinels = {}
        for mf in kept:
            bucket = json.loads(mf.read_text())["bucket"]
            p = tmp_path / f"part-{bucket:05d}.parquet"
            sentinels[p] = p.stat().st_mtime_ns

        summary = write_parquet_resumable(
            ray.data.from_arrow(tbl), tmp_path, n_buckets=8, run_id="r2"
        )
        assert summary["buckets_skipped"] == len(kept)
        assert summary["rows_total"] == 400
        for p, mtime in sentinels.items():
            assert p.stat().st_mtime_ns == mtime, "completed bucket rewritten"
        out = _read_all(tmp_path).sort_by("doc_id")
        assert out.column("doc_id").to_pylist() == list(range(400))
        run = json.loads(
            (tmp_path / "_manifests" / "_run_r2.json").read_text()
        )
        assert run["rows_total"] == 400

    def test_resume_refuses_changed_config(self, ray_session, tmp_path):
        import ray

        write_parquet_resumable(
            ray.data.from_arrow(_corpus(50)), tmp_path, n_buckets=8
        )
        with pytest.raises(ValueError, match="re-route"):
            write_parquet_resumable(
                ray.data.from_arrow(_corpus(50)), tmp_path, n_buckets=16
            )

    def test_no_resume_refuses_nonempty_dir(self, ray_session, tmp_path):
        import ray

        (tmp_path / "stale.txt").write_text("x")
        with pytest.raises(ValueError, match="not empty"):
            write_parquet_resumable(
                ray.data.from_arrow(_corpus(10)),
                tmp_path,
                resume=False,
            )

    def test_torn_manifest_is_not_complete(self, ray_session, tmp_path):
        import ray

        write_parquet_resumable(
            ray.data.from_arrow(_corpus(100)), tmp_path, n_buckets=4
        )
        mf = sorted((tmp_path / "_manifests").glob("part-*.json"))[0]
        mf.write_text('{"bucket": 0, "rows":')  # torn write
        summary = write_parquet_resumable(
            ray.data.from_arrow(_corpus(100)), tmp_path, n_buckets=4
        )
        # the torn bucket was rewritten; the other three skipped
        assert summary["buckets_skipped"] == 3
        assert _read_all(tmp_path).num_rows == 100

    def test_null_id_raises(self, ray_session, tmp_path):
        import ray

        tbl = pa.table(
            {
                "doc_id": pa.array([1, None, 3], type=pa.int64()),
                "text": ["a", "b", "c"],
            }
        )
        with pytest.raises(Exception, match="null id"):
            write_parquet_resumable(
                ray.data.from_arrow(tbl), tmp_path, n_buckets=2
            )

    def test_non_integer_id_refused(self, ray_session, tmp_path):
        import ray

        tbl = pa.table({"doc_id": ["a", "b"], "text": ["x", "y"]})
        with pytest.raises(TypeError, match="integer-typed"):
            write_parquet_resumable(
                ray.data.from_arrow(tbl), tmp_path, n_buckets=2
            )

    def test_sort_cols_deterministic_bytes(self, ray_session, tmp_path):
        import hashlib

        import ray

        # chunk-shaped rows: composite (doc_id, chunk_id) identity,
        # bucketed by doc_id so a document's chunks stay together
        tbl = pa.table(
            {
                "doc_id": pa.array([2, 1, 2, 1, 3, 3], type=pa.int64()),
                "chunk_id": pa.array([1, 0, 0, 1, 0, 1], type=pa.int64()),
                "text": ["c", "a", "b", "d", "e", "f"],
            }
        )
        d1, d2 = tmp_path / "a", tmp_path / "b"
        for d in (d1, d2):
            write_parquet_resumable(
                ray.data.from_arrow(tbl),
                d,
                id_col="doc_id",
                sort_cols=("doc_id", "chunk_id"),
                n_buckets=2,
            )

        def digest(d):
            return [
                hashlib.sha256(p.read_bytes()).hexdigest()
                for p in sorted(d.glob("part-*.parquet"))
            ]

        assert digest(d1) == digest(d2)
        out = _read_all(d1)
        # within each file, rows are (doc_id, chunk_id)-sorted
        df = out.to_pandas()
        assert len(df) == 6


class TestPrepResumeIntegration:
    def test_funnel_through_resumable_sink(self, ray_session, tmp_path):
        """prep --resume semantics end-to-end: funnel output written
        bucketed, a simulated crash (half the manifests gone) resumed,
        total output equal to a single-shot run."""
        import ray

        from deduce_ray.ops.funnel import prep_corpus

        texts = [
            " ".join(f"woord{i}w{j}" for j in range(40)) for i in range(60)
        ]
        rows = [
            {"doc_id": i, "text": texts[i % 60]} for i in range(120)
        ]  # every text duplicated once -> 60 survivors

        def run(out_dir):
            out = prep_corpus(
                ray.data.from_items(rows),
                min_chars=10,
                minhash_threshold=None,
            )
            return write_parquet_resumable(
                out, out_dir, n_buckets=8, run_id="t"
            )

        d = tmp_path / "out"
        run(d)
        full = _read_all(d).sort_by("doc_id")
        assert full.num_rows == 60

        # crash simulation: drop half the manifests + their data files
        manifests = sorted((d / "_manifests").glob("part-*.json"))
        for mf in manifests[::2]:
            bucket = json.loads(mf.read_text())["bucket"]
            mf.unlink()
            (d / f"part-{bucket:05d}.parquet").unlink()

        summary = run(d)
        assert summary["buckets_skipped"] == len(manifests) - len(
            manifests[::2]
        )
        resumed = _read_all(d).sort_by("doc_id")
        assert resumed.equals(full)
