"""Resumable bucketed parquet sink.

``materialize_graph`` (rayops/kg.py) pioneered this repo's resumable-sink
shape: deterministic unit routing, one atomically-renamed parquet file +
one lineage manifest per unit, completed units filtered out BEFORE the
exchange, and a refusal to resume under a changed routing config (rows
would re-route into differently-named units while the old files survive
— duplicated output).  That sink is graph-specific (units are
(repo, lang, salt) partitions).  This module generalizes the pattern to
ANY dataset with a stable integer id column, so the prep funnel's
survivor corpus — previously an all-or-nothing ``write_parquet`` — can
be written as N hash buckets where a restarted run skips the finished
ones.

Semantics and limits, stated plainly:

- Routing is ``splitmix64(id) % n_buckets`` — deterministic across
  runs, independent of block boundaries or execution order, uniform
  even for sequential ids.  The id column must be integer-typed,
  non-null, and (per the funnel's module-wide contract) unique.
- Resume skips the WRITE (and the shuffle volume) of completed
  buckets; the upstream pipeline still re-executes to regenerate the
  missing rows.  That is the honest contract for a deterministic
  pipeline — the same one materialize_graph documents.
- Each bucket becomes one group task holding the whole bucket in
  memory: size ``n_buckets`` so ``corpus / n_buckets`` fits a worker's
  heap (the cost of atomic per-unit commit; at 100 TB you want
  thousands of buckets, not the CLI's single-node default of 64).
- Within a bucket, rows are sorted by ``sort_cols`` before writing so a
  re-run of the same input reproduces the same bytes — manifests carry
  a content hash over the sorted id column to make that checkable.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from pathlib import Path

import numpy as np
import pyarrow as pa

# Version of the on-disk layout (file naming + bucket derivation).
# Recorded in every manifest; resume refuses a mismatch for the same
# reason it refuses a changed n_buckets.
_LAYOUT_VERSION = 1


def _bucket_of(ids: np.ndarray, n_buckets: int) -> np.ndarray:
    """splitmix64 finalizer over the id column — vectorized, stable.

    A bare ``id % n_buckets`` is uniform for this repo's sha-derived
    doc ids but degenerate for user corpora with structured ids (e.g.
    ids stepping by n_buckets); the mix costs three multiplies and
    removes the failure mode entirely.
    """
    x = ids.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x += np.uint64(0x9E3779B97F4A7C15)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x = x ^ (x >> np.uint64(31))
    return (x % np.uint64(n_buckets)).astype(np.int64)


def _scan_manifests(out_dir: Path, config: dict) -> tuple[set[int], int]:
    """One driver pass over ``_manifests/``: refuse a config/layout
    mismatch, return (completed bucket ids, rows already written)."""
    done: set[int] = set()
    rows_done = 0
    mdir = out_dir / "_manifests"
    if not mdir.exists():
        return done, 0
    for mf in mdir.glob("*.json"):
        if mf.name.startswith("_run_"):
            continue
        try:
            with open(mf) as fh:
                manifest = json.load(fh)
        except json.JSONDecodeError:
            continue  # torn write from a crashed run: unit not complete
        recorded = manifest.get("config")
        if recorded is not None and recorded != config:
            raise ValueError(
                f"write_parquet_resumable: resume with config {config} but "
                f"completed bucket {manifest.get('bucket')} was written "
                f"with {recorded}; rows would re-route into differently-"
                "named buckets while the old files survive — clear the "
                "output directory or rerun with the original id_col/"
                "n_buckets"
            )
        if manifest.get("layout", 0) != _LAYOUT_VERSION:
            raise ValueError(
                f"write_parquet_resumable: output dir uses unit layout "
                f"v{manifest.get('layout', 0)} but this version writes "
                f"v{_LAYOUT_VERSION}; clear the output directory"
            )
        if manifest.get("complete") and "bucket" in manifest:
            done.add(int(manifest["bucket"]))
            rows_done += int(manifest.get("rows", 0))
    return done, rows_done


def write_parquet_resumable(
    ds,
    out_dir: str | Path,
    id_col: str = "doc_id",
    n_buckets: int = 64,
    sort_cols: tuple[str, ...] | None = None,
    resume: bool = True,
    run_id: str | None = None,
) -> dict:
    """Write ``ds`` as ``part-<bucket>.parquet`` files under ``out_dir``
    with per-bucket completion manifests; returns a summary dict
    ``{"buckets_written", "buckets_skipped", "rows", "rows_total"}``.

    ``resume=True`` (default) skips buckets whose manifest says
    complete — filtered out before the exchange, so their rows never
    shuffle.  ``resume=False`` refuses a non-empty output directory
    outright (the prep CLI's historical all-or-nothing behavior).
    """
    import pyarrow.compute as pc

    out_dir = Path(out_dir)
    if not resume and out_dir.exists() and any(out_dir.iterdir()):
        raise ValueError(
            f"write_parquet_resumable: {out_dir} exists and is not empty "
            "and resume is off — output would mix with stale files"
        )
    out_dir.mkdir(parents=True, exist_ok=True)
    (out_dir / "_manifests").mkdir(exist_ok=True)

    config = {"id_col": id_col, "n_buckets": int(n_buckets)}
    done, rows_done = (
        _scan_manifests(out_dir, config) if resume else (set(), 0)
    )

    schema = ds.schema()  # ray.data.Schema: parallel .names / .types
    if "__bucket" in schema.names:
        raise ValueError(
            "write_parquet_resumable: input already has a __bucket column "
            "(reserved for routing)"
        )
    id_type = dict(zip(schema.names, schema.types))[id_col]
    if not (isinstance(id_type, pa.DataType) and pa.types.is_integer(id_type)):
        raise TypeError(
            f"write_parquet_resumable: id column {id_col!r} must be "
            f"integer-typed for stable bucket routing, got {id_type}"
        )
    sort_by = list(sort_cols) if sort_cols else [id_col]
    missing = [c for c in sort_by if c not in schema.names]
    if missing:
        raise ValueError(
            f"write_parquet_resumable: sort_cols {missing} not in schema "
            f"{schema.names}"
        )

    done_arr = pa.array(sorted(done), type=pa.int64()) if done else None

    def add_bucket(batch: pa.Table) -> pa.Table:
        # null check BEFORE to_numpy: a nullable int column converts to
        # float64-with-NaN, which would silently route to a garbage bucket
        if batch.num_rows and batch.column(id_col).null_count:
            raise ValueError(
                f"write_parquet_resumable: null id in column {id_col!r}"
            )
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        bucket = _bucket_of(ids, n_buckets) if batch.num_rows else np.array(
            [], dtype=np.int64
        )
        batch = batch.append_column(
            "__bucket", pa.array(bucket, type=pa.int64())
        )
        if done_arr is not None:
            batch = batch.filter(
                pc.invert(
                    pc.is_in(batch.column("__bucket"), value_set=done_arr)
                )
            )
        return batch

    def write_unit(group: pa.Table) -> pa.Table:
        t0 = time.time()
        bucket = group.column("__bucket")[0].as_py()
        group = group.drop_columns(["__bucket"]).sort_by(
            [(c, "ascending") for c in sort_by]
        )
        import pyarrow.parquet as pq

        data_path = out_dir / f"part-{bucket:05d}.parquet"
        tmp_path = out_dir / f".part-{bucket:05d}.{os.getpid()}.tmp"
        pq.write_table(group, tmp_path)
        os.replace(tmp_path, data_path)

        ids_sorted = group.column(id_col).to_numpy(zero_copy_only=False)
        content_hash = hashlib.sha256(
            np.ascontiguousarray(ids_sorted).tobytes()
        ).hexdigest()
        manifest = {
            "bucket": int(bucket),
            "rows": int(group.num_rows),
            "ids_sha256": content_hash,
            "duration_s": round(time.time() - t0, 3),
            "config": config,
            "layout": _LAYOUT_VERSION,
            "complete": True,
        }
        mtmp = out_dir / "_manifests" / f".part-{bucket:05d}.{os.getpid()}.tmp"
        with open(mtmp, "w") as fh:
            json.dump(manifest, fh)
        os.replace(mtmp, out_dir / "_manifests" / f"part-{bucket:05d}.json")
        return pa.table(
            {
                "bucket": pa.array([int(bucket)], type=pa.int64()),
                "rows": pa.array([int(group.num_rows)], type=pa.int64()),
            }
        )

    metrics = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(write_unit, batch_format="pyarrow")
    )
    written = 0
    rows_written = 0
    # one row per bucket: a bounded driver pull by construction
    for bt in metrics.iter_batches(batch_format="pyarrow"):
        written += bt.num_rows
        if bt.num_rows:
            rows_written += int(
                pc.sum(bt.column("rows")).as_py() or 0
            )

    summary = {
        "buckets_written": written,
        "buckets_skipped": len(done),
        "rows": rows_written,
        "rows_total": rows_written + rows_done,
    }
    if run_id is not None:
        run_manifest = {"run_id": run_id, "config": config, **summary}
        rtmp = out_dir / "_manifests" / f"._run_{run_id}.{os.getpid()}.tmp"
        with open(rtmp, "w") as fh:
            json.dump(run_manifest, fh)
        os.replace(rtmp, out_dir / "_manifests" / f"_run_{run_id}.json")
    return summary
