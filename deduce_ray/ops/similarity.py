"""Similarity search over an embedding column (list<float>).

Baseline: brute-force cosine top-k — a numpy matmul per batch against a
broadcast query matrix, local top-k per batch, then one tiny groupby merge
(the scale-correct "prune locally, merge globally" top-k shape).

Scale path: LSH-bucketed search — vectors are pre-assigned to
random-hyperplane buckets; queries probe only their own bucket (plus
Hamming-1 neighbors), cutting the scanned fraction to ~ (1 + n_planes)/2^p.
"""

from __future__ import annotations

import functools

import numpy as np
import pandas as pd
import pyarrow as pa


def _as_matrix(column) -> np.ndarray:
    """(n, dim) float64 from an Arrow list<float> column WITHOUT creating
    per-element Python objects: for uniform-width null-free rows (the
    embedding contract) read the flat values buffer and reshape — at 768
    dims this avoids materializing ~dim x n Python floats per batch.
    Ragged or null rows fall back to the object path."""
    if isinstance(column, pa.ChunkedArray):
        column = column.combine_chunks()
    try:
        if column.null_count == 0 and len(column):
            if isinstance(column, pa.FixedSizeListArray):
                flat = column.values.to_numpy(zero_copy_only=False)
                return flat.astype(np.float64, copy=False).reshape(
                    len(column), -1
                )
            offsets = column.offsets.to_numpy(zero_copy_only=False)
            widths = np.diff(offsets)
            if (widths == widths[0]).all() and widths[0] > 0:
                # offsets are absolute into the shared values buffer (a
                # sliced array does not start at 0)
                flat = column.values.to_numpy(zero_copy_only=False)[
                    offsets[0] : offsets[-1]
                ]
                return flat.astype(np.float64, copy=False).reshape(
                    len(column), int(widths[0])
                )
    except (AttributeError, pa.ArrowInvalid):
        pass
    try:
        return np.asarray(column.to_pylist(), dtype=np.float64)
    except (ValueError, TypeError) as exc:
        # actionable contract error instead of numpy's bare
        # "inhomogeneous shape" message: name WHICH widths break the
        # fixed-dimension embedding contract.  (NULL whole-row
        # embeddings never reach here — ingestion points filter them
        # via drop_invalid_vector_rows; NULL elements INSIDE a list
        # become NaN components on both the zero-copy and fallback
        # paths and propagate per IEEE, ranking that row last / never
        # pairing it.)
        widths = sorted(
            {len(v) for v in column.to_pylist() if v is not None}
        )
        raise ValueError(
            "embedding column violates the fixed-dimension contract: "
            f"all rows must share one width (widths found: "
            f"{widths[:10]}) [{exc}]"
        ) from exc


def drop_invalid_vector_rows(
    batch: pa.Table, id_col: str, vec_col: str
) -> pa.Table:
    """Drop rows whose id or vector is NULL — the SQL-null contract for
    every vector op (a NULL embedding can't score, a NULL id can't label
    a neighbor; DuckDB oracles carry the matching ``WHERE ... IS NOT
    NULL``).  Vectorized validity test, zero-copy when nothing is
    dropped; dropped counts are logged (no silent caps).  Found by the
    adversarial-sf sweep: a single NULL embedding row crashed every ANN
    path at the np.stack, and a NULL vec_id crashed the shard keyer."""
    import pyarrow.compute as pc

    ids = batch.column(id_col)
    vecs = batch.column(vec_col)
    if ids.null_count == 0 and vecs.null_count == 0:
        return batch
    keep = pc.and_(pc.is_valid(ids), pc.is_valid(vecs))
    dropped = batch.num_rows - pc.sum(pc.cast(keep, pa.int64())).as_py()
    if dropped:
        import logging

        logging.getLogger(__name__).warning(
            "dropping %d row(s) with NULL %s or NULL %s (SQL-null "
            "contract for vector ops)",
            dropped,
            id_col,
            vec_col,
        )
    return batch.filter(keep)


@functools.lru_cache(maxsize=8)
def _hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    """Deterministic (dim, n_planes) hyperplane matrix, cached per worker
    process — regenerating identical RNG draws per batch is pure waste."""
    return np.random.default_rng(seed).standard_normal((dim, n_planes))


def _unit_rows(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def _top_indices(scores, ids, top):
    """Indices of the top candidates under the ANN ordering contract:
    round(score, 6) descending, id ascending.  argpartition alone would
    break ties arbitrarily and could drop the lowest-id member of a tied
    group at a batch boundary, diverging from the oracle's row_number."""
    rounded = np.round(scores, 6)
    order = np.lexsort((ids, -rounded))
    return order[:top]


def _merge_topk(k: int, id_col: str):
    """Shared global top-k merge for all ANN paths: sort by (score desc,
    id asc), keep k, assign 1-based ranks — the tie-break contract the
    DuckDB oracle relies on, defined once."""

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["score", id_col], ascending=[False, True]).head(k)
        df = df.reset_index(drop=True)
        df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
        return df

    return merge


def _ann_scan(
    ds,
    unit_queries: np.ndarray,
    k: int,
    id_col: str,
    vec_col: str,
    labels_fn=None,
    probe_rows=None,
):
    """The shared ANN scan shape: per-batch local top-k per query (prune
    inside the batch), then one tiny global groupby merge under the
    ordering contract (_merge_topk).  ``labels_fn(batch, mat)`` assigns a
    per-row int label and ``probe_rows[qi]`` lists the labels query ``qi``
    scans; both None means every query scans every row (brute force,
    computed as one BLAS matmul per batch)."""
    import ray

    state_ref = ray.put((unit_queries, probe_rows))

    def local_topk(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "query_id": pa.array([], type=pa.int64()),
                id_col: pa.array([], type=pa.int64()),
                "score": pa.array([], type=pa.float64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        batch = drop_invalid_vector_rows(batch, id_col, vec_col)
        if batch.num_rows == 0:
            return empty
        q, probes = ray.get(state_ref)
        ids = np.asarray(batch.column(id_col).to_pylist(), dtype=np.int64)
        mat = _unit_rows(_as_matrix(batch.column(vec_col)))
        labels = labels_fn(batch, mat) if labels_fn is not None else None
        sims_all = mat @ q.T if labels is None else None
        out = {"query_id": [], id_col: [], "score": []}
        for qi in range(q.shape[0]):
            if labels is None:
                sub_ids, col = ids, sims_all[:, qi]
            else:
                mask = np.isin(labels, probes[qi])
                if not mask.any():
                    continue
                sub_ids = ids[mask]
                col = mat[mask] @ q[qi]
            top = min(k, len(sub_ids))
            idx = _top_indices(col, sub_ids, top)
            for i in idx:
                out["query_id"].append(qi)
                out[id_col].append(int(sub_ids[i]))
                out["score"].append(round(float(col[i]), 6))
        if not out["query_id"]:
            return empty
        return pa.table(
            {
                "query_id": pa.array(out["query_id"], type=pa.int64()),
                id_col: pa.array(out[id_col], type=pa.int64()),
                "score": pa.array(out["score"], type=pa.float64()),
            }
        )

    local = ds.map_batches(local_topk, batch_format="pyarrow")
    return local.groupby("query_id").map_groups(
        _merge_topk(k, id_col), batch_format="pandas"
    )


def brute_force_topk(
    ds_embeddings,
    queries: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Exact cosine top-k for each query row.

    Returns a Dataset of (query_id, vec_id, score, rank); scores rounded to
    6 decimals, ties broken by vec_id ascending (deterministic).
    """
    unit_queries = _unit_rows(np.asarray(queries, dtype=np.float64))
    return _ann_scan(ds_embeddings, unit_queries, k, id_col, vec_col)


def kmeans_centroids(
    mat: np.ndarray, n_lists: int, iters: int = 10, seed: int = 777
) -> np.ndarray:
    """Deterministic Lloyd k-means on unit vectors (spherical k-means):
    fixed-seed init, assignments by max dot product, centroids re-normalized
    each round.  Empty lists re-seed from the worst-covered point."""
    unit = _unit_rows(np.asarray(mat, dtype=np.float64))
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(unit), size=min(n_lists, len(unit)), replace=False)
    cents = unit[np.sort(idx)].copy()
    for _ in range(iters):
        sims = unit @ cents.T
        assign = np.argmax(sims, axis=1)
        # reseed empty lists from DISTINCT worst-covered points (a shared
        # argmin would make every empty list the same duplicate centroid)
        coverage_order = iter(np.argsort(np.max(sims, axis=1)))
        for c in range(len(cents)):
            members = unit[assign == c]
            if len(members) == 0:
                cents[c] = unit[next(coverage_order)]
            else:
                cents[c] = members.mean(axis=0)
        cents = _unit_rows(cents)
    return cents


def _train_quantizer(
    ds_embeddings, train_size: int, n_lists: int, vec_col: str
) -> np.ndarray:
    """Shared coarse-quantizer training for the in-batch and partitioned
    IVF paths — one bounded driver materialization of the first
    ``train_size`` rows, then deterministic spherical k-means.  Must stay
    the SINGLE implementation so both paths quantize identically."""
    sample = ds_embeddings.limit(train_size).take_all()
    # NULL-vector rows can't train the quantizer (SQL-null contract,
    # same as drop_invalid_vector_rows on the scan side)
    train = np.asarray(
        [r[vec_col] for r in sample if r[vec_col] is not None],
        dtype=np.float64,
    )
    return kmeans_centroids(train, n_lists)


def ivf_topk(
    ds_embeddings,
    queries: np.ndarray,
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
    train_size: int = 2048,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """IVF (inverted-file) approximate top-k: a coarse spherical-k-means
    quantizer assigns every vector to one of ``n_lists`` lists; each query
    scans only its ``n_probe`` closest lists, cutting the scanned fraction
    to ~ n_probe/n_lists.

    Training samples the first ``train_size`` vectors (bounded driver
    materialization — the trained quantizer is a (n_lists x dim) matrix
    broadcast via ray.put).  At cluster scale, the build step would
    additionally repartition vectors by list id so probes touch only the
    relevant blocks; here list pruning happens inside each batch, the same
    shape as :func:`lsh_bucketed_topk`.
    """
    queries = np.asarray(queries, dtype=np.float64)
    unit_queries = _unit_rows(queries)

    cents = _train_quantizer(ds_embeddings, train_size, n_lists, vec_col)

    # each query probes its n_probe nearest lists
    q_sims = unit_queries @ cents.T
    probe_lists = np.argsort(-q_sims, axis=1)[:, :n_probe]

    def assign_lists(batch: pa.Table, mat: np.ndarray) -> np.ndarray:
        return np.argmax(mat @ cents.T, axis=1)

    return _ann_scan(
        ds_embeddings,
        unit_queries,
        k,
        id_col,
        vec_col,
        labels_fn=assign_lists,
        probe_rows=probe_lists,
    )


def lsh_bucketed_topk(
    ds_embeddings,
    queries: np.ndarray,
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exhaustive: bool = False,
):
    """Approximate top-k: vectors bucketed by hyperplane signs; each query
    scans only its bucket and all Hamming-1 neighbor buckets.

    ``exhaustive=True`` probes EVERY bucket: the full bucketing machinery
    (plane projection, label assignment, per-bucket grouping, per-query
    merge) still runs, but the result provably equals brute force — the
    same mode-equivalence trick ``ivf_search(n_probe=n_lists)`` uses to
    value-check the approximate path against the exact DuckDB oracle."""
    queries = np.asarray(queries, dtype=np.float64)
    unit_queries = _unit_rows(queries)

    def bucket_of(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
        bits = (mat @ planes) > 0
        return bits @ (1 << np.arange(n_planes))

    qb = bucket_of(unit_queries, _hyperplanes(queries.shape[1], n_planes, 54321))
    if exhaustive:
        all_buckets = np.arange(1 << n_planes, dtype=np.int64)
        probe_rows = [all_buckets] * len(qb)
    else:
        probe_rows = [
            np.array(
                sorted({int(b)} | {int(b) ^ (1 << p) for p in range(n_planes)}),
                dtype=np.int64,
            )
            for b in qb
        ]

    def assign_buckets(batch: pa.Table, mat: np.ndarray) -> np.ndarray:
        return bucket_of(mat, _hyperplanes(mat.shape[1], n_planes, 54321))

    return _ann_scan(
        ds_embeddings,
        unit_queries,
        k,
        id_col,
        vec_col,
        labels_fn=assign_buckets,
        probe_rows=probe_rows,
    )


# ---------------------------------------------------------------------------
# IVF with a partitioned index on disk — the true cluster-scale path
# ---------------------------------------------------------------------------


def ivf_build(
    ds_embeddings,
    index_dir: str,
    n_lists: int = 16,
    train_size: int = 2048,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Build a PARTITIONED IVF index: train a coarse spherical-k-means
    quantizer, assign every vector a ``list_id``, and write the corpus as
    hive-partitioned parquet (one directory per list) plus a tiny
    ``_centroids`` table.

    This is the design :func:`ivf_topk` only simulates: at search time a
    query's ``n_probe`` lists map to partition DIRECTORIES, so the read
    itself is pruned — untouched lists never leave storage, the property
    that matters when the corpus is 100 TB and a query should touch
    n_probe/n_lists of it.  Build is one streaming pass (assign inside
    map_batches against broadcast centroids, write partitioned); the only
    driver materialization is the bounded ``train_size`` training sample.
    """
    import ray
    import ray.data

    from deduce_ray.raytune import tune_data_context

    tune_data_context()
    cents = _train_quantizer(ds_embeddings, train_size, n_lists, vec_col)
    cents_ref = ray.put(cents)

    def assign(batch: pa.Table) -> pa.Table:
        batch = drop_invalid_vector_rows(batch, id_col, vec_col)
        if batch.num_rows == 0:
            return batch.append_column("list_id", pa.array([], type=pa.int32()))
        mat = _unit_rows(_as_matrix(batch.column(vec_col)))
        lists = np.argmax(mat @ ray.get(cents_ref).T, axis=1).astype(np.int32)
        return batch.append_column("list_id", pa.array(lists))

    ds_embeddings.map_batches(assign, batch_format="pyarrow").write_parquet(
        f"{index_dir}/lists", partition_cols=["list_id"]
    )
    ray.data.from_arrow(
        pa.table(
            {
                "list_id": pa.array(range(len(cents)), type=pa.int32()),
                "centroid": pa.array(
                    [list(c) for c in cents], type=pa.list_(pa.float64())
                ),
            }
        )
    ).write_parquet(f"{index_dir}/_centroids")


def ivf_search(
    index_dir: str,
    queries: np.ndarray,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Search a :func:`ivf_build` index, reading ONLY the probed
    partitions: a PATH-level hive filter prunes whole directories before
    any file is even opened (stronger than a row filter — unprobed lists
    cost zero IO).  Within the probed lists the scan is exact, so
    ``n_probe == n_lists`` reproduces brute force exactly."""
    import pyarrow.parquet as pq
    import ray
    import ray.data
    from ray.data.datasource.partitioning import (
        Partitioning,
        PathPartitionFilter,
    )

    from deduce_ray.raytune import tune_data_context

    tune_data_context()
    cent_tbl = pq.read_table(f"{index_dir}/_centroids")
    order = np.argsort(np.asarray(cent_tbl.column("list_id").to_pylist()))
    cents = np.asarray(cent_tbl.column("centroid").to_pylist(), dtype=np.float64)[
        order
    ]

    unit_queries = _unit_rows(np.asarray(queries, dtype=np.float64))
    q_sims = unit_queries @ cents.T
    n_probe = min(n_probe, len(cents))
    probe_lists = np.argsort(-q_sims, axis=1)[:, :n_probe]
    probed = {int(x) for x in probe_lists.ravel()}
    import logging

    logging.getLogger(__name__).info(
        "ivf_search: probing %d of %d lists (%.0f%% of the index is never "
        "opened, path-level pruning)",
        len(probed),
        len(cents),
        100.0 * (1 - len(probed) / max(1, len(cents))),
    )

    # hive partition values parse as int so the per-row probe masks below
    # compare integers; the path filter is what skips unprobed directories
    ds = ray.data.read_parquet(
        f"{index_dir}/lists",
        partitioning=Partitioning("hive", field_types={"list_id": int}),
        partition_filter=PathPartitionFilter.of(
            lambda d: int(d["list_id"]) in probed, style="hive"
        ),
    )

    def read_lists(batch: pa.Table, mat: np.ndarray) -> np.ndarray:
        return np.asarray(batch.column("list_id").to_pylist(), dtype=np.int64)

    return _ann_scan(
        ds,
        unit_queries,
        k,
        id_col,
        vec_col,
        labels_fn=read_lists,
        probe_rows=probe_lists,
    )
