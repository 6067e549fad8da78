"""Incremental near-dup store over EMBEDDINGS: drop rows whose vector is
close (cosine) to any previously-retained row's vector — the cross-run
counterpart of :func:`deduce_ray.ops.dedup.embedding_neardup_pairs`.

The signature is 64 hyperplane sign bits (the deterministic seeded
planes shared with the in-batch embedding LSH): for unit vectors,
``P(bit differs) = angle / pi``, so cosine-near vectors land within a
few Hamming bits and the whole :class:`SimHashStore` machinery — 4x16
band rows with inline signatures, manifest commits, crash-resume,
compaction — applies unchanged.  Only the band pass differs.

Unlike text SimHash (where Hamming <= 3 IS the dedup criterion), the
Hamming test here is a probabilistic proxy for cosine similarity:
``max_hamming`` trades recall against false drops (3 bits of 64 ~
cosine >= cos(3pi/64) ~ 0.989 in expectation).  For an exact-threshold
in-batch dedup use ``embedding_neardup_pairs``; this store is the
approximate cross-run gate where re-verifying against raw stored
vectors would mean persisting the vectors themselves (dim x 8 bytes/row
instead of 8).

Vector dim is fixed at creation (recorded in ``_meta.json``) — the
hyperplanes depend on it, so mixing dims would silently compare
incompatible signatures; ingest validates every batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from deduce_ray.state.base import META_FILE
from deduce_ray.state.simhash_store import SimHashStore

import os


def _embedding_band_pass(vec_col: str, id_col: str, n_shards: int, dim: int):
    def bands(batch: pa.Table) -> pa.Table:
        from deduce_ray.ops.dedup import _lsh_planes, _vec_matrix

        mat = _vec_matrix(batch.column(vec_col))
        if mat.shape[0] and mat.shape[1] != dim:
            raise ValueError(
                f"embedding dim {mat.shape[1]} != store dim {dim}"
            )
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        norms = np.linalg.norm(mat, axis=1) if mat.shape[0] else np.empty(0)
        keep = norms > 0  # zero vectors: like word-less docs, never indexed
        mat, ids = mat[keep], ids[keep]
        out_shard, out_bucket, out_id, out_sig = [], [], [], []
        if len(ids):
            planes = _lsh_planes(dim, 64, 1)[0]  # (dim, 64), seeded
            bits = (mat @ planes) > 0  # (n, 64)
            sigs = np.packbits(bits, axis=1).view(">u8").ravel().astype(np.uint64)
            for band in range(4):
                chunk = (sigs >> np.uint64(band * 16)) & np.uint64(0xFFFF)
                bucket = (band * 65536 + chunk.astype(np.int64)).astype(np.int64)
                out_shard.append(bucket % n_shards)
                out_bucket.append(bucket)
                out_id.append(ids.astype(np.int64))
                out_sig.append(sigs)
        if out_shard:
            shard = np.concatenate(out_shard)
            bucket = np.concatenate(out_bucket)
            rid = np.concatenate(out_id)
            sig = np.concatenate(out_sig)
        else:
            shard = np.empty(0, dtype=np.int64)
            bucket = np.empty(0, dtype=np.int64)
            rid = np.empty(0, dtype=np.int64)
            sig = np.empty(0, dtype=np.uint64)
        return pa.table(
            {
                "__shard": pa.array(shard.astype(np.int32)),
                "bucket": pa.array(bucket.astype(np.int32)),
                id_col: pa.array(rid),
                "sig": pa.array(sig),
            }
        )

    return bands


class EmbeddingLSHStore(SimHashStore):
    """Open with :meth:`create` or :meth:`open`; then :meth:`ingest`
    (pass ``text_col`` as the embedding list<float> column name)."""

    KIND = "embedding_lsh"

    @classmethod
    def create(
        cls,
        store_dir: str,
        dim: int,
        n_shards: int = 64,
        max_hamming: int = 3,
    ) -> "EmbeddingLSHStore":
        if dim < 1:
            raise ValueError("dim must be >= 1")
        if not 0 <= max_hamming <= 3:
            raise ValueError("max_hamming must be in [0, 3]")
        return cls._create(
            store_dir,
            {"n_shards": n_shards, "max_hamming": max_hamming, "dim": dim},
        )

    def _band_pass(self, col: str, id_col: str):
        return _embedding_band_pass(
            col, id_col, self.n_shards, int(self.meta["dim"])
        )

    def ingest(
        self,
        ds,
        label: str,
        text_col: str = "embedding",  # the vector column (inherited name)
        id_col: str = "vec_id",
        loser_broadcast_max: int = 50_000_000,
        max_candidates_per_band: int | None = None,
        defer_commit: bool = False,
    ):
        return super().ingest(
            ds,
            label,
            text_col=text_col,
            id_col=id_col,
            loser_broadcast_max=loser_broadcast_max,
            max_candidates_per_band=max_candidates_per_band,
            defer_commit=defer_commit,
        )

    def stats(self) -> dict:
        st = super().stats()
        st["dim"] = int(self.meta["dim"])
        return st


def incremental_embedding_neardup(
    ds,
    store_dir: str,
    label: str,
    dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_shards: int = 64,
    max_hamming: int = 3,
    loser_broadcast_max: int = 50_000_000,
    defer_commit: bool = False,
):
    """Convenience wrapper mirroring :func:`incremental_neardup` for the
    embedding store; ``dim`` is required (fixed at creation)."""
    if os.path.exists(os.path.join(store_dir, META_FILE)):
        store = EmbeddingLSHStore.open(store_dir)
    else:
        store = EmbeddingLSHStore.create(
            store_dir, dim=dim, n_shards=n_shards, max_hamming=max_hamming
        )
    return store.ingest(
        ds,
        label,
        text_col=vec_col,
        id_col=id_col,
        loser_broadcast_max=loser_broadcast_max,
        defer_commit=defer_commit,
    )
