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


def _embedding_band_pass(
    vec_col: str, id_col: str, n_shards: int, dim: int, planes: np.ndarray
):
    # ``planes`` is the PERSISTED (dim, 64) matrix from the store dir —
    # captured in the closure, so the ~8 KB ships once with the task
    def bands(batch: pa.Table) -> pa.Table:
        from deduce_ray.ops.dedup import _vec_matrix, sig_band_rows

        mat = _vec_matrix(batch.column(vec_col))
        if mat.shape[0]:
            if mat.ndim != 2:
                raise ValueError(
                    f"embedding column {vec_col!r} has null or ragged "
                    "rows — the store indexes fixed-dim vectors only"
                )
            if mat.shape[1] != dim:
                raise ValueError(
                    f"embedding dim {mat.shape[1]} != store dim {dim}"
                )
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        norms = np.linalg.norm(mat, axis=1) if mat.shape[0] else np.empty(0)
        keep = norms > 0  # zero vectors: like word-less docs, never indexed
        mat, ids = mat[keep], ids[keep].astype(np.int64)
        if len(ids):
            bits = (mat @ planes) > 0  # (n, 64)
            sigs = np.packbits(bits, axis=1).view(">u8").ravel().astype(np.uint64)
        else:
            sigs = np.empty(0, dtype=np.uint64)
        shard, bucket = sig_band_rows(sigs, n_shards)
        return pa.table(
            {
                "__shard": pa.array(shard.astype(np.int32)),
                "bucket": pa.array(bucket.astype(np.int32)),
                id_col: pa.array(np.tile(ids, 4)),
                "sig": pa.array(np.tile(sigs, 4)),
            }
        )

    return bands


class EmbeddingLSHStore(SimHashStore):
    """Open with :meth:`create` or :meth:`open`; then :meth:`ingest`
    (pass ``text_col`` as the embedding list<float> column name)."""

    KIND = "embedding_lsh"

    PLANES_FILE = "_planes.npy"

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
        store = cls._create(
            store_dir,
            {"n_shards": n_shards, "max_hamming": max_hamming, "dim": dim},
        )
        # PERSIST the hyperplanes: NumPy does not guarantee Generator
        # streams across versions (NEP 19), so regenerating them per run
        # could silently change every signature and collapse recall to
        # ~0 against the stored ones.  ~8 KB, written once, atomic.
        from deduce_ray.ops.dedup import _lsh_planes

        planes = np.ascontiguousarray(_lsh_planes(dim, 64, 1)[0])
        path = os.path.join(store_dir, cls.PLANES_FILE)
        tmp = path + f".tmp-{os.getpid()}"
        np.save(tmp, planes, allow_pickle=False)
        os.replace(tmp + ".npy", path)
        return store

    def planes(self) -> np.ndarray:
        return np.load(
            os.path.join(self.store_dir, self.PLANES_FILE),
            allow_pickle=False,
        )

    def _band_pass(self, col: str, id_col: str):
        return _embedding_band_pass(
            col, id_col, self.n_shards, int(self.meta["dim"]), self.planes()
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
    max_candidates_per_band: int | None = None,
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
        max_candidates_per_band=max_candidates_per_band,
        defer_commit=defer_commit,
    )
