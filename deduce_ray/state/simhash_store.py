"""Incremental NEAR-dup store: drop documents whose SimHash is within
``max_hamming`` of any document retained by a previous committed ingest,
then remember the survivors' signatures — the cross-run counterpart of
:func:`deduce_ray.ops.dedup.simhash_pairs`.

Boilerplate mutates between crawls (dates bumped, one URL swapped):
exact cross-run dedup (:class:`~deduce_ray.state.dedup_store.DedupStore`)
misses those, so a persistent near-dup index is the second half of the
incremental story.  SimHash is the right sketch for a persistent store:
8 bytes per document (vs ``8 * n_perm`` for MinHash), and the 4x16-bit
band decomposition guarantees recall for Hamming distance <= 3 — every
such pair agrees exactly on at least one band (pigeonhole).

Layout (same manifest-commit protocol as the exact store, see
:mod:`deduce_ray.state.base`):

    store_dir/
      _meta.json                 {"kind": "simhash", "n_shards": K,
                                  "max_hamming": 3}
      _ingests/<label>.json
      shard=K/<label>.parquet    (bucket int32, doc_id int64,
                                  sig uint64), bucket-sorted

One store row per (document, band) — 4 rows x ~20 bytes per retained
document, signature inline so candidate verification happens inside the
band-shard task with no second lookup.

Scale shape per ingest (two exchanges):

1. Signature pass (``map_batches``): 4 narrow band rows per doc; the
   band table is MATERIALIZED (object-store spill is fine — it is 2-3%
   of corpus bytes) so phases 2 and 3 never recompute signatures.
2. Membership groupby on the persistent shard key: each task loads its
   shard's committed rows (bucket-sorted), finds bucket collisions with
   vectorized equal-range + one XOR/popcount pass, and emits the ids of
   incoming docs within ``max_hamming`` of a stored signature.
3. Survivor append: the band table minus losers, grouped by the SAME
   shard key, written per shard (atomic, deterministic) — a second
   groupby is unavoidable because a doc's 4 bands land in 4 different
   shards and ANY of them can kill it; a shard cannot know the doc's
   fate until all shards have voted.

Semantics and caveats:

- Within-ingest near-dups are NOT removed (two mutually-near new docs
  are both retained and both recorded): run the prep funnel's
  within-batch near-dedup first; this store answers "near anything
  retained BEFORE".
- Word-less documents have no signature, always survive, and are never
  recorded (mirrors ``simhash_pairs``' empty-doc guard).
- A pathologically hot stored bucket (thousands of near-identical
  retained docs sharing a band value) makes every colliding incoming
  doc verify against all of them.  The funnel + exact store keep
  retained density low by construction; ``max_candidates_per_doc``
  optionally caps verification fan-out per incoming band row with a
  logged drop (recall, not precision, degrades).

Reference anchor: the reference engine has no cross-run state
(/root/reference/deduce/deduce.py) — target-surface addition, not a
port.
"""

from __future__ import annotations

import logging
import os
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from deduce_ray.state.base import (
    META_FILE,
    StoreBase,
    atomic_write_parquet,
    is_committed_file,
)

logger = logging.getLogger(__name__)


def _band_pass(text_col: str, id_col: str, n_shards: int):
    """4 band rows per doc: (shard, bucket, doc_id, sig) — the banding
    itself comes from :func:`deduce_ray.ops.dedup.simhash_band_rows`, the
    single source of the recall-critical decomposition."""

    def bands(batch: pa.Table) -> pa.Table:
        from deduce_ray.ops.dedup import simhash_band_rows

        shard, bucket, ids, sigs = simhash_band_rows(
            batch.column(id_col).to_pylist(),
            batch.column(text_col).to_pylist(),
            n_shards,
        )
        return pa.table(
            {
                "__shard": pa.array(shard, type=pa.int32()),
                "bucket": pa.array(bucket, type=pa.int32()),
                id_col: pa.array(ids, type=pa.int64()),
                "sig": pa.array(sigs, type=pa.uint64()),
            }
        )

    return bands


def _read_shard_rows(
    shard_dir: str, committed: frozenset[str]
) -> tuple[np.ndarray, np.ndarray]:
    """(bucket, sig) of one shard's committed rows, bucket-sorted."""
    buckets, sigs = [], []
    if os.path.isdir(shard_dir):
        for name in sorted(os.listdir(shard_dir)):
            if not name.endswith(".parquet") or not is_committed_file(
                name, committed
            ):
                continue
            t = pq.read_table(
                os.path.join(shard_dir, name), columns=["bucket", "sig"]
            )
            buckets.append(t.column("bucket").to_numpy(zero_copy_only=False))
            sigs.append(t.column("sig").to_numpy(zero_copy_only=False))
    if not buckets:
        return np.empty(0, dtype=np.int32), np.empty(0, dtype=np.uint64)
    b = np.concatenate(buckets)
    s = np.concatenate(sigs)
    order = np.argsort(b, kind="stable")
    return b[order], s[order]


def _hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = (a ^ b).astype(np.uint64)
    return (
        np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1)
        .sum(axis=1)
        .astype(np.int64)
    )


class SimHashStore(StoreBase):
    """Open with :meth:`create` or :meth:`open`; then :meth:`ingest`."""

    KIND = "simhash"

    @classmethod
    def create(
        cls, store_dir: str, n_shards: int = 64, max_hamming: int = 3
    ) -> "SimHashStore":
        if not 0 <= max_hamming <= 3:
            # the 4x16 band decomposition only guarantees recall to 3
            raise ValueError("max_hamming must be in [0, 3]")
        return cls._create(
            store_dir, {"n_shards": n_shards, "max_hamming": max_hamming}
        )

    def stats(self) -> dict[str, Any]:
        st = super().stats()
        st["max_hamming"] = int(self.meta["max_hamming"])
        # one retained doc = 4 band rows
        st["n_docs"] = st["n_rows"] // 4
        return st

    def _band_pass(self, col: str, id_col: str):
        """The (shard, bucket, id, sig) row generator — subclasses swap
        the signature source (text SimHash here, embedding hyperplane
        bits in :class:`~deduce_ray.state.embedding_store.EmbeddingLSHStore`)
        while keeping the whole band/membership/commit machinery."""
        return _band_pass(col, id_col, self.n_shards)

    def ingest(
        self,
        ds,
        label: str,
        text_col: str = "text",
        id_col: str = "doc_id",
        loser_broadcast_max: int = 50_000_000,
        max_candidates_per_band: int | None = None,
        defer_commit: bool = False,
    ):
        """Filter ``ds`` to rows NOT near-duplicate (Hamming <=
        ``max_hamming``) of any previously-retained document, remember
        the survivors' signatures, and return the survivors lazily.

        ``ds`` must satisfy the doc-id contract (unique, non-null int64
        ids) and be re-readable (signature pass + filter pass).  Labels
        follow the store protocol: fresh per batch, crashed-label re-runs
        resume (stale partials are recomputed — signatures of
        since-dropped docs must not linger), committed-label re-runs are
        refused.  ``max_candidates_per_band`` caps verification fan-out
        per incoming BAND ROW (a doc has 4, so up to 4x the cap per doc)
        against a pathologically hot stored bucket, with a logged drop —
        recall, not precision, degrades.  ``defer_commit=True`` returns
        ``(survivors, commit)``: write the survivors to their destination
        first, then call ``commit()`` (see ``DedupStore.ingest``).

        Subclasses reinterpret ``text_col`` as their signature-source
        column (the embedding store passes its vector column) and swap
        :meth:`_band_pass`; everything below is shared.
        """
        committed = self._check_label(label)
        # recompute a crashed attempt from scratch: its leftover files
        # may hold signatures of docs that a LATER committed ingest now
        # near-duplicates — committing them would record never-retained
        # docs and wrongly drop their future neighbors (hamming is not
        # transitive)
        self._clean_label_files(label)

        from deduce_ray.ops.dedup import _chunked_id_refs, _drop_ids

        store_dir = self.store_dir
        max_hamming = int(self.meta["max_hamming"])
        label_file = f"{label}.parquet"

        def find_losers(tbl: pa.Table) -> pa.Table:
            if not tbl.num_rows:
                return pa.table({id_col: pa.array([], type=pa.int64())})
            shard = tbl.column("__shard")[0].as_py()
            b_s, sig_s = _read_shard_rows(
                os.path.join(store_dir, f"shard={shard}"), committed
            )
            if not len(b_s):
                return pa.table({id_col: pa.array([], type=pa.int64())})
            b_q = tbl.column("bucket").to_numpy(zero_copy_only=False)
            sig_q = tbl.column("sig").to_numpy(zero_copy_only=False)
            ids_q = tbl.column(id_col).to_numpy(zero_copy_only=False)
            left = np.searchsorted(b_s, b_q, side="left")
            right = np.searchsorted(b_s, b_q, side="right")
            runs = right - left
            if max_candidates_per_band is not None:
                over = runs > max_candidates_per_band
                if over.any():
                    logger.warning(
                        "simhash store shard %d: capping %d band rows at "
                        "%d candidates each (hot stored bucket; recall "
                        "may drop)",
                        shard,
                        int(over.sum()),
                        max_candidates_per_band,
                    )
                    runs = np.minimum(runs, max_candidates_per_band)
            total = int(runs.sum())
            if not total:
                return pa.table({id_col: pa.array([], type=pa.int64())})
            # expand equal-ranges to flat candidate (query, store) pairs:
            # store index = left[q] + offset within the run
            q_idx = np.repeat(np.arange(len(b_q)), runs)
            starts = np.repeat(left, runs)
            offs = np.arange(total) - np.repeat(
                np.cumsum(runs) - runs, runs
            )
            s_idx = starts + offs
            near = _hamming64(sig_q[q_idx], sig_s[s_idx]) <= max_hamming
            return pa.table(
                {id_col: pa.array(np.unique(ids_q[q_idx[near]]))}
            )

        def write_shard(tbl: pa.Table) -> pa.Table:
            n = tbl.num_rows
            if n:
                shard = tbl.column("__shard")[0].as_py()
                # canonical column names on disk regardless of the
                # caller's id_col — compact() and future readers depend
                # on (bucket, doc_id, sig)
                out = (
                    tbl.select(["bucket", id_col, "sig"])
                    .rename_columns(["bucket", "doc_id", "sig"])
                    .sort_by(
                        [("bucket", "ascending"), ("doc_id", "ascending")]
                    )
                )
                atomic_write_parquet(
                    out,
                    os.path.join(store_dir, f"shard={shard}", label_file),
                )
            return pa.table({"rows": pa.array([n], type=pa.int64())})

        bands = ds.map_batches(
            self._band_pass(text_col, id_col),
            batch_format="pyarrow",
            batch_size=65536,
            num_cpus=0.9,
        ).materialize()  # 4 narrow rows/doc; phases 2+3 both consume it

        losers = bands.groupby("__shard").map_groups(
            find_losers, batch_format="pyarrow"
        )
        refs = _chunked_id_refs(losers, id_col, loser_broadcast_max)

        survivors_bands = _drop_ids(bands, refs, id_col) if refs else bands
        # count() forces every shard file onto disk before the commit
        survivors_bands.groupby("__shard").map_groups(
            write_shard, batch_format="pyarrow"
        ).count()

        import ray

        # zero-copy plasma reads; records the drop count in the manifest
        n_dropped = sum(len(ray.get(r)) for r in refs)
        survivors = _drop_ids(ds, refs, id_col) if refs else ds
        commit = lambda: self._commit(label, {"n_dropped": n_dropped})
        if defer_commit:
            return survivors, commit
        commit()
        return survivors

    def compact(self) -> None:
        """Merge each shard's COMMITTED files (single-writer maintenance;
        not during an ingest; uncommitted partials left untouched).
        Duplicate rows from a crashed compact are harmless to membership
        and removed by the next compact."""
        committed = frozenset(self.ingests())
        n = len(committed)
        for k in range(self.n_shards):
            shard_dir = self._shard_dir(k)
            files = self._committed_files(shard_dir, committed)
            if len(files) <= 1:
                continue
            t = pa.concat_tables(pq.read_table(f) for f in files)
            t = t.sort_by(
                [("bucket", "ascending"), ("doc_id", "ascending")]
            )
            # consecutive-duplicate mask (the DedupStore.compact pattern):
            # equal (bucket, doc_id) rows necessarily carry the same sig
            b = t.column("bucket").to_numpy(zero_copy_only=False)
            d = t.column("doc_id").to_numpy(zero_copy_only=False)
            keep = np.ones(len(b), dtype=bool)
            keep[1:] = (b[1:] != b[:-1]) | (d[1:] != d[:-1])
            out = t.filter(pa.array(keep))
            compact_file = f"compact-{n}-{k}.parquet"
            path = os.path.join(shard_dir, compact_file)
            atomic_write_parquet(out, path)
            for f in files:
                if os.path.basename(f) != compact_file:
                    os.remove(f)


def incremental_neardup(
    ds,
    store_dir: str,
    label: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_shards: int = 64,
    max_hamming: int = 3,
    loser_broadcast_max: int = 50_000_000,
    max_candidates_per_band: int | None = None,
    defer_commit: bool = False,
):
    """Convenience wrapper: open (or create) the simhash store at
    ``store_dir`` and ingest ``ds`` under ``label``; returns the
    surviving Dataset (or ``(survivors, commit)`` with
    ``defer_commit=True``).  ``label`` must be fresh (or the uncommitted
    leftover of a crashed run)."""
    if os.path.exists(os.path.join(store_dir, META_FILE)):
        store = SimHashStore.open(store_dir)
    else:
        store = SimHashStore.create(
            store_dir, n_shards=n_shards, max_hamming=max_hamming
        )
    return store.ingest(
        ds,
        label,
        max_candidates_per_band=max_candidates_per_band,
        defer_commit=defer_commit,
        text_col=text_col,
        id_col=id_col,
        loser_broadcast_max=loser_broadcast_max,
    )
