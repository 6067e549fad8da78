"""Incremental exact-dedup store: drop documents already seen by ANY
previous ingest, then remember the new ones — the cross-run counterpart
of :func:`deduce_ray.ops.dedup.dedup_survivors`.

A 100-TB training corpus is not ingested once; it arrives in crawls,
dumps, and backfills over months.  Within-run dedup cannot drop a
document that duplicates last month's batch, so the seen-set must
persist.  This store keeps it as hash-sharded, append-only parquet:

    store_dir/
      _meta.json                 {"version": 1, "n_shards": K}
      _ingests/<label>.json      commit manifest per completed ingest
      shard=K/<label>.parquet    (h_hi, h_lo) int64 pairs, lexsorted

Scale shape:

- The exchange carries only ``(doc_id, h_hi, h_lo, shard)`` int64 rows
  (the full 128-bit md5 as two words — the same narrow-key convention as
  ``dedup_survivors``); document payloads never shuffle.
- One groupby on the PERSISTENT shard key co-locates each incoming hash
  with the store partition that can answer "seen?".  Each per-shard task
  reads only its own ``shard=K/`` directory — at any corpus size a task
  touches 1/K of the store, and K is fixed at creation so every future
  ingest reuses the same partitioning.
- **Size K for the TARGET corpus, not the first batch**: a membership
  task holds one shard in memory (16 bytes/hash), so K must keep
  ``total_hashes * 16 / K`` under a worker's heap budget — e.g. 10^11
  documents need K >= 4096 for <=400 MB/shard — and K also caps the
  membership stage's parallelism.  The default 64 suits tests and
  single-node runs; pass ``n_shards`` at creation for cluster scale.
- Dropped ids come back to the driver in bounded sorted chunks and the
  corpus streams through the shared searchsorted anti-join
  (:func:`~deduce_ray.ops.dedup._drop_ids`) — no full-row shuffle.
- Store writes are per-shard single-writer (the shard is the group key),
  written to a temp name and atomically renamed, so a killed run leaves
  no partial file.

Crash safety hangs on the ``_ingests/`` manifests, not on filenames:
membership counts ONLY files whose label has a commit manifest (plus
``compact-*`` maintenance files), so a crashed ingest's partial shard
files are invisible — they cannot eat the crashed label's own documents
on resume, and they cannot eat a LATER label's documents if the crashed
one is abandoned.  Re-running an uncommitted label recomputes
byte-identical files (content is a deterministic function of committed
store state + incoming batch) and commits; re-running a COMMITTED label
is refused with ``ValueError`` — the repo-wide resume-refusal
convention (cf. ``materialize_graph``), because after compaction the
store can no longer reconstruct "the store as label X first saw it", so
silent re-ingest could silently return zero survivors.

Concurrency contract: ONE writer at a time (ingest or compact; labels
serialize the store's history); any number of concurrent readers.  On a
real cluster ``store_dir`` must live on storage every node mounts (NFS /
object store via fsspec); in this sandbox it is a local path.

Reference anchor: the reference engine has no cross-run state at all
(/root/reference/deduce/deduce.py processes one text per call); this
module is part of the target's training-data-pipeline surface, not a
port.
"""

from __future__ import annotations

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


def _hash_pass(text_col: str, id_col: str, n_shards: int):
    def hash_batch(batch: pa.Table) -> pa.Table:
        # the shared 128-bit content-hash convention (ops.dedup._md5_words)
        # so cross-run and within-run "duplicate" can never disagree
        from deduce_ray.ops.dedup import _md5_words

        hi, lo = _md5_words(batch.column(text_col).to_pylist())
        return pa.table(
            {
                id_col: batch.column(id_col),
                "__h_hi": pa.array(hi),
                "__h_lo": pa.array(lo),
                # np.mod follows the divisor's sign: non-negative here
                "__shard": pa.array(np.mod(hi, n_shards)),
            }
        )

    return hash_batch


def _pairs_in_store(
    hi_q: np.ndarray, lo_q: np.ndarray, hi_s: np.ndarray, lo_s: np.ndarray
) -> np.ndarray:
    """Membership of 128-bit (hi, lo) query pairs in a LEXSORTED store
    array pair.  Vectorized equal-range on ``hi``; the lo check inside a
    run is vectorized for the overwhelmingly-common run length 1 and
    falls back to a per-query scan only when two distinct store hashes
    share their top 64 bits (expected ~once per 4e9 store entries)."""
    if not len(hi_s):
        return np.zeros(len(hi_q), dtype=bool)
    left = np.searchsorted(hi_s, hi_q, side="left")
    right = np.searchsorted(hi_s, hi_q, side="right")
    run = right - left
    seen = np.zeros(len(hi_q), dtype=bool)
    one = run == 1
    if one.any():
        seen[one] = lo_s[left[one]] == lo_q[one]
    for i in np.nonzero(run > 1)[0]:
        seen[i] = lo_q[i] in lo_s[left[i] : right[i]]
    return seen


def _read_shard(
    shard_dir: str, committed: frozenset[str]
) -> tuple[np.ndarray, np.ndarray]:
    """The (hi, lo) pairs of one shard directory, lexsorted, counting
    ONLY committed labels' files (and ``compact-*`` merges) — a crashed
    ingest's partial output must not poison membership."""
    his, los = [], []
    if os.path.isdir(shard_dir):
        for name in sorted(os.listdir(shard_dir)):
            if not name.endswith(".parquet") or not is_committed_file(
                name, committed
            ):
                continue
            t = pq.read_table(
                os.path.join(shard_dir, name), columns=["h_hi", "h_lo"]
            )
            his.append(t.column("h_hi").to_numpy(zero_copy_only=False))
            los.append(t.column("h_lo").to_numpy(zero_copy_only=False))
    if not his:
        z = np.empty(0, dtype=np.int64)
        return z, z
    hi = np.concatenate(his)
    lo = np.concatenate(los)
    order = np.lexsort((lo, hi))
    return hi[order], lo[order]


class DedupStore(StoreBase):
    """Open with :meth:`create` or :meth:`open`; then :meth:`ingest`."""

    KIND = "exact"

    # -- lifecycle ---------------------------------------------------------

    @classmethod
    def create(cls, store_dir: str, n_shards: int = 64) -> "DedupStore":
        return cls._create(store_dir, {"n_shards": n_shards})

    def stats(self) -> dict[str, Any]:
        """Footer-metadata only; one store row = one seen hash, reported
        as ``n_hashes`` (see :meth:`StoreBase.stats` for the committed /
        uncommitted split)."""
        st = super().stats()
        st["n_hashes"] = st.pop("n_rows")
        return st

    # -- the operator ------------------------------------------------------

    def ingest(
        self,
        ds,
        label: str,
        text_col: str = "text",
        id_col: str = "doc_id",
        loser_broadcast_max: int = 50_000_000,
        defer_commit: bool = False,
    ):
        """Filter ``ds`` to rows never seen before (by this ingest OR any
        prior one), remember the new hashes, and return the surviving
        rows as a lazy Dataset.

        Within the ingest the minimum-id row of every distinct text
        survives (the ``dedup_survivors`` convention); a text already in
        the store keeps NO row.  ``ds`` must satisfy the module-wide
        doc-id contract (unique, non-null int64 ids) and be re-readable
        (hash pass + filter pass).

        Only COMMITTED ingests count as "seen", so re-running a label
        whose previous attempt crashed resumes it exactly; a label that
        already committed is refused (``ValueError``) — pick a new label
        per batch (see the module docstring for why silent re-ingest
        would be unsafe after compaction).

        ``defer_commit=True`` returns ``(survivors, commit)`` instead:
        the shard files are on disk but invisible until the caller
        invokes ``commit()`` — write the survivors to their destination
        FIRST, then commit, so a crash in between leaves a resumable
        uncommitted label instead of a committed batch whose output was
        never written.
        """
        committed = self._check_label(label)
        # a crashed attempt's leftovers were computed against an older
        # committed set; recompute from scratch
        self._clean_label_files(label)

        from deduce_ray.ops.dedup import _chunked_id_refs, _drop_ids

        store_dir, n_shards = self.store_dir, self.n_shards
        label_file = f"{label}.parquet"

        def per_shard(tbl: pa.Table) -> pa.Table:
            if not tbl.num_rows:
                return tbl.select([id_col])
            shard = tbl.column("__shard")[0].as_py()
            tbl = tbl.sort_by(
                [
                    ("__h_hi", "ascending"),
                    ("__h_lo", "ascending"),
                    (id_col, "ascending"),
                ]
            )
            hi = tbl.column("__h_hi").to_numpy(zero_copy_only=False)
            lo = tbl.column("__h_lo").to_numpy(zero_copy_only=False)
            ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
            first = np.ones(len(hi), dtype=bool)
            first[1:] = (hi[1:] != hi[:-1]) | (lo[1:] != lo[:-1])

            shard_dir = os.path.join(store_dir, f"shard={shard}")
            hi_s, lo_s = _read_shard(shard_dir, committed)
            seen_first = _pairs_in_store(hi[first], lo[first], hi_s, lo_s)

            # write the shard's NEW hashes (first occurrence, unseen),
            # already (hi, lo)-sorted by construction
            new_hi = hi[first][~seen_first]
            if len(new_hi):
                out = pa.table(
                    {"h_hi": pa.array(new_hi), "h_lo": pa.array(lo[first][~seen_first])}
                )
                atomic_write_parquet(out, os.path.join(shard_dir, label_file))

            # losers: within-ingest non-firsts, plus every member of a
            # store-seen hash run (propagate the run's seen flag)
            drop = ~first | _propagate_runs(seen_first, first)
            return pa.table({id_col: pa.array(ids[drop])})

        hashes = ds.map_batches(
            _hash_pass(text_col, id_col, n_shards),
            batch_format="pyarrow",
            batch_size=65536,
            num_cpus=0.9,
        )
        losers = hashes.groupby("__shard").map_groups(
            per_shard, batch_format="pyarrow"
        )
        # pulling the loser chunks FORCES the groupby, so every shard file
        # is on disk before the manifest commits
        refs = _chunked_id_refs(losers, id_col, loser_broadcast_max)
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
        """Merge each shard's COMMITTED files into one (single-writer
        maintenance; do not run concurrently with an ingest).  An
        uncommitted label's partial files are left untouched — they
        belong to a crashed ingest that may still resume, and folding
        them into a compact file would wrongly promote them to committed
        membership.  Membership is a set union, so a crash mid-compact
        (new file written, old not yet removed) leaves duplicate hashes
        that are harmless to readers and removed by the next compact."""
        committed = frozenset(self.ingests())
        n = len(committed)
        for k in range(self.n_shards):
            shard_dir = os.path.join(self.store_dir, f"shard={k}")
            if not os.path.isdir(shard_dir):
                continue
            names = sorted(
                f
                for f in os.listdir(shard_dir)
                if f.endswith(".parquet") and is_committed_file(f, committed)
            )
            if len(names) <= 1:
                continue
            hi, lo = _read_shard(shard_dir, committed)
            # drop the harmless duplicates a previous crashed compact left
            keep = np.ones(len(hi), dtype=bool)
            keep[1:] = (hi[1:] != hi[:-1]) | (lo[1:] != lo[:-1])
            out = pa.table({"h_hi": pa.array(hi[keep]), "h_lo": pa.array(lo[keep])})
            compact_file = f"compact-{n}-{k}.parquet"
            atomic_write_parquet(out, os.path.join(shard_dir, compact_file))
            for name in names:
                if name != compact_file:
                    os.remove(os.path.join(shard_dir, name))


def _propagate_runs(seen_first: np.ndarray, first: np.ndarray) -> np.ndarray:
    """Spread each hash-run's ``seen`` flag (one entry per run, in run
    order) to every row of the run (rows are sorted so a run is
    contiguous and starts where ``first`` is True)."""
    run_idx = np.cumsum(first) - 1
    return seen_first[run_idx]


def incremental_dedup(
    ds,
    store_dir: str,
    label: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_shards: int = 64,
    loser_broadcast_max: int = 50_000_000,
    defer_commit: bool = False,
):
    """Convenience wrapper: open (or create) the store at ``store_dir``
    and ingest ``ds`` under ``label``; returns the surviving Dataset (or
    ``(survivors, commit)`` with ``defer_commit=True``).  ``label`` must
    be fresh (or the uncommitted leftover of a crashed run) — a
    committed label raises ``ValueError``."""
    if os.path.exists(os.path.join(store_dir, META_FILE)):
        store = DedupStore.open(store_dir)
    else:
        store = DedupStore.create(store_dir, n_shards=n_shards)
    return store.ingest(
        ds,
        label,
        text_col=text_col,
        id_col=id_col,
        loser_broadcast_max=loser_broadcast_max,
        defer_commit=defer_commit,
    )
