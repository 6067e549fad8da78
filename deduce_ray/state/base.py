"""Shared machinery for persistent stores: meta files, commit manifests,
committed-membership file filtering, atomic writes.

The crash-safety contract every store here follows:

- ``_meta.json`` (atomic write) fixes the store's immutable parameters
  (shard count, signature config) at creation.
- Each completed ingest writes ``_ingests/<label>.json`` (atomic) AFTER
  all its shard files are on disk.
- Readers count ONLY files whose label has a manifest (plus ``compact-*``
  maintenance merges): a crashed ingest's partial files are invisible.
- Re-running an uncommitted label resumes it (file contents are a
  deterministic function of committed state + input); re-running a
  committed label raises ``ValueError`` (the repo-wide resume-refusal
  convention — after compaction the pre-label store state is gone, so a
  silent re-ingest could silently drop everything).
"""

from __future__ import annotations

import json
import os
from typing import Any

import pyarrow.parquet as pq

META_FILE = "_meta.json"
INGESTS_DIR = "_ingests"
VERSION = 1
LEGACY_KIND = "exact"  # the only store kind that predates the meta field


def is_committed_file(name: str, committed: frozenset[str]) -> bool:
    stem = name[: -len(".parquet")]
    return stem in committed or stem.startswith("compact-")


def atomic_write_json(path: str, payload: dict) -> None:
    tmp = path + f".tmp-{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, path)


def atomic_write_parquet(table, path: str) -> None:
    d, name = os.path.split(path)
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".{name}.tmp-{os.getpid()}")
    pq.write_table(table, tmp)
    os.replace(tmp, path)


class StoreBase:
    """Common lifecycle for manifest-committed sharded parquet stores."""

    KIND = ""  # subclasses set a discriminator recorded in _meta.json

    def __init__(self, store_dir: str, meta: dict) -> None:
        self.store_dir = store_dir
        self.meta = meta
        self.n_shards = int(meta["n_shards"])

    @classmethod
    def _create(cls, store_dir: str, extra_meta: dict) -> "StoreBase":
        n_shards = int(extra_meta.get("n_shards", 0))
        if n_shards < 1:
            raise ValueError("n_shards must be >= 1")
        meta_path = os.path.join(store_dir, META_FILE)
        if os.path.exists(meta_path):
            raise ValueError(f"store already exists at {store_dir}")
        os.makedirs(os.path.join(store_dir, INGESTS_DIR), exist_ok=True)
        meta = {"version": VERSION, "kind": cls.KIND, **extra_meta}
        atomic_write_json(meta_path, meta)
        return cls(store_dir, meta)

    @classmethod
    def open(cls, store_dir: str) -> "StoreBase":
        with open(os.path.join(store_dir, META_FILE)) as f:
            meta = json.load(f)
        if meta.get("version") != VERSION:
            raise ValueError(
                f"store version {meta.get('version')} != supported {VERSION}"
            )
        # stores created before the 'kind' field are all exact dedup
        # stores — defaulting to the OPENER's kind would let SimHashStore
        # silently adopt (and then corrupt) a legacy exact store
        kind = meta.get("kind", LEGACY_KIND)
        if kind != cls.KIND:
            raise ValueError(
                f"store at {store_dir} is kind {kind!r}, not {cls.KIND!r}"
            )
        return cls(store_dir, meta)

    # -- manifests ---------------------------------------------------------

    def ingests(self) -> list[str]:
        d = os.path.join(self.store_dir, INGESTS_DIR)
        if not os.path.isdir(d):
            return []
        return sorted(
            name[: -len(".json")]
            for name in os.listdir(d)
            if name.endswith(".json")
        )

    def ingest_info(self, label: str) -> dict:
        """The commit manifest of one completed ingest (label, kind,
        and operational counters like ``n_dropped``)."""
        with open(
            os.path.join(self.store_dir, INGESTS_DIR, f"{label}.json")
        ) as f:
            return json.load(f)

    def _commit(self, label: str, extra: dict | None = None) -> None:
        d = os.path.join(self.store_dir, INGESTS_DIR)
        os.makedirs(d, exist_ok=True)
        atomic_write_json(
            os.path.join(d, f"{label}.json"),
            {
                "label": label,
                "version": VERSION,
                "kind": self.KIND,
                **(extra or {}),
            },
        )

    def _check_label(self, label: str) -> frozenset[str]:
        """Validate + refuse committed labels; returns the committed set."""
        if (
            not label
            or label.startswith((".", "compact-"))
            or any(c in label for c in "/\\\0")
        ):
            raise ValueError(
                f"label must be a plain filename stem not starting with "
                f"'.' or 'compact-': {label!r}"
            )
        committed = frozenset(self.ingests())
        if label in committed:
            raise ValueError(
                f"ingest label {label!r} already committed to this store; "
                "each batch needs a fresh label (re-running is only "
                "supported for a label whose previous attempt crashed "
                "before commit)"
            )
        return committed

    # -- files -------------------------------------------------------------

    def _shard_dir(self, k: int) -> str:
        return os.path.join(self.store_dir, f"shard={k}")

    def _clean_label_files(self, label: str) -> None:
        """Remove a label's uncommitted shard files before re-ingesting
        it.  A crashed attempt's files were computed against the
        committed set AS OF that attempt; if other labels committed in
        between, a shard that now has nothing new to write would leave
        the STALE file visible at commit — recording rows for documents
        this attempt no longer retains (harmless duplicate hashes for
        the exact store, but wrong membership for signature stores)."""
        name = f"{label}.parquet"
        for k in range(self.n_shards):
            path = os.path.join(self._shard_dir(k), name)
            if os.path.exists(path):
                os.remove(path)

    @staticmethod
    def _committed_files(shard_dir: str, committed: frozenset[str]) -> list[str]:
        if not os.path.isdir(shard_dir):
            return []
        return sorted(
            os.path.join(shard_dir, f)
            for f in os.listdir(shard_dir)
            if f.endswith(".parquet") and is_committed_file(f, committed)
        )

    def stats(self) -> dict[str, Any]:
        """Footer-metadata only — opens no data pages.  Rows/files count
        COMMITTED membership; a crashed label's leftovers are reported
        separately as ``n_uncommitted_files``."""
        committed = frozenset(self.ingests())
        n_rows = 0
        n_files = 0
        n_uncommitted = 0
        for k in range(self.n_shards):
            shard_dir = self._shard_dir(k)
            if not os.path.isdir(shard_dir):
                continue
            for name in os.listdir(shard_dir):
                if not name.endswith(".parquet"):
                    continue
                if not is_committed_file(name, committed):
                    n_uncommitted += 1
                    continue
                n_files += 1
                n_rows += pq.ParquetFile(
                    os.path.join(shard_dir, name)
                ).metadata.num_rows
        return {
            "kind": self.KIND,
            "n_shards": self.n_shards,
            "n_rows": n_rows,
            "n_files": n_files,
            "n_uncommitted_files": n_uncommitted,
            "ingests": sorted(committed),
        }
