"""Incremental dedup store: cross-ingest filtering, resume, compaction."""

import os

import numpy as np
import pytest

from deduce_ray.state.dedup_store import (
    DedupStore,
    _pairs_in_store,
    incremental_dedup,
)


def _corpus(rows):
    import ray

    return ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in rows]
    )


def _ids(ds):
    return sorted(r["doc_id"] for r in ds.take_all())


class TestDedupStore:
    def test_first_ingest_keeps_min_id_per_text(self, ray_session, tmp_path):
        store = DedupStore.create(str(tmp_path / "s"), n_shards=4)
        ds = _corpus([(3, "aa"), (1, "bb"), (2, "aa"), (7, "cc"), (5, "bb")])
        out = store.ingest(ds, "batch1")
        assert _ids(out) == [1, 2, 7]
        st = store.stats()
        assert st["n_hashes"] == 3
        assert st["ingests"] == ["batch1"]

    def test_second_ingest_drops_previously_seen(self, ray_session, tmp_path):
        store = DedupStore.create(str(tmp_path / "s"), n_shards=4)
        store.ingest(_corpus([(1, "aa"), (2, "bb")]), "b1").materialize()
        out = store.ingest(
            _corpus([(10, "aa"), (11, "new"), (12, "bb"), (13, "new")]), "b2"
        )
        # both previously-seen texts keep NO row; "new" keeps its min id
        assert _ids(out) == [11]
        assert store.stats()["n_hashes"] == 3
        assert store.ingests() == ["b1", "b2"]

    def test_reingest_committed_label_refused(self, ray_session, tmp_path):
        store = DedupStore.create(str(tmp_path / "s"), n_shards=4)
        store.ingest(_corpus([(1, "aa")]), "b1").materialize()
        with pytest.raises(ValueError, match="already committed"):
            store.ingest(_corpus([(2, "bb")]), "b1")

    def test_crash_before_commit_resumes(self, ray_session, tmp_path):
        """Shard files on disk but no manifest (the crash window): the
        re-run must not let the partial attempt's own hashes eat the
        documents that produced them."""
        store = DedupStore.create(str(tmp_path / "s"), n_shards=4)
        batch = [(1, "aa"), (2, "bb"), (3, "aa")]
        survivors = _ids(store.ingest(_corpus(batch), "b1"))
        manifest = tmp_path / "s" / "_ingests" / "b1.json"
        os.remove(manifest)  # simulate dying before commit
        assert store.ingests() == []
        redo = _ids(store.ingest(_corpus(batch), "b1"))
        assert redo == survivors == [1, 2]
        assert store.ingests() == ["b1"]

    def test_abandoned_crashed_label_is_invisible(self, ray_session, tmp_path):
        """A crashed (uncommitted) ingest's partial shard files must not
        count as seen for a LATER label — its documents were never
        retained by any completed run."""
        store = DedupStore.create(str(tmp_path / "s"), n_shards=4)
        store.ingest(_corpus([(1, "aa")]), "crashed").materialize()
        os.remove(tmp_path / "s" / "_ingests" / "crashed.json")
        out = store.ingest(_corpus([(5, "aa"), (6, "zz")]), "b2")
        assert _ids(out) == [5, 6]
        st = store.stats()
        assert st["n_uncommitted_files"] == 1
        assert st["ingests"] == ["b2"]

    def test_null_text_hashes_as_empty(self, ray_session, tmp_path):
        store = DedupStore.create(str(tmp_path / "s"), n_shards=2)
        out = store.ingest(_corpus([(5, None), (2, ""), (9, "x")]), "b1")
        # None and "" are the same document content; min id 2 survives
        assert _ids(out) == [2, 9]

    def test_compact_preserves_membership(self, ray_session, tmp_path):
        store = DedupStore.create(str(tmp_path / "s"), n_shards=2)
        store.ingest(_corpus([(1, "aa"), (2, "bb")]), "b1").materialize()
        store.ingest(_corpus([(3, "cc"), (4, "dd")]), "b2").materialize()
        before = store.stats()["n_hashes"]
        store.compact()
        st = store.stats()
        assert st["n_hashes"] == before
        assert st["n_files"] <= store.n_shards
        out = store.ingest(
            _corpus([(10, "aa"), (11, "dd"), (12, "ee")]), "b3"
        )
        assert _ids(out) == [12]

    def test_compact_skips_uncommitted_files(self, ray_session, tmp_path):
        """Compaction must not fold a crashed label's partial files into
        a compact-* file (that would promote them to committed)."""
        store = DedupStore.create(str(tmp_path / "s"), n_shards=2)
        store.ingest(_corpus([(1, "aa"), (2, "bb")]), "b1").materialize()
        store.ingest(_corpus([(3, "cc")]), "crashed").materialize()
        os.remove(tmp_path / "s" / "_ingests" / "crashed.json")
        store.compact()
        st = store.stats()
        assert st["n_uncommitted_files"] == 1
        # "cc" is still unseen after compaction
        assert _ids(store.ingest(_corpus([(9, "cc")]), "b2")) == [9]
        # resuming the crashed label now drops "cc" (b2 committed it)
        assert _ids(store.ingest(_corpus([(3, "cc")]), "crashed")) == []

    def test_label_validation_and_lifecycle_errors(self, ray_session, tmp_path):
        store = DedupStore.create(str(tmp_path / "s"), n_shards=2)
        with pytest.raises(ValueError, match="label"):
            store.ingest(_corpus([(1, "a")]), "bad/label")
        with pytest.raises(ValueError, match="label"):
            store.ingest(_corpus([(1, "a")]), "compact-1")
        with pytest.raises(ValueError, match="already exists"):
            DedupStore.create(str(tmp_path / "s"))
        with pytest.raises(FileNotFoundError):
            DedupStore.open(str(tmp_path / "missing"))

    def test_manifest_records_drop_count(self, ray_session, tmp_path):
        store = DedupStore.create(str(tmp_path / "s"), n_shards=4)
        store.ingest(_corpus([(1, "aa"), (2, "aa"), (3, "bb")]), "b1").materialize()
        info = store.ingest_info("b1")
        assert info["label"] == "b1" and info["kind"] == "exact"
        assert info["n_dropped"] == 1  # the within-ingest dup
        store.ingest(_corpus([(9, "aa"), (10, "cc")]), "b2").materialize()
        assert store.ingest_info("b2")["n_dropped"] == 1  # the seen "aa"

    def test_incremental_dedup_wrapper_creates_store(self, ray_session, tmp_path):
        path = str(tmp_path / "auto")
        out = incremental_dedup(_corpus([(1, "aa"), (2, "aa")]), path, "b1")
        assert _ids(out) == [1]
        out2 = incremental_dedup(_corpus([(3, "aa"), (4, "zz")]), path, "b2")
        assert _ids(out2) == [4]
        assert DedupStore.open(path).ingests() == ["b1", "b2"]


class TestPairsInStore:
    def test_equal_hi_run(self):
        # two store hashes share hi: the rare >1-run scan path
        hi_s = np.array([5, 5, 9], dtype=np.int64)
        lo_s = np.array([1, 7, 0], dtype=np.int64)
        hi_q = np.array([5, 5, 5, 9, 4], dtype=np.int64)
        lo_q = np.array([1, 7, 3, 0, 1], dtype=np.int64)
        assert _pairs_in_store(hi_q, lo_q, hi_s, lo_s).tolist() == [
            True,
            True,
            False,
            True,
            False,
        ]

    def test_empty_store(self):
        z = np.empty(0, dtype=np.int64)
        q = np.array([1], dtype=np.int64)
        assert _pairs_in_store(q, q, z, z).tolist() == [False]
