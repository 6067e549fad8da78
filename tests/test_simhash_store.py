"""Incremental SimHash near-dup store: cross-ingest filtering, resume,
compaction, and the store/base protocol shared with DedupStore."""

import os

import pytest

from deduce_ray.state.simhash_store import SimHashStore, incremental_neardup


def _corpus(rows):
    import ray

    return ray.data.from_items([{"doc_id": i, "text": t} for i, t in rows])


def _ids(ds):
    return sorted(r["doc_id"] for r in ds.take_all())


BASE = " ".join(f"word{i}" for i in range(80))
OTHER = " ".join(f"other{i}" for i in range(80))


def _near_text(base: str, max_hamming: int = 3) -> str:
    """A deterministic suffix mutation within ``max_hamming`` bits of
    ``base`` (simhash of an 80-word doc rarely moves on a 1-word edit;
    the first qualifying suffix is stable across runs)."""
    from deduce_ray.ops.dedup import simhash64

    h0 = simhash64(base)
    for i in range(500):
        cand = f"{base} tail{i}"
        if bin(h0 ^ simhash64(cand)).count("1") <= max_hamming:
            return cand
    raise AssertionError("no near mutation found")


class TestSimHashStore:
    def test_cross_ingest_near_dup_drops(self, ray_session, tmp_path):
        store = SimHashStore.create(str(tmp_path / "s"), n_shards=4)
        out1 = store.ingest(_corpus([(1, BASE), (2, OTHER)]), "b1")
        assert _ids(out1) == [1, 2]
        st = store.stats()
        assert st["n_docs"] == 2 and st["n_rows"] == 8
        # batch 2: an exact copy (hamming 0), a near mutation (<=3), and
        # a genuinely new doc
        fresh = " ".join(f"fresh{i}" for i in range(80))
        out2 = store.ingest(
            _corpus([(10, BASE), (11, _near_text(BASE)), (12, fresh)]), "b2"
        )
        assert _ids(out2) == [12]
        assert store.stats()["n_docs"] == 3

    def test_within_ingest_near_dups_both_retained(self, ray_session, tmp_path):
        """Documented semantics: the store answers 'near anything
        retained BEFORE this ingest' — within-batch near-dedup is the
        funnel's job."""
        store = SimHashStore.create(str(tmp_path / "s"), n_shards=4)
        out = store.ingest(
            _corpus([(1, BASE), (2, _near_text(BASE))]), "b1"
        )
        assert _ids(out) == [1, 2]
        assert store.stats()["n_docs"] == 2

    def test_wordless_doc_survives_unrecorded(self, ray_session, tmp_path):
        store = SimHashStore.create(str(tmp_path / "s"), n_shards=2)
        out = store.ingest(_corpus([(1, ""), (2, None), (3, BASE)]), "b1")
        assert _ids(out) == [1, 2, 3]
        assert store.stats()["n_docs"] == 1
        # empty docs stay invisible: a later empty doc is not "near" them
        out2 = store.ingest(_corpus([(9, "")]), "b2")
        assert _ids(out2) == [9]

    def test_crash_before_commit_resumes(self, ray_session, tmp_path):
        store = SimHashStore.create(str(tmp_path / "s"), n_shards=4)
        batch = [(1, BASE), (2, OTHER)]
        first = _ids(store.ingest(_corpus(batch), "b1"))
        os.remove(tmp_path / "s" / "_ingests" / "b1.json")
        assert store.stats()["n_docs"] == 0  # partials invisible
        redo = _ids(store.ingest(_corpus(batch), "b1"))
        assert redo == first == [1, 2]
        assert store.stats()["n_docs"] == 2

    def test_committed_label_refused_and_kind_checked(self, ray_session, tmp_path):
        store = SimHashStore.create(str(tmp_path / "s"), n_shards=2)
        store.ingest(_corpus([(1, BASE)]), "b1").materialize()
        with pytest.raises(ValueError, match="already committed"):
            store.ingest(_corpus([(2, OTHER)]), "b1")
        from deduce_ray.state import DedupStore

        with pytest.raises(ValueError, match="kind"):
            DedupStore.open(str(tmp_path / "s"))

    def test_compact_preserves_membership(self, ray_session, tmp_path):
        store = SimHashStore.create(str(tmp_path / "s"), n_shards=2)
        store.ingest(_corpus([(1, BASE)]), "b1").materialize()
        store.ingest(_corpus([(2, OTHER)]), "b2").materialize()
        before = store.stats()["n_rows"]
        store.compact()
        st = store.stats()
        assert st["n_rows"] == before
        assert st["n_files"] <= store.n_shards
        out = store.ingest(
            _corpus([(10, BASE), (11, OTHER), (12, " ".join(f"x{i}" for i in range(80)))]),
            "b3",
        )
        assert _ids(out) == [12]

    def test_max_hamming_validation(self, ray_session, tmp_path):
        with pytest.raises(ValueError, match="max_hamming"):
            SimHashStore.create(str(tmp_path / "s"), max_hamming=4)

    def test_legacy_meta_without_kind_is_exact_only(self, tmp_path):
        """A pre-'kind' _meta.json is an exact store: SimHashStore must
        refuse it (adopting it would write bucket/sig rows into an
        exact store's shards)."""
        import json
        import os

        from deduce_ray.state import DedupStore

        d = str(tmp_path / "legacy")
        os.makedirs(d)
        with open(os.path.join(d, "_meta.json"), "w") as f:
            json.dump({"version": 1, "n_shards": 4}, f)
        assert DedupStore.open(d).n_shards == 4
        with pytest.raises(ValueError, match="kind"):
            SimHashStore.open(d)

    def test_stale_crashed_files_recomputed_on_resume(self, ray_session, tmp_path):
        """Crash -> another label commits a near-dup of a crashed doc ->
        resume: the crashed label must NOT commit its stale file, or the
        store would record a document that was never retained."""
        import pyarrow.parquet as pq

        store = SimHashStore.create(str(tmp_path / "s"), n_shards=4)
        near = _near_text(BASE)
        # b2's first attempt retains doc 20 (store empty), then crashes
        store.ingest(_corpus([(20, near)]), "b2").materialize()
        os.remove(tmp_path / "s" / "_ingests" / "b2.json")
        # b3 commits BASE — which is near doc 20's text
        store.ingest(_corpus([(30, BASE)]), "b3").materialize()
        # resume b2: doc 20 is now near a retained doc and must drop
        assert _ids(store.ingest(_corpus([(20, near)]), "b2")) == []
        st = store.stats()
        assert st["n_docs"] == 1  # only doc 30
        recorded = set()
        for k in range(store.n_shards):
            sd = tmp_path / "s" / f"shard={k}"
            if sd.is_dir():
                for f in sd.glob("*.parquet"):
                    recorded |= set(
                        pq.read_table(str(f), columns=["doc_id"])
                        .column("doc_id")
                        .to_pylist()
                    )
        assert 20 not in recorded

    def test_defer_commit(self, ray_session, tmp_path):
        store = SimHashStore.create(str(tmp_path / "s"), n_shards=2)
        survivors, commit = store.ingest(
            _corpus([(1, BASE)]), "b1", defer_commit=True
        )
        assert _ids(survivors) == [1]
        assert store.ingests() == []  # files invisible until commit
        assert store.stats()["n_docs"] == 0
        commit()
        assert store.ingests() == ["b1"]
        assert store.stats()["n_docs"] == 1

    def test_custom_id_col_and_compact(self, ray_session, tmp_path):
        """Store files carry the canonical doc_id column regardless of
        the caller's id_col, so compact() works on any store."""
        import ray

        store = SimHashStore.create(str(tmp_path / "s"), n_shards=2)
        ds1 = ray.data.from_items([{"my_id": 1, "body": BASE}])
        ds2 = ray.data.from_items([{"my_id": 2, "body": OTHER}])
        store.ingest(ds1, "b1", text_col="body", id_col="my_id").materialize()
        store.ingest(ds2, "b2", text_col="body", id_col="my_id").materialize()
        store.compact()
        assert store.stats()["n_docs"] == 2
        ds3 = ray.data.from_items(
            [{"my_id": 9, "body": BASE}, {"my_id": 10, "body": "x " * 40}]
        )
        out = store.ingest(ds3, "b3", text_col="body", id_col="my_id")
        assert sorted(r["my_id"] for r in out.take_all()) == [10]

    def test_wrapper_creates_store(self, ray_session, tmp_path):
        path = str(tmp_path / "auto")
        out = incremental_neardup(_corpus([(1, BASE)]), path, "b1")
        assert _ids(out) == [1]
        out2 = incremental_neardup(_corpus([(2, BASE), (3, OTHER)]), path, "b2")
        assert _ids(out2) == [3]
        assert SimHashStore.open(path).ingests() == ["b1", "b2"]
