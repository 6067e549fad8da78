"""Incremental embedding near-dup store (hyperplane-bit signatures on
the shared SimHash band machinery)."""

import numpy as np
import pytest

from deduce_ray.state.embedding_store import (
    EmbeddingLSHStore,
    incremental_embedding_neardup,
)

DIM = 16


def _sig(vec):
    from deduce_ray.ops.dedup import _lsh_planes

    planes = _lsh_planes(DIM, 64, 1)[0]
    bits = (np.asarray(vec)[None, :] @ planes) > 0
    return int(np.packbits(bits, axis=1).view(">u8")[0, 0])


def _near_vec(v, max_hamming=3):
    """Deterministic perturbation within ``max_hamming`` signature bits
    (shrink the noise until the signature barely moves)."""
    rng = np.random.default_rng(7)
    noise = rng.standard_normal(DIM)
    h0 = _sig(v)
    for scale in [0.1, 0.03, 0.01, 0.003, 0.001, 0.0]:
        cand = v + noise * scale
        if bin(h0 ^ _sig(cand)).count("1") <= max_hamming:
            return cand
    raise AssertionError("unreachable: scale 0 is exact")


def _corpus(rows):
    import ray

    return ray.data.from_items(
        [{"vec_id": i, "embedding": list(map(float, v))} for i, v in rows]
    )


def _ids(ds):
    return sorted(r["vec_id"] for r in ds.take_all())


class TestEmbeddingLSHStore:
    def test_cross_ingest_near_drop(self, ray_session, tmp_path):
        rng = np.random.default_rng(0)
        a, b = rng.standard_normal(DIM), rng.standard_normal(DIM)
        store = EmbeddingLSHStore.create(str(tmp_path / "s"), dim=DIM, n_shards=4)
        assert _ids(store.ingest(_corpus([(1, a), (2, b)]), "b1")) == [1, 2]
        fresh = rng.standard_normal(DIM)
        # exact copy, near perturbation, and (very likely far) fresh vec;
        # assert the fresh one's signature is actually far so the test
        # is deterministic rather than probabilistic
        assert bin(_sig(a) ^ _sig(fresh)).count("1") > 3
        out = store.ingest(
            _corpus([(10, a), (11, _near_vec(a)), (12, fresh)]), "b2"
        )
        assert _ids(out) == [12]
        st = store.stats()
        assert st["n_docs"] == 3 and st["dim"] == DIM

    def test_dim_mismatch_raises(self, ray_session, tmp_path):
        store = EmbeddingLSHStore.create(str(tmp_path / "s"), dim=8, n_shards=2)
        import ray

        with pytest.raises(Exception, match="dim"):
            store.ingest(
                _corpus([(1, np.ones(16))]), "b1"
            ).materialize()

    def test_zero_vector_survives_unrecorded(self, ray_session, tmp_path):
        store = EmbeddingLSHStore.create(str(tmp_path / "s"), dim=DIM, n_shards=2)
        v = np.random.default_rng(1).standard_normal(DIM)
        out = store.ingest(_corpus([(1, np.zeros(DIM)), (2, v)]), "b1")
        assert _ids(out) == [1, 2]
        assert store.stats()["n_docs"] == 1
        # zero vectors are invisible: a later one is not "near" them
        assert _ids(store.ingest(_corpus([(9, np.zeros(DIM))]), "b2")) == [9]

    def test_kind_isolation(self, ray_session, tmp_path):
        from deduce_ray.state import SimHashStore

        EmbeddingLSHStore.create(str(tmp_path / "s"), dim=DIM)
        with pytest.raises(ValueError, match="kind"):
            SimHashStore.open(str(tmp_path / "s"))

    def test_planes_persisted_not_regenerated(
        self, ray_session, tmp_path, monkeypatch
    ):
        """Signatures must come from the PERSISTED hyperplanes (NumPy
        Generator streams are not stable across versions): after
        creation, ingest must work even if the plane factory is gone."""
        from deduce_ray.ops.dedup import _lsh_planes

        store = EmbeddingLSHStore.create(str(tmp_path / "s"), dim=DIM, n_shards=2)
        assert np.array_equal(store.planes(), _lsh_planes(DIM, 64, 1)[0])

        import deduce_ray.ops.dedup as dedup_mod

        def boom(*a, **k):
            raise AssertionError("planes must load from the store dir")

        monkeypatch.setattr(dedup_mod, "_lsh_planes", boom)
        v = np.random.default_rng(5).standard_normal(DIM)
        assert _ids(store.ingest(_corpus([(1, v)]), "b1")) == [1]
        assert _ids(store.ingest(_corpus([(2, v)]), "b2")) == []

    def test_wrapper(self, ray_session, tmp_path):
        rng = np.random.default_rng(3)
        a, b = rng.standard_normal(DIM), rng.standard_normal(DIM)
        path = str(tmp_path / "auto")
        assert _ids(
            incremental_embedding_neardup(_corpus([(1, a)]), path, "b1", dim=DIM)
        ) == [1]
        out = incremental_embedding_neardup(
            _corpus([(2, a), (3, b)]), path, "b2", dim=DIM
        )
        assert _ids(out) == [3]
