"""Benchmark decontamination: n-gram overlap flagging and filtering."""

from deduce_ray.ops.decontaminate import (
    benchmark_grams,
    contaminated_ids,
    decontaminate,
)

BENCH = " ".join(f"bench{i}" for i in range(20))  # 20-word benchmark doc


def _corpus(rows):
    import ray

    return ray.data.from_items([{"doc_id": i, "text": t} for i, t in rows])


class TestDecontaminate:
    def test_flags_embedded_benchmark_gram(self, ray_session):
        grams = benchmark_grams([BENCH], n=13)
        # doc 1 embeds a benchmark 13-gram mid-document; doc 2 shares
        # only a 12-gram (one word short); doc 3 is unrelated
        inner13 = " ".join(f"bench{i}" for i in range(3, 16))
        inner12 = " ".join(f"bench{i}" for i in range(3, 15))
        rows = [
            (1, f"prefix words here {inner13} and a tail"),
            (2, f"prefix words here {inner12} other tail"),
            (3, " ".join(f"clean{i}" for i in range(30))),
        ]
        hits = sorted(
            r["doc_id"] for r in contaminated_ids(_corpus(rows), grams).take_all()
        )
        assert hits == [1]
        out = decontaminate(_corpus(rows), grams)
        assert sorted(r["doc_id"] for r in out.take_all()) == [2, 3]

    def test_short_docs_never_flagged(self, ray_session):
        grams = benchmark_grams([BENCH], n=13)
        rows = [(1, " ".join(f"bench{i}" for i in range(12)))]  # < n words
        assert contaminated_ids(_corpus(rows), grams).take_all() == []

    def test_hash_only_agrees(self, ray_session):
        grams = benchmark_grams([BENCH], n=13)
        inner13 = " ".join(f"bench{i}" for i in range(0, 13))
        rows = [(1, f"x {inner13} y"), (2, "totally unrelated " * 10)]
        exact = sorted(
            r["doc_id"] for r in contaminated_ids(_corpus(rows), grams).take_all()
        )
        hashed = sorted(
            r["doc_id"]
            for r in contaminated_ids(
                _corpus(rows), grams, hash_only=True
            ).take_all()
        )
        assert exact == hashed == [1]

    def test_empty_benchmark_flags_nothing(self, ray_session):
        rows = [(1, "a b c " * 10)]
        assert contaminated_ids(_corpus(rows), set()).take_all() == []
