"""Corpus mixing: per-group token-budget prefix along the deterministic
hash order, validated against a local brute-force of the same rule."""

import hashlib

import pytest

from deduce_ray.ops.mixing import sample_to_token_budget


def _corpus(rows):
    import ray

    return ray.data.from_items(
        [{"doc_id": i, "text": t, "lang": g} for i, t, g in rows]
    )


def _brute(rows, budgets):
    # the PRODUCT's word class, not str.split(): they differ on non-ASCII
    # whitespace, and the brute force must encode the same rule
    from deduce_ray.ops.textstats import split_words

    picked = []
    for g in {r[2] for r in rows}:
        if g not in budgets:
            continue
        grp = sorted(
            (r for r in rows if r[2] == g),
            key=lambda r: (hashlib.md5(str(r[0]).encode()).hexdigest(), r[0]),
        )
        cum = 0
        for i, t, _ in grp:
            n = len(split_words(t or ""))
            if cum + n > budgets[g]:
                break
            cum += n
            picked.append(i)
    return sorted(picked)


class TestSampleToTokenBudget:
    def test_matches_bruteforce_prefix(self, ray_session):
        rows = [
            (i, " ".join(f"w{j}" for j in range(3 + i % 7)), ["en", "de"][i % 2])
            for i in range(60)
        ]
        budgets = {"en": 40, "de": 25}
        out = sample_to_token_budget(_corpus(rows), budgets)
        got = sorted(r["doc_id"] for r in out.take_all())
        assert got == _brute(rows, budgets)
        assert got  # budgets are non-trivial

    def test_include_all_and_drop_paths(self, ray_session):
        rows = [
            (1, "a b c", "en"),
            (2, "d e", "en"),
            (3, "x y z w", "zh"),  # no budget -> dropped
        ]
        out = sample_to_token_budget(_corpus(rows), {"en": 1000})
        assert sorted(r["doc_id"] for r in out.take_all()) == [1, 2]

    def test_budget_smaller_than_first_doc(self, ray_session):
        rows = [(1, "a b c d e", "en"), (2, "f g h i j", "en")]
        out = sample_to_token_budget(_corpus(rows), {"en": 3})
        assert out.take_all() == []

    def test_zero_token_docs_ride_free(self, ray_session):
        # empty docs add 0 tokens; the inclusive-prefix rule keeps them
        # wherever they fall in the hash order
        rows = [(i, "" if i % 3 == 0 else "tok tok", "en") for i in range(30)]
        budgets = {"en": 14}
        out = sample_to_token_budget(_corpus(rows), budgets)
        got = sorted(r["doc_id"] for r in out.take_all())
        assert got == _brute(rows, budgets)

    def test_boundary_guard_raises(self, ray_session):
        rows = [(i, "w " * 5, "en") for i in range(50)]
        with pytest.raises(ValueError, match="boundary"):
            sample_to_token_budget(
                _corpus(rows), {"en": 50}, boundary_rows_max=0
            )
