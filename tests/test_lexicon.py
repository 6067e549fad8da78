"""Lexicon compiler tests over the reference's fixture tree
(/root/reference/tests/data/lookup/src; oracle sets from
tests/unit/test_lookup_struct.py:19-43) plus variation-transform unit tests
(oracle: tests/unit/test_utils.py)."""

from pathlib import Path

import pytest

from deduce_ray.lexicon import (
    apply_transform,
    load_raw_itemset,
    load_raw_itemsets,
    str_variations,
)

FIXTURES = Path("/root/reference/tests/data/lookup/src")


@pytest.mark.skipif(not FIXTURES.exists(), reason="reference fixtures not present")
class TestRawItemsets:
    def test_items_exceptions_transform(self):
        got = load_raw_itemset(FIXTURES / "lst_test")
        assert got == {"de Vries", "De Vries", "Sijbrand", "Sybrand", "Pieters"}

    def test_nested_sublists(self):
        got = load_raw_itemset(FIXTURES / "lst_test_nested")
        assert got == {"a", "b", "c", "d"}

    def test_load_many(self):
        got = load_raw_itemsets(FIXTURES.parent, ["lst_test_nested"])
        assert got["test_nested"] == {"a", "b", "c", "d"}


class TestStrVariations:
    def test_no_matches(self):
        assert str_variations("abc", {"d": ["e"]}) == ["abc"]

    def test_single_match(self):
        got = set(str_variations("Prof. Lievenslaan", {"Prof\\.": ["Prof.", "Professor"]}))
        assert got == {"Prof. Lievenslaan", "Professor Lievenslaan"}

    def test_cartesian(self):
        got = set(
            str_variations(
                "Prof. Mr. Lievenslaan",
                {"Prof\\.": ["Prof.", "Professor"], "Mr\\.": ["Mr.", "Meester"]},
            )
        )
        assert got == {
            "Prof. Mr. Lievenslaan",
            "Professor Mr. Lievenslaan",
            "Prof. Meester Lievenslaan",
            "Professor Meester Lievenslaan",
        }

    def test_overlap_raises(self):
        with pytest.raises(RuntimeError):
            str_variations("abc", {"ab": ["x"], "bc": ["y"]})

    def test_apply_transform_stages_compose(self):
        items = apply_transform(
            {"y x"},
            {"transforms": {"s1": {"y": ["y", "z"]}, "s2": {"x": ["x", "w"]}}},
        )
        assert items == {"y x", "z x", "y w", "z w"}

    def test_apply_transform_strips(self):
        items = apply_transform({" a "}, {"transforms": {}})
        assert items == {"a"}


class TestTextStats:
    def test_predict_lang(self):
        from deduce_ray.ops.textstats import predict_lang

        assert predict_lang("the cat sat on the mat and it is a cat") == "en"
        assert predict_lang("der hund ist nicht mit der katze") == "de"
        assert predict_lang("一个测试文档") == "zh"
        assert predict_lang("zzz qqq xxx") == "unknown"

    def test_shingle_fingerprint_deterministic(self):
        from deduce_ray.ops.textstats import shingle_fingerprint

        a = shingle_fingerprint("the quick brown fox jumps over the dog")
        b = shingle_fingerprint("the quick brown fox jumps over the dog")
        c = shingle_fingerprint("a completely different text body here")
        assert a == b != c
        assert shingle_fingerprint("short") == shingle_fingerprint("short")

    def test_wordish_tokens_ascii_semantics(self):
        from deduce_ray.ops.textstats import _WORDISH_RE

        assert _WORDISH_RE.findall("foo bar_1 (x)") == ["foo", "bar_1", "(", "x", ")"]
