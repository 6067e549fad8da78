"""Annotator unit tests; fixture scenarios mirror the reference's
tests/unit/test_annotator.py so behavior is pinned case by case."""

import pytest

from deduce_ray.annotation import Annotation, AnnotationSet
from deduce_ray.annotators import (
    BsnAnnotator,
    ContextAnnotator,
    MultiTokenLookupAnnotator,
    PatientNameAnnotator,
    PhoneNumberAnnotator,
    RegexpAnnotator,
    RegexpPseudoAnnotator,
    TokenPatternAnnotator,
    match_position,
)
from deduce_ray.document import Document
from deduce_ray.person import Person
from deduce_ray.structures import DsCollection, LookupSet, LookupTrie
from deduce_ray.tokenizer import Token, WordTokenizer


@pytest.fixture
def ds():
    ds = DsCollection()
    ds["first_names"] = LookupSet().add_items_from_iterable(
        ["Andries", "pieter", "Aziz", "Bernard"]
    )
    ds["surnames"] = LookupSet().add_items_from_iterable(
        ["Meijer", "Smit", "Bakker", "Heerma"]
    )
    return ds


@pytest.fixture
def tokenizer():
    return WordTokenizer()


@pytest.fixture
def pattern_doc(tokenizer):
    return Document(
        "De man heet Andries Meijer-Heerma, voornaam Andries.", tokenizer=tokenizer
    )


def tok(text):
    return Token(text, 0, len(text))


class TestPositionMatcher:
    def test_equal(self):
        assert match_position({"equal": "test"}, tok("test"), None)
        assert not match_position({"equal": "_"}, tok("test"), None)

    def test_re_match(self):
        assert match_position({"re_match": "[a-z]"}, tok("abc"), None)
        assert match_position({"re_match": "[a-z]"}, tok("abc123"), None)
        assert not match_position({"re_match": "[a-z]"}, tok(""), None)
        assert not match_position({"re_match": "[a-z]"}, tok("123"), None)
        assert not match_position({"re_match": "[a-z]"}, tok("123abc"), None)

    def test_is_initials(self):
        for text in ["A", "AB", "ABC", "ABCD"]:
            assert match_position({"is_initials": True}, tok(text), None)
        for text in ["ABCDE", "", "abcd", "abcde"]:
            assert not match_position({"is_initials": True}, tok(text), None)

    def test_like_name(self):
        assert match_position({"like_name": True}, tok("Diederik"), None)
        for text in ["Le", "diederik", "Diederik3"]:
            assert not match_position({"like_name": True}, tok(text), None)

    def test_lookup(self, ds):
        assert match_position({"lookup": "first_names"}, tok("Andries"), ds)
        assert not match_position({"lookup": "first_names"}, tok("andries"), ds)
        assert not match_position({"lookup": "surnames"}, tok("Andries"), ds)
        assert match_position({"lookup": "surnames"}, tok("Smit"), ds)

    def test_neg_lookup(self, ds):
        assert not match_position({"neg_lookup": "first_names"}, tok("Andries"), ds)
        assert match_position({"neg_lookup": "first_names"}, tok("andries"), ds)
        assert match_position({"neg_lookup": "first_names"}, tok("Smit"), ds)

    def test_and_or(self):
        assert match_position(
            {"and": [{"equal": "Abcd"}, {"like_name": True}]}, tok("Abcd"), None
        )
        assert not match_position(
            {"and": [{"equal": "dcef"}, {"like_name": True}]}, tok("Abcd"), None
        )
        assert match_position(
            {"or": [{"equal": "dcef"}, {"like_name": True}]}, tok("Abcd"), None
        )
        assert not match_position(
            {"or": [{"equal": "b"}, {"like_name": True}]}, tok("a"), None
        )


class TestTokenPattern:
    def test_match_right(self, pattern_doc, ds):
        tpa = TokenPatternAnnotator(pattern=[{}], ds=ds, tag="_")
        pattern = [{"lookup": "first_names"}, {"like_name": True}]
        got = tpa.match_sequence(
            pattern_doc.text, pattern, pattern_doc.get_tokens()[3]
        )
        assert got == Annotation("Andries Meijer", 12, 26, "_")
        assert (
            tpa.match_sequence(pattern_doc.text, pattern, pattern_doc.get_tokens()[7])
            is None
        )

    def test_match_left(self, pattern_doc, ds):
        tpa = TokenPatternAnnotator(pattern=[{}], ds=ds, tag="_")
        pattern = [{"lookup": "first_names"}, {"like_name": True}]
        got = tpa.match_sequence(
            pattern_doc.text, pattern, pattern_doc.get_tokens()[4], direction="left"
        )
        assert got == Annotation("Andries Meijer", 12, 26, "_")

    def test_match_skip(self, pattern_doc, ds):
        tpa = TokenPatternAnnotator(pattern=[{}], ds=ds, tag="_")
        pattern = [{"lookup": "surnames"}, {"like_name": True}]
        got = tpa.match_sequence(
            pattern_doc.text, pattern, pattern_doc.get_tokens()[4], skip={"-"}
        )
        assert got == Annotation("Meijer-Heerma", 20, 33, "_")
        assert (
            tpa.match_sequence(
                pattern_doc.text, pattern, pattern_doc.get_tokens()[4], skip=set()
            )
            is None
        )

    def test_annotate(self, pattern_doc, ds):
        tpa = TokenPatternAnnotator(
            pattern=[{"lookup": "first_names"}, {"like_name": True}], ds=ds, tag="_"
        )
        assert tpa.annotate(pattern_doc) == [Annotation("Andries Meijer", 12, 26, "_")]


class TestContextAnnotator:
    def test_extend_right(self, pattern_doc):
        annotator = ContextAnnotator(pattern=[])
        anns = AnnotationSet(
            [
                Annotation(
                    "Andries", 12, 19, "voornaam",
                    start_token=pattern_doc.get_tokens()[3],
                    end_token=pattern_doc.get_tokens()[3],
                )
            ]
        )
        got = annotator._extend_with_pattern(
            pattern_doc.text,
            anns,
            {
                "pattern": [{"like_name": True}],
                "direction": "right",
                "pre_tag": "voornaam",
                "tag": "{tag}+naam",
            },
        )
        assert got == AnnotationSet(
            [Annotation("Andries Meijer", 12, 26, "voornaam+naam")]
        )

    def test_extend_left(self, pattern_doc):
        annotator = ContextAnnotator(pattern=[])
        anns = AnnotationSet(
            [
                Annotation(
                    "Meijer", 20, 26, "achternaam",
                    start_token=pattern_doc.get_tokens()[4],
                    end_token=pattern_doc.get_tokens()[4],
                )
            ]
        )
        got = annotator._extend_with_pattern(
            pattern_doc.text,
            anns,
            {
                "pattern": [{"like_name": True}],
                "direction": "left",
                "pre_tag": "achternaam",
                "tag": "naam+{tag}",
            },
        )
        assert got == AnnotationSet(
            [Annotation("Andries Meijer", 12, 26, "naam+achternaam")]
        )

    def test_iterative(self, pattern_doc):
        annotator = ContextAnnotator(
            pattern=[
                {
                    "pattern": [{"like_name": True}],
                    "direction": "right",
                    "skip": ["-"],
                    "pre_tag": ["naam", "voornaam"],
                    "tag": "{tag}+naam",
                }
            ],
            iterative=True,
        )
        anns = AnnotationSet(
            [
                Annotation(
                    "Andries", 12, 19, "voornaam",
                    start_token=pattern_doc.get_tokens()[3],
                    end_token=pattern_doc.get_tokens()[3],
                )
            ]
        )
        assert annotator._expand(pattern_doc.text, anns) == AnnotationSet(
            [Annotation("Andries Meijer-Heerma", 12, 33, "voornaam+naam+naam")]
        )


class TestMultiTokenLookup:
    def test_overlapping(self, tokenizer):
        trie = LookupTrie()
        trie.add_item(["Bergen"])
        trie.add_item(["Bergen", "op", "Zoom"])
        doc = Document("naar Bergen op Zoom vandaag", tokenizer=tokenizer)
        ann = MultiTokenLookupAnnotator(trie=trie, tag="loc", overlapping=True)
        assert ann.annotate(doc) == [Annotation("Bergen op Zoom", 5, 19, "loc")]

    def test_non_overlapping_advances(self, tokenizer):
        trie = LookupTrie()
        trie.add_item(["a", "b"])
        trie.add_item(["b"])
        doc = Document("a b", tokenizer=tokenizer)
        ann = MultiTokenLookupAnnotator(trie=trie, tag="t", overlapping=False)
        assert ann.annotate(doc) == [Annotation("a b", 0, 3, "t")]
        ann_overlap = MultiTokenLookupAnnotator(trie=trie, tag="t", overlapping=True)
        assert ann_overlap.annotate(doc) == [
            Annotation("a b", 0, 3, "t"),
            Annotation("b", 2, 3, "t"),
        ]


class TestRegexpAnnotators:
    def test_pre_match_words_gate(self, tokenizer):
        ann = RegexpAnnotator(
            regexp_pattern=r"\d+", tag="_", pre_match_words=["nummer"]
        )
        doc_hit = Document("nummer 123", tokenizer=tokenizer)
        doc_miss = Document("getal 123", tokenizer=tokenizer)
        assert ann.annotate(doc_hit) == [Annotation("123", 7, 10, "_")]
        assert ann.annotate(doc_miss) == []

    def test_requires_digit_gate(self, tokenizer):
        ann = RegexpAnnotator(regexp_pattern=r"\d+", tag="_", requires_digit=True)
        doc_hit = Document("nummer 123", tokenizer=tokenizer)
        doc_miss = Document("nummer honderd", tokenizer=tokenizer)
        assert ann.annotate(doc_hit) == [Annotation("123", 7, 10, "_")]
        assert ann.annotate(doc_miss) == []

    def test_requires_digit_flags_are_structurally_sound(self, engine):
        """Every configured requires_digit pattern must be unable to match
        digit-free text — otherwise the gate would change behavior.  The
        probe text contains every word that could unlock a gated pattern
        (months, age words, postbus) but no digit."""
        probe = (
            "postbus jaar jarige jr januari februari maart april mei juni "
            "juli augustus september oktober november december jan feb mrt "
            "apr jun jul aug sep sept okt nov dec ' ` . - / BSN"
        )
        assert not any(ch.isdigit() for ch in probe)
        n_gated = 0
        for _, members in engine.processor_groups.items():
            for _, proc in members:
                if getattr(proc, "requires_digit", False):
                    n_gated += 1
                    assert proc.regexp.search(probe) is None, proc.tag
        assert n_gated == 8  # 4 dates, age, id, postal_code, postbus

    def test_pseudo_veto(self, tokenizer):
        doc = Document(
            "De patient is Na 12 jaar gestopt met medicijnen.", tokenizer=tokenizer
        )
        base = RegexpPseudoAnnotator(regexp_pattern=r"\d+ jaar", tag="_")
        assert len(base.annotate(doc)) == 1

        pre = RegexpPseudoAnnotator(
            regexp_pattern=r"\d+ jaar", tag="_", pre_pseudo=["na"], lowercase=True
        )
        assert pre.annotate(doc) == []

        post = RegexpPseudoAnnotator(
            regexp_pattern=r"\d+ jaar", tag="_",
            post_pseudo=["geleden", "getrouwd", "gestopt"],
        )
        assert post.annotate(doc) == []


class TestBsn:
    def test_elfproef(self):
        ann = BsnAnnotator(bsn_regexp=r"(\D|^)(\d{9})(\D|$)", capture_group=2, tag="_")
        assert ann.elfproef("111222333")
        assert not ann.elfproef("111222334")
        assert ann.elfproef("123456782")
        assert not ann.elfproef("123456783")
        with pytest.raises(ValueError):
            ann.elfproef("12345678")
        with pytest.raises(ValueError):
            ann.elfproef("testtestt")

    def test_annotate(self):
        text = (
            "Geldige voorbeelden zijn: 111222333 en 123456782. "
            "Patientnummer is 01234, en ander id 01234567890."
        )
        ann = BsnAnnotator(bsn_regexp=r"(\D|^)(\d{9})(\D|$)", capture_group=2, tag="_")
        assert ann.annotate(Document(text)) == [
            Annotation("111222333", 26, 35, "_"),
            Annotation("123456782", 39, 48, "_"),
        ]

    def test_with_punctuation(self):
        ann = BsnAnnotator(bsn_regexp=r"\d{4}\.\d{2}\.\d{3}", tag="_")
        assert ann.annotate(Document("1234.56.782")) == [
            Annotation("1234.56.782", 0, 11, "_")
        ]


PHONE_RE = (
    r"(?<!\d)(\(?(0031|\+31|0)(1[035]|2[0347]|3[03568]|4[03456]|5[0358]|6|7|"
    r"88|800|91|90[069]|[1-5]\d{2})\)?) ?-? ?((\d{2,4}[ -]?)+\d{2,4})"
)

PHONE_TEXT = (
    "Telefoonnummers zijn 0314-555555, (088 755 55 55) of (06)55555555, "
    "maar 065555 is te kort en 065555555555 is te lang. "
    "Verwijsnummer is 0800-9003."
)


class TestPhone:
    def test_defaults(self):
        ann = PhoneNumberAnnotator(phone_regexp=PHONE_RE, tag="_")
        assert ann.annotate(Document(PHONE_TEXT)) == [
            Annotation("0314-555555", 21, 32, "_"),
            Annotation("088 755 55 55", 35, 48, "_"),
            Annotation("(06)55555555", 53, 65, "_"),
            Annotation("0800-9003", 135, 144, "_"),
        ]

    def test_short_window(self):
        ann = PhoneNumberAnnotator(
            phone_regexp=PHONE_RE, tag="_", min_digits=4, max_digits=8
        )
        assert ann.annotate(Document(PHONE_TEXT)) == [
            Annotation("065555", 72, 78, "_")
        ]

    def test_long_window(self):
        ann = PhoneNumberAnnotator(
            phone_regexp=PHONE_RE, tag="_", min_digits=11, max_digits=12
        )
        assert ann.annotate(Document(PHONE_TEXT)) == [
            Annotation("065555555555", 93, 105, "_")
        ]


class TestPatientName:
    def make(self, tokenizer):
        return PatientNameAnnotator(tokenizer=tokenizer, tag="_")

    def test_first_name_exact_and_fuzzy(self, tokenizer):
        ann = self.make(tokenizer)
        doc = Document(
            "De patient heet Jan", tokenizer=tokenizer,
            metadata={"patient": Person(first_names=["Jan", "Johan"],
                                        initials="JJ", surname="Jansen")},
        )
        assert ann.annotate(doc) == [Annotation("Jan", 16, 19, "voornaam_patient")]

        fuzzy_doc = Document(
            "De patient heet Adriana", tokenizer=tokenizer,
            metadata={"patient": Person(first_names=["Adriaan"])},
        )
        assert ann.annotate(fuzzy_doc) == [
            Annotation("Adriana", 16, 23, "voornaam_patient")
        ]

    def test_no_fuzzy_for_short_names(self, tokenizer):
        ann = self.make(tokenizer)
        doc = Document(
            "De patient heet Dan", tokenizer=tokenizer,
            metadata={"patient": Person(first_names=["Jan"])},
        )
        assert ann.annotate(doc) == []

    def test_initials(self, tokenizer):
        ann = self.make(tokenizer)
        doc = Document(
            "De patient heet JJ", tokenizer=tokenizer,
            metadata={"patient": Person(first_names=["Jan", "Johan"],
                                        initials="JJ", surname="Jansen")},
        )
        assert ann.annotate(doc) == [Annotation("JJ", 16, 18, "initiaal_patient")]

    def test_initial_from_name_with_period(self, tokenizer):
        ann = self.make(tokenizer)
        doc = Document(
            "De patient heet J.", tokenizer=tokenizer,
            metadata={"patient": Person(first_names=["Jan", "Johan"],
                                        initials="JJ", surname="Jansen")},
        )
        assert ann.annotate(doc) == [Annotation("J.", 16, 18, "initiaal_patient")]

    def test_surname(self, tokenizer):
        ann = self.make(tokenizer)
        doc = Document(
            "De patient heet Jansen", tokenizer=tokenizer,
            metadata={"patient": Person(first_names=["Jan", "Johan"],
                                        initials="JJ", surname="Jansen")},
        )
        assert ann.annotate(doc) == [
            Annotation("Jansen", 16, 22, "achternaam_patient")
        ]

    def test_multi_token_surname_fuzzy(self, tokenizer):
        # each surname token may be DL<=1 off ("Heijde" for "Heide",
        # "Ginkle" for "Ginkel"); mirrors reference test_match_surname_fuzzy
        merged = WordTokenizer(merge_terms=["Van der"])
        ann = PatientNameAnnotator(tokenizer=merged, tag="_")
        doc = Document(
            "dhr Van der Heijde-Ginkle gezien", tokenizer=merged,
            metadata={"patient": Person(surname="Van der Heide-Ginkel")},
        )
        got = ann.annotate(doc)
        assert got == [
            Annotation("Van der Heijde-Ginkle", 4, 25, "achternaam_patient")
        ]

    def test_no_patient_metadata(self, tokenizer):
        ann = self.make(tokenizer)
        doc = Document("Jan", tokenizer=tokenizer)
        assert ann.annotate(doc) == []


class TestReviewRegressions:
    """Reproduced-defect regressions from the round-2 review passes."""

    def test_patient_metadata_with_empty_components(self, engine):
        """Double spaces / blank metadata fields must not crash the
        annotate path (empty first-name components, whitespace surname)."""
        from deduce_ray.person import Person

        doc = engine.deidentify(
            "Jan  Willem kwam op controle.",
            metadata={
                "patient": Person.from_keywords(
                    patient_first_names="Jan  Willem", patient_surname=" "
                )
            },
            enabled={"names", "patient_name"},
        )
        assert any(a.tag == "voornaam_patient" for a in doc.annotations)

    def test_empty_pattern_matches_nothing(self, engine):
        from deduce_ray.annotators import TokenPatternAnnotator

        ann = TokenPatternAnnotator(
            ds=engine.lookup_structs, pattern=[], tag="boom"
        )
        doc = engine.deidentify("gewoon wat tekst", enabled=set())
        assert ann.annotate(doc) == []

    def test_word_index_distinguishes_pipeline_params(self, engine):
        from deduce_ray.document import Document
        from deduce_ray.strproc import FilterByLength

        doc = Document("aa bbbb cc ddddd", tokenizer=engine.tokenizer)
        tl = doc.get_tokens()
        short = tl.get_words([FilterByLength(min_len=2)])
        long = tl.get_words([FilterByLength(min_len=4)])
        assert "aa" in short and "aa" not in long
        assert "ddddd" in short and "ddddd" in long

    def test_pre_match_words_case_insensitive(self, engine):
        from deduce_ray.annotators import RegexpAnnotator

        ann = RegexpAnnotator(
            regexp_pattern=r"[Pp]ostbus \d+",
            tag="locatie",
            pre_match_words=["Postbus"],  # capitalized gate word
        )
        doc = engine.deidentify("Stuur naar Postbus 123 aub.", enabled=set())
        assert [a.text for a in ann.annotate(doc)] == ["Postbus 123"]
