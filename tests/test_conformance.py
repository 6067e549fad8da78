"""Conformance against the reference's own golden corpus.

This is the P/R gate from BASELINE.json: the engine must reproduce the
reference's annotation sets exactly on

  - the pipeline golden document (tests/pipeline/test_deduce.py:5-87), and
  - all 463 regression examples (tests/data/regression_cases/*.json), each
    run with only that category's annotator group enabled.
"""

import json
from pathlib import Path

import pytest

from deduce_ray.annotation import Annotation, AnnotationSet
from deduce_ray.linker import annotate_intext
from deduce_ray.person import Person

REFERENCE_TESTS = Path("/root/reference/tests")

GOLDEN_TEXT = (
    "betreft: Jan Jansen, bsn 111222333, patnr 000334433. De patient J. Jansen is 64 "
    "jaar oud en woonachtig in Utrecht. Hij werd op 10 oktober 2018 door arts "
    "Peter de Visser ontslagen van de kliniek van het UMCU. Voor nazorg kan hij "
    "worden bereikt via j.JNSEN.123@gmail.com of (06)12345678."
)

GOLDEN_ANNOTATIONS = AnnotationSet(
    [
        Annotation("(06)12345678", 272, 284, "telefoonnummer"),
        Annotation("111222333", 25, 34, "bsn"),
        Annotation("Peter de Visser", 153, 168, "persoon"),
        Annotation("j.JNSEN.123@gmail.com", 247, 268, "emailadres"),
        Annotation("J. Jansen", 64, 73, "patient"),
        Annotation("Jan Jansen", 9, 19, "patient"),
        Annotation("10 oktober 2018", 127, 142, "datum"),
        Annotation("64", 77, 79, "leeftijd"),
        Annotation("000334433", 42, 51, "id"),
        Annotation("Utrecht", 106, 113, "locatie"),
        Annotation("UMCU", 202, 206, "ziekenhuis"),
    ]
)

GOLDEN_DEIDENTIFIED = (
    "betreft: [PATIENT], bsn [BSN-1], patnr [ID-1]. De patient [PATIENT] is "
    "[LEEFTIJD-1] jaar oud en woonachtig in [LOCATIE-1]. Hij werd op "
    "[DATUM-1] door arts [PERSOON-1] ontslagen van de kliniek van het "
    "[ZIEKENHUIS-1]. Voor nazorg kan hij worden bereikt via [EMAILADRES-1] "
    "of [TELEFOONNUMMER-1]."
)

GOLDEN_INTEXT = (
    "betreft: <PATIENT>Jan Jansen</PATIENT>, bsn <BSN>111222333</BSN>, "
    "patnr <ID>000334433</ID>. De patient <PATIENT>J. Jansen</PATIENT> is "
    "<LEEFTIJD>64</LEEFTIJD> jaar oud en woonachtig in <LOCATIE>Utrecht"
    "</LOCATIE>. Hij werd op <DATUM>10 oktober 2018</DATUM> door arts "
    "<PERSOON>Peter de Visser</PERSOON> ontslagen van de kliniek van het "
    "<ZIEKENHUIS>UMCU</ZIEKENHUIS>. Voor nazorg kan hij worden bereikt "
    "via <EMAILADRES>j.JNSEN.123@gmail.com</EMAILADRES> of "
    "<TELEFOONNUMMER>(06)12345678</TELEFOONNUMMER>."
)


@pytest.fixture(scope="module")
def golden_doc(engine):
    return engine.deidentify(
        GOLDEN_TEXT,
        metadata={"patient": Person(first_names=["Jan"], surname="Jansen")},
    )


class TestPipelineGolden:
    def test_annotations(self, golden_doc):
        assert golden_doc.annotations == GOLDEN_ANNOTATIONS

    def test_deidentified_text(self, golden_doc):
        assert golden_doc.deidentified_text == GOLDEN_DEIDENTIFIED

    def test_intext_annotation(self, golden_doc):
        assert annotate_intext(golden_doc.text, golden_doc.annotations) == GOLDEN_INTEXT


CATEGORY_GROUPS = {
    "names": "names",
    "locations": "locations",
    "institutions": "institutions",
    "dates": "dates",
    "ages": "ages",
    "identifiers": "identifiers",
    "phone_numbers": "phone_numbers",
    "emails": "email_addresses",
    "urls": "urls",
}


@pytest.mark.skipif(
    not REFERENCE_TESTS.exists(), reason="reference corpus not present"
)
@pytest.mark.parametrize("category", sorted(CATEGORY_GROUPS))
def test_regression_corpus(engine, category):
    path = REFERENCE_TESTS / "data" / "regression_cases" / f"{category}.json"
    enabled = engine.group_names(CATEGORY_GROUPS[category])

    with open(path, "rb") as fh:
        examples = json.load(fh)["examples"]

    failures = []
    for example in examples:
        expected = AnnotationSet(
            Annotation(**annotation) for annotation in example["annotations"]
        )
        predicted = engine.deidentify(example["text"], enabled=enabled).annotations
        if expected != predicted:
            failures.append(example["id"])

    assert failures == [], f"{category}: {len(failures)} mismatches: {failures}"


class TestTimeBudget:
    """Per-document wall-clock budget (straggler guard, opt-in)."""

    def test_adversarial_chain_flags_and_returns_fast(self, engine):
        import time

        text = "Jansen " * 2500  # quadratic context-fixpoint input
        t0 = time.monotonic()
        doc = engine.deidentify(text, time_budget_s=0.5)
        elapsed = time.monotonic() - t0
        assert doc.budget_exhausted is True
        # generous margin over the 0.5 s budget: one fixpoint round plus
        # the remaining (cheap) processors
        assert elapsed < 5.0

    def test_normal_doc_unaffected(self, engine):
        text = "Patient Jan Jansen werd gezien door dr. Peter de Visser."
        base = engine.deidentify(text)
        budgeted = engine.deidentify(text, time_budget_s=30.0)
        assert budgeted.budget_exhausted is False
        assert base.annotations == budgeted.annotations
