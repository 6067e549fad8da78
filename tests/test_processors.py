"""Set-processor and linker tests; scenarios mirror the reference's
tests/unit/test_annotation_processor.py and test_redactor.py."""

from deduce_ray.annotation import Annotation, AnnotationSet
from deduce_ray.linker import DeduceRedactor, assign_entity_ids
from deduce_ray.processors import (
    CleanAnnotationTag,
    DeduceMergeAdjacentAnnotations,
    OverlapResolver,
    PersonAnnotationConverter,
    RemoveAnnotations,
)


class TestOverlapResolver:
    def test_priority_wins_and_trims(self):
        resolver = OverlapResolver(
            sort_by=("priority", "length"),
            sort_by_callbacks={"priority": lambda x: -x, "length": lambda x: -x},
        )
        text = "x 111222333 x"
        anns = AnnotationSet(
            [
                Annotation("111222333", 2, 11, "bsn", priority=100),
                Annotation("111222333", 2, 11, "id"),
            ]
        )
        assert resolver.process_annotations(anns, text) == AnnotationSet(
            [Annotation("111222333", 2, 11, "bsn")]
        )

    def test_partial_trim(self):
        resolver = OverlapResolver(
            sort_by=("priority", "length"),
            sort_by_callbacks={"priority": lambda x: -x, "length": lambda x: -x},
        )
        text = "Jan Jansen"
        anns = AnnotationSet(
            [
                Annotation("Jan", 0, 3, "patient", priority=1),
                Annotation("Jan Jansen", 0, 10, "persoon"),
            ]
        )
        got = resolver.process_annotations(anns, text)
        assert got == AnnotationSet(
            [
                Annotation("Jan", 0, 3, "patient"),
                Annotation(" Jansen", 3, 10, "persoon"),
            ]
        )


class TestPersonConverter:
    def test_patient_no_overlap(self):
        proc = PersonAnnotationConverter()
        anns = AnnotationSet(
            [
                Annotation("Jan", 0, 3, "voornaam_patient"),
                Annotation("Jansen", 4, 10, "achternaam_patient"),
            ]
        )
        assert proc.process_annotations(anns, "Jan Jansen") == AnnotationSet(
            [
                Annotation("Jan", 0, 3, "patient"),
                Annotation("Jansen", 4, 10, "patient"),
            ]
        )

    def test_patient_with_overlap_longest_wins(self):
        proc = PersonAnnotationConverter()
        anns = AnnotationSet(
            [
                Annotation("Jan", 0, 3, "voornaam_patient"),
                Annotation("Jan Jansen", 0, 10, "naam_patient"),
            ]
        )
        assert proc.process_annotations(anns, "Jan Jansen") == AnnotationSet(
            [Annotation("Jan Jansen", 0, 10, "patient")]
        )

    def test_mixed_overlap_trims_persoon(self):
        proc = PersonAnnotationConverter()
        anns = AnnotationSet(
            [
                Annotation("Jan", 0, 3, "voornaam_patient"),
                Annotation("Jan Jansen", 0, 10, "naam_onbekend"),
            ]
        )
        assert proc.process_annotations(anns, "Jan Jansen") == AnnotationSet(
            [
                Annotation("Jan", 0, 3, "patient"),
                Annotation(" Jansen", 3, 10, "persoon"),
            ]
        )

    def test_pseudo_deletes_overlapping_names(self):
        proc = PersonAnnotationConverter()
        anns = AnnotationSet(
            [
                Annotation("Henoch", 0, 6, "voornaam"),
                Annotation("Henoch Schonlein", 0, 16, "pseudo_naam"),
            ]
        )
        assert proc.process_annotations(anns, "Henoch Schonlein") == AnnotationSet()


class TestMergeAdjacent:
    def test_equal_tags_merge_over_slack(self):
        proc = DeduceMergeAdjacentAnnotations(
            slack_regexp="[\\. \\-]?[\\. ]?"
        )
        text = "Jan Jansen"
        anns = AnnotationSet(
            [
                Annotation("Jan", 0, 3, "persoon"),
                Annotation("Jansen", 4, 10, "persoon"),
            ]
        )
        assert proc.process_annotations(anns, text) == AnnotationSet(
            [Annotation("Jan Jansen", 0, 10, "persoon")]
        )

    def test_mixed_patient_persoon_merges_to_patient(self):
        proc = DeduceMergeAdjacentAnnotations(
            slack_regexp="[\\. \\-]?[\\. ]?"
        )
        text = "Jan Jansen"
        anns = AnnotationSet(
            [
                Annotation("Jan", 0, 3, "patient"),
                Annotation("Jansen", 4, 10, "persoon"),
            ]
        )
        assert proc.process_annotations(anns, text) == AnnotationSet(
            [Annotation("Jan Jansen", 0, 10, "patient")]
        )

    def test_different_tags_do_not_merge(self):
        proc = DeduceMergeAdjacentAnnotations(
            slack_regexp="[\\. \\-]?[\\. ]?"
        )
        text = "Jan Utrecht"
        anns = AnnotationSet(
            [
                Annotation("Jan", 0, 3, "persoon"),
                Annotation("Utrecht", 4, 11, "locatie"),
            ]
        )
        assert proc.process_annotations(anns, text) == anns

    def test_gap_exceeding_slack_does_not_merge(self):
        proc = DeduceMergeAdjacentAnnotations(
            slack_regexp="[\\. \\-]?[\\. ]?"
        )
        text = "Jan en Jansen"
        anns = AnnotationSet(
            [
                Annotation("Jan", 0, 3, "persoon"),
                Annotation("Jansen", 7, 13, "persoon"),
            ]
        )
        assert proc.process_annotations(anns, text) == anns


class TestRemoveAndClean:
    def test_remove(self):
        proc = RemoveAnnotations(tags=["straat", "nope"])
        anns = AnnotationSet(
            [
                Annotation("Herestraat", 0, 10, "straat"),
                Annotation("12", 11, 13, "huisnummer"),
            ]
        )
        assert proc.process_annotations(anns, "_") == AnnotationSet(
            [Annotation("12", 11, 13, "huisnummer")]
        )

    def test_clean_tag(self):
        proc = CleanAnnotationTag(tag_map={"straat+huisnummer": "locatie"})
        anns = AnnotationSet(
            [Annotation("Herestraat 12", 0, 13, "straat+huisnummer", priority=1)]
        )
        got = proc.process_annotations(anns, "_")
        assert got == AnnotationSet([Annotation("Herestraat 12", 0, 13, "locatie")])
        assert next(iter(got)).priority == 1


class TestRedactorAndLinker:
    def test_patient_replacement(self):
        red = DeduceRedactor()
        anns = AnnotationSet(
            [
                Annotation("Jan", 0, 3, "patient"),
                Annotation("Jansen", 4, 10, "patient"),
            ]
        )
        assert red.redact("Jan Jansen", anns) == "[PATIENT] [PATIENT]"

    def test_tag_numbering(self):
        red = DeduceRedactor()
        text = "Jan Jansen, wonende in Rotterdam, verhuisd vanuit Groningen"
        anns = AnnotationSet(
            [
                Annotation("Rotterdam", 23, 32, "woonplaats"),
                Annotation("Groningen", 50, 59, "woonplaats"),
            ]
        )
        assert red.redact(text, anns) == (
            "Jan Jansen, wonende in [WOONPLAATS-1], verhuisd vanuit [WOONPLAATS-2]"
        )

    def test_fuzzy_entity_reuse(self):
        red = DeduceRedactor()
        text = "Jan Jansen, wonende in Ommen, verhuisd vanuit Emmen"
        anns = AnnotationSet(
            [
                Annotation("Ommen", 23, 28, "woonplaats"),
                Annotation("Emmen", 46, 51, "woonplaats"),
            ]
        )
        assert red.redact(text, anns) == (
            "Jan Jansen, wonende in [WOONPLAATS-1], verhuisd vanuit [WOONPLAATS-1]"
        )

    def test_assign_entity_ids(self):
        anns = AnnotationSet(
            [
                Annotation("Jan", 0, 3, "patient"),
                Annotation("Ommen", 23, 28, "woonplaats"),
                Annotation("Emmen", 46, 51, "woonplaats"),
            ]
        )
        ids = assign_entity_ids(anns)
        by_text = {a.text: e for a, e in ids.items()}
        assert by_text["Jan"] == "PATIENT"
        assert by_text["Ommen"] == "WOONPLAATS-1"
        assert by_text["Emmen"] == "WOONPLAATS-1"
