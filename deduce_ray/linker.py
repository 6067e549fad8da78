"""Per-document entity linking / redaction.

The reference's redactor (/root/reference/deduce/redactor.py:5-64) is, in KG
terms, entity linking + canonicalization: mentions of the same tag whose
texts are within Damerau-Levenshtein distance 1 of an earlier mention share
one per-document entity id ("TAG-n", numbered in end_char order); patient
mentions all link to the "PATIENT" entity.  This module exposes both the
entity assignment (for the triple table) and the redacted-text rendering
(for conformance testing against the reference).
"""

from __future__ import annotations

from deduce_ray.annotation import Annotation, AnnotationSet
from deduce_ray.matching import within_edit_distance_one


def assign_entity_ids(annotations: AnnotationSet) -> dict[Annotation, str]:
    """Map each annotation to its per-document entity id (no brackets)."""
    by_tag: dict[str, list[Annotation]] = {}
    for ann in annotations:
        by_tag.setdefault(ann.tag, []).append(ann)

    assignment: dict[Annotation, str] = {}
    for tag, group in by_tag.items():
        group.sort(key=lambda a: a.sort_key(("end_char",)))
        if tag == "patient":
            for ann in group:
                assignment[ann] = "PATIENT"
            continue

        labeled: list[tuple[Annotation, str]] = []
        counter = 1
        for ann in group:
            label = None
            for earlier, earlier_label in labeled:
                if within_edit_distance_one(ann.text, earlier.text):
                    label = earlier_label
                    break
            if label is None:
                label = f"{tag.upper()}-{counter}"
                counter += 1
            labeled.append((ann, label))
            assignment[ann] = label
    return assignment


class DeduceRedactor:
    def __init__(self, open_char: str = "[", close_char: str = "]") -> None:
        self.open_char = open_char
        self.close_char = close_char

    def redact(self, text: str, annotations: AnnotationSet) -> str:
        assignment = assign_entity_ids(annotations)
        pieces = []
        pos = 0
        for ann in annotations.sorted_by(("start_char",)):
            if ann.start_char < pos:
                continue  # overlapping (should not happen post-resolution)
            pieces.append(text[pos : ann.start_char])
            pieces.append(f"{self.open_char}{assignment[ann]}{self.close_char}")
            pos = ann.end_char
        pieces.append(text[pos:])
        return "".join(pieces)


def annotate_intext(text: str, annotations: AnnotationSet) -> str:
    """Render ``<TAG>span</TAG>`` markup (conformance helper, mirrors
    docdeid's annotate_intext used by tests/pipeline/test_deduce.py:72-87)."""
    pieces = []
    pos = 0
    for ann in annotations.sorted_by(("start_char",)):
        if ann.start_char < pos:
            continue
        tag = ann.tag.upper()
        pieces.append(text[pos : ann.start_char])
        pieces.append(f"<{tag}>{text[ann.start_char:ann.end_char]}</{tag}>")
        pos = ann.end_char
    pieces.append(text[pos:])
    return "".join(pieces)
