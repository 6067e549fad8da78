"""Annotation-set processors: overlap resolution, adjacent merging, tag
cleanup, and the person-annotation converter.

Overlap resolution uses a character-coverage mask: annotations are visited in
rank order; a lower-ranked annotation overlapping already-claimed characters
is trimmed to its unclaimed character runs (possibly dropped entirely).  This
reproduces the partial punch-out semantics evidenced by the reference's
tests (tests/unit/test_annotation_processor.py:139-161: patient "Jan" +
persoon "Jan Jansen" -> patient "Jan", persoon " Jansen").
"""

from __future__ import annotations

import re
from collections.abc import Callable, Sequence

from deduce_ray.annotation import Annotation, AnnotationSet


class AnnotationProcessor:
    def process_annotations(
        self, annotations: AnnotationSet, text: str
    ) -> AnnotationSet:
        raise NotImplementedError


class OverlapResolver(AnnotationProcessor):
    def __init__(
        self,
        sort_by: Sequence[str],
        sort_by_callbacks: dict[str, Callable] | None = None,
    ) -> None:
        self.sort_by = tuple(sort_by)
        self.sort_by_callbacks = dict(sort_by_callbacks or {})

    def process_annotations(
        self, annotations: AnnotationSet, text: str
    ) -> AnnotationSet:
        mask = bytearray(len(text))
        result = AnnotationSet()

        for ann in annotations.sorted_by(self.sort_by, self.sort_by_callbacks):
            start, end = ann.start_char, ann.end_char
            segment = mask[start:end]
            if 1 not in segment:
                result.add(ann)
                mask[start:end] = b"\x01" * (end - start)
                continue

            # claim each still-unclaimed character run as a trimmed annotation
            run_start = None
            for offset in range(len(segment) + 1):
                free = offset < len(segment) and segment[offset] == 0
                if free and run_start is None:
                    run_start = offset
                elif not free and run_start is not None:
                    result.add(
                        Annotation(
                            text=ann.text[run_start:offset],
                            start_char=start + run_start,
                            end_char=start + offset,
                            tag=ann.tag,
                        )
                    )
                    mask[start + run_start : start + offset] = b"\x01" * (
                        offset - run_start
                    )
                    run_start = None

        return result


class MergeAdjacentAnnotations(AnnotationProcessor):
    """Merges annotations with matching tags whose gap fully matches the
    slack regexp (or is empty)."""

    def __init__(self, slack_regexp: str | None = None) -> None:
        self.slack = re.compile(slack_regexp) if slack_regexp else None

    def _tags_match(self, left_tag: str, right_tag: str) -> bool:
        return left_tag == right_tag

    def _merged_tag(self, left_tag: str, right_tag: str) -> str:
        return left_tag

    def process_annotations(
        self, annotations: AnnotationSet, text: str
    ) -> AnnotationSet:
        result = AnnotationSet()
        pending: Annotation | None = None

        for ann in annotations.sorted_by(("start_char",)):
            if pending is None:
                pending = ann
                continue
            gap = text[pending.end_char : ann.start_char]
            adjacent = self._tags_match(pending.tag, ann.tag) and (
                gap == "" if self.slack is None else self.slack.fullmatch(gap) is not None
            )
            if adjacent:
                pending = Annotation(
                    text=text[pending.start_char : ann.end_char],
                    start_char=pending.start_char,
                    end_char=ann.end_char,
                    tag=self._merged_tag(pending.tag, ann.tag),
                )
            else:
                result.add(pending)
                pending = ann

        if pending is not None:
            result.add(pending)
        return result


class DeduceMergeAdjacentAnnotations(MergeAdjacentAnnotations):
    """patient/persoon count as matching tags and merge to patient
    (reference: annotation_processor.py:8-54)."""

    def _tags_match(self, left_tag: str, right_tag: str) -> bool:
        return left_tag == right_tag or {left_tag, right_tag} == {"patient", "persoon"}

    def _merged_tag(self, left_tag: str, right_tag: str) -> str:
        return left_tag if left_tag == right_tag else "patient"


def _name_tag_rank(tag: str) -> int:
    if "pseudo" in tag:
        return 0
    if "patient" in tag:
        return 1
    return 2


class PersonAnnotationConverter(AnnotationProcessor):
    """Resolves overlap among name annotations (pseudo < patient < persoon
    rank, longest-first), drops pseudo and whitespace-only results, and maps
    tags to patient/persoon (reference: annotation_processor.py:57-101)."""

    def __init__(self) -> None:
        self._resolver = OverlapResolver(
            sort_by=("tag", "length"),
            sort_by_callbacks={"tag": _name_tag_rank, "length": lambda x: -x},
        )

    def process_annotations(
        self, annotations: AnnotationSet, text: str
    ) -> AnnotationSet:
        resolved = self._resolver.process_annotations(annotations, text)
        return AnnotationSet(
            Annotation(
                text=ann.text,
                start_char=ann.start_char,
                end_char=ann.end_char,
                tag="patient" if "patient" in ann.tag else "persoon",
            )
            for ann in resolved
            if "pseudo" not in ann.tag and ann.text.strip() != ""
        )


class RemoveAnnotations(AnnotationProcessor):
    def __init__(self, tags: Sequence[str]) -> None:
        self.tags = set(tags)

    def process_annotations(
        self, annotations: AnnotationSet, text: str
    ) -> AnnotationSet:
        return AnnotationSet(a for a in annotations if a.tag not in self.tags)


class CleanAnnotationTag(AnnotationProcessor):
    def __init__(self, tag_map: dict[str, str]) -> None:
        self.tag_map = dict(tag_map)

    def process_annotations(
        self, annotations: AnnotationSet, text: str
    ) -> AnnotationSet:
        result = AnnotationSet()
        for ann in annotations:
            new_tag = self.tag_map.get(ann.tag)
            if new_tag is None:
                result.add(ann)
            else:
                result.add(
                    Annotation(
                        text=ann.text,
                        start_char=ann.start_char,
                        end_char=ann.end_char,
                        tag=new_tag,
                        priority=ann.priority,
                        start_token=ann.start_token,
                        end_token=ann.end_token,
                    )
                )
        return result
