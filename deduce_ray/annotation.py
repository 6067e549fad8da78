"""Annotation span records and sets.

Equality/hash cover (text, start_char, end_char, tag) — priority and token
anchors are bookkeeping, which matches how the reference test corpus compares
golden sets (annotations in tests/data/regression_cases/*.json carry only
those four fields).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence


class Annotation:
    __slots__ = ("text", "start_char", "end_char", "tag", "priority", "start_token", "end_token")

    def __init__(
        self,
        text: str,
        start_char: int,
        end_char: int,
        tag: str,
        priority: int = 0,
        start_token=None,
        end_token=None,
    ) -> None:
        self.text = text
        self.start_char = start_char
        self.end_char = end_char
        self.tag = tag
        self.priority = priority
        self.start_token = start_token
        self.end_token = end_token

    @property
    def length(self) -> int:
        return self.end_char - self.start_char

    def __eq__(self, other) -> bool:
        if not isinstance(other, Annotation):
            return NotImplemented
        return (
            self.start_char == other.start_char
            and self.end_char == other.end_char
            and self.tag == other.tag
            and self.text == other.text
        )

    def __hash__(self) -> int:
        return hash((self.text, self.start_char, self.end_char, self.tag))

    def __repr__(self) -> str:
        return (
            f"Annotation({self.text!r}, {self.start_char}, {self.end_char}, "
            f"{self.tag!r}, priority={self.priority})"
        )

    def sort_key(
        self,
        by: Sequence[str],
        callbacks: dict[str, Callable] | None = None,
    ) -> tuple:
        """Sort key over the given attributes, with a deterministic tail so
        ties never depend on set iteration order."""
        key = []
        for attr in by:
            value = getattr(self, attr)
            if callbacks and attr in callbacks:
                value = callbacks[attr](value)
            key.append(value)
        key.append(self.end_char)
        key.append(self.start_char)
        key.append(self.tag)
        key.append(self.text)
        return tuple(key)


class AnnotationSet(set):
    """Set of annotations with sorted-view helpers."""

    def sorted_by(
        self,
        by: Sequence[str],
        callbacks: dict[str, Callable] | None = None,
    ) -> list[Annotation]:
        return sorted(self, key=lambda a: a.sort_key(by, callbacks))
