"""String normalizers and filters used by lookup-structure pipelines.

Semantics mirror the reference's string-processor stack
(/root/reference/deduce/str/processor.py:7-100 plus the docdeid built-ins it
uses: lowercase, strip, length filter, non-ascii folding, value replace).
Implemented as tiny callables: a *modifier* maps str -> str, a *filter*
maps str -> bool (False drops the item from a cleaning pipeline).
"""

from __future__ import annotations

import re
import unicodedata
from collections.abc import Iterable, Sequence


class StrModifier:
    """Base class for str -> str processors."""

    is_filter = False

    def __call__(self, item: str) -> str:
        raise NotImplementedError


class StrFilter:
    """Base class for str -> bool processors (False = drop)."""

    is_filter = True

    def __call__(self, item: str) -> bool:
        raise NotImplementedError


class Lowercase(StrModifier):
    def __call__(self, item: str) -> str:
        return item.lower()


class Strip(StrModifier):
    def __call__(self, item: str) -> str:
        return item.strip()


class Uppercase(StrModifier):
    def __call__(self, item: str) -> str:
        return item.upper()


class UppercaseFirstChar(StrModifier):
    def __call__(self, item: str) -> str:
        return item[0].upper() + item[1:] if item else item


class Titlecase(StrModifier):
    def __call__(self, item: str) -> str:
        return item.title()


class TakeLastToken(StrModifier):
    def __call__(self, item: str) -> str:
        return item.split(" ")[-1]


class FoldNonAscii(StrModifier):
    """Replace accented characters by their ascii base form (é -> e)."""

    def __call__(self, item: str) -> str:
        return (
            unicodedata.normalize("NFKD", item)
            .encode("ascii", "ignore")
            .decode("ascii")
        )


class ReplaceValue(StrModifier):
    def __init__(self, find: str, replace: str) -> None:
        self.find = find
        self.replace = replace

    def __call__(self, item: str) -> str:
        return item.replace(self.find, self.replace)


class RemoveValues(StrModifier):
    """Remove the given values when they occur as whole words."""

    def __init__(self, filter_values: Sequence[str]) -> None:
        self.filter_values = list(filter_values)

    def __call__(self, item: str) -> str:
        for value in self.filter_values:
            v = re.escape(value)  # values are literals, not regex fragments
            item = re.sub(r"(^" + v + r" | " + v + r" | " + v + r"$)", "", item)
        return item


class Acronimify(StrModifier):
    """Split on ``split_value`` and keep the first char of every part."""

    def __init__(self, split_value: str = " ", join_value: str = "") -> None:
        self.split_value = split_value
        self.join_value = join_value

    def __call__(self, item: str) -> str:
        return self.join_value.join(
            part[0] for part in item.split(self.split_value) if part
        )


class FilterByLength(StrFilter):
    def __init__(self, min_len: int) -> None:
        self.min_len = min_len

    def __call__(self, item: str) -> bool:
        return len(item) >= self.min_len


class FilterNotIn(StrFilter):
    """Keep items NOT present in the given lookup set (optionally
    case-insensitive), mirroring FilterBasedOnLookupSet
    (/root/reference/deduce/str/processor.py:82-100)."""

    def __init__(self, filter_items: Iterable[str], case_sensitive: bool = True) -> None:
        if case_sensitive:
            self._items = set(filter_items)
            self._lower = False
        else:
            self._items = {x.lower() for x in filter_items}
            self._lower = True

    def __call__(self, item: str) -> bool:
        probe = item.lower() if self._lower else item
        return probe not in self._items


def apply_pipeline(item: str, pipeline: Sequence) -> str | None:
    """Run one item through a pipeline of modifiers/filters.

    Returns the transformed item, or None if a filter dropped it.
    """
    for proc in pipeline:
        if proc.is_filter:
            if not proc(item):
                return None
        else:
            item = proc(item)
    return item


def apply_pipeline_iter(items: Iterable[str], pipeline: Sequence) -> list[str]:
    out = []
    for item in items:
        item = apply_pipeline(item, pipeline)
        if item is not None:
            out.append(item)
    return out
