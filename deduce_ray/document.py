"""Per-row document state: text + metadata + cached tokens + annotations."""

from __future__ import annotations

import re

from deduce_ray.annotation import AnnotationSet
from deduce_ray.tokenizer import TokenList, WordTokenizer

_DIGIT_RE = re.compile(r"\d")


class MetaData:
    """Dict-like metadata where missing keys read as None."""

    __slots__ = ("_items",)

    def __init__(self, items: dict | None = None) -> None:
        self._items = dict(items or {})

    def __getitem__(self, key: str):
        return self._items.get(key)

    def __setitem__(self, key: str, value) -> None:
        self._items[key] = value

    def __contains__(self, key: str) -> bool:
        return key in self._items


class Document:
    __slots__ = (
        "text",
        "metadata",
        "annotations",
        "deidentified_text",
        "budget_exhausted",
        "_deadline",
        "_tokenizer",
        "_tokens",
        "_has_digit",
    )

    def __init__(
        self,
        text: str,
        tokenizer: WordTokenizer | None = None,
        metadata: dict | None = None,
    ) -> None:
        self.text = text
        self.metadata = MetaData(metadata)
        self.annotations = AnnotationSet()
        self.deidentified_text: str | None = None
        # set when a per-document time budget cut processing short
        # (engine.deidentify time_budget_s); annotations present are
        # valid but possibly incomplete
        self.budget_exhausted = False
        self._deadline: float | None = None
        self._tokenizer = tokenizer
        self._tokens: TokenList | None = None
        self._has_digit: bool | None = None

    def has_digit(self) -> bool:
        """Whether the text contains any decimal digit, computed once.

        Cheap C-level gate for annotators whose pattern must consume a
        digit (dates, ids, postal codes, phone, bsn, ages): a digit-free
        document provably cannot match them, and prose-heavy corpora are
        mostly digit-free, so one search saves 8+ full regex scans."""
        if self._has_digit is None:
            self._has_digit = _DIGIT_RE.search(self.text) is not None
        return self._has_digit

    def get_tokens(self) -> TokenList:
        if self._tokens is None:
            if self._tokenizer is None:
                raise RuntimeError("document has no tokenizer")
            self._tokens = self._tokenizer.tokenize(self.text)
        return self._tokens
