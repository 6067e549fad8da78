"""Lookup structures: LookupSet, LookupTrie, and a named collection.

These are the engine's broadcast "database": compiled once on the driver,
shipped to every annotator actor (see deduce_ray.rayops).  Semantics mirror
the reference's docdeid lookup structures as evidenced by call sites in
/root/reference/deduce (lookup_struct_loader.py, tokenizer.py:94-107,
utils.py:261-280): a matching pipeline normalizes both stored items and
probes; a cleaning pipeline transforms/drops items at insert time.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

from deduce_ray.strproc import apply_pipeline, apply_pipeline_iter

# Sentinel key marking "a stored sequence ends here" inside trie nodes.
_END = ""


class LookupSet:
    """A set of strings with insert-time cleaning and probe-time matching
    normalization."""

    __slots__ = ("_items", "matching_pipeline")

    def __init__(self, matching_pipeline: Sequence | None = None) -> None:
        self._items: set[str] = set()
        self.matching_pipeline = list(matching_pipeline or [])

    def _normalize(self, item: str) -> str | None:
        if not self.matching_pipeline:
            return item
        return apply_pipeline(item, self.matching_pipeline)

    def add_items_from_iterable(
        self, items: Iterable[str], cleaning_pipeline: Sequence | None = None
    ) -> "LookupSet":
        if cleaning_pipeline:
            items = apply_pipeline_iter(items, cleaning_pipeline)
        if self.matching_pipeline:
            items = apply_pipeline_iter(items, self.matching_pipeline)
        self._items.update(items)
        return self

    def add_items_from_self(
        self, cleaning_pipeline: Sequence, replace: bool = False
    ) -> "LookupSet":
        snapshot = list(self._items)
        if replace:
            self._items = set()
        self.add_items_from_iterable(snapshot, cleaning_pipeline=cleaning_pipeline)
        return self

    def remove_items_from_iterable(self, items: Iterable[str]) -> "LookupSet":
        for item in items:
            norm = self._normalize(item)
            if norm is not None:
                self._items.discard(norm)
        return self

    def items(self) -> set[str]:
        return self._items

    def __contains__(self, item: str) -> bool:
        norm = self._normalize(item)
        return norm is not None and norm in self._items

    def __iter__(self):
        return iter(self._items)

    def __len__(self) -> int:
        return len(self._items)

    def __sub__(self, other: "LookupSet") -> "LookupSet":
        result = LookupSet(matching_pipeline=self.matching_pipeline)
        result._items = self._items - set(other.items())
        return result

    def __add__(self, other: "LookupSet") -> "LookupSet":
        result = LookupSet(matching_pipeline=self.matching_pipeline)
        result._items = self._items | set(other.items())
        return result


class LookupTrie:
    """A trie over token-text sequences.

    Nodes are plain nested dicts (token text -> child node); the empty-string
    key marks sequence end.  ``longest_matching_prefix`` returns the length
    of the longest stored sequence matching ``tokens[start_i:]``, or 0.
    """

    __slots__ = ("_root", "matching_pipeline")

    def __init__(self, matching_pipeline: Sequence | None = None) -> None:
        self._root: dict = {}
        self.matching_pipeline = list(matching_pipeline or [])

    def _norm(self, token_text: str) -> str | None:
        if not self.matching_pipeline:
            return token_text
        return apply_pipeline(token_text, self.matching_pipeline)

    def add_item(self, tokens: Sequence[str]) -> None:
        node = self._root
        for tok in tokens:
            tok = self._norm(tok)
            if tok is None:
                return
            nxt = node.get(tok)
            if nxt is None:
                nxt = {}
                node[tok] = nxt
            node = nxt
        node[_END] = True

    def __contains__(self, tokens: Sequence[str]) -> bool:
        node = self._root
        for tok in tokens:
            tok = self._norm(tok)
            node = node.get(tok) if tok is not None else None
            if node is None:
                return False
        return _END in node

    def start_words(self) -> set[str]:
        """First-level keys; used to prefilter candidate start tokens."""
        return {k for k in self._root if k != _END}

    def longest_matching_prefix(
        self, tokens_text: Sequence[str], start_i: int = 0
    ) -> int:
        """Length (in tokens) of the longest stored sequence that is a prefix
        of ``tokens_text[start_i:]``; 0 if none."""
        node = self._root
        longest = 0
        i = start_i
        n = len(tokens_text)
        norm = self._norm if self.matching_pipeline else None
        while True:
            if _END in node:
                longest = i - start_i
            if i >= n:
                break
            tok = tokens_text[i]
            if norm is not None:
                tok = norm(tok)
                if tok is None:
                    break
            node = node.get(tok)
            if node is None:
                break
            i += 1
        return longest

    def __len__(self) -> int:
        count = 0
        stack = [self._root]
        while stack:
            node = stack.pop()
            for key, child in node.items():
                if key == _END:
                    count += 1
                else:
                    stack.append(child)
        return count

    def find_spans(self, texts: Sequence[str]) -> list[tuple[int, int]]:
        """All (start_index, longest_matching_length) spans over token texts
        (same contract as PackedTrie.find_spans)."""
        spans = []
        root = self._root
        norm = self._norm if self.matching_pipeline else None
        for i in range(len(texts)):
            tok = texts[i]
            if norm is not None:
                tok = norm(tok)
                if tok is None:
                    continue
            if tok not in root:
                continue
            length = self.longest_matching_prefix(texts, start_i=i)
            if length:
                spans.append((i, length))
        return spans


class DsCollection(dict):
    """Named collection of lookup structures (plain dict subclass)."""
