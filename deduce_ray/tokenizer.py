"""Tokenization.

Token semantics mirror the reference tokenizer
(/root/reference/deduce/tokenizer.py:6, 111-136): a token is a run of word
characters, a single newline/CR/tab, a run of 4+ spaces, or any single
non-space character; runs of 1-3 spaces are not tokens.  Multi-word merge
terms (name prefixes/interfixes such as "van der") are re-joined into single
tokens via a trie over token texts (tokenizer.py:68-109).

Unlike the reference's doubly-linked token objects, tokens here live in one
list and navigate by index — cheaper to build per document and trivially
serializable.
"""

from __future__ import annotations

import re
from collections import defaultdict
from collections.abc import Iterable, Sequence

from deduce_ray.strproc import Lowercase, apply_pipeline
from deduce_ray.structures import LookupTrie

# no IGNORECASE/MULTILINE: the pattern has no cased literals and no ^/$,
# so both flags are semantic no-ops (span-identity verified against the
# flagged form on the full corpus + unicode adversarials) — and dropping
# them measures ~7% faster finditer (flags inhibit literal-scan regex
# optimizations)
TOKEN_RE = re.compile(r"\w+|[\n\r\t]| {4,}|[^ ]")


class Token:
    """One token; knows its neighbours through the owning list."""

    __slots__ = ("text", "start_char", "end_char", "_tokens", "_i")

    def __init__(
        self,
        text: str,
        start_char: int,
        end_char: int,
        tokens: list | None = None,
        i: int = -1,
    ) -> None:
        self.text = text
        self.start_char = start_char
        self.end_char = end_char
        self._tokens = tokens
        self._i = i

    def next(self) -> "Token | None":
        if self._tokens is None or self._i + 1 >= len(self._tokens):
            return None
        return self._tokens[self._i + 1]

    def previous(self) -> "Token | None":
        if self._tokens is None or self._i <= 0:
            return None
        return self._tokens[self._i - 1]

    @property
    def index(self) -> int:
        return self._i

    def __eq__(self, other) -> bool:
        if not isinstance(other, Token):
            return NotImplemented
        return (
            self.text == other.text
            and self.start_char == other.start_char
            and self.end_char == other.end_char
        )

    def __hash__(self) -> int:
        return hash((self.text, self.start_char, self.end_char))

    def __repr__(self) -> str:
        return f"Token({self.text!r}, {self.start_char}, {self.end_char})"


class TokenList:
    """Indexable token sequence with a lazily-built inverted index used to
    prefilter candidate start tokens for lookup annotators."""

    __slots__ = ("_tokens", "_word_index_cache", "_texts", "_encoded",
                 "_encoded_lower", "_lowered", "_text_set")

    def __init__(self, tokens: list[Token]) -> None:
        self._tokens = tokens
        self._word_index_cache: dict = {}
        self._texts: list[str] | None = None
        self._encoded: list[bytes] | None = None
        self._encoded_lower: list[bytes] | None = None
        self._lowered: list[str] | None = None
        self._text_set: set[str] | None = None

    def __len__(self) -> int:
        return len(self._tokens)

    def __getitem__(self, i: int) -> Token:
        return self._tokens[i]

    def __iter__(self):
        return iter(self._tokens)

    def texts(self) -> list[str]:
        if self._texts is None:
            self._texts = [t.text for t in self._tokens]
        return self._texts

    def encoded(self) -> list[bytes]:
        """utf-8 token texts, computed once and shared by all lexicon
        probes over this document."""
        if self._encoded is None:
            # bare encode() defaults to utf-8 without the per-call codec
            # argument lookup; map() keeps the loop in C
            self._encoded = list(map(str.encode, self.texts()))
        return self._encoded

    def text_set(self) -> set[str]:
        """Distinct raw token texts, built once (C-level) and shared by
        every no-pipeline start-set intersection."""
        if self._text_set is None:
            self._text_set = set(self.texts())
        return self._text_set

    def lowered(self) -> list[str]:
        """Lowercased token texts, computed once (C-level map) and shared
        by encoded_lower and the Lowercase word index — each previously
        lowered every token independently (2x str.lower per token per
        doc on the profile)."""
        if self._lowered is None:
            self._lowered = list(map(str.lower, self.texts()))
        return self._lowered

    def encoded_lower(self) -> list[bytes]:
        if self._encoded_lower is None:
            self._encoded_lower = list(map(str.encode, self.lowered()))
        return self._encoded_lower

    def _word_index(self, pipeline_key: tuple, pipeline: Sequence) -> dict:
        index = self._word_index_cache.get(pipeline_key)
        if index is None:
            # defaultdict, not dict.setdefault: setdefault(k, []) allocates
            # a throwaway list per call even on hits (one per token here).
            # Consumers only .get()/iterate, so the insert-on-[] footgun
            # never fires.  Each pipeline's index stays LAZY: with the
            # digit gate, prose-only documents never request the Lowercase
            # index (its only consumers are regexp pre_match_words gates,
            # all of which are digit-gated first), so eagerly fusing the
            # two builds would do wasted work on the scale-dominant case.
            index = defaultdict(list)
            if not pipeline:
                for tok in self._tokens:
                    index[tok.text].append(tok)
            elif len(pipeline) == 1 and type(pipeline[0]) is Lowercase:
                for low, tok in zip(self.lowered(), self._tokens):
                    index[low].append(tok)
            else:
                for tok in self._tokens:
                    text = apply_pipeline(tok.text, pipeline)
                    if text is None:
                        continue
                    index[text].append(tok)
            self._word_index_cache[pipeline_key] = index
        return index

    @staticmethod
    def _pipeline_key(pipeline: Sequence | None) -> tuple:
        # Key by class name PLUS constructor parameters: two pipelines with
        # the same classes but different parameters (FilterByLength(2) vs
        # FilterByLength(4)) must not share cache entries.  Bare id() keys
        # are unsafe here — a garbage-collected transient processor's
        # address can be reused by its successor, silently colliding.
        # Unhashable attribute values (e.g. a LookupSet) fall back to id(),
        # which is safe for those long-lived lexicon structures.
        parts = []
        for p in (pipeline or ()):
            part = getattr(p, "_pipeline_key_part", None)
            if part is None:
                try:
                    attrs = []
                    for k, v in sorted(vars(p).items()):
                        if k == "_pipeline_key_part":
                            continue
                        try:
                            hash(v)
                            attrs.append((k, v))
                        except TypeError:
                            attrs.append((k, id(v)))
                    part = (type(p).__name__, tuple(attrs))
                except TypeError:  # __slots__ objects without __dict__
                    part = (type(p).__name__, id(p))
                # memoize on the instance (hot path calls this per lookup);
                # the memo dies with the object, so no id-reuse hazard
                try:
                    p._pipeline_key_part = part
                except AttributeError:
                    pass
            parts.append(part)
        return tuple(parts)

    def get_words(self, pipeline: Sequence | None = None) -> set[str]:
        # memoized: every gated RegexpAnnotator (10+ per full-engine doc)
        # asks for the same lowercase word set; building set(index) anew
        # per caller was a measurable share of the regexp stage
        key = self._pipeline_key(pipeline)
        memo_key = ("get_words", key)
        words = self._word_index_cache.get(memo_key)
        if words is None:
            if (
                pipeline is not None
                and len(pipeline) == 1
                and type(pipeline[0]) is Lowercase
            ):
                # the word SET is all get_words callers need; building it
                # straight from the lowered text list (one C-level set())
                # skips materializing the token-valued Lowercase index,
                # which has no other consumer on the gated-regexp path
                words = set(self.lowered())
            else:
                words = set(self._word_index(key, pipeline or ()))
            self._word_index_cache[memo_key] = words
        return words

    def token_lookup(
        self, lookup_values: set[str], matching_pipeline: Sequence | None = None
    ) -> list[Token]:
        """Tokens whose (normalized) text is in ``lookup_values``, in
        document order.

        Results are memoized per (lookup set, pipeline): the name
        token-pattern annotators share their start sets three ways (prefix
        x3, initial x2), so each distinct candidate list is computed once
        per document.  The memo keys on id(lookup_values) but stores the
        set itself alongside the result and re-checks identity on hit —
        holding the strong reference means the id cannot be recycled by a
        different set while the entry is alive, so a transient caller set
        can never alias a stale entry."""
        pipeline_key = self._pipeline_key(matching_pipeline)
        memo_key = ("token_lookup", id(lookup_values), pipeline_key)
        cached = self._word_index_cache.get(memo_key)
        if cached is not None and cached[0] is lookup_values:
            return cached[1]
        hits: list[Token]
        if not matching_pipeline:
            # raw-text lookups (all six name-pattern start sets): one
            # C-level set intersection decides emptiness first — most
            # documents contain no start word, so the Python scan is
            # skipped entirely; when some ARE present, scanning against
            # the (tiny) intersection beats probing the full lookup set
            present = self.text_set().intersection(lookup_values)
            if not present:
                hits = []
            else:
                hits = [
                    tok
                    for text, tok in zip(self.texts(), self._tokens)
                    if text in present
                ]
        else:
            index = self._word_index(pipeline_key, matching_pipeline)
            hits = []
            if len(lookup_values) < len(index):
                for value in lookup_values:
                    found = index.get(value)
                    if found:
                        hits.extend(found)
                hits.sort(key=lambda t: t.start_char)
            else:
                for text, toks in index.items():
                    if text in lookup_values:
                        hits.extend(toks)
                hits.sort(key=lambda t: t.start_char)
        self._word_index_cache[memo_key] = (lookup_values, hits)
        return hits


class WordTokenizer:
    """Regex tokenizer with multi-word merge terms."""

    def __init__(self, merge_terms: Iterable[str] | None = None) -> None:
        self._merge_trie: LookupTrie | None = None
        self._merge_start_words: set[str] = set()
        if merge_terms is not None:
            trie = LookupTrie()
            for term in merge_terms:
                parts = [m.group(0) for m in TOKEN_RE.finditer(term)]
                if not parts:
                    continue
                trie.add_item(parts)
                self._merge_start_words.add(parts[0])
            self._merge_trie = trie

    def tokenize(self, text: str) -> TokenList:
        # one pass builds tokens AND their text list (the text list would
        # otherwise be rebuilt by _merge and again by TokenList.texts();
        # m.span() + a slice is one C call cheaper than group/start/end)
        raw: list[Token] = []
        texts: list[str] = []
        t_append = raw.append
        x_append = texts.append
        for m in TOKEN_RE.finditer(text):
            s, e = m.span()
            t = text[s:e]
            x_append(t)
            t_append(Token(t, s, e))

        # isdisjoint is one C-level pass; most documents contain no merge
        # start word at all, so the Python _merge loop (and its full
        # list rebuild) is skipped for them
        if (
            self._merge_trie is not None
            and raw
            and not self._merge_start_words.isdisjoint(texts)
        ):
            raw, texts = self._merge(text, raw, texts)

        for i, tok in enumerate(raw):
            tok._tokens = raw
            tok._i = i
        tlist = TokenList(raw)
        tlist._texts = texts
        return tlist

    def _merge(
        self, text: str, tokens: list[Token], texts: list[str]
    ) -> tuple[list[Token], list[str]]:
        out: list[Token] = []
        out_texts: list[str] = []
        i = 0
        n = len(tokens)
        start_words = self._merge_start_words
        trie = self._merge_trie
        while i < n:
            if texts[i] not in start_words:
                out.append(tokens[i])
                out_texts.append(texts[i])
                i += 1
                continue
            span = trie.longest_matching_prefix(texts, start_i=i)
            if span <= 1:
                out.append(tokens[i])
                out_texts.append(texts[i])
                i += 1
            else:
                first, last = tokens[i], tokens[i + span - 1]
                merged = text[first.start_char : last.end_char]
                out.append(
                    Token(merged, first.start_char, last.end_char)
                )
                out_texts.append(merged)
                i += span
        return out, out_texts
