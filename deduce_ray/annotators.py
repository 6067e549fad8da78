"""Annotators: per-document span extractors.

Each annotator maps a Document to a list of Annotations (ContextAnnotator
rewrites the document's annotation set in place instead).  Behavior mirrors
the reference pipeline stages configured in
/root/reference/deduce/base_config.json:15-533 and implemented in
/root/reference/deduce/annotator.py — re-implemented from observed semantics
(the reference's unit tests are replayed against this module in tests/).
"""

from __future__ import annotations

import re
import time
from collections.abc import Sequence

from deduce_ray.annotation import Annotation, AnnotationSet
from deduce_ray.document import Document
from deduce_ray.matching import str_match
from deduce_ray.strproc import Lowercase
from deduce_ray.structures import DsCollection, LookupSet, LookupTrie
from deduce_ray.tokenizer import Token, WordTokenizer

_LOWER = [Lowercase()]


class Annotator:
    """Base: every annotator has a tag and a priority."""

    def __init__(self, tag: str, priority: int = 0) -> None:
        self.tag = tag
        self.priority = priority

    def annotate(self, doc: Document) -> list[Annotation]:
        raise NotImplementedError


# ---------------------------------------------------------------------------
# token-pattern predicate language
# (reference: annotator.py:29-83; truth tables in tests/unit/test_annotator.py)
# ---------------------------------------------------------------------------


def match_position(spec: dict, token: Token, ds: DsCollection | None) -> bool:
    """Evaluate a single-position predicate dict against one token."""
    if len(spec) != 1:
        raise ValueError(f"pattern position must have exactly 1 key: {spec}")
    op, arg = next(iter(spec.items()))
    text = token.text

    if op == "equal":
        return text == arg
    if op == "re_match":
        if isinstance(arg, re.Pattern):
            return arg.match(text) is not None
        return re.match(arg, text) is not None
    if op == "is_initials":
        return (len(text) <= 4 and text.isupper()) == arg
    if op == "like_name":
        return (
            len(text) >= 3 and text.istitle() and not any(c.isdigit() for c in text)
        ) == arg
    if op == "lookup":
        return text in ds[arg]
    if op == "neg_lookup":
        return text not in ds[arg]
    if op == "and":
        return all(match_position(sub, token, ds) for sub in arg)
    if op == "or":
        return any(match_position(sub, token, ds) for sub in arg)
    raise NotImplementedError(f"unknown pattern predicate: {op}")


def compile_position(spec: dict, ds: DsCollection | None):
    """Compile a single-position predicate dict into a closure — the dict
    dispatch in match_position costs real time at one call per token per
    pattern position; compiled closures skip it.  Semantics identical to
    match_position (shared conformance tests)."""
    if len(spec) != 1:
        raise ValueError(f"pattern position must have exactly 1 key: {spec}")
    op, arg = next(iter(spec.items()))

    if op == "equal":
        return lambda token: token.text == arg
    if op == "re_match":
        pattern = arg if isinstance(arg, re.Pattern) else re.compile(arg)
        match = pattern.match
        return lambda token: match(token.text) is not None
    if op == "is_initials":
        if arg:
            return lambda token: len(token.text) <= 4 and token.text.isupper()
        return lambda token: not (len(token.text) <= 4 and token.text.isupper())
    if op == "like_name":
        def like_name(token, _want=bool(arg)):
            text = token.text
            return (
                len(text) >= 3
                and text.istitle()
                and not any(c.isdigit() for c in text)
            ) == _want

        return like_name
    if op == "lookup":
        struct = ds[arg]
        return lambda token: token.text in struct
    if op == "neg_lookup":
        struct = ds[arg]
        return lambda token: token.text not in struct
    if op == "and":
        subs = [compile_position(sub, ds) for sub in arg]
        return lambda token: all(fn(token) for fn in subs)
    if op == "or":
        subs = [compile_position(sub, ds) for sub in arg]
        return lambda token: any(fn(token) for fn in subs)
    raise NotImplementedError(f"unknown pattern predicate: {op}")


def compile_pattern_regexps(pattern) -> None:
    """Precompile every ``re_match`` value inside a (possibly nested)
    pattern spec in place — avoids the re-cache lookup per token."""
    if isinstance(pattern, list):
        for item in pattern:
            compile_pattern_regexps(item)
    elif isinstance(pattern, dict):
        for key, value in pattern.items():
            if key == "re_match" and isinstance(value, str):
                pattern[key] = re.compile(value)
            elif key in ("and", "or", "pattern"):
                compile_pattern_regexps(value)


def _step(token: Token | None, direction: str, skip: set[str]) -> Token | None:
    """Neighbouring token in the given direction, skipping tokens whose text
    is in ``skip``."""
    while token is not None:
        token = token.next() if direction == "right" else token.previous()
        if token is None or token.text not in skip:
            break
    return token


class TokenPatternAnnotator(Annotator):
    """Matches a sequence of per-token predicates along the token chain.

    An optional first-position ``lookup`` prefilters candidate start tokens
    through the token index (reference: annotator.py:111-129, 211-217).
    """

    def __init__(
        self,
        pattern: list[dict],
        tag: str,
        ds: DsCollection | None = None,
        skip: Sequence[str] | None = None,
        priority: int = 0,
    ) -> None:
        super().__init__(tag, priority)
        compile_pattern_regexps(pattern)
        self.pattern = pattern
        self.ds = ds
        self.skip = set(skip or [])
        self._compiled = [compile_position(spec, ds) for spec in pattern if spec]
        # Single-position re_match patterns (street_pattern) otherwise walk
        # match_sequence once per token of the document — the regex itself
        # is the entire check, so scan the token-text list directly.
        self._single_re = None
        if (
            len(pattern) == 1
            and "re_match" in pattern[0]
            and isinstance(pattern[0]["re_match"], re.Pattern)
        ):
            self._single_re = pattern[0]["re_match"]
            # token-text -> verdict memo, annotator lifetime (= worker
            # lifetime in the Ray stage): Zipf makes repeat texts the
            # common case, and one dict probe beats a C regex call ~5x
            self._single_memo: dict[str, bool] = {}
        self._start_values: set[str] | None = None
        self._start_pipeline = None
        if pattern and "lookup" in pattern[0]:
            if ds is None:
                raise RuntimeError("lookup pattern requires lookup structures")
            struct = ds[pattern[0]["lookup"]]
            if not isinstance(struct, LookupSet):
                raise ValueError("first-position lookup must name a LookupSet")
            self._start_values = struct.items()
            self._start_pipeline = struct.matching_pipeline

    def match_sequence(
        self,
        text: str,
        pattern: Sequence,
        start_token: Token,
        direction: str = "right",
        skip: set[str] | None = None,
    ) -> Annotation | None:
        """``pattern`` may hold predicate dicts or precompiled closures."""
        if not pattern:
            # an empty pattern must match NOTHING — falling through would
            # "match" with zero checks and annotate/extend arbitrary tokens
            return None
        skip = skip or set()
        ordered = pattern if direction == "right" else list(reversed(pattern))

        current: Token | None = start_token
        last = start_token
        for spec in ordered:
            if current is None:
                return None
            if callable(spec):
                if not spec(current):
                    return None
            elif not match_position(spec, current, self.ds):
                return None
            last = current
            current = _step(current, direction, skip)

        left, right = (start_token, last) if direction == "right" else (last, start_token)
        return Annotation(
            text=text[left.start_char : right.end_char],
            start_char=left.start_char,
            end_char=right.end_char,
            tag=self.tag,
            priority=self.priority,
            start_token=left,
            end_token=right,
        )

    def annotate(self, doc: Document) -> list[Annotation]:
        tokens = doc.get_tokens()
        if self._single_re is not None:
            match = self._single_re.match
            memo = self._single_memo
            if len(memo) > 1_000_000:
                memo.clear()
            tag, priority = self.tag, self.priority
            found = []
            for text, token in zip(tokens.texts(), tokens):
                hit = memo.get(text)
                if hit is None:
                    hit = memo[text] = match(text) is not None
                if hit:
                    found.append(
                        Annotation(
                            text=token.text,
                            start_char=token.start_char,
                            end_char=token.end_char,
                            tag=tag,
                            priority=priority,
                            start_token=token,
                            end_token=token,
                        )
                    )
            return found
        if self._start_values is not None:
            candidates = tokens.token_lookup(self._start_values, self._start_pipeline)
        else:
            candidates = tokens

        found = []
        for token in candidates:
            ann = self.match_sequence(
                doc.text, self._compiled, token, direction="right", skip=self.skip
            )
            if ann is not None:
                found.append(ann)
        return found


class ContextAnnotator(TokenPatternAnnotator):
    """Iteratively extends existing annotations left/right using context
    patterns keyed on the first/last component of the existing tag
    (reference: annotator.py:230-340)."""

    def __init__(
        self,
        pattern: list[dict],
        ds: DsCollection | None = None,
        iterative: bool = True,
        max_rounds: int = 64,
    ) -> None:
        super().__init__(pattern=[], tag="_", ds=ds)
        self.pattern = pattern
        compile_pattern_regexps(pattern)
        for ctx in pattern:
            ctx["_compiled"] = [
                compile_position(spec, ds) for spec in ctx.get("pattern", [])
            ]
        self.iterative = iterative
        # Straggler guard: real name chains are a handful of tokens; an
        # adversarial document ("Jansen " * 2500) otherwise makes the
        # fixpoint quadratic (one token of growth per round).  The cap only
        # diverges from the reference on such pathological inputs.
        self.max_rounds = max_rounds

    def _extend_with_pattern(
        self, text: str, annotations: AnnotationSet, ctx: dict
    ) -> AnnotationSet:
        direction = ctx["direction"]
        skip = set(ctx.get("skip", []))

        for ann in list(annotations):
            parts = ann.tag.split("+")
            component = parts[-1] if direction == "right" else parts[0]
            if component not in ctx["pre_tag"]:
                continue

            anchor = ann.end_token if direction == "right" else ann.start_token
            if anchor is None:
                continue
            start_token = _step(anchor, direction, skip)
            if start_token is None:
                continue

            extension = self.match_sequence(
                text,
                ctx.get("_compiled") or ctx.get("pattern", []),
                start_token,
                direction=direction,
                skip=skip,
            )
            if extension is None:
                continue

            left, right = (
                (ann, extension) if direction == "right" else (extension, ann)
            )
            merged = Annotation(
                text=text[left.start_char : right.end_char],
                start_char=left.start_char,
                end_char=right.end_char,
                tag=ctx["tag"].format(tag=ann.tag),
                priority=ann.priority,
                start_token=left.start_token,
                end_token=right.end_token,
            )
            annotations.discard(ann)
            annotations.add(merged)

        return annotations

    def _expand(
        self,
        text: str,
        annotations: AnnotationSet,
        deadline: float | None = None,
        doc: Document | None = None,
    ) -> AnnotationSet:
        """Fixpoint extension.  Iterative rather than recursive: each round
        re-processes only the annotations changed by the previous round
        (adversarially long token chains must not hit the recursion
        limit — a straggler concern at scale, SURVEY.md §4.2).  A
        ``deadline`` (time.monotonic value, from the engine's per-doc
        budget) stops the fixpoint mid-iteration, keeping annotations
        found so far and flagging the document."""
        if not self.iterative:
            for ctx in self.pattern:
                annotations = self._extend_with_pattern(text, annotations, ctx)
            return annotations

        settled = AnnotationSet()
        work = annotations
        rounds = 0
        while work:
            if deadline is not None:
                if time.monotonic() > deadline:
                    if doc is not None:
                        doc.budget_exhausted = True
                    settled.update(work)
                    break
            original = AnnotationSet(work)
            for ctx in self.pattern:
                work = self._extend_with_pattern(text, work, ctx)
            changed = AnnotationSet(work - original)
            settled.update(work & original)
            work = changed
            rounds += 1
            if rounds >= self.max_rounds:
                settled.update(work)
                break
        return settled

    def annotate(self, doc: Document) -> list[Annotation]:
        doc.annotations = self._expand(
            doc.text,
            doc.annotations,
            deadline=getattr(doc, "_deadline", None),
            doc=doc,
        )
        return []


# ---------------------------------------------------------------------------
# multi-token lexicon lookup
# ---------------------------------------------------------------------------


class MultiTokenLookupAnnotator(Annotator):
    """Longest-prefix lexicon match over token texts.  Accepts either a
    build-time LookupTrie or a compiled PackedTrie — anything exposing
    ``find_spans(texts) -> [(start_index, length)]``."""

    def __init__(
        self, trie, tag: str, overlapping: bool = False, priority: int = 0
    ) -> None:
        super().__init__(tag, priority)
        self.trie = trie
        self.overlapping = overlapping

    def _spans(self, tokens) -> list[tuple[int, int]]:
        trie = self.trie
        if hasattr(trie, "spans_for_tokens"):
            # member of a merged multi-lexicon: one shared probe pass per
            # document, cached on the token list
            return trie.spans_for_tokens(tokens)
        if (
            hasattr(trie, "find_spans_encoded")
            and getattr(trie, "_overlay", None) is None
        ):
            pipeline = trie.matching_pipeline
            if not pipeline:
                return trie.find_spans_encoded(tokens.encoded())
            if len(pipeline) == 1 and isinstance(pipeline[0], Lowercase):
                return trie.find_spans_encoded(tokens.encoded_lower())
        return trie.find_spans(tokens.texts())

    def annotate(self, doc: Document) -> list[Annotation]:
        tokens = doc.get_tokens()
        if not len(tokens):
            return []

        found = []
        min_i = 0
        for i, span in self._spans(tokens):
            if i < min_i:
                continue
            first, last = tokens[i], tokens[i + span - 1]
            found.append(
                Annotation(
                    text=doc.text[first.start_char : last.end_char],
                    start_char=first.start_char,
                    end_char=last.end_char,
                    tag=self.tag,
                    priority=self.priority,
                    start_token=first,
                    end_token=last,
                )
            )
            if not self.overlapping:
                min_i = i + span
        return found


# ---------------------------------------------------------------------------
# regexp annotators
# ---------------------------------------------------------------------------


class RegexpAnnotator(Annotator):
    """Regexp matcher with an optional whole-document token gate
    (``pre_match_words``) that skips documents cheaply."""

    def __init__(
        self,
        regexp_pattern: str | re.Pattern,
        tag: str,
        capturing_group: int = 0,
        pre_match_words: Sequence[str] | None = None,
        requires_digit: bool = False,
        priority: int = 0,
    ) -> None:
        super().__init__(tag, priority)
        self.regexp = (
            re.compile(regexp_pattern)
            if isinstance(regexp_pattern, str)
            else regexp_pattern
        )
        self.capturing_group = capturing_group
        # compared against the LOWERCASED document word set — normalize here
        # so capitalized gate words cannot silently disable the annotator
        self.pre_match_words = (
            {w.lower() for w in pre_match_words} if pre_match_words else None
        )
        # set ONLY for patterns that must consume at least one digit on
        # every match (a structural property of the regex, asserted per
        # config entry): digit-free documents then skip the scan outright
        self.requires_digit = requires_digit

    def _validate_match(self, match: re.Match, doc: Document) -> bool:
        return True

    def annotate(self, doc: Document) -> list[Annotation]:
        if self.requires_digit and not doc.has_digit():
            return []
        if self.pre_match_words is not None:
            words = doc.get_tokens().get_words(_LOWER)
            if words.isdisjoint(self.pre_match_words):
                return []

        found = []
        group = self.capturing_group
        for match in self.regexp.finditer(doc.text):
            if not self._validate_match(match, doc):
                continue
            text = match.group(group)
            if text is None:
                continue
            start, end = match.span(group)
            found.append(
                Annotation(
                    text=text,
                    start_char=start,
                    end_char=end,
                    tag=self.tag,
                    priority=self.priority,
                )
            )
        return found


class RegexpPseudoAnnotator(RegexpAnnotator):
    """Regexp annotator that vetoes matches preceded/followed by certain
    words (reference: annotator.py:488-594, used for ages)."""

    def __init__(
        self,
        regexp_pattern: str | re.Pattern,
        tag: str,
        pre_pseudo: Sequence[str] | None = None,
        post_pseudo: Sequence[str] | None = None,
        lowercase: bool = True,
        **kwargs,
    ) -> None:
        super().__init__(regexp_pattern, tag, **kwargs)
        # probe words are lowercased when self.lowercase, so the veto lists
        # must be lowercase too or capitalized entries would never fire
        self.pre_pseudo = (
            {w.lower() for w in pre_pseudo} if lowercase else set(pre_pseudo)
        ) if pre_pseudo else set()
        self.post_pseudo = (
            {w.lower() for w in post_pseudo} if lowercase else set(post_pseudo)
        ) if post_pseudo else set()
        self.lowercase = lowercase

    @staticmethod
    def _is_word_char(char: str) -> bool:
        return char.isalpha()

    def _previous_word(self, index: int, text: str) -> str:
        chunk = text[:index].strip()
        chars = []
        for ch in reversed(chunk):
            if not ch.isalpha():
                break
            chars.append(ch)
        return "".join(reversed(chars)).strip()

    def _next_word(self, index: int, text: str) -> str:
        chunk = text[index:].strip()
        chars = []
        for ch in chunk:
            if not ch.isalpha():
                break
            chars.append(ch)
        return "".join(chars)

    def _validate_match(self, match: re.Match, doc: Document) -> bool:
        start, end = match.span(0)
        prev_word = self._previous_word(start, doc.text)
        next_word = self._next_word(end, doc.text)
        if self.lowercase:
            prev_word = prev_word.lower()
            next_word = next_word.lower()
        return prev_word not in self.pre_pseudo and next_word not in self.post_pseudo


# ---------------------------------------------------------------------------
# specialized annotators
# ---------------------------------------------------------------------------


class BsnAnnotator(Annotator):
    """Dutch BSN: 9-digit runs that pass the mod-11 'elfproef'
    (reference: annotator.py:597-651)."""

    def __init__(
        self, bsn_regexp: str, tag: str, capture_group: int = 0, priority: int = 0
    ) -> None:
        super().__init__(tag, priority)
        self.regexp = re.compile(bsn_regexp)
        self.capture_group = capture_group

    @staticmethod
    def elfproef(bsn: str) -> bool:
        if len(bsn) != 9 or not bsn.isdigit():
            raise ValueError("elfproef requires exactly 9 digits")
        weights = (9, 8, 7, 6, 5, 4, 3, 2, -1)
        return sum(int(c) * w for c, w in zip(bsn, weights)) % 11 == 0

    def annotate(self, doc: Document) -> list[Annotation]:
        # a BSN is 9 digits by definition; digit-free documents can't match
        if not doc.has_digit():
            return []
        found = []
        for match in self.regexp.finditer(doc.text):
            text = match.group(self.capture_group)
            digits = re.sub(r"\D", "", text)
            if self.elfproef(digits):
                start, end = match.span(self.capture_group)
                found.append(
                    Annotation(
                        text=text,
                        start_char=start,
                        end_char=end,
                        tag=self.tag,
                        priority=self.priority,
                    )
                )
        return found


class PhoneNumberAnnotator(Annotator):
    """Dutch phone numbers: regexp + digit-count window, max one hyphen,
    paren trimming, and a -2 digit shift for 0800/0900/0906/0909 numbers
    (reference: annotator.py:654-722)."""

    def __init__(
        self,
        phone_regexp: str,
        tag: str,
        min_digits: int = 9,
        max_digits: int = 11,
        priority: int = 0,
    ) -> None:
        super().__init__(tag, priority)
        self.regexp = re.compile(phone_regexp)
        self.min_digits = min_digits
        self.max_digits = max_digits

    def annotate(self, doc: Document) -> list[Annotation]:
        # the digit-count window needs >= min_digits digits; digit-free
        # documents can't match
        if not doc.has_digit():
            return []
        found = []
        for match in self.regexp.finditer(doc.text):
            full = match.group(0)
            if full.count("-") > 1:
                continue

            prefix_with_parens = match.group(1)
            prefix_digits = "0" + re.sub(r"\D", "", match.group(3))
            number_digits = re.sub(r"\D", "", match.group(4))

            shift = -2 if prefix_digits in ("0800", "0900", "0906", "0909") else 0
            n_digits = len(prefix_digits) + len(number_digits)
            if not (self.min_digits + shift <= n_digits <= self.max_digits + shift):
                continue

            left_trim = (
                1
                if prefix_with_parens.startswith("(")
                and not prefix_with_parens.endswith(")")
                else 0
            )
            start, end = match.span(0)
            found.append(
                Annotation(
                    text=full[left_trim:],
                    start_char=start + left_trim,
                    end_char=end,
                    tag=self.tag,
                    priority=self.priority,
                )
            )
        return found


class PatientNameAnnotator(Annotator):
    """Matches the document's own patient metadata (first names incl. fuzzy,
    initials, multi-token fuzzy surname walk); reference:
    annotator.py:343-485."""

    def __init__(self, tokenizer: WordTokenizer, tag: str = "_", priority: int = 0) -> None:
        super().__init__(tag, priority)
        self.tokenizer = tokenizer

    @staticmethod
    def _match_first_names(doc: Document, token: Token):
        for name in doc.metadata["patient"].first_names:
            if not name:
                continue
            if str_match(token.text, name) or (
                len(token.text) > 3 and str_match(token.text, name, max_edit_distance=1)
            ):
                return token, token
        return None

    @staticmethod
    def _match_initial_from_name(doc: Document, token: Token):
        for name in doc.metadata["patient"].first_names:
            if not name:
                continue  # empty components (double spaces in metadata)
            if str_match(token.text, name[0]):
                nxt = token.next()
                if nxt is not None and str_match(nxt.text, "."):
                    return token, nxt
                return token, token
        return None

    @staticmethod
    def _match_initials(doc: Document, token: Token):
        if str_match(token.text, doc.metadata["patient"].initials):
            return token, token
        return None

    def _match_surname(self, doc: Document, token: Token):
        if doc.metadata["surname_pattern"] is None:
            doc.metadata["surname_pattern"] = self.tokenizer.tokenize(
                doc.metadata["patient"].surname
            )
        pattern = doc.metadata["surname_pattern"]
        if len(pattern) == 0:
            return None  # blank/whitespace-only surname metadata

        pattern_token = pattern[0]
        start = token
        while True:
            if not str_match(pattern_token.text, token.text, max_edit_distance=1):
                return None
            matched_end = token
            pattern_token = pattern_token.next()
            token = token.next()
            if pattern_token is None:
                return start, matched_end
            if token is None:
                return None

    def annotate(self, doc: Document) -> list[Annotation]:
        patient = doc.metadata["patient"]
        if patient is None:
            return []

        matchers = []
        if patient.first_names is not None:
            matchers.append((self._match_first_names, "voornaam_patient"))
            matchers.append((self._match_initial_from_name, "initiaal_patient"))
        if patient.initials is not None:
            matchers.append((self._match_initials, "initiaal_patient"))
        if patient.surname is not None:
            matchers.append((self._match_surname, "achternaam_patient"))

        found = []
        for token in doc.get_tokens():
            for matcher, tag in matchers:
                match = matcher(doc, token)
                if match is None:
                    continue
                start_token, end_token = match
                found.append(
                    Annotation(
                        text=doc.text[start_token.start_char : end_token.end_char],
                        start_char=start_token.start_char,
                        end_char=end_token.end_char,
                        tag=tag,
                        priority=self.priority,
                        start_token=start_token,
                        end_token=end_token,
                    )
                )
        return found
