"""PackedTrie: a read-only, numpy-backed multi-token lookup structure.

The build-time ``LookupTrie`` (nested dicts) is great for construction but
serializes as millions of tiny objects — ~30-40 s to unpickle the 775k-entry
street lexicon, paid by *every* annotator actor at startup.  PackedTrie
stores the same entry set as two byte blobs + offset arrays:

  - ``entries``: every token sequence joined with NUL, utf-8, sorted,
    concatenated; membership = binary search with exact byte compare.
  - ``firsts``:  the distinct first tokens, sorted, each with a bitmask of
    the entry lengths (in tokens) that start with it — this drives both the
    candidate-start prefilter and the longest-prefix probe order.

Pickling moves 4 flat buffers, so actor-side load is milliseconds, and the
resident size is ~10x smaller than nested dicts — which is what lets a
256-node cluster spin annotator actors up and down cheaply.
"""

from __future__ import annotations

import numpy as np

from deduce_ray.strproc import apply_pipeline

_SEP = b"\x00"
_MAX_LEN = 64  # entry length cap in tokens (bitmask width)


def _pack_sorted(items: list[bytes]) -> tuple[bytes, np.ndarray]:
    offsets = np.zeros(len(items) + 1, dtype=np.int64)
    np.cumsum([len(b) for b in items], out=offsets[1:])
    return b"".join(items), offsets


def _prefix64(b: bytes) -> int:
    return int.from_bytes(b[:8].ljust(8, b"\x00"), "big")


class _BlobSet:
    """Sorted-unique byte strings packed in one buffer.

    Probe = numpy searchsorted over the 8-byte big-endian prefixes (C
    speed), then exact byte compares only within the (usually length-1)
    equal-prefix run.  Byte order and uint64 big-endian order agree, so
    the prefix array is sorted exactly like the strings.
    """

    __slots__ = ("blob", "offsets", "n", "prefixes")

    def __init__(self, items: set[bytes]) -> None:
        ordered = sorted(items)
        self.blob, self.offsets = _pack_sorted(ordered)
        self.n = len(ordered)
        self.prefixes = np.fromiter(
            (_prefix64(b) for b in ordered), dtype=np.uint64, count=self.n
        )

    def _at(self, i: int) -> bytes:
        return self.blob[self.offsets[i] : self.offsets[i + 1]]

    def index(self, probe: bytes) -> int:
        """Index of probe, or -1."""
        # bound-method searchsorted (the np.searchsorted wrapper costs more
        # than the search itself at this call volume).  The key MUST be
        # boxed to np.uint64: searchsorted with a Python int against a
        # uint64 array compares through float64, which rounds above 2^53
        # and silently misses prefixes.
        key = np.uint64(_prefix64(probe))
        prefixes = self.prefixes
        lo = int(prefixes.searchsorted(key, "left"))
        if lo >= self.n or prefixes[lo] != key:
            return -1
        # binary search inside the equal-prefix run (runs can be long for
        # lexicons with shared prefixes, e.g. street names)
        hi = int(prefixes.searchsorted(key, "right"))
        blob, offsets = self.blob, self.offsets
        while lo < hi:
            mid = (lo + hi) >> 1
            if blob[offsets[mid] : offsets[mid + 1]] < probe:
                lo = mid + 1
            else:
                hi = mid
        if lo < self.n and blob[offsets[lo] : offsets[lo + 1]] == probe:
            return lo
        return -1

    def __contains__(self, probe: bytes) -> bool:
        return self.index(probe) >= 0

    def __getstate__(self):
        return (self.blob, self.offsets, self.n, self.prefixes)

    def __setstate__(self, state):
        self.blob, self.offsets, self.n, self.prefixes = state


class PackedTrie:
    """Read-only compiled form of a LookupTrie."""

    __slots__ = (
        "matching_pipeline",
        "_entries",
        "_firsts",
        "_len_masks",
        "_n_entries",
        "_first_memo",
        "_entry_memo",
        "_overlay",
    )

    _MEMO_CAP = 262_144  # bound the cross-document first-token memo

    def __init__(
        self, sequences: list[list[str]], matching_pipeline: list | None = None
    ) -> None:
        # NOTE: sequences must already be normalized (they come out of a
        # LookupTrie, whose add_item applied the matching pipeline).
        self.matching_pipeline = list(matching_pipeline or [])

        entry_bytes: set[bytes] = set()
        first_masks: dict[bytes, int] = {}
        for seq in sequences:
            if not seq or len(seq) > _MAX_LEN:
                continue
            enc = [t.encode("utf-8") for t in seq]
            entry_bytes.add(_SEP.join(enc))
            first_masks[enc[0]] = first_masks.get(enc[0], 0) | (1 << (len(seq) - 1))

        self._entries = _BlobSet(entry_bytes)
        self._n_entries = len(entry_bytes)
        self._first_memo: dict[bytes, int] = {}
        self._entry_memo: dict[bytes, int] = {}
        self._overlay = None  # runtime-tailoring additions (LookupTrie)
        firsts_sorted = sorted(first_masks)
        self._firsts = _BlobSet(set(firsts_sorted))
        masks = np.zeros(len(firsts_sorted), dtype=np.uint64)
        for tok in firsts_sorted:
            masks[self._firsts.index(tok)] = first_masks[tok]
        self._len_masks = masks

    @classmethod
    def from_lookup_trie(cls, trie) -> "PackedTrie":
        sequences: list[list[str]] = []

        def walk(node: dict, prefix: list[str]) -> None:
            for key, child in node.items():
                if key == "":
                    sequences.append(list(prefix))
                else:
                    prefix.append(key)
                    walk(child, prefix)
                    prefix.pop()

        walk(trie._root, [])
        return cls(sequences, matching_pipeline=trie.matching_pipeline)

    def __len__(self) -> int:
        return self._n_entries

    def _norm_encoded(self, texts: list[str]) -> list[bytes]:
        if self.matching_pipeline:
            out = []
            for t in texts:
                t = apply_pipeline(t, self.matching_pipeline)
                out.append(t.encode("utf-8") if t is not None else b"\xff\xff")
            return out
        return [t.encode("utf-8") for t in texts]

    def add_item(self, tokens: list[str]) -> None:
        """Runtime tailoring: additions go to a small overlay trie merged
        at probe time."""
        from deduce_ray.structures import LookupTrie

        if self._overlay is None:
            self._overlay = LookupTrie(matching_pipeline=self.matching_pipeline)
        self._overlay.add_item(tokens)

    def find_spans(self, texts: list[str]) -> list[tuple[int, int]]:
        """All (start_index, longest_matching_length) spans over the token
        texts.  Candidate starts are prefiltered against the first-token
        blob (memoized per distinct token text)."""
        spans = self.find_spans_encoded(self._norm_encoded(texts))
        if self._overlay is not None:
            spans = merge_spans(spans, self._overlay.find_spans(texts))
        return spans

    def find_spans_encoded(self, enc: list[bytes]) -> list[tuple[int, int]]:
        """Same as find_spans but over pre-encoded (and pre-normalized)
        token bytes — lets the caller share one encoding pass across all
        lexicons probing the same document."""
        n = len(enc)
        memo = self._first_memo
        if len(memo) > self._MEMO_CAP:
            memo.clear()
        firsts = self._firsts
        len_masks = self._len_masks
        entries = self._entries
        entry_memo = self._entry_memo
        if len(entry_memo) > self._MEMO_CAP:
            entry_memo.clear()
        spans = []

        # memo maps token -> length mask (0 = not a first token), so the
        # steady-state per-token cost is one dict probe, no numpy unboxing
        for i, tok in enumerate(enc):
            mask = memo.get(tok)
            if mask is None:
                fi = firsts.index(tok)
                mask = int(len_masks[fi]) if fi >= 0 else 0
                memo[tok] = mask
            if mask == 0:
                continue
            length = mask.bit_length()  # highest candidate length
            while length > 0:
                if (mask >> (length - 1)) & 1 and i + length <= n:
                    if length == 1:
                        spans.append((i, 1))
                        break
                    joined = _SEP.join(enc[i : i + length])
                    hit = entry_memo.get(joined)
                    if hit is None:
                        hit = entries.index(joined)
                        entry_memo[joined] = hit
                    if hit >= 0:
                        spans.append((i, length))
                        break
                length -= 1
        return spans

    def longest_matching_prefix(self, texts: list[str], start_i: int = 0) -> int:
        # consult the runtime-tailoring overlay too, so the two probe APIs
        # of one trie (find_spans and this) agree about membership
        overlay_len = 0
        if self._overlay is not None:
            overlay_len = self._overlay.longest_matching_prefix(texts, start_i)
        enc = self._norm_encoded(texts[start_i:])
        if not enc:
            return overlay_len
        fi = self._firsts.index(enc[0])
        if fi < 0:
            return overlay_len
        mask = int(self._len_masks[fi])
        length = mask.bit_length()
        n = len(enc)
        while length > overlay_len:
            if (mask >> (length - 1)) & 1 and length <= n:
                if length == 1 or _SEP.join(enc[:length]) in self._entries:
                    return length
            length -= 1
        return overlay_len

    def __getstate__(self):
        return (
            self.matching_pipeline,
            self._entries,
            self._firsts,
            self._len_masks,
            self._n_entries,
            self._overlay,
        )

    def __setstate__(self, state):
        (
            self.matching_pipeline,
            self._entries,
            self._firsts,
            self._len_masks,
            self._n_entries,
            *rest,
        ) = state
        self._overlay = rest[0] if rest else None
        self._first_memo = {}
        self._entry_memo = {}


class MultiPackedTrie:
    """Several lexicons (no matching pipeline) merged into ONE probe
    structure: the entry and first-token blobs are unioned, with per-item
    bitmasks recording which lexicons contain them.  A document's tokens
    are then scanned once for ALL member lexicons instead of once per
    lexicon (the lexicon probe is the hottest part of the annotate stage).

    ``find_all(enc)`` returns one span list per member lexicon, each
    identical to what that lexicon's own PackedTrie.find_spans would
    produce (verified by tests).
    """

    __slots__ = (
        "names", "_entries", "_entry_masks", "_firsts", "_len_masks",
        "_first_memo", "_sizes", "_entry_memo",
    )

    _MEMO_CAP = 262_144
    _MISS = (0, ())  # memo value for tokens absent from every lexicon

    def _mask_row(self, fi: int) -> tuple[int, tuple[int, ...]]:
        """(union_mask, per-trie masks) for first-token row ``fi`` as plain
        Python ints: the probe loop reads these once per candidate token,
        and numpy scalar unboxing there costs more than the whole candidate
        check.  Built LAZILY per first-token on demand (and held by the
        token memo): materializing all ~240k rows eagerly cost ~1.6 s and
        ~100 MB of heap per worker at unpickle time, for rows mostly never
        probed by any document."""
        trie_masks = tuple(int(x) for x in self._len_masks[fi])
        union = 0
        for m in trie_masks:
            union |= m
        return (union, trie_masks)

    def __init__(self, tries: list[tuple[str, object]]) -> None:
        # tries: (name, build-time LookupTrie) pairs, all pipeline-free
        if any(t.matching_pipeline for _, t in tries):
            raise ValueError("MultiPackedTrie members must have no pipeline")
        self.names = [name for name, _ in tries]
        n_tries = len(tries)

        entry_masks: dict[bytes, int] = {}
        first_masks: dict[bytes, list[int]] = {}
        self._sizes = []
        for t_idx, (_, trie) in enumerate(tries):
            sequences: list[list[str]] = []

            def walk(node: dict, prefix: list[str]) -> None:
                for key, child in node.items():
                    if key == "":
                        sequences.append(list(prefix))
                    else:
                        prefix.append(key)
                        walk(child, prefix)
                        prefix.pop()

            walk(trie._root, [])
            self._sizes.append(len(sequences))
            for seq in sequences:
                if not seq or len(seq) > _MAX_LEN:
                    continue
                enc = [s.encode("utf-8") for s in seq]
                joined = _SEP.join(enc)
                entry_masks[joined] = entry_masks.get(joined, 0) | (1 << t_idx)
                row = first_masks.setdefault(enc[0], [0] * n_tries)
                row[t_idx] |= 1 << (len(seq) - 1)

        self._entries = _BlobSet(set(entry_masks))
        masks = np.zeros(self._entries.n, dtype=np.uint32)
        for joined, mask in entry_masks.items():
            masks[self._entries.index(joined)] = mask
        self._entry_masks = masks

        self._firsts = _BlobSet(set(first_masks))
        len_masks = np.zeros((self._firsts.n, n_tries), dtype=np.uint64)
        for tok, row in first_masks.items():
            len_masks[self._firsts.index(tok)] = row
        self._len_masks = len_masks
        self._first_memo: dict[bytes, tuple[int, tuple[int, ...]]] = {}
        self._entry_memo: dict[bytes, int] = {}

    def find_all(self, enc: list[bytes]) -> list[list[tuple[int, int]]]:
        n = len(enc)
        n_tries = len(self.names)
        spans: list[list[tuple[int, int]]] = [[] for _ in range(n_tries)]
        memo = self._first_memo
        if len(memo) > self._MEMO_CAP:
            memo.clear()
        # joined-phrase -> entry index memo: multi-token candidates repeat
        # across documents (names, streets, institutions recur corpus-wide),
        # so the binary search runs once per distinct phrase per worker
        entry_memo = self._entry_memo
        if len(entry_memo) > self._MEMO_CAP:
            entry_memo.clear()
        firsts = self._firsts
        entries = self._entries
        entry_masks = self._entry_masks
        mask_row = self._mask_row
        miss = self._MISS

        # NOTE: a vectorized candidate prefilter (np.array(enc, dtype="S8")
        # .view(">u8") + one searchsorted against firsts.prefixes) was
        # measured SLOWER here: at the corpus' ~54 tokens/doc the ~15 us
        # numpy setup per call exceeds the whole memoized loop (bytes hash
        # is cached, so the miss path is one dict.get ~0.2 us/token).
        for i, tok in enumerate(enc):
            cached = memo.get(tok)
            if cached is None:
                fi = firsts.index(tok)
                cached = mask_row(fi) if fi >= 0 else miss
                memo[tok] = cached
            # misses (the overwhelming majority of tokens) short-circuit
            # on the tuple's truthiness-equivalent first element without
            # paying the unpack
            if cached[0] == 0:
                continue
            union_mask, trie_masks = cached
            pending = [t for t in range(n_tries) if trie_masks[t]]
            length = union_mask.bit_length()
            while length > 0 and pending:
                if (union_mask >> (length - 1)) & 1 and i + length <= n:
                    if length == 1:
                        # a set length-1 bit in trie t implies the entry
                        for t in list(pending):
                            if (trie_masks[t] >> (length - 1)) & 1:
                                spans[t].append((i, 1))
                                pending.remove(t)
                    else:
                        joined = _SEP.join(enc[i : i + length])
                        ei = entry_memo.get(joined)
                        if ei is None:
                            ei = entries.index(joined)
                            entry_memo[joined] = ei
                        if ei >= 0:
                            e_mask = int(entry_masks[ei])
                            for t in list(pending):
                                if (trie_masks[t] >> (length - 1)) & 1 and (
                                    e_mask >> t
                                ) & 1:
                                    spans[t].append((i, length))
                                    pending.remove(t)
                length -= 1
        return spans

    def __getstate__(self):
        return (
            self.names,
            self._entries,
            self._entry_masks,
            self._firsts,
            self._len_masks,
            self._sizes,
        )

    def __setstate__(self, state):
        (
            self.names,
            self._entries,
            self._entry_masks,
            self._firsts,
            self._len_masks,
            self._sizes,
        ) = state
        self._first_memo = {}
        self._entry_memo = {}


def merge_spans(
    base: list[tuple[int, int]], extra: list[tuple[int, int]]
) -> list[tuple[int, int]]:
    """Merge two longest-prefix span lists: one span per start index,
    keeping the longer match (longest-prefix semantics)."""
    if not extra:
        return base
    merged = dict(base)
    for start, length in extra:
        if length > merged.get(start, 0):
            merged[start] = length
    return sorted(merged.items())


class MemberTrieView:
    """One lexicon's view into a MultiPackedTrie.  Satisfies the
    MultiTokenLookupAnnotator contract; the underlying single probe pass
    is computed once per document and cached on the TokenList.

    Runtime tailoring: ``add_item`` inserts into a small mutable overlay
    trie whose matches are merged with the packed base at probe time
    (mirrors the reference's lookup-structure tailoring,
    docs/source/tutorial.md:163-236)."""

    __slots__ = ("multi", "index", "matching_pipeline", "_overlay")

    def __init__(self, multi: MultiPackedTrie, index: int) -> None:
        self.multi = multi
        self.index = index
        self.matching_pipeline: list = []
        self._overlay = None

    def __getstate__(self):
        return (self.multi, self.index, self.matching_pipeline, self._overlay)

    def __setstate__(self, state):
        self.multi, self.index, self.matching_pipeline, *rest = state
        self._overlay = rest[0] if rest else None

    def __len__(self) -> int:
        base = self.multi._sizes[self.index]
        return base + (len(self._overlay) if self._overlay is not None else 0)

    def add_item(self, tokens: list[str]) -> None:
        from deduce_ray.structures import LookupTrie

        if self._overlay is None:
            self._overlay = LookupTrie()
        self._overlay.add_item(tokens)

    def add_items_from_iterable(self, sequences) -> None:
        for seq in sequences:
            self.add_item(seq)

    def spans_for_tokens(self, tokens) -> list[tuple[int, int]]:
        cache = tokens._word_index_cache
        key = ("multilex", id(self.multi))
        all_spans = cache.get(key)
        if all_spans is None:
            all_spans = self.multi.find_all(tokens.encoded())
            cache[key] = all_spans
        spans = all_spans[self.index]
        if self._overlay is not None:
            spans = merge_spans(spans, self._overlay.find_spans(tokens.texts()))
        return spans

    def find_spans(self, texts: list[str]) -> list[tuple[int, int]]:
        enc = [t.encode("utf-8") for t in texts]
        spans = self.multi.find_all(enc)[self.index]
        if self._overlay is not None:
            spans = merge_spans(spans, self._overlay.find_spans(texts))
        return spans
