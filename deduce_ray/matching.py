"""Fuzzy string primitives.

The reference (deduce/utils.py:13-32, deduce/redactor.py:39-47) only ever
uses Damerau-Levenshtein distance with a cutoff of 1, via rapidfuzz.  That
single predicate is implemented here directly (rapidfuzz is not available,
and a bounded check is O(n) instead of O(n*m)).
"""

from __future__ import annotations


def within_edit_distance_one(a: str, b: str) -> bool:
    """True iff Damerau-Levenshtein distance(a, b) <= 1.

    Covers: equality, one substitution, one insertion/deletion, one
    transposition of adjacent characters.  For a distance bound of 1 the
    restricted (OSA) and unrestricted DL metrics coincide.
    """
    if a == b:
        return True

    la, lb = len(a), len(b)
    if la > lb:
        a, b, la, lb = b, a, lb, la
    if lb - la > 1:
        return False

    i = 0
    while i < la and a[i] == b[i]:
        i += 1

    if la == lb:
        # one substitution at i, or one adjacent transposition at (i, i+1)
        if a[i + 1 :] == b[i + 1 :]:
            return True
        return (
            i + 1 < la
            and a[i] == b[i + 1]
            and a[i + 1] == b[i]
            and a[i + 2 :] == b[i + 2 :]
        )

    # one insertion into the shorter string at position i
    return a[i:] == b[i + 1 :]


def str_match(str_1: str, str_2: str, max_edit_distance: int | None = None) -> bool:
    """Exact match, or fuzzy match when ``max_edit_distance`` is given.

    Mirrors reference semantics (deduce/utils.py:13-32); only
    ``max_edit_distance in (None, 1)`` is supported, which is all the
    reference configuration ever uses.
    """
    if max_edit_distance is None:
        return str_1 == str_2
    if max_edit_distance == 1:
        return within_edit_distance_one(str_1, str_2)
    raise NotImplementedError("only max_edit_distance=1 is supported")
