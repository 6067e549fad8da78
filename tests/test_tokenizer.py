"""Tokenizer goldens (cases from the reference's tokenizer tests:
/root/reference/tests/unit/test_tokenizer.py)."""

from deduce_ray.tokenizer import WordTokenizer


def toks(text, merge_terms=None):
    return [
        (t.text, t.start_char, t.end_char)
        for t in WordTokenizer(merge_terms=merge_terms).tokenize(text)
    ]


def test_alpha_split():
    assert toks("Pieter van der Zee") == [
        ("Pieter", 0, 6),
        ("van", 7, 10),
        ("der", 11, 14),
        ("Zee", 15, 18),
    ]


def test_nonalpha_single_chars():
    assert toks("prematuur (<p3)") == [
        ("prematuur", 0, 9),
        ("(", 10, 11),
        ("<", 11, 12),
        ("p3", 12, 14),
        (")", 14, 15),
    ]


def test_four_plus_spaces_is_token():
    assert toks("Pieter van der Zee     Bergen Op  Zoom") == [
        ("Pieter", 0, 6),
        ("van", 7, 10),
        ("der", 11, 14),
        ("Zee", 15, 18),
        ("     ", 18, 23),
        ("Bergen", 23, 29),
        ("Op", 30, 32),
        ("Zoom", 34, 38),
    ]


def test_newline_is_token():
    assert toks("regel 1 \n gevolgd door regel 2") == [
        ("regel", 0, 5),
        ("1", 6, 7),
        ("\n", 8, 9),
        ("gevolgd", 10, 17),
        ("door", 18, 22),
        ("regel", 23, 28),
        ("2", 29, 30),
    ]


def test_merge_terms():
    assert toks("Pieter van der Zee", merge_terms=["van der"]) == [
        ("Pieter", 0, 6),
        ("van der", 7, 14),
        ("Zee", 15, 18),
    ]


def test_token_navigation():
    tl = WordTokenizer().tokenize("a b c")
    assert tl[0].next().text == "b"
    assert tl[2].previous().text == "b"
    assert tl[0].previous() is None
    assert tl[2].next() is None
