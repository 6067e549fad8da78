from deduce_ray.matching import str_match, within_edit_distance_one


def test_exact():
    assert within_edit_distance_one("jansen", "jansen")
    assert str_match("a", "a")
    assert not str_match("a", "b")


def test_substitution():
    assert within_edit_distance_one("Adriaan", "Adriaon")
    assert not within_edit_distance_one("Adriaan", "Odriaon")


def test_insertion_deletion():
    assert within_edit_distance_one("Jansen", "Janssen")
    assert within_edit_distance_one("Janssen", "Jansen")
    assert not within_edit_distance_one("Jansen", "Jansssen")


def test_transposition():
    assert within_edit_distance_one("Adriaan", "Adriana")
    assert within_edit_distance_one("ab", "ba")
    assert not within_edit_distance_one("abcd", "badc")


def test_ommen_emmen():
    # reference redactor test: Ommen and Emmen share an entity id (DL distance 1)
    assert within_edit_distance_one("Ommen", "Emmen")


def test_length_gap():
    assert not within_edit_distance_one("ab", "abcd")
    assert within_edit_distance_one("", "a")
    assert not within_edit_distance_one("", "ab")


def test_str_match_fuzzy():
    assert str_match("Adriaan", "Adriana", max_edit_distance=1)
    assert not str_match("Jan", "Dani", max_edit_distance=1)
