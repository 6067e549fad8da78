import random

from deduce_ray import strproc as sp
from deduce_ray.packed_trie import PackedTrie
from deduce_ray.structures import LookupSet, LookupTrie


def test_lookup_set_matching_pipeline():
    ls = LookupSet(matching_pipeline=[sp.Lowercase()])
    ls.add_items_from_iterable(["Utrecht", "AMSTERDAM"])
    assert "utrecht" in ls
    assert "UTRECHT" in ls
    assert "Amsterdam" in ls
    assert "Rotterdam" not in ls


def test_lookup_set_cleaning_pipeline():
    ls = LookupSet()
    ls.add_items_from_iterable(["ab", "c", "def"], cleaning_pipeline=[sp.FilterByLength(min_len=2)])
    assert ls.items() == {"ab", "def"}


def test_lookup_set_self_variants():
    ls = LookupSet()
    ls.add_items_from_iterable(["van", "de"])
    ls.add_items_from_self(cleaning_pipeline=[sp.UppercaseFirstChar()])
    assert ls.items() == {"van", "de", "Van", "De"}


def test_lookup_set_algebra():
    a = LookupSet().add_items_from_iterable(["x", "y", "z"])
    b = LookupSet().add_items_from_iterable(["y"])
    assert (a - b).items() == {"x", "z"}
    assert (a + b).items() == {"x", "y", "z"}


def test_trie_longest_prefix():
    trie = LookupTrie()
    trie.add_item(["Bergen"])
    trie.add_item(["Bergen", "op", "Zoom"])
    texts = ["in", "Bergen", "op", "Zoom", "."]
    assert trie.longest_matching_prefix(texts, start_i=1) == 3
    assert trie.longest_matching_prefix(texts, start_i=0) == 0
    assert trie.longest_matching_prefix(["Bergen", "op"], start_i=0) == 1


def test_trie_matching_pipeline():
    trie = LookupTrie(matching_pipeline=[sp.Lowercase()])
    trie.add_item(["UMC", "Utrecht"])
    assert trie.longest_matching_prefix(["umc", "utrecht"], 0) == 2
    assert trie.longest_matching_prefix(["UMC", "UTRECHT"], 0) == 2


def test_packed_trie_equivalence_random():
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(40)]
    trie = LookupTrie()
    for _ in range(300):
        seq = [rng.choice(vocab) for _ in range(rng.randint(1, 5))]
        trie.add_item(seq)
    packed = PackedTrie.from_lookup_trie(trie)

    for _ in range(200):
        texts = [rng.choice(vocab) for _ in range(rng.randint(1, 30))]
        assert trie.find_spans(texts) == packed.find_spans(texts)
        for i in range(len(texts)):
            assert trie.longest_matching_prefix(texts, i) == packed.longest_matching_prefix(texts, i)


def test_packed_trie_pipeline():
    trie = LookupTrie(matching_pipeline=[sp.Lowercase()])
    trie.add_item(["UMC", "Utrecht"])
    trie.add_item(["AMC"])
    packed = PackedTrie.from_lookup_trie(trie)
    assert packed.find_spans(["naar", "het", "umc", "UTRECHT"]) == [(2, 2)]
    assert packed.find_spans(["amc"]) == [(0, 1)]


def test_packed_trie_pickle_roundtrip():
    import pickle

    trie = LookupTrie()
    trie.add_item(["a", "b"])
    trie.add_item(["a"])
    packed = pickle.loads(pickle.dumps(PackedTrie.from_lookup_trie(trie)))
    assert packed.find_spans(["a", "b", "a"]) == [(0, 2), (2, 1)]


def test_multi_packed_trie_matches_individual():
    rng = random.Random(11)
    vocab = [f"t{i}" for i in range(30)]
    tries = []
    for name in ["lexA", "lexB", "lexC"]:
        trie = LookupTrie()
        for _ in range(150):
            trie.add_item([rng.choice(vocab) for _ in range(rng.randint(1, 4))])
        tries.append((name, trie))

    from deduce_ray.packed_trie import MultiPackedTrie

    multi = MultiPackedTrie(tries)
    for _ in range(100):
        texts = [rng.choice(vocab) for _ in range(rng.randint(1, 25))]
        enc = [t.encode() for t in texts]
        got = multi.find_all(enc)
        for idx, (_, trie) in enumerate(tries):
            assert got[idx] == trie.find_spans(texts), (idx, texts)


def test_multi_packed_trie_pickle():
    import pickle

    from deduce_ray.packed_trie import MemberTrieView, MultiPackedTrie

    trie = LookupTrie()
    trie.add_item(["a", "b"])
    trie.add_item(["a"])
    multi = pickle.loads(pickle.dumps(MultiPackedTrie([("x", trie)])))
    assert multi.find_all([b"a", b"b"]) == [[(0, 2)]]
    view = MemberTrieView(multi, 0)
    assert view.find_spans(["a", "b"]) == [(0, 2)]
    assert len(view) == 2


def test_library_import_has_no_ray_data_side_effects():
    """Importing deduce_ray packages must neither import ray.data (multi-
    second, for numpy-only helpers) nor mutate the global DataContext of
    an embedding application — tuning happens at the engine's own entry
    surfaces (readers, CLI, bench, driver contract) instead."""
    import subprocess
    import sys

    code = (
        "import sys\n"
        "import deduce_ray.ops, deduce_ray.rayops\n"
        "import deduce_ray.ops.multimodal\n"
        "assert 'ray.data' not in sys.modules, 'ray.data import side effect'\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True
    )
    assert proc.returncode == 0, proc.stderr
