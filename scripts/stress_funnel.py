"""End-to-end stress for the COMPLETE data-prep funnel: language +
digit + Gopher-repetition filters -> exact dedup -> MinHash near-dup ->
CCNet LM perplexity filter, all in one prep_corpus call over a 1M-doc
synthetic corpus with four planted pathology categories (by id mod 100),
each designed to trip EXACTLY ONE stage:

    0  -> byte-identical boilerplate built from the shared pair pool
          (exact dedup: 1 survivor whose bigrams are corpus-frequent,
          so it also passes the later LM filter)
    1  -> digit-heavy                            (max_digit_ppm)
    2  -> duplicated-line template spam          (max_dup_line_ppm)
    3  -> gibberish: en stopwords interleaved with namespaced unique
          words so EVERY bigram sits at the add-one floor (max_ppl:
          ppl ~11k at 10k docs, ~70k at 1M, vs ~1-2k for normal docs)
    else -> normal docs: a 4-word base-50 id prefix (injective ->
          distinct under exact dedup), "the of and" (language id), and
          a tail of 13 word-pairs drawn per-(id,position) hash from a
          5000-pair pool over a 10k-word vocabulary.  Within-pair
          bigrams are corpus-frequent (the Zipf-like "seen" mass the
          self-trained LM needs); pair-boundary bigrams are floors.

The corpus layout is itself a scale lesson (measured): a first draft
drew every word from a 50-word vocabulary, which saturates the 3-gram
shingle universe (125k possible shingles across 1M docs) — thousands
of LSH band buckets hit the max_bucket cap and the all-pairs candidate
stage inside them wrote >80 GB of object-store spill at 1M docs.  Real
text has enormous shingle diversity; the 10k-word pool restores it
(the only globally shared shingle is "the of and": ~1.1k docs per band
bucket, ~21M rejected candidates, bounded).  The LM/LSH tension is
inherent: frequent bigrams REQUIRE shared word sequences, so the pool
shares 2-word units (bigram signal) while every 3-shingle spans a
pair boundary (shingle diversity).

Expected survivors: EXACTLY n_normal + 1, verified per category.  The
LM stage runs with lm_min_count=3 — the documented scale knob: floor
bigrams are pruned at the count merge so the broadcast model holds
~300k entries at 1M docs instead of ~12M.

Run:  python scripts/stress_funnel.py [n_docs]
Emits one JSON line with wall time and the per-category survivor check.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa

_LETTERS = "abcdefghijklmnopqrstuvwxyz"


def _b26(n: int) -> str:
    out = []
    while True:
        out.append(_LETTERS[n % 26])
        n //= 26
        if not n:
            return "".join(out)


_W = ["v" + _b26(j) for j in range(10_000)]  # shared 10k-word vocabulary
N_PAIRS = 5_000  # pair p = (_W[2p], _W[2p+1]); the frequent-bigram units

# 3 + 22 words, never byte-equal to a 33-word normal doc
# en-profile word pairs only: guarantees predict_lang(doc) == "en"
# (score >= 2; no other profile can exceed 1 on the "v"-prefixed vocab)
_STOPWORD_PAIRS = [
    ("the", "of"), ("and", "to"), ("is", "in"), ("that", "it"),
    ("the", "for"), ("of", "and"), ("to", "is"), ("in", "that"),
    ("it", "for"), ("the", "and"), ("of", "to"), ("is", "that"),
    ("in", "it"), ("for", "the"), ("and", "of"), ("to", "in"),
    ("is", "it"), ("that", "for"), ("the", "is"), ("of", "in"),
    ("and", "it"), ("to", "that"), ("is", "for"), ("in", "the"),
    ("it", "of"),
]

_BOILER = "the of and " + " ".join(
    f"{_W[2 * p]} {_W[2 * p + 1]}" for p in range(11)
)


def _doc_text(i: int) -> str:
    k = i % 100
    if k == 0:
        return _BOILER
    if k == 1:
        return f"4821 90210 55512 {i} 777 31337 2718281828"
    if k == 2:
        return "the spam line is here\n" * 6
    if k == 3:
        u = [f"zz{_b26(i * 6 + s)}" for s in range(6)]
        # stopwords in the word SET (language id) but never adjacent to
        # each other -> every bigram is an add-one floor
        return f"the {u[0]} of {u[1]} and {u[2]} {u[3]} {u[4]} {u[5]}"
    words = []
    n = i
    for _ in range(4):  # id in base 50: injective prefix
        words.append(_W[n % 50])
        n //= 50
    h = (i * 2654435761) & 0xFFFFFFFF
    # 14 two-word units: 13 hash-chosen vocab pairs plus ONE stopword
    # pair (en profile words -> language id) at a hash-chosen slot.
    # No word sequence is shared by a constant fraction of the corpus:
    # a globally shared phrase ("the of and" in an earlier draft) makes
    # r=2 LSH band buckets grow Theta(n) and the candidate stage
    # Theta(n^2) — measured 5M sub-threshold candidates at 96k docs,
    # ~24 GB of object spill at 700k (see the module docstring).
    stop_slot = (h >> 4) % 14
    stop_pair = _STOPWORD_PAIRS[(h >> 8) % len(_STOPWORD_PAIRS)]
    for j in range(14):
        if j == stop_slot:
            words.extend(stop_pair)
            continue
        h = (h * 1103515245 + j * 40503 + 12345) & 0xFFFFFFFF
        p = (h >> 12) % N_PAIRS
        words.append(_W[2 * p])
        words.append(_W[2 * p + 1])
    return " ".join(words)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    assert n_docs % 100 == 0

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    import ray.data

    from deduce_ray.ops.funnel import prep_corpus
    from deduce_ray.raytune import tune_data_context

    tune_data_context()

    def synth(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "text": pa.array(
                    [_doc_text(int(i)) for i in ids], type=pa.string()
                ),
            }
        )

    docs = ray.data.range(n_docs).map_batches(synth, batch_format="pyarrow")

    t0 = time.perf_counter()
    out = prep_corpus(
        docs,
        langs=("en",),
        min_chars=20,
        max_digit_ppm=300_000,
        max_dup_line_ppm=500_000,
        max_top_2gram_ppm=900_000,
        max_dup_5gram_ppm=900_000,
        minhash_threshold=0.7,
        max_bucket=4096,
        max_ppl=5_000.0,
        lm_min_count=3,
    ).materialize()
    wall = time.perf_counter() - t0

    import numpy as np

    per_cat = np.zeros(5, dtype=np.int64)  # 0..3 planted, 4 = normal
    for b in out.iter_batches(batch_format="pyarrow"):
        k = b.column("doc_id").to_numpy(zero_copy_only=False) % 100
        np.add.at(per_cat, np.minimum(k, 4), 1)

    n_normal = n_docs - 4 * (n_docs // 100)
    expect = [1, 0, 0, 0, n_normal]
    got = per_cat.tolist()
    print(
        json.dumps(
            {
                "n_docs": n_docs,
                "wall_sec": round(wall, 2),
                "docs_per_sec": round(n_docs / wall, 1),
                "survivors": int(per_cat.sum()),
                "per_category": {
                    "exact_dup": got[0],
                    "digits": got[1],
                    "dup_lines": got[2],
                    "gibberish": got[3],
                    "normal": got[4],
                },
                "exact": got == expect,
            }
        )
    )
    assert got == expect, (got, expect)
    ray.shutdown()


if __name__ == "__main__":
    main()
