"""Benchmark decontamination: flag (or drop) documents that share any
word n-gram with a benchmark/evaluation set — the step that keeps test
data out of a training corpus.

Match semantics are word-sequence equality, not raw substring: a
document is contaminated iff the set of its ``n``-gram strings (words
joined by single spaces, words per the module-wide
:data:`~deduce_ray.ops.textstats.WORD_RE` class) intersects the
benchmark's ``n``-gram set.  This is exactly reproducible in SQL (the
``decontaminate`` oracle equality-joins both sides' unnested n-grams),
and it is the standard 13-gram criterion from published training-data
pipelines.

Scale shape: the benchmark side is SMALL (an eval suite — thousands to
millions of grams); it broadcasts ONCE via ``ray.put`` as (a) a sorted
uint64 hash array for a vectorized searchsorted prefilter and (b) the
exact gram strings for collision-proof verification.  The corpus
streams through one ``map_batches``; nothing shuffles.  For benchmark
sets too large to hold exact strings per worker, ``hash_only=True``
skips (b) — md5-64 collisions then flag ~n_grams/2^64 false positives,
which for decontamination (dropping a few extra docs) is the safe
direction.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def _gram_strings(text: str, n: int) -> list[str]:
    from deduce_ray.ops.textstats import split_words

    words = split_words(text or "")
    if len(words) < n:
        return []
    return [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]


def _hash64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big", signed=True)


def benchmark_grams(texts, n: int = 13) -> set[str]:
    """The benchmark side's n-gram set from an iterable of texts."""
    grams: set[str] = set()
    for t in texts:
        grams.update(_gram_strings(t or "", n))
    return grams


def contaminated_ids(
    ds,
    grams: set[str],
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_only: bool = False,
):
    """Dataset of the ids of documents sharing >= 1 n-gram with
    ``grams``, streaming (one map_batches, no shuffle)."""
    import ray

    sorted_hashes = np.sort(
        np.fromiter((_hash64(g) for g in grams), dtype=np.int64, count=len(grams))
    )
    hashes_ref = ray.put(sorted_hashes)
    grams_ref = None if hash_only else ray.put(grams)

    def flag(batch: pa.Table) -> pa.Table:
        bench_hashes = ray.get(hashes_ref)
        bench_grams = None if grams_ref is None else ray.get(grams_ref)
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        hit_ids = []
        for i, t in zip(ids, texts):
            doc_grams = _gram_strings(t or "", n)
            if not doc_grams:
                continue
            h = np.fromiter(
                (_hash64(g) for g in doc_grams),
                dtype=np.int64,
                count=len(doc_grams),
            )
            if not len(bench_hashes):
                continue
            pos = np.minimum(
                np.searchsorted(bench_hashes, h), len(bench_hashes) - 1
            )
            cand = np.nonzero(bench_hashes[pos] == h)[0]
            if not len(cand):
                continue
            if bench_grams is None or any(
                doc_grams[c] in bench_grams for c in cand
            ):
                hit_ids.append(i)
        return pa.table(
            {id_col: pa.array(hit_ids, type=batch.schema.field(id_col).type)}
        )

    return ds.map_batches(flag, batch_format="pyarrow", num_cpus=0.9)


def decontaminate(
    ds,
    grams: set[str],
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    loser_broadcast_max: int = 50_000_000,
    hash_only: bool = False,
):
    """Drop contaminated documents; returns the surviving Dataset.
    ``ds`` must be re-readable (flag pass + filter pass); contaminated
    ids ride the shared bounded-chunk searchsorted anti-join."""
    from deduce_ray.ops.dedup import _chunked_id_refs, _drop_ids

    hits = contaminated_ids(
        ds, grams, n=n, text_col=text_col, id_col=id_col, hash_only=hash_only
    )
    refs = _chunked_id_refs(hits, id_col, loser_broadcast_max)
    if not refs:
        return ds
    return _drop_ids(ds, refs, id_col)
