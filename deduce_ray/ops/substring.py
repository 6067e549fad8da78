"""Cross-document duplicated-substring detection (Lee et al. 2021,
"Deduplicating Training Data Makes Language Models Better",
arXiv:2107.06499): find the word spans of every document that also occur
verbatim in at least ``min_docs - 1`` OTHER documents, as merged maximal
intervals.  This is substring-level dedup — finer than the whole-doc
(exact) and near-doc (MinHash/SimHash) families in
:mod:`deduce_ray.ops.dedup` — and the standard tool for stripping
boilerplate (license headers, navigation chrome, templated intros) from
a training corpus.

Match semantics are word-sequence equality over the module-wide word
class (:data:`deduce_ray.ops.textstats.WORD_RE`): a window of ``n``
consecutive words is *duplicated* iff the same ``n`` words (joined by
single spaces) appear in >= ``min_docs`` distinct documents.  Duplicated
window positions are merged per document into maximal contiguous
intervals (windows whose starts are <= ``n`` apart chain together).
This is exactly reproducible in SQL, so the ``dup_spans`` query has a
full DuckDB oracle.

Scale shape (the published distributed approximation — suffix arrays do
not distribute; n-gram fingerprints do):

- one streaming ``map_batches`` pass emits ``(gram_hash, doc_id, pos)``
  — 24 bytes per word position, constant width, no strings on the wire;
- ONE all-to-all exchange groups by a hash shard of the gram; within a
  shard, duplicated grams are found with a vectorized pandas
  ``transform('nunique')`` (no per-gram Python);
- the surviving hit positions (usually a small fraction of the corpus)
  ride a second, doc-sharded exchange where intervals merge vectorized.

The exchange payload is ~24 B x total corpus word count — the honest,
linear cost of substring dedup; nothing is quadratic and no stage holds
more than one shard in memory.

Gram identity is a 64-bit polynomial combine of memoized md5 word
hashes (:func:`deduce_ray.ops.dedup._word_hashes`); a collision would
need two distinct word sequences in the corpus to share a 64-bit hash
(~(corpus grams)^2 / 2^64 — negligible, and the repo-wide convention
for md5-64 identities).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


# single positional rolling-hash core, shared with the MinHash shingle
# stage so the gram identity can never drift between the two families
from deduce_ray.ops.dedup import gram_hash_array  # noqa: F401  (re-export)


def duplicated_ngram_spans(
    ds,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
):
    """Dataset of ``(doc_id, start_word, end_word)`` — one row per
    maximal duplicated span per document, where a span is the union of
    ``n``-word windows shared (verbatim) by >= ``min_docs`` distinct
    documents.  ``end_word`` is exclusive; positions index the
    document's word sequence."""
    from deduce_ray.ops.agg import merge_shards
    from deduce_ray.ops.textstats import split_words

    n_shards = merge_shards()

    def emit_grams(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        hash_parts, id_parts, pos_parts = [], [], []
        for i, t in zip(ids, texts):
            g = gram_hash_array(split_words(t or ""), n)
            if not len(g):
                continue
            hash_parts.append(g.view(np.int64))
            id_parts.append(np.full(len(g), i, dtype=np.int64))
            pos_parts.append(np.arange(len(g), dtype=np.int64))
        if not hash_parts:
            return pa.table(
                {
                    "gram_shard": pa.array([], type=pa.int64()),
                    "gram_hash": pa.array([], type=pa.int64()),
                    id_col: pa.array([], type=pa.int64()),
                    "pos": pa.array([], type=pa.int64()),
                }
            )
        gh = np.concatenate(hash_parts)
        return pa.table(
            {
                "gram_shard": (gh.view(np.uint64) % n_shards).astype(np.int64),
                "gram_hash": gh,
                id_col: np.concatenate(id_parts),
                "pos": np.concatenate(pos_parts),
            }
        )

    def dup_hits(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized within the shard: a gram is duplicated iff its
        # positions span >= min_docs distinct documents.  The next
        # shuffle's key is emitted here too (one stage fewer over the
        # hits dataset).
        ndocs = df.groupby("gram_hash", sort=False)[id_col].transform("nunique")
        hits = df.loc[ndocs >= min_docs, [id_col, "pos"]].copy()
        if hits.empty:
            return pd.DataFrame(
                {
                    id_col: pd.Series(dtype="int64"),
                    "pos": pd.Series(dtype="int64"),
                    "doc_shard": pd.Series(dtype="int64"),
                }
            )
        hits["doc_shard"] = hits[id_col].to_numpy() % n_shards
        return hits

    def merge_intervals(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                id_col: pd.Series(dtype="int64"),
                "start_word": pd.Series(dtype="int64"),
                "end_word": pd.Series(dtype="int64"),
            }
        )
        if df.empty:
            return empty
        # (doc, pos) rows are unique by construction: the emitter
        # produces each document position exactly once, and dup_hits
        # only filters — so no dedup before the interval merge
        df = df.sort_values([id_col, "pos"], kind="mergesort")
        doc = df[id_col].to_numpy()
        pos = df["pos"].to_numpy()
        brk = np.ones(len(df), dtype=bool)
        if len(df) > 1:
            same_doc = doc[1:] == doc[:-1]
            chained = (pos[1:] - pos[:-1]) <= n
            brk[1:] = ~(same_doc & chained)
        gid = np.cumsum(brk)
        out = pd.DataFrame({id_col: doc, "pos": pos, "gid": gid})
        agg = out.groupby("gid", sort=True).agg(
            **{
                id_col: (id_col, "first"),
                "start_word": ("pos", "min"),
                "end_word": ("pos", "max"),
            }
        )
        agg["end_word"] += n
        return agg.reset_index(drop=True)

    # large batch_size COALESCES small input blocks before the sort
    # exchange: shuffle metadata scales with blocks x shard partitions,
    # and a many-tiny-blocks corpus otherwise pays tens of seconds of
    # pure scheduling (the repo-wide pre-shuffle coalescing pattern)
    grams = ds.map_batches(
        emit_grams, batch_format="pyarrow", batch_size=8192, num_cpus=0.9
    )
    hits = grams.groupby("gram_shard").map_groups(dup_hits, batch_format="pandas")
    spans = hits.groupby("doc_shard").map_groups(
        merge_intervals, batch_format="pandas"
    )
    return spans


def strip_dup_spans(
    ds,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
    spans=None,
    chunk_rows: int = 50_000_000,
):
    """Rewrite the corpus with duplicated spans REMOVED — the cleaning
    step of substring dedup (Lee et al. 2021 strip the repeated
    substring from all but one occurrence; this removes it from every
    document, the symmetric variant that needs no global occurrence
    ordering).  Returns the input rows with ``text_col`` rewritten.

    A document containing duplicated spans is rebuilt as its surviving
    words joined by single spaces (word-level semantics, matching the
    detector); documents with no duplicated span keep their original
    text byte-for-byte.  All other columns pass through unchanged, so
    the op composes inside a wider pipeline (the prep funnel).

    Scale shape: the corpus STREAMS (one map_batches, no full-row
    shuffle); the span side — output of
    :func:`duplicated_ngram_spans`, one row per maximal duplicated
    interval — ships in sorted numpy chunks of at most ``chunk_rows``
    rows via ``ray.put`` (driver holds one chunk at a time, workers
    zero-copy them from plasma), the same bounded broadcast shape as
    the dedup loser anti-join.  At pathological boilerplate rates the
    span count approaches the document count, the identical bound class
    as ``dedup_survivors``' loser set.

    Pass ``spans`` to reuse an already-computed span dataset; ``ds``
    must be re-readable when spans are derived here (detection pass +
    rewrite pass).
    """
    import ray

    from deduce_ray.ops.textstats import split_words

    if spans is None:
        spans = duplicated_ngram_spans(
            ds, n=n, text_col=text_col, id_col=id_col, min_docs=min_docs
        )

    # respect the caller's chunk size (tests exercise the multi-chunk
    # merge path with tiny chunks); the 50M default bounds driver peak
    chunk_rows = max(int(chunk_rows), 1)
    refs, bufs, buffered = [], [], 0

    def _flush():
        nonlocal bufs, buffered
        if not bufs:
            return
        doc = np.concatenate([b[0] for b in bufs])
        start = np.concatenate([b[1] for b in bufs])
        end = np.concatenate([b[2] for b in bufs])
        order = np.lexsort((start, doc))
        refs.append(ray.put((doc[order], start[order], end[order])))
        bufs, buffered = [], 0

    for b in spans.iter_batches(batch_format="pyarrow"):
        if not b.num_rows:
            continue
        bufs.append(
            (
                b.column(id_col).to_numpy(zero_copy_only=False),
                b.column("start_word").to_numpy(zero_copy_only=False),
                b.column("end_word").to_numpy(zero_copy_only=False),
            )
        )
        buffered += b.num_rows
        if buffered >= chunk_rows:
            _flush()
    _flush()

    def rewrite(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        intervals: dict[int, list[tuple[int, int]]] = {}
        for ref in refs:
            doc, start, end = ray.get(ref)
            lo = np.searchsorted(doc, ids, side="left")
            hi = np.searchsorted(doc, ids, side="right")
            for i in np.nonzero(hi > lo)[0]:
                intervals.setdefault(int(ids[i]), []).extend(
                    zip(
                        start[lo[i] : hi[i]].tolist(),
                        end[lo[i] : hi[i]].tolist(),
                    )
                )
        if not intervals:
            return batch
        texts = batch.column(text_col).to_pylist()
        out = []
        for i, t in zip(ids.tolist(), texts):
            spans_i = intervals.get(i)
            if not spans_i:
                out.append(t)
                continue
            words = split_words(t or "")
            keep = np.ones(len(words), dtype=bool)
            for s, e in spans_i:
                keep[s:e] = False
            out.append(" ".join(w for w, k in zip(words, keep) if k))
        # replace the text column in place: every other column passes
        # through untouched
        idx = batch.schema.get_field_index(text_col)
        return batch.set_column(
            idx, text_col, pa.array(out, type=pa.string())
        )

    return ds.map_batches(rewrite, batch_format="pyarrow", num_cpus=0.9)
