"""Training-window preparation: split cleaned documents into fixed word
windows (chunking) and pack chunks into budgeted sequences (packing) —
the stage every LLM data pipeline runs AFTER filtering/dedup and before
tokenizer sharding.

Both ops are single streaming ``map_batches`` passes — no shuffle, no
driver materialization; at 100 TB they parallelize embarrassingly over
corpus blocks.  Word semantics follow the module-wide word class
(:data:`deduce_ray.ops.textstats.WORD_RE`), and chunk text is the
window's words joined by single spaces — the same convention as
substring-dedup's rewrite, so chunk boundaries are reproducible from
the word sequence alone.

Packing is deliberately PER-BLOCK (greedy, first-fit in document
order): global optimal bin packing is a serial constraint that cannot
stream, and per-block greedy is the standard practice at scale — the
only cost is at most one underfull pack per block, which shrinks
relative to block size.  The approximation is documented here and in
the function docstring; nothing is silently dropped (every chunk lands
in exactly one pack).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa


def window_spans(n: int, window: int, stride: int) -> list[tuple[int, int]]:
    """The chunking window math as a pure function (property-tested):
    [start, end) spans at 0, stride, 2*stride, ...; emission stops with
    the first span reaching ``n``.  Requires 0 < stride <= window, so
    consecutive spans always touch or overlap and no word is skipped."""
    spans: list[tuple[int, int]] = []
    start = 0
    while start < n:
        end = min(start + window, n)
        spans.append((start, end))
        if end >= n:
            break
        start += stride
    return spans


def chunk_documents(
    ds,
    window: int = 512,
    stride: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Split each document into word windows of ``window`` words, every
    ``stride`` words (default: ``window``, i.e. disjoint chunks).

    Emits one row per chunk: ``(doc_id, chunk_id, text, n_words)`` with
    ``chunk_id`` the 0-based window index within its document.  Windows
    start at 0, stride, 2*stride, ... ; emission stops with the first
    window that reaches the document's end (so a final partial window
    appears exactly once and no text is lost).  Empty/null documents
    emit nothing.  Overlapping strides (stride < window) duplicate the
    overlapped words by design — the standard context-window overlap.
    """
    from deduce_ray.ops.textstats import split_words

    if window <= 0:
        raise ValueError("window must be positive")
    stride_v = window if stride is None else int(stride)
    if stride_v <= 0:
        raise ValueError("stride must be positive")
    if stride_v > window:
        # a stride beyond the window would skip words between windows
        # (and could drop the document tail) — that is sampling, not
        # chunking, and would silently violate the no-text-lost contract
        raise ValueError(
            f"stride ({stride_v}) must not exceed window ({window}): "
            "words between windows would be silently dropped"
        )

    def chunks(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        out_ids, out_cids, out_texts, out_n = [], [], [], []
        for i, t in zip(ids, texts):
            words = split_words(t or "")
            n = len(words)
            if not n:
                continue
            for cid, (s, e) in enumerate(window_spans(n, window, stride_v)):
                out_ids.append(i)
                out_cids.append(cid)
                out_texts.append(" ".join(words[s:e]))
                out_n.append(e - s)
        # doc_id keeps the INPUT column's type (string ids pass through)
        return pa.table(
            {
                id_col: pa.array(
                    out_ids, type=batch.schema.field(id_col).type
                ),
                "chunk_id": pa.array(out_cids, type=pa.int64()),
                "text": pa.array(out_texts, type=pa.string()),
                "n_words": pa.array(out_n, type=pa.int64()),
            }
        )

    return ds.map_batches(chunks, batch_format="pyarrow", num_cpus=0.9)


def pack_chunks(
    ds,
    max_words: int = 2048,
    text_col: str = "text",
    count_col: str = "n_words",
    id_col: str = "doc_id",
    chunk_col: str = "chunk_id",
    separator: str = "\n\n",
):
    """Greedy first-fit packing of chunks into sequences of at most
    ``max_words`` words, in document order WITHIN each block (per-block
    approximation — see the module docstring).

    Emits one row per pack: ``(pack_id, doc_ids, chunk_ids, text,
    n_words)`` where ``pack_id`` is a deterministic 63-bit hash of the
    member (doc_id, chunk_id) list — stable across executions of this
    re-executable pipeline, independent of block scheduling order.  A
    single chunk longer than ``max_words`` gets its own pack rather
    than being dropped or truncated (no silent caps); ``n_words`` is
    the sum of member word counts (the joined text adds only
    separators).
    """
    if max_words <= 0:
        raise ValueError("max_words must be positive")

    def packs(batch: pa.Table) -> pa.Table:
        id_type = batch.schema.field(id_col).type
        ids = batch.column(id_col).to_pylist()
        cids = batch.column(chunk_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        counts = batch.column(count_col).to_pylist()

        p_ids, p_docs, p_chunks, p_texts, p_n = [], [], [], [], []
        cur_docs: list[int] = []
        cur_chunks: list[int] = []
        cur_texts: list[str] = []
        cur_n = 0

        def flush():
            nonlocal cur_docs, cur_chunks, cur_texts, cur_n
            if not cur_docs:
                return
            # repr() keys are unambiguous for string doc ids that may
            # themselves contain ':' or ',' (quotes + escapes disambiguate
            # them from int ids and from the separators)
            key = ",".join(
                f"{d!r}:{c}" for d, c in zip(cur_docs, cur_chunks)
            ).encode()
            pack_id = (
                int.from_bytes(hashlib.md5(key).digest()[:8], "big") >> 1
            )
            p_ids.append(pack_id)
            p_docs.append(list(cur_docs))
            p_chunks.append(list(cur_chunks))
            p_texts.append(separator.join(cur_texts))
            p_n.append(cur_n)
            cur_docs, cur_chunks, cur_texts, cur_n = [], [], [], 0

        for d, c, t, n in zip(ids, cids, texts, counts):
            if cur_n and cur_n + n > max_words:
                flush()
            cur_docs.append(d)
            cur_chunks.append(c)
            cur_texts.append(t or "")
            cur_n += n
            if cur_n >= max_words:
                flush()
        flush()

        return pa.table(
            {
                "pack_id": pa.array(p_ids, type=pa.int64()),
                "doc_ids": pa.array(p_docs, type=pa.list_(id_type)),
                "chunk_ids": pa.array(p_chunks, type=pa.list_(pa.int64())),
                "text": pa.array(p_texts, type=pa.string()),
                "n_words": pa.array(p_n, type=pa.int64()),
            }
        )

    # a large batch_size makes Ray BUNDLE small upstream blocks into one
    # packing task (the greedy approximation then costs at most one
    # underfull pack per batch, and a many-tiny-blocks corpus does not
    # degenerate into one pack per block) — but sized by WORD budget,
    # not a fixed row count: 65536 rows of 8192-word chunks would be a
    # multi-GB Python-list batch.  ~16M words/batch keeps the batch
    # ~100 MB of text while leaving the underfull-pack cost negligible
    # (max_words/16M per pack).
    batch_rows = max(1024, min(65536, 16_000_000 // max(max_words, 1)))
    return ds.map_batches(
        packs, batch_format="pyarrow", batch_size=batch_rows, num_cpus=0.9
    )
