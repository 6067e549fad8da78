"""The canonical LLM training-data preparation funnel, composed from this
engine's operators as ONE streaming pipeline:

    corpus -> language filter -> quality filter -> exact dedup
           -> substring strip (optional) -> MinHash near-dup removal
           -> surviving rows

Substring stripping runs BEFORE the MinHash pass on purpose: shared
boilerplate (license headers, navigation chrome) that is large enough
to collide LSH band buckets but below the Jaccard threshold creates
quadratic candidate blowup in the verify stage (measured: 20k docs
sharing a 40-word header among 100k docs runs for >10 minutes);
stripping the duplicated spans first removes the shared mass, so the
buckets reflect the documents' real bodies.  ``max_bucket`` (off by
default, like every output-changing cap in this repo) is the residual
safety net for boilerplate the strip cannot see (shared runs shorter
than the n-gram window); the prep CLI enables it at 4096 as its
disclosed production default.

Every stage is the already-oracled primitive (textstats heuristics,
dedup_survivors' loser anti-join, minhash_lsh_pairs + neardup_clusters);
this module only supplies the glue, filter predicates, and the near-dup
loser selection.  The EXPENSIVE language/quality predicate runs exactly
once: its failing ids broadcast as bounded sorted chunks (the same
ray.put shape as the dedup losers) and every pass applies only the
cheap searchsorted anti-join.  With the default ``checkpoint=True`` the
filtered/survivor sets are materialized into the (spill-backed) object
store between the multi-consume stages — at beyond-RAM corpus sizes
that is object-store spill, not heap; ``checkpoint=False`` keeps every
stage a lazy re-execution instead.

Cluster-loser semantics: within every near-dup cluster the MINIMUM doc id
survives (``neardup_clusters`` labels components by their min id, so a
loser is simply a row whose id differs from its cluster id).
"""

from __future__ import annotations

import pyarrow as pa


def _failing_ids_fn(
    text_col: str,
    id_col: str,
    langs: tuple[str, ...] | None,
    min_chars: int,
    max_digit_ppm: int | None,
    max_dup_line_ppm: int | None = None,
    max_top_2gram_ppm: int | None = None,
    max_dup_5gram_ppm: int | None = None,
):
    from deduce_ray.ops.textstats import (
        _DIGIT_RE,
        _gram_ppms,
        predict_lang,
        repetition_signals,
        split_words,
    )

    rep_all = all(
        v is not None
        for v in (max_dup_line_ppm, max_top_2gram_ppm, max_dup_5gram_ppm)
    )

    def rep_fails(t: str) -> bool:
        # compute only the enabled signals: the gram Counters dominate
        # this pass's per-doc cost, so a line-cap-only run must not pay
        # for 2-gram AND 5-gram counting it will discard
        if rep_all:
            _, dl, _, t2, d5 = repetition_signals(t)
            return (
                dl > max_dup_line_ppm
                or t2 > max_top_2gram_ppm
                or d5 > max_dup_5gram_ppm
            )
        if max_dup_line_ppm is not None:
            lines = [ln for ln in t.split("\n") if ln]
            if lines:
                dl = ((len(lines) - len(set(lines))) * 1_000_000) // len(
                    lines
                )
                if dl > max_dup_line_ppm:
                    return True
        if max_top_2gram_ppm is not None or max_dup_5gram_ppm is not None:
            ws = split_words(t)
            if (
                max_top_2gram_ppm is not None
                and _gram_ppms(ws, 2)[0] > max_top_2gram_ppm
            ):
                return True
            if (
                max_dup_5gram_ppm is not None
                and _gram_ppms(ws, 5)[1] > max_dup_5gram_ppm
            ):
                return True
        return False

    rep_on = any(
        v is not None
        for v in (max_dup_line_ppm, max_top_2gram_ppm, max_dup_5gram_ppm)
    )

    def failing(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        mask = []
        for t in texts:
            t = t or ""
            n = len(t)
            if n < min_chars:
                mask.append(True)
                continue
            # n == 0 passes a min_chars <= 0 gate; treat its digit ratio
            # as 0 (the same guard textstats.quality_batch applies)
            if max_digit_ppm is not None and n:
                d = len(_DIGIT_RE.findall(t))
                if (d * 1_000_000) // n > max_digit_ppm:
                    mask.append(True)
                    continue
            if langs is not None and predict_lang(t) not in langs:
                mask.append(True)
                continue
            if rep_on and rep_fails(t):
                mask.append(True)
                continue
            mask.append(False)
        return pa.table(
            {id_col: batch.column(id_col).filter(pa.array(mask, type=pa.bool_()))}
        )

    return failing


def _neardup_loser_refs(
    survivors,
    text_col: str,
    id_col: str,
    minhash_threshold: float,
    loser_broadcast_max: int,
    max_bucket: int | None = None,
    bands: int | None = None,
    keep: str = "min_id",
):
    """ray.put sorted-id chunk refs for every near-dup cluster member
    except its representative.  The clusters table is bounded by the
    corpus's near-duplicate rows, so the loser list is small relative
    to the corpus.

    ``keep`` picks the representative: ``"min_id"`` (the component
    minimum — cheapest, row-local) or ``"longest"`` (the member with
    the most characters, ties to the smaller id — the CCNet/
    RefinedWeb-style quality heuristic: boilerplate-trimmed copies and
    truncated mirrors lose to the fullest text).  The longest path
    adds ONE bounded corpus pass: cluster member ids broadcast sorted,
    members emit (id, n_chars), and a small cluster-sharded groupby
    picks winners — everything scales with the near-dup mass, never
    the corpus."""
    from deduce_ray.ops.dedup import (
        _chunked_id_refs,
        minhash_lsh_pairs,
        neardup_clusters,
    )

    if keep not in ("min_id", "longest"):
        raise ValueError(f"keep must be 'min_id' or 'longest', got {keep!r}")
    kwargs = {} if bands is None else {"bands": bands}
    pairs = minhash_lsh_pairs(
        survivors,
        text_col=text_col,
        id_col=id_col,
        threshold=minhash_threshold,
        max_bucket=max_bucket,
        **kwargs,
    )
    labels = neardup_clusters(pairs)
    if keep == "longest":
        return _longest_member_loser_refs(
            survivors, labels, text_col, id_col, loser_broadcast_max
        )

    def losers_of(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # cluster_id IS the component minimum, so the loser test is
        # row-local — a per-batch groupby-min would be wrong whenever a
        # cluster spans blocks (the distributed labels path shards by id)
        keep_mask = pc.equal(batch.column("doc_id"), batch.column("cluster_id"))
        return pa.table(
            {"doc_id": batch.column("doc_id").filter(pc.invert(keep_mask))}
        )

    loser_ds = labels.map_batches(losers_of, batch_format="pyarrow")
    return _chunked_id_refs(loser_ds, "doc_id", loser_broadcast_max)


def _longest_member_loser_refs(survivors, labels, text_col, id_col,
                               loser_broadcast_max):
    """Losers = cluster members except the (max n_chars, min id) one.
    labels: (doc_id, cluster_id) rows, bounded by near-dup mass."""
    import numpy as np
    import ray
    import pyarrow.compute as pc

    from deduce_ray.ops.agg import merge_shards
    from deduce_ray.ops.dedup import _chunked_id_refs

    labels = labels.materialize()
    member_refs = _chunked_id_refs(
        labels.map_batches(
            lambda b: b.select(["doc_id"]), batch_format="pyarrow"
        ),
        "doc_id",
        loser_broadcast_max,
    )
    if not member_refs:
        return []

    def member_lengths(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        mask = np.zeros(len(ids), dtype=bool)
        for ref in member_refs:
            chunk = ray.get(ref)
            idx = np.searchsorted(chunk, ids)
            idx[idx == len(chunk)] = 0
            mask |= chunk[idx] == ids
        if not mask.any():
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "n_chars": pa.array([], type=pa.int64()),
                }
            )
        sub = batch.filter(pa.array(mask))
        texts = sub.column(text_col).to_pylist()
        return pa.table(
            {
                "doc_id": pc.cast(sub.column(id_col), pa.int64()),
                "n_chars": pa.array(
                    [len(t) if t else 0 for t in texts], type=pa.int64()
                ),
            }
        )

    lengths = survivors.map_batches(member_lengths, batch_format="pyarrow")
    n_shards = merge_shards()

    def shard_of(batch: pa.Table, col: str) -> pa.Table:
        c = batch.column(col).to_numpy(zero_copy_only=False)
        return batch.append_column(
            "__shard",
            pa.array(
                (c.view(np.uint64) % n_shards).astype(np.int64)
                if len(c)
                else np.empty(0, dtype=np.int64)
            ),
        )

    import pandas as pd

    # two tiny sharded exchanges over the near-dup mass only: (1) a
    # member-id-sharded merge attaches each member's n_chars to its
    # label row, (2) a cluster-sharded pass keeps everything but the
    # (max n_chars, min id) representative per cluster
    lab_tag = labels.map_batches(
        lambda b: b.append_column(
            "__side", pa.array(np.zeros(b.num_rows, dtype=np.int64))
        ).append_column(
            "n_chars", pa.array(np.zeros(b.num_rows, dtype=np.int64))
        ),
        batch_format="pyarrow",
    )
    len_tag = lengths.map_batches(
        lambda b: pa.table(
            {
                "doc_id": b.column("doc_id"),
                "cluster_id": pa.array(
                    np.zeros(b.num_rows, dtype=np.int64)
                ),
                "__side": pa.array(np.ones(b.num_rows, dtype=np.int64)),
                "n_chars": b.column("n_chars"),
            }
        ),
        batch_format="pyarrow",
    )
    both = lab_tag.union(len_tag).map_batches(
        lambda b: shard_of(b, "doc_id"), batch_format="pyarrow"
    )

    def join_member(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "cluster_id": pa.array([], type=pa.int64()),
                    "n_chars": pa.array([], type=pa.int64()),
                }
            )
        lab = df[df["__side"] == 0][["doc_id", "cluster_id"]]
        ln = df[df["__side"] == 1][["doc_id", "n_chars"]]
        m = lab.merge(ln, on="doc_id", how="left")
        m["n_chars"] = m["n_chars"].fillna(0).astype("int64")
        return pa.Table.from_pandas(m, preserve_index=False)

    member_rows = both.groupby("__shard").map_groups(
        join_member, batch_format="pandas"
    )
    clustered = member_rows.map_batches(
        lambda b: shard_of(b, "cluster_id"), batch_format="pyarrow"
    )
    loser_ds = clustered.groupby("__shard").map_groups(
        pick_losers_by_cluster, batch_format="pandas"
    )
    return _chunked_id_refs(loser_ds, "doc_id", loser_broadcast_max)


def pick_losers_by_cluster(df):
    """Within one cluster shard: every member except the
    (max n_chars, min doc_id) representative."""
    import pandas as pd
    import pyarrow as pa

    if df.empty:
        return pa.table({"doc_id": pa.array([], type=pa.int64())})
    df = df.sort_values(["n_chars", "doc_id"], ascending=[False, True])
    losers = df[df.duplicated("cluster_id", keep="first")]
    return pa.table(
        {"doc_id": pa.array(losers["doc_id"].to_numpy(), type=pa.int64())}
    )


def prep_corpus(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    langs: tuple[str, ...] | None = None,
    min_chars: int = 1,
    max_digit_ppm: int | None = None,
    max_dup_line_ppm: int | None = None,
    max_top_2gram_ppm: int | None = None,
    max_dup_5gram_ppm: int | None = None,
    minhash_threshold: float | None = 0.7,
    neardup_keep: str = "min_id",
    strip_dup_ngrams: int | None = None,
    max_bucket: int | None = None,
    minhash_bands: int | None = None,
    max_ppl: float | None = None,
    lm_min_count: int = 1,
    semantic_threshold: float | None = None,
    embed_dim: int = 32,
    checkpoint: bool = True,
    loser_broadcast_max: int = 50_000_000,
):
    """Run the funnel; returns the surviving corpus Dataset.

    ``checkpoint`` (default on) materializes the survivor set into the
    object store after the exact-dedup and strip stages.  The funnel's
    later passes each re-execute their input pipeline; without a
    checkpoint that means re-reading and re-filtering the raw corpus
    ~6x (measured on a 1M-doc boilerplate corpus: 253 s lazy vs 89 s
    checkpointed).  Materialized blocks spill to disk under memory
    pressure, so this holds at corpus sizes beyond RAM; pass False to
    trade recompute for zero object-store footprint.

    ``langs=None`` / ``max_digit_ppm=None`` / ``minhash_threshold=None``
    disable the corresponding stage.  ``strip_dup_ngrams`` (e.g. 13)
    enables substring-level dedup between the exact and near-dup passes:
    word spans shared verbatim by >= 2 exact-dedup survivors are
    stripped from all of them BEFORE MinHash (see the module docstring
    for why the order matters).  ``max_bucket`` caps LSH bucket
    membership in the near-dup pass (logged drops) — like every
    output-changing cap in this repo it is OFF by default so results
    stay exact; boilerplate-heavy corpora should set it (the prep CLI
    defaults to 4096, disclosed in its --help) or enable
    ``strip_dup_ngrams``, which removes the shared mass before LSH.
    ``minhash_bands`` overrides the LSH banding (None keeps the library
    default 32x2): corpora where a short phrase appears in nearly every
    document should use fewer/wider bands (e.g. 16 -> r=4) — with r=2
    the ubiquitous-phrase band buckets grow Theta(n) and the rejected
    candidates Theta(n^2) (measured; see minhash_lsh_pairs and
    scripts/stress_funnel.py).

    ``neardup_keep`` picks each near-dup cluster's survivor:
    ``"min_id"`` (default) or ``"longest"`` (max characters, ties to
    the smaller id — keep the fullest copy, the quality-aware
    convention; see _neardup_loser_refs).

    ``max_dup_line_ppm`` / ``max_top_2gram_ppm`` / ``max_dup_5gram_ppm``
    enable the Gopher-style repetition filters inside the SAME single
    expensive predicate pass as the language/digit gates (one streaming
    read, failing ids broadcast once): documents whose duplicate-line
    fraction, heaviest-2-gram mass, or duplicated-5-gram mass exceeds
    the ppm threshold are dropped (textstats.repetition_signals — the
    exact contract the oracled ``doc_repetition`` query value-checks).

    ``semantic_threshold`` enables the semantic near-dup stage between
    the MinHash pass and the LM filter: the corpus is embedded by the
    actor-pool hashing encoder (ops/embed.py, ``embed_dim`` components)
    and cosine near-duplicate clusters above the threshold keep only
    their representative (``neardup_keep`` applies here too) — catching word-reordered/paraphrase-shaped
    duplicates that shingle space misses.

    ``max_ppl`` enables the CCNet-style LM quality filter as the LAST
    stage: a bigram model self-trains on the deduplicated survivors
    (training before dedup would let duplicate mass bias the counts)
    and documents whose perplexity exceeds the threshold are dropped.
    Documents with < 2 words have no perplexity and always survive this
    stage (no evidence either way).  ``lm_min_count`` prunes the model's
    bigram tail at scale (ops/lm.py — pruning keeps results
    deterministic but is output-changing, so it is 1/off by default).

    The input must satisfy the module-wide doc-id contract (unique,
    non-null, non-negative int64 ids) and be re-readable (it is consumed
    by multiple passes, like
    :func:`deduce_ray.ops.dedup.dedup_survivors`).
    """
    from deduce_ray.ops.dedup import (
        _chunked_id_refs,
        _drop_ids,
        dedup_survivors,
    )

    rep_caps = (max_dup_line_ppm, max_top_2gram_ppm, max_dup_5gram_ppm)
    if (
        langs is not None
        or min_chars > 1
        or max_digit_ppm is not None
        or any(v is not None for v in rep_caps)
    ):
        fail_ds = ds.map_batches(
            _failing_ids_fn(
                text_col, id_col, langs, min_chars, max_digit_ppm, *rep_caps
            ),
            batch_format="pyarrow",
        )
        refs = _chunked_id_refs(fail_ds, id_col, loser_broadcast_max)
        filtered = _drop_ids(ds, refs, id_col) if refs else ds
        if checkpoint:
            # dedup_survivors consumes its input twice; without this the
            # raw read + filter re-executes for each pass
            filtered = filtered.materialize()
    else:
        filtered = ds
    survivors = dedup_survivors(
        filtered,
        text_col=text_col,
        id_col=id_col,
        loser_broadcast_max=loser_broadcast_max,
    )
    if checkpoint and (strip_dup_ngrams or minhash_threshold is not None):
        survivors = survivors.materialize()
    if strip_dup_ngrams:
        from deduce_ray.ops.substring import strip_dup_spans

        survivors = strip_dup_spans(
            survivors,
            n=strip_dup_ngrams,
            text_col=text_col,
            id_col=id_col,
            chunk_rows=loser_broadcast_max,
        )
        if checkpoint and minhash_threshold is not None:
            survivors = survivors.materialize()
    if minhash_threshold is None:
        out = survivors
    else:
        # near-dup pass runs over the exact-dedup (and, when enabled,
        # substring-stripped) SURVIVORS: collapse already removed
        # byte-identical copies and the strip removed shared boilerplate,
        # so LSH buckets reflect each document's real body
        refs = _neardup_loser_refs(
            survivors,
            text_col,
            id_col,
            minhash_threshold,
            loser_broadcast_max,
            max_bucket=max_bucket,
            bands=minhash_bands,
            keep=neardup_keep,
        )
        out = _drop_ids(survivors, refs, id_col) if refs else survivors
    if semantic_threshold is not None:
        out = _semantic_loser_filter(
            out, text_col, id_col, float(semantic_threshold),
            embed_dim, loser_broadcast_max, checkpoint,
            keep=neardup_keep,
        )
    if max_ppl is None:
        return out
    return _lm_ppl_filter(
        out, text_col, id_col, float(max_ppl), lm_min_count,
        loser_broadcast_max, checkpoint,
    )


def _semantic_loser_filter(out, text_col, id_col, threshold, dim,
                           loser_broadcast_max, checkpoint,
                           keep: str = "min_id"):
    """Semantic near-dup stage: embed the surviving corpus (actor-pool
    inference, ops/embed.py), find cosine near-duplicate clusters via
    hyperplane LSH, keep each cluster's minimum id.  Runs AFTER the
    MinHash pass: shingle-level near-dups are already gone, so this
    catches only reorderings/paraphrases the n-gram space missed (the
    bag-of-words hashing encoder maps word-permuted documents to the
    SAME vector — cosine exactly 1.0, LSH recall 1).  The survivor set
    is consumed twice (embed + final anti-join), so it checkpoints
    first."""
    import pyarrow.compute as pc

    from deduce_ray.ops.dedup import (
        _chunked_id_refs,
        _drop_ids,
        embedding_neardup_pairs,
        neardup_clusters,
    )
    from deduce_ray.ops.embed import embed_documents

    if checkpoint:
        out = out.materialize()
    emb = embed_documents(out, text_col=text_col, id_col=id_col, dim=dim)
    pairs = embedding_neardup_pairs(
        emb, id_col=id_col, vec_col="embedding", threshold=threshold
    )
    labels = neardup_clusters(pairs)
    if keep == "longest":
        refs = _longest_member_loser_refs(
            out, labels, text_col, id_col, loser_broadcast_max
        )
        return _drop_ids(out, refs, id_col) if refs else out

    def losers_of(batch: pa.Table) -> pa.Table:
        keep_mask = pc.equal(
            batch.column("doc_id"), batch.column("cluster_id")
        )
        return pa.table(
            {id_col: batch.column("doc_id").filter(pc.invert(keep_mask))}
        )

    loser_ds = labels.map_batches(losers_of, batch_format="pyarrow")
    refs = _chunked_id_refs(loser_ds, id_col, loser_broadcast_max)
    return _drop_ids(out, refs, id_col) if refs else out


def _lm_ppl_filter(out, text_col, id_col, max_ppl, lm_min_count,
                   loser_broadcast_max, checkpoint):
    """Drop documents whose self-trained bigram perplexity exceeds
    ``max_ppl`` (see :mod:`deduce_ray.ops.lm`).  The survivor set is
    consumed three times here (model train, scoring, final anti-join),
    so it is checkpointed first."""
    import pyarrow.compute as pc

    from deduce_ray.ops.dedup import _chunked_id_refs, _drop_ids
    from deduce_ray.ops.lm import lm_perplexity

    if checkpoint:
        out = out.materialize()
    scored = lm_perplexity(
        out, text_col=text_col, id_col=id_col, min_count=lm_min_count
    )

    def high_ppl_ids(batch: pa.Table) -> pa.Table:
        bad = batch.filter(pc.greater(batch.column("ppl"), max_ppl))
        return bad.select(["doc_id"]).rename_columns([id_col])

    bad_ids = scored.map_batches(high_ppl_ids, batch_format="pyarrow")
    refs = _chunked_id_refs(bad_ids, id_col, loser_broadcast_max)
    return _drop_ids(out, refs, id_col) if refs else out
