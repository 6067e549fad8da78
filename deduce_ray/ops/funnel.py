"""The canonical LLM training-data preparation funnel, composed from this
engine's operators as ONE streaming pipeline:

    corpus -> language filter -> quality filter -> exact dedup
           -> MinHash near-dup removal -> surviving rows (+ funnel stats)

Every stage is the already-oracled primitive (textstats heuristics,
dedup_survivors' loser anti-join, minhash_lsh_pairs + neardup_clusters);
this module only supplies the glue, filter predicates, and the near-dup
loser selection.  No stage materializes the corpus: the language/quality
filters are per-batch Arrow transforms, exact dedup ships int keys only,
and near-dup losers ride the same bounded ray.put chunk broadcast as
exact-dedup losers.

Cluster-loser semantics: within every near-dup cluster the MINIMUM doc id
survives (matching dedup_survivors' min-id rule), all other members drop.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _lang_quality_filter(
    text_col: str,
    langs: tuple[str, ...] | None,
    min_chars: int,
    max_digit_ppm: int | None,
):
    from deduce_ray.ops.textstats import _DIGIT_RE, predict_lang

    def keep(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        mask = []
        for t in texts:
            t = t or ""
            n = len(t)
            if n < min_chars:
                mask.append(False)
                continue
            if max_digit_ppm is not None:
                d = len(_DIGIT_RE.findall(t))
                if (d * 1_000_000) // n > max_digit_ppm:
                    mask.append(False)
                    continue
            if langs is not None and predict_lang(t) not in langs:
                mask.append(False)
                continue
            mask.append(True)
        return batch.filter(pa.array(mask, type=pa.bool_()))

    return keep


def _neardup_loser_refs(
    survivors,
    text_col: str,
    id_col: str,
    minhash_threshold: float,
    loser_broadcast_max: int,
):
    """(ray.put sorted-id chunk refs, n_losers): every near-dup cluster
    member except its minimum id.  The clusters table is bounded by the
    corpus's near-duplicate rows, so the per-cluster min and the loser
    list are small relative to the corpus."""
    import ray

    from deduce_ray.ops.dedup import minhash_lsh_pairs, neardup_clusters

    pairs = minhash_lsh_pairs(
        survivors,
        text_col=text_col,
        id_col=id_col,
        threshold=minhash_threshold,
    )
    labels = neardup_clusters(pairs)

    def losers_of(df):
        keep = df.groupby("cluster_id")["doc_id"].transform("min")
        out = df.loc[df["doc_id"] != keep, ["doc_id"]]
        return out

    loser_ds = labels.map_batches(
        lambda df: losers_of(df), batch_format="pandas"
    )
    chunk_rows = max(int(loser_broadcast_max), 1_000_000)
    refs, buf, buffered, total = [], [], 0, 0
    for b in loser_ds.iter_batches(batch_format="pyarrow"):
        if not b.num_rows:
            continue
        buf.append(b.column("doc_id").to_numpy(zero_copy_only=False))
        buffered += b.num_rows
        total += b.num_rows
        if buffered >= chunk_rows:
            refs.append(ray.put(np.sort(np.concatenate(buf))))
            buf, buffered = [], 0
    if buf:
        refs.append(ray.put(np.sort(np.concatenate(buf))))
    return refs, total


def prep_corpus(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    langs: tuple[str, ...] | None = None,
    min_chars: int = 1,
    max_digit_ppm: int | None = None,
    minhash_threshold: float | None = 0.7,
    loser_broadcast_max: int = 50_000_000,
):
    """Run the funnel; returns the surviving corpus Dataset.

    ``langs=None`` / ``max_digit_ppm=None`` / ``minhash_threshold=None``
    disable the corresponding stage.  The input must satisfy the
    module-wide doc-id contract (unique, non-null, non-negative int64
    ids) and be re-readable (it is consumed by multiple passes, like
    :func:`deduce_ray.ops.dedup.dedup_survivors`).
    """
    from deduce_ray.ops.dedup import _drop_ids, dedup_survivors

    filtered = ds.map_batches(
        _lang_quality_filter(text_col, langs, min_chars, max_digit_ppm),
        batch_format="pyarrow",
    )
    survivors = dedup_survivors(
        filtered,
        text_col=text_col,
        id_col=id_col,
        loser_broadcast_max=loser_broadcast_max,
    )
    if minhash_threshold is None:
        return survivors
    # near-dup pass runs over the exact-dedup SURVIVORS (collapse already
    # removed byte-identical copies, so LSH sees each distinct text once)
    refs, n_losers = _neardup_loser_refs(
        survivors, text_col, id_col, minhash_threshold, loser_broadcast_max
    )
    if not refs:
        return survivors
    return _drop_ids(survivors, refs, id_col)
