"""Corpus mixing: cut each group of a corpus to a TOKEN budget,
deterministically — the "N billion tokens of English, M of code" step
every LLM training-data pipeline runs after cleaning/dedup.

Semantics (exactly SQL-window-reproducible, see the ``corpus_mix``
oracle): within each group, order documents by
``(md5(CAST(doc_id AS VARCHAR)), doc_id)`` — a deterministic shuffle
that is stable across runs and cluster sizes — and keep the prefix
whose INCLUSIVE running sum of whitespace-token counts stays within the
group's budget.  Groups without a budget are dropped (mixing is an
explicit allowlist).

Scale shape (no global sort, no per-group materialization):

1. One combiner pass buckets every document by the first 3 hex chars of
   its id hash (4096 buckets — a lexicographic PREFIX of the ordering,
   so bucket order == hash order) and partial-sums token counts per
   (group, bucket) inside each batch.
2. A small groupby merges partials; the driver pulls at most
   ``n_groups x 4096`` count rows and finds each group's BOUNDARY
   bucket (where the cumulative sum crosses the budget).
3. Only the boundary buckets' documents (~1/4096 of each group; the
   exact count is known from the histogram and guarded) come to the
   driver to resolve the exact inclusive cutoff ``(hash, doc_id)``.
4. One streaming filter keeps ``bucket < boundary`` or
   ``(hash, doc_id) <= cutoff`` — the corpus itself never shuffles.

Token counts use the module-wide whitespace word class
(:data:`deduce_ray.ops.textstats.WORD_RE`), mirrored by the oracles'
``WORD_CLASS_SQL`` — both sides must agree on one definition.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def _doc_hash(doc_id) -> str:
    return hashlib.md5(str(doc_id).encode()).hexdigest()


def sample_to_token_budget(
    ds,
    budgets: dict[str, int],
    group_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    boundary_rows_max: int = 5_000_000,
):
    """Filter ``ds`` to each group's hash-ordered token-budget prefix.

    ``ds`` must be re-readable (histogram pass + boundary pass + filter
    pass) and satisfy the doc-id contract (unique, non-null).  Raises if
    a boundary bucket holds more than ``boundary_rows_max`` documents
    (pathologically skewed corpus — re-run is cheap, the fix is a finer
    bucket prefix)."""
    groups = dict(budgets)

    def histogram(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        grp = batch.column(group_col).to_pylist()
        from deduce_ray.ops.textstats import split_words

        agg: dict[tuple, list] = {}
        for i, t, g in zip(ids, texts, grp):
            if g not in groups:
                continue
            key = (g, int(_doc_hash(i)[:3], 16))
            slot = agg.get(key)
            if slot is None:
                slot = agg[key] = [0, 0]
            slot[0] += len(split_words(t or ""))
            slot[1] += 1
        keys = sorted(agg)
        # explicit types: an all-unbudgeted batch must emit string, not
        # null, or block schemas diverge across the groupby
        return pa.table(
            {
                "__gb": pa.array(
                    [f"{g}\x00{b}" for g, b in keys], type=pa.string()
                ),
                "grp": pa.array([g for g, _ in keys], type=pa.string()),
                "bucket": pa.array([b for _, b in keys], type=pa.int64()),
                "tokens": pa.array([agg[k][0] for k in keys], type=pa.int64()),
                "docs": pa.array([agg[k][1] for k in keys], type=pa.int64()),
            }
        )

    def merge_gb(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "grp": tbl.column("grp").slice(0, 1),
                "bucket": tbl.column("bucket").slice(0, 1),
                "tokens": pa.array(
                    [pc.sum(tbl.column("tokens")).as_py()], type=pa.int64()
                ),
                "docs": pa.array(
                    [pc.sum(tbl.column("docs")).as_py()], type=pa.int64()
                ),
            }
        )

    hist = (
        ds.map_batches(
            histogram, batch_format="pyarrow", batch_size=65536, num_cpus=0.9
        )
        .groupby("__gb")
        .map_groups(merge_gb, batch_format="pyarrow")
    )
    # driver frame: at most n_groups x 4096 rows
    per_group: dict[str, dict[int, tuple[int, int]]] = {}
    for b in hist.iter_batches(batch_format="pyarrow"):
        for g, bk, tok, dc in zip(
            b.column("grp").to_pylist(),
            b.column("bucket").to_pylist(),
            b.column("tokens").to_pylist(),
            b.column("docs").to_pylist(),
        ):
            per_group.setdefault(g, {})[bk] = (tok, dc)

    # boundary bucket per group: first bucket where cum > budget
    rules: dict[str, dict] = {}
    boundary_docs = 0
    for g, buckets in per_group.items():
        budget = groups[g]
        cum = 0
        boundary = None
        for bk in sorted(buckets):
            tok, dc = buckets[bk]
            if cum + tok > budget:
                boundary = bk
                break
            cum += tok
        if boundary is None:
            rules[g] = {"include_all": True}
        else:
            rules[g] = {
                "include_all": False,
                "boundary": boundary,
                "base": cum,  # tokens in buckets before the boundary
            }
            boundary_docs += buckets[boundary][1]
    if boundary_docs > boundary_rows_max:
        raise ValueError(
            f"boundary buckets hold {boundary_docs} docs > "
            f"boundary_rows_max={boundary_rows_max}: corpus is skewed "
            "into one hash-prefix bucket; refine the bucket prefix"
        )

    boundaries = {
        (g, r["boundary"]) for g, r in rules.items() if not r["include_all"]
    }
    if boundaries:

        def boundary_rows(batch: pa.Table) -> pa.Table:
            ids = batch.column(id_col).to_pylist()
            texts = batch.column(text_col).to_pylist()
            grp = batch.column(group_col).to_pylist()
            from deduce_ray.ops.textstats import split_words

            out = {"grp": [], "h": [], id_col: [], "tokens": []}
            for i, t, g in zip(ids, texts, grp):
                h = _doc_hash(i)
                if (g, int(h[:3], 16)) in boundaries:
                    out["grp"].append(g)
                    out["h"].append(h)
                    out[id_col].append(i)
                    out["tokens"].append(len(split_words(t or "")))
            return pa.table(
                {
                    "grp": pa.array(out["grp"], type=pa.string()),
                    "h": pa.array(out["h"], type=pa.string()),
                    # type from the source column: an all-miss batch must
                    # not emit a null-typed id column
                    id_col: pa.array(
                        out[id_col], type=batch.schema.field(id_col).type
                    ),
                    "tokens": pa.array(out["tokens"], type=pa.int64()),
                }
            )

        detail: dict[str, list] = {}
        for b in ds.map_batches(
            boundary_rows, batch_format="pyarrow", num_cpus=0.9
        ).iter_batches(batch_format="pyarrow"):
            for g, h, i, tok in zip(
                b.column("grp").to_pylist(),
                b.column("h").to_pylist(),
                b.column(id_col).to_pylist(),
                b.column("tokens").to_pylist(),
            ):
                detail.setdefault(g, []).append((h, i, tok))
        for g, rows in detail.items():
            rows.sort(key=lambda r: (r[0], r[1]))
            cum = rules[g]["base"]
            cutoff = None
            for h, i, tok in rows:
                if cum + tok > groups[g]:
                    break
                cum += tok
                cutoff = (h, i)
            rules[g]["cutoff"] = cutoff  # None: boundary contributes 0 docs

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        grp = batch.column(group_col).to_pylist()
        mask = np.zeros(len(ids), dtype=bool)
        for pos, (i, g) in enumerate(zip(ids, grp)):
            rule = rules.get(g)
            if rule is None:
                continue
            if rule["include_all"]:
                mask[pos] = True
                continue
            h = _doc_hash(i)
            bk = int(h[:3], 16)
            if bk < rule["boundary"]:
                mask[pos] = True
            elif bk == rule["boundary"]:
                cut = rule.get("cutoff")
                mask[pos] = cut is not None and (h, i) <= cut
        return batch.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")
