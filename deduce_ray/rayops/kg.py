"""Triple-graph pipeline: dedup/canonicalize, skew-aware shuffle, and
checkpointed, resumable graph materialization partitioned by (repo, lang).

Scale notes (north_rule):
  - Local combiner first: per-batch dedup/aggregation inside map_batches
    shrinks the all-to-all shuffle before any groupby.
  - Partition key is (repo, lang) throughout; the synthetic corpus has a
    30%-hot monorepo, which the combiner absorbs (the per-partition group
    task then handles pre-aggregated rows, not raw mentions).
  - Materialization writes one parquet file + one manifest per partition;
    a manifest is written only after its data file, so a re-run can skip
    complete partitions (resume) and re-do partial ones idempotently.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from pathlib import Path

import pyarrow as pa

_GRAPH_KEY = ["repo", "lang", "doc_id", "pred", "obj", "entity_id"]


def _dedup_batch(batch: pa.Table) -> pa.Table:
    """Local combiner: collapse duplicate triples within a batch, counting
    mentions and keeping the first span as provenance."""
    if batch.num_rows == 0:
        return pa.table(
            {
                **{k: pa.array([], type=pa.string()) for k in _GRAPH_KEY},
                "n_mentions": pa.array([], type=pa.int64()),
                "first_start_char": pa.array([], type=pa.int32()),
            }
        )
    grouped = batch.group_by(_GRAPH_KEY).aggregate(
        [("start_char", "count"), ("start_char", "min")]
    )
    return grouped.rename_columns(_GRAPH_KEY + ["n_mentions", "first_start_char"])


def _merge_graph_rows(df):
    return df.groupby(_GRAPH_KEY, as_index=False).agg(
        n_mentions=("n_mentions", "sum"),
        first_start_char=("first_start_char", "min"),
    )


def dedup_triples(triples_ds, by_doc_first: bool = False):
    """Flat mention rows -> deduplicated graph rows.

    Default: per-batch combiner (no shuffle) then one hash-shuffle groupby
    on (repo, lang) to merge cross-batch duplicates.

    ``by_doc_first=True``: collapse duplicates first under a UNIFORM
    doc_id-hash bucket key (no skew — sha256 prefixes spread evenly), then
    run the (repo, lang) exchange over the already-collapsed rows.  Worth
    it when cross-batch duplication is high (re-crawled corpora, replicas):
    the skewed second shuffle then moves only unique graph rows.  For
    low-duplication corpora it adds one same-volume exchange — keep it off.
    """
    combined = triples_ds.map_batches(_dedup_batch, batch_format="pyarrow")

    if by_doc_first:
        def add_bucket(batch: pa.Table) -> pa.Table:
            doc_ids = batch.column("doc_id").to_pylist()
            buckets = [int(d[:4], 16) % 256 if d else 0 for d in doc_ids]
            return batch.append_column(
                "doc_bucket", pa.array(buckets, type=pa.int32())
            )

        collapsed = (
            combined.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("doc_bucket")
            .map_groups(
                lambda df: _merge_graph_rows(df.drop(columns=["doc_bucket"])),
                batch_format="pandas",
            )
        )
        return collapsed.groupby(_GRAPH_KEY[:2]).map_groups(
            _merge_graph_rows, batch_format="pandas"
        )

    return combined.groupby(_GRAPH_KEY[:2]).map_groups(
        _merge_graph_rows, batch_format="pandas"
    )


def canonical_entities(triples_ds):
    """Cross-document canonical entity table: groupby (pred, obj) with
    mention/document counts — the global side of entity linking."""
    import pyarrow.compute as pc

    def combine(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "pred": pa.array([], type=pa.string()),
                    "obj_norm": pa.array([], type=pa.string()),
                    "n_mentions": pa.array([], type=pa.int64()),
                }
            )
        batch = batch.append_column(
            "obj_norm", pc.utf8_lower(batch.column("obj"))
        )
        grouped = batch.group_by(["pred", "obj_norm"]).aggregate([("obj", "count")])
        return grouped.rename_columns(["pred", "obj_norm", "n_mentions"])

    combined = triples_ds.map_batches(combine, batch_format="pyarrow")

    def merge(df):
        return df.groupby(["pred", "obj_norm"], as_index=False).agg(
            n_mentions=("n_mentions", "sum")
        )

    return combined.groupby("pred").map_groups(merge, batch_format="pandas")


def canonicalize_entities(triples_ds):
    """Cross-document entity canonicalization: per predicate, cluster
    mention surface forms whose lowercase texts are within
    Damerau-Levenshtein distance 1 (the same fuzzy rule the reference's
    per-document linker uses, applied graph-wide), and pick the most
    frequent form as the canonical label.

    Blocking: a DL<=1 pair differs by at most one in length, so only forms
    in the same or adjacent length bucket are compared (exact for DL<=1;
    swap in an LSH blocker if a predicate's surface vocabulary reaches
    millions).  Returns (pred, obj_norm, canonical, n_mentions).
    """
    import pandas as pd

    counted = canonical_entities(triples_ds)

    def cluster_group(df: pd.DataFrame) -> pd.DataFrame:
        from deduce_ray.matching import within_edit_distance_one

        forms = (
            df.groupby("obj_norm", as_index=False)
            .agg(n_mentions=("n_mentions", "sum"))
            .sort_values(["n_mentions", "obj_norm"], ascending=[False, True])
            .reset_index(drop=True)
        )
        names = forms["obj_norm"].tolist()
        parent = list(range(len(names)))

        def find(i):
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        blocks: dict[int, list[int]] = {}
        for idx, name in enumerate(names):
            blocks.setdefault(len(name), []).append(idx)
        for length, members in blocks.items():
            candidates = members + blocks.get(length + 1, [])
            for i_pos in range(len(candidates)):
                for j_pos in range(i_pos + 1, len(candidates)):
                    i, j = candidates[i_pos], candidates[j_pos]
                    if find(i) == find(j):
                        continue
                    if within_edit_distance_one(names[i], names[j]):
                        ri, rj = find(i), find(j)
                        parent[max(ri, rj)] = min(ri, rj)

        # canonical = most frequent form in the cluster (forms are sorted
        # by frequency, so the cluster root with the smallest index wins)
        canonical = [names[find(i)] for i in range(len(names))]
        out = forms.copy()
        out["canonical"] = canonical
        out["pred"] = df["pred"].iloc[0]
        return out[["pred", "obj_norm", "canonical", "n_mentions"]]

    return counted.groupby("pred").map_groups(cluster_group, batch_format="pandas")


# ---------------------------------------------------------------------------
# checkpointed materialization
# ---------------------------------------------------------------------------


def _partition_slug(repo: str, lang: str) -> str:
    return f"{repo.replace('/', '__')}__{lang}"


def completed_partitions(out_dir: str | Path) -> set[str]:
    manifest_dir = Path(out_dir) / "_manifests"
    if not manifest_dir.exists():
        return set()
    done = set()
    for mf in manifest_dir.glob("*.json"):
        try:
            with open(mf) as fh:
                manifest = json.load(fh)
            if manifest.get("complete"):
                done.add(manifest["partition"])
        except (json.JSONDecodeError, KeyError):
            continue
    return done


def materialize_graph(
    triples_ds,
    out_dir: str | Path,
    resume: bool = True,
    hot_keys: set[str] | None = None,
    n_salts: int = 8,
    run_id: str | None = None,
):
    """Write the deduplicated triple graph partitioned by (repo, lang), one
    parquet file + one lineage manifest per (partition, salt) unit.
    Returns the metrics dataset (one row per unit written).

    Skew: a hot partition (e.g. a monorepo holding 30% of the corpus)
    would serialize behind one group task.  Repos named in ``hot_keys``
    (from a cheap pre-scan of per-repo volumes, or domain knowledge) are
    salted with ``doc_id-hash % n_salts`` so their group work and output
    fan out across ``n_salts`` units (``part-<salt>.parquet`` files under
    the partition directory); cold partitions keep a single unit.  Dedup
    stays exact under salting because the salt derives from doc_id, which
    is part of the graph key.

    Resume: units listed complete in ``_manifests/`` are filtered out
    *before* the shuffle, so a restarted run neither recomputes nor
    rewrites them.  A ``_manifests/_run_<id>.json`` summary records the
    run-level lineage.
    """
    import pyarrow.compute as pc

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    (out_dir / "_manifests").mkdir(exist_ok=True)

    combined = triples_ds.map_batches(_dedup_batch, batch_format="pyarrow")

    hot = frozenset(hot_keys or ())

    def add_salt(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("salt", pa.array([], type=pa.int32()))
        repos = batch.column("repo").to_pylist()
        doc_ids = batch.column("doc_id").to_pylist()
        salts = [
            int(d[:4], 16) % n_salts if (r in hot and d) else 0
            for r, d in zip(repos, doc_ids)
        ]
        return batch.append_column("salt", pa.array(salts, type=pa.int32()))

    salted = combined.map_batches(add_salt, batch_format="pyarrow")

    done = completed_partitions(out_dir) if resume else set()
    if done:
        done_list = pa.array(sorted(done))

        def drop_done(batch: pa.Table) -> pa.Table:
            slug = pc.binary_join_element_wise(
                pc.replace_substring(batch.column("repo"), "/", "__"),
                batch.column("lang"),
                pc.cast(batch.column("salt"), pa.string()),
                "__",
            )
            return batch.filter(pc.invert(pc.is_in(slug, value_set=done_list)))

        salted = salted.map_batches(drop_done, batch_format="pyarrow")

    def write_unit(df):
        import pandas as pd

        t0 = time.time()
        repo, lang = df["repo"].iloc[0], df["lang"].iloc[0]
        salt = int(df["salt"].iloc[0])
        slug = f"{_partition_slug(repo, lang)}__{salt}"

        graph = (
            df.groupby(_GRAPH_KEY, as_index=False)
            .agg(
                n_mentions=("n_mentions", "sum"),
                first_start_char=("first_start_char", "min"),
            )
            .sort_values(["doc_id", "first_start_char", "pred", "obj"])
            .reset_index(drop=True)
        )

        part_dir = out_dir / _partition_slug(repo, lang)
        part_dir.mkdir(parents=True, exist_ok=True)
        data_path = part_dir / f"part-{salt}.parquet"
        tmp_path = part_dir / f".part-{salt}.{os.getpid()}.tmp"
        graph.to_parquet(tmp_path, index=False)
        os.replace(tmp_path, data_path)

        content_hash = hashlib.sha256(
            "\n".join(
                graph["doc_id"] + "|" + graph["pred"] + "|" + graph["obj"]
            ).encode()
        ).hexdigest()
        manifest = {
            "partition": slug,
            "repo": repo,
            "lang": lang,
            "salt": salt,
            "rows": int(len(graph)),
            "docs": int(graph["doc_id"].nunique()),
            "mentions": int(graph["n_mentions"].sum()),
            "triples_sha256": content_hash,
            "duration_s": round(time.time() - t0, 3),
            "complete": True,
        }
        mtmp = out_dir / "_manifests" / f".{slug}.{os.getpid()}.tmp"
        with open(mtmp, "w") as fh:
            json.dump(manifest, fh)
        os.replace(mtmp, out_dir / "_manifests" / f"{slug}.json")

        return pd.DataFrame([{k: v for k, v in manifest.items() if k != "complete"}])

    metrics = salted.groupby(["repo", "lang", "salt"]).map_groups(
        write_unit, batch_format="pandas"
    )

    if run_id is not None:
        summary = metrics.to_pandas()
        run_manifest = {
            "run_id": run_id,
            "units_written": int(len(summary)),
            "rows": int(summary["rows"].sum()) if len(summary) else 0,
            "docs": int(summary["docs"].sum()) if len(summary) else 0,
            "resumed_units_skipped": len(done),
        }
        with open(out_dir / "_manifests" / f"_run_{run_id}.json", "w") as fh:
            json.dump(run_manifest, fh)
        import ray.data

        return ray.data.from_pandas(summary) if len(summary) else metrics
    return metrics
