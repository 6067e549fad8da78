"""Corpus source readers beyond parquet: JSONL, CSV, and text-file trees.

Every reader returns a Ray ``Dataset`` in the repo-table shape fixed by
BASELINE.json's ``input_hint``:

    (repo: string, path: string, commit: string, lang: string,
     content: string)

so any of them can feed :func:`deduce_ray.rayops.annotate.extract_triples`
directly.  The reference engine has no sources at all (it takes one Python
string at a time, /root/reference/deduce/deduce.py:129-170); these readers
are the ingestion layer a 100-TB deployment needs.

Scale notes:
  - JSONL/CSV use the streaming ``ray.data.read_json`` / ``read_csv``
    readers — one task per file / block, no driver materialization.  A
    directory of many files parallelizes naturally; a SINGLE small file is
    pre-split with the same driver-side slicing rationale as
    :func:`deduce_ray.corpus.read_parquet_sliced` (Ray Data parallelizes
    per block, and one small file otherwise yields one block that
    serializes every downstream per-row stage).
  - Text trees use ``ray.data.read_binary_files(include_paths=True)`` —
    one document per file, decoded per batch, never driver-side.
  - Column mapping happens inside ``map_batches`` (zero-copy Arrow in/out
    for the passthrough columns); missing repo-schema columns are
    synthesized deterministically (commit = "" unless provided; repo
    defaults to the first path segment for text trees).
"""

from __future__ import annotations

from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc

REPO_SCHEMA_NAMES = ["repo", "path", "commit", "lang", "content"]

# same bound as corpus.read_parquet_sliced: a single input file at or
# below this size is split driver-side into CPU-sized blocks
_SMALL_FILE_MAX_BYTES = 64 << 20


def _default_column_map(text_key: str) -> dict[str, str]:
    """source column -> repo column; identity for same-named columns."""
    return {
        "repo": "repo",
        "path": "path",
        "commit": "commit",
        "lang": "lang",
        text_key: "content",
    }


def _to_repo_batch(batch: pa.Table, column_map: dict[str, str]) -> pa.Table:
    """Project/rename a source batch into the repo schema.

    Present columns pass through zero-copy (renamed); absent ones are
    filled with "" (commit/lang/repo/path) so the annotate stage's
    contract holds.  The content column must exist — a corpus without
    text is a caller error, not something to paper over.
    """
    inverse = {v: k for k, v in column_map.items()}
    content_src = inverse.get("content")
    if content_src is None or content_src not in batch.schema.names:
        raise ValueError(
            f"source batch has no content column (looked for "
            f"{content_src!r}; batch has {batch.schema.names})"
        )
    n = batch.num_rows
    cols: dict[str, pa.ChunkedArray | pa.Array] = {}
    for out_name in REPO_SCHEMA_NAMES:
        src = inverse.get(out_name)
        if src is not None and src in batch.schema.names:
            col = batch.column(src)
            if not pa.types.is_string(col.type) and not pa.types.is_large_string(
                col.type
            ):
                col = pc.cast(col, pa.string())
            if col.null_count:
                if out_name == "content":
                    # a null-content row would be silently skipped by the
                    # annotate stage, corrupting downstream dedup counts —
                    # malformed corpus rows are the caller's problem
                    raise ValueError(
                        f"{col.null_count} row(s) have null content "
                        f"(source column {content_src!r})"
                    )
                # row-level nulls in metadata columns (a JSONL line
                # missing one key) get the same "" the fully-absent
                # column case uses — the repo schema is non-null strings
                col = pc.fill_null(col, "")
            cols[out_name] = col
        else:
            cols[out_name] = pa.nulls(n, type=pa.string()).fill_null("")
    return pa.table(cols)


def _presplit_single_small_file(path: str | Path, reader, ds_factory):
    """Single small file -> driver-read + CPU-sized from_arrow blocks;
    anything else -> the streaming reader unchanged.

    ``reader()`` must return a pyarrow Table for the single-file case;
    ``ds_factory()`` the streaming Dataset otherwise.
    """
    from deduce_ray.corpus import slice_table_to_blocks

    p = Path(path)
    if p.is_file() and p.stat().st_size <= _SMALL_FILE_MAX_BYTES:
        return slice_table_to_blocks(reader())
    return ds_factory()


def read_jsonl_corpus(
    path: str | Path, text_key: str = "content", column_map: dict[str, str] | None = None
):
    """Newline-delimited JSON file(s) -> repo-shaped Dataset.

    ``column_map`` maps SOURCE keys to repo columns (default: identity
    plus ``text_key`` -> content).  Extra JSON keys are dropped; missing
    repo columns become "".
    """
    import pyarrow.json as pj
    import ray.data

    cmap = column_map or _default_column_map(text_key)
    ds = _presplit_single_small_file(
        path,
        reader=lambda: pj.read_json(str(path)),
        ds_factory=lambda: ray.data.read_json(str(path)),
    )
    return ds.map_batches(
        lambda b: _to_repo_batch(b, cmap), batch_format="pyarrow"
    )


def read_csv_corpus(
    path: str | Path, text_key: str = "content", column_map: dict[str, str] | None = None
):
    """CSV file(s) with a header row -> repo-shaped Dataset."""
    import pyarrow.csv as pcsv
    import ray.data

    cmap = column_map or _default_column_map(text_key)
    ds = _presplit_single_small_file(
        path,
        reader=lambda: pcsv.read_csv(str(path)),
        ds_factory=lambda: ray.data.read_csv(str(path)),
    )
    return ds.map_batches(
        lambda b: _to_repo_batch(b, cmap), batch_format="pyarrow"
    )


def read_text_tree_corpus(root: str | Path, lang: str = "", encoding: str = "utf-8"):
    """Directory tree of text files -> repo-shaped Dataset, one document
    per file.

    ``repo`` is the first path segment under ``root`` (a tree of checked-
    out repositories is the natural 100-TB layout), ``path`` the remainder,
    ``commit`` is "" (no VCS metadata in a bare tree).  Decoding runs per
    batch inside ``map_batches``; undecodable files raise — silently
    dropping corpus documents would corrupt downstream dedup counts.
    """
    import os

    import ray.data

    # Ray hands back normalized absolute paths — resolve the root the same
    # way, or a relative/symlinked root fails the prefix match and every
    # row silently gets repo="" with an absolute path
    root = Path(root).resolve()
    root_str = str(root)

    def decode(batch: dict) -> pa.Table:
        paths = batch["path"]
        texts = [b.decode(encoding) for b in batch["bytes"]]
        repos, rels = [], []
        for p in paths:
            # use the path exactly as Ray reports it (child names joined
            # onto the resolved root) — resolving it again would rewrite
            # symlinked entries INSIDE the tree to their targets outside
            # the root and corrupt repo attribution
            rel = os.path.relpath(str(p), root_str)
            if rel.startswith(".."):
                # not under the resolved root (defensive; should not
                # happen given read_binary_files is handed root_str)
                repos.append("")
                rels.append(str(p))
                continue
            parts = rel.split("/", 1)
            repos.append(parts[0] if len(parts) == 2 else "")
            rels.append(parts[1] if len(parts) == 2 else rel)
        n = len(texts)
        return pa.table(
            {
                "repo": pa.array(repos, type=pa.string()),
                "path": pa.array(rels, type=pa.string()),
                "commit": pa.array([""] * n, type=pa.string()),
                "lang": pa.array([lang] * n, type=pa.string()),
                "content": pa.array(texts, type=pa.string()),
            }
        )

    ds = ray.data.read_binary_files(str(root), include_paths=True)
    return ds.map_batches(decode, batch_format="numpy")


def write_triples_jsonl(triples_ds, out_dir: str | Path):
    """Triple rows -> newline-delimited JSON, one file per block
    (streaming sink; the partitioned, resumable parquet sink remains
    :func:`deduce_ray.rayops.kg.materialize_graph`)."""
    triples_ds.write_json(str(out_dir))
