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

from deduce_ray.corpus import _DRIVER_SLICE_MAX_BYTES as _SMALL_FILE_MAX_BYTES

REPO_SCHEMA_NAMES = ["repo", "path", "commit", "lang", "content"]


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
    from deduce_ray.raytune import tune_data_context

    tune_data_context()

    p = Path(path)
    if p.is_file() and p.stat().st_size <= _SMALL_FILE_MAX_BYTES:
        return slice_table_to_blocks(reader())
    return ds_factory()


def _resolve_compression(path: str | Path, compression: str | None) -> str | None:
    """"infer" -> codec from the file suffix (.gz/.zst/.bz2; web-scale
    text dumps ship as *.jsonl.gz / *.csv.gz); explicit codec passes
    through; None disables.  A DIRECTORY under "infer" resolves to None here —
    the streaming readers' per-task opens use pyarrow's own
    compression="detect", which infers from each member file's suffix,
    so mixed/compressed directories decompress per file regardless."""
    if compression != "infer":
        return compression
    s = str(path)
    for suffix, codec in ((".gz", "gzip"), (".zst", "zstd"), (".bz2", "bz2")):
        if s.endswith(suffix):
            return codec
    return None


def _open_maybe_compressed(path: str | Path, codec: str | None):
    """Driver-side open for the single-small-file fast path: a plain
    OSFile, or a pyarrow CompressedInputStream around it."""
    f = pa.OSFile(str(path), "rb")
    if codec is None:
        return f
    return pa.CompressedInputStream(f, codec)


def read_jsonl_corpus(
    path: str | Path,
    text_key: str = "content",
    column_map: dict[str, str] | None = None,
    compression: str | None = "infer",
):
    """Newline-delimited JSON file(s) -> repo-shaped Dataset.

    ``column_map`` maps SOURCE keys to repo columns (default: identity
    plus ``text_key`` -> content).  Extra JSON keys are dropped; missing
    repo columns become "".

    ``compression="infer"`` (default) reads ``*.gz`` transparently —
    streaming decompression inside each read task (pyarrow
    CompressedInputStream via ``arrow_open_stream_args``), never on the
    driver for the multi-file case.

    Mapped columns are read with an EXPLICIT string schema: pyarrow's
    type inference would otherwise rewrite bytes — ISO-date strings
    ("2021-03-14") come back as timestamps rendering "2021-03-14
    00:00:00" — silently breaking the sha256(content) doc_id invariant.
    """
    import pyarrow.json as pj
    import ray.data

    cmap = column_map or _default_column_map(text_key)
    codec = _resolve_compression(path, compression)
    parse = pj.ParseOptions(
        explicit_schema=pa.schema([(src, pa.string()) for src in cmap]),
        unexpected_field_behavior="ignore",
    )
    # explicit codec rides arrow_open_stream_args (needed when the suffix
    # would defeat pyarrow's "detect"); inferred/None cases rely on the
    # reader's per-file detect.  file_extensions passed EXPLICITLY:
    # Ray's read_json default excludes *.ndjson entirely and the .bz2
    # compressed variants, so a directory of part-*.ndjson.gz (or a large
    # docs.jsonl.bz2 falling through to the streaming path) would raise
    # "No input files found" under the default filter.
    stream_args = {"compression": codec} if codec else None
    bases = ["json", "jsonl", "ndjson"]
    exts = bases + [
        f"{b}.{c}" for b in bases for c in ("gz", "br", "zst", "lz4", "bz2")
    ]
    ds = _presplit_single_small_file(
        path,
        reader=lambda: pj.read_json(
            _open_maybe_compressed(path, codec), parse_options=parse
        ),
        ds_factory=lambda: ray.data.read_json(
            str(path),
            parse_options=parse,
            arrow_open_stream_args=stream_args,
            file_extensions=exts,
        ),
    )
    return ds.map_batches(
        lambda b: _to_repo_batch(b, cmap), batch_format="pyarrow"
    )


def read_csv_corpus(
    path: str | Path,
    text_key: str = "content",
    column_map: dict[str, str] | None = None,
    compression: str | None = "infer",
):
    """CSV file(s) with a header row -> repo-shaped Dataset.

    ``compression="infer"`` (default) reads ``*.gz`` transparently, with
    per-task streaming decompression (same mechanism as
    :func:`read_jsonl_corpus`).

    Mapped columns are forced to string at parse time — inference would
    turn an all-numeric content column ("1.50") into a double rendered
    back as "1.5", or strip the leading zero off a commit "0123456",
    silently breaking the sha256(content) invariant.
    """
    import pyarrow.csv as pcsv
    import ray.data

    cmap = column_map or _default_column_map(text_key)
    codec = _resolve_compression(path, compression)
    convert = pcsv.ConvertOptions(
        column_types={src: pa.string() for src in cmap}
    )
    stream_args = {"compression": codec} if codec else None
    ds = _presplit_single_small_file(
        path,
        reader=lambda: pcsv.read_csv(
            _open_maybe_compressed(path, codec), convert_options=convert
        ),
        ds_factory=lambda: ray.data.read_csv(
            str(path),
            convert_options=convert,
            arrow_open_stream_args=stream_args,
        ),
    )
    return ds.map_batches(
        lambda b: _to_repo_batch(b, cmap), batch_format="pyarrow"
    )


def read_orc_corpus(
    path: str | Path, text_key: str = "content", column_map: dict[str, str] | None = None
):
    """ORC file(s) -> repo-shaped Dataset.

    Ray Data has no native ORC reader; a single small file is read
    driver-side (column-pruned via ``ORCFile.read(columns=...)``) and
    pre-sliced, while a directory (or large file) streams through
    ``read_binary_files`` with per-file ORC decode inside ``map_batches``
    — one task per file, never driver-side.  ORC is a TYPED format, so
    there are no source bytes to preserve: non-string mapped columns are
    cast to string by the repo-batch mapper.
    """
    import pyarrow.orc as orc
    import ray.data

    from deduce_ray.corpus import slice_table_to_blocks
    from deduce_ray.raytune import tune_data_context

    tune_data_context()
    cmap = column_map or _default_column_map(text_key)
    p = Path(path)

    def wanted_columns(schema_names) -> list[str]:
        return [c for c in cmap if c in schema_names]

    if p.is_file() and p.stat().st_size <= _SMALL_FILE_MAX_BYTES:
        f = orc.ORCFile(str(p))
        tbl = f.read(columns=wanted_columns(f.schema.names))
        ds = slice_table_to_blocks(tbl)
        return ds.map_batches(
            lambda b: _to_repo_batch(b, cmap), batch_format="pyarrow"
        )

    content_src = {v: k for k, v in cmap.items()}["content"]

    def decode(batch: dict) -> pa.Table:
        outs = []
        for raw in batch["bytes"]:
            f = orc.ORCFile(pa.BufferReader(bytes(raw)))
            tbl = f.read(columns=wanted_columns(f.schema.names))
            outs.append(_to_repo_batch(tbl, cmap))
        if not outs:
            outs = [
                _to_repo_batch(
                    pa.table({content_src: pa.array([], type=pa.string())}),
                    cmap,
                )
            ]
        return pa.concat_tables(outs)

    ds = ray.data.read_binary_files(
        str(p), include_paths=False, file_extensions=["orc"]
    )
    return ds.map_batches(decode, batch_format="numpy")


def read_text_tree_corpus(
    root: str | Path,
    lang: str = "",
    encoding: str = "utf-8",
    extensions: list[str] | None = None,
    skip_hidden: bool = True,
    on_decode_error: str = "raise",
):
    """Directory tree of text files -> repo-shaped Dataset, one document
    per file.

    ``repo`` is the first path segment under ``root`` (a tree of checked-
    out repositories is the natural 100-TB layout), ``path`` the
    remainder, ``commit`` is "" (no VCS metadata in a bare tree).

    Real checkouts contain things that are not corpus documents:
      - ``extensions`` restricts the read to matching suffixes (e.g.
        ``["txt", "md", "py"]``) at file-discovery time, before any byte
        leaves storage;
      - ``skip_hidden`` (default) drops entries with a dot-prefixed path
        component — ``.git/objects/*`` above all, whose zlib blobs would
        otherwise abort the decode;
      - ``on_decode_error="skip"`` drops undecodable files instead of
        raising, COUNTING them (logged per batch) — a silent drop would
        corrupt downstream dedup counts, so the default stays "raise".
    """
    import os

    import ray.data

    from deduce_ray.raytune import tune_data_context

    tune_data_context()
    if on_decode_error not in ("raise", "skip"):
        raise ValueError(f"on_decode_error must be raise|skip, got {on_decode_error!r}")

    # Ray hands back normalized absolute paths — resolve the root the same
    # way, or a relative/symlinked root fails the prefix match and every
    # row silently gets repo="" with an absolute path
    root = Path(root).resolve()
    root_str = str(root)

    def decode(batch: dict) -> pa.Table:
        repos, rels, texts = [], [], []
        skipped = 0
        for p, raw in zip(batch["path"], batch["bytes"]):
            # use the path exactly as Ray reports it (child names joined
            # onto the resolved root) — resolving it again would rewrite
            # symlinked entries INSIDE the tree to their targets outside
            # the root and corrupt repo attribution
            rel = os.path.relpath(str(p), root_str)
            if rel.startswith(".."):
                # not under the resolved root (defensive; should not
                # happen given read_binary_files is handed root_str)
                repo, rel_path = "", str(p)
            else:
                parts = rel.split("/", 1)
                repo = parts[0] if len(parts) == 2 else ""
                rel_path = parts[1] if len(parts) == 2 else rel
            if skip_hidden and any(
                seg.startswith(".") for seg in rel.split("/")
            ):
                continue
            try:
                text = bytes(raw).decode(encoding)
            except UnicodeDecodeError:
                if on_decode_error == "raise":
                    raise
                skipped += 1
                continue
            repos.append(repo)
            rels.append(rel_path)
            texts.append(text)
        if skipped:
            print(
                f"read_text_tree_corpus: skipped {skipped} undecodable "
                f"file(s) in batch (on_decode_error=skip)"
            )
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

    read_kwargs = {}
    if extensions is not None:
        read_kwargs["file_extensions"] = list(extensions)
    ds = ray.data.read_binary_files(
        str(root), include_paths=True, **read_kwargs
    )
    return ds.map_batches(decode, batch_format="numpy")


def write_triples_jsonl(triples_ds, out_dir: str | Path):
    """Triple rows -> newline-delimited JSON, one file per block
    (streaming sink; the partitioned, resumable parquet sink remains
    :func:`deduce_ray.rayops.kg.materialize_graph`)."""
    triples_ds.write_json(str(out_dir))
