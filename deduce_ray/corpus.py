"""Deterministic synthesis of the engine's input table.

BASELINE.json's input_hint fixes the input schema:
    (repo: string, path: string, commit: string, lang: string, content: string)

The driver-provided ``documents.parquet`` (doc_id, text, lang, source,
n_chars) supplies neutral bulk text; this module deterministically maps it
into that shape (FIXTURES.md §1/§6):

  - ``repo``:   Zipf-skewed — 30%% of rows land in one hot repo, the rest
                spread over 37 repos (exercises skew-aware shuffling).
  - ``path``/``commit``: derived from doc_id (commit = sha256 hex, 40 chars).
  - ``content``: text + one PHI-bearing snippet chosen by doc_id %% N, so the
                annotators have something to find.  The construction is a
                pure function of (doc_id, text) and is also expressible in
                SQL — DuckDB oracles rebuild the identical content.

Snippets are original sentences in the style of the reference's corpus (not
copied from it).
"""

from __future__ import annotations

import hashlib

# One snippet per PHI category mix; index = doc_id % len(SNIPPETS).
SNIPPETS = [
    "Patient Jan Jansen, bsn 111222333, werd gezien door dr. Peter de Visser.",
    "Mevrouw Maria van den Berg is 57 jaar en woont in Rotterdam.",
    "Opname op 14-03-2021 in het UMCU, ontslag volgde op 2 april 2021.",
    "Contact via m.vandenberg@ziekenhuis.nl of telefonisch 088 755 55 55.",
    "Verwezen naar Sint Antonius te Utrecht, patientnummer 4567890.",
    "Huisarts E. Bakker, praktijk aan de Prinsengracht 21, Amsterdam.",
    "Controle over 3 maanden; zie ook www.thuisarts.nl voor informatie.",
    "De heer K. de Groot, geboren 01-01-1980, bsn 123456782.",
    "Telefonisch bereikbaar op (06)12345678 na 17 uur.",
    "Besproken in MDO van 2018-11-05 met collega Pietersen.",
    "Adres: Postbus 85500, 3508 GA Utrecht.",
    "Zus van patient, Emma, was aanwezig bij het gesprek.",
]

HOT_REPO_PCT = 30  # doc_id % 100 < 30 -> hot repo
N_COLD_REPOS = 37


def repo_for_doc_id(doc_id: int) -> str:
    if doc_id % 100 < HOT_REPO_PCT:
        return "org/monorepo"
    return f"org/repo-{doc_id % N_COLD_REPOS:04d}"


def path_for_doc_id(doc_id: int) -> str:
    return f"notes/{doc_id:08d}.txt"


def commit_for_doc_id(doc_id: int) -> str:
    return hashlib.sha256(f"commit:{doc_id}".encode()).hexdigest()[:40]


def content_for(doc_id: int, text: str | None) -> str:
    # null text decorates as empty (the corpus-wide `text or ""`
    # convention; the SQL mirror coalesces identically — bare || would
    # make the whole content NULL)
    return (text or "") + " " + SNIPPETS[doc_id % len(SNIPPETS)]


def decorate_batch(batch):
    """pyarrow batch (doc_id, text, lang, ...) -> repo-table batch.

    Stateless map_batches task; all columns derive from (doc_id, text).
    """
    import pyarrow as pa

    if batch.column("doc_id").null_count:
        # loud contract error, not a cryptic `None % int` from deep in
        # repo_for_doc_id: every decoration column derives from doc_id,
        # so a null id has no well-defined repo/path/commit/content.
        # (Corpora read through deduce_ray.sources never hit this —
        # their ids are hashed from per-row identity and non-null.)
        raise ValueError(
            f"{batch.column('doc_id').null_count} document row(s) have a "
            "null doc_id; the repo-table decoration requires non-null "
            "int64 ids (drop or assign ids upstream)"
        )
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    langs = batch.column("lang").to_pylist()
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, type=pa.int64()),
            "repo": pa.array([repo_for_doc_id(d) for d in doc_ids]),
            "path": pa.array([path_for_doc_id(d) for d in doc_ids]),
            "commit": pa.array([commit_for_doc_id(d) for d in doc_ids]),
            "lang": pa.array(langs),
            "content": pa.array(
                [content_for(d, t) for d, t in zip(doc_ids, texts)]
            ),
        }
    )


# single parquet FILES at or below this compressed size with ONE row
# group are read driver-side and pre-sliced into CPU-sized blocks (see
# read_parquet_sliced); anything larger, multi-row-group, or a directory
# streams through ray.data.read_parquet unchanged
_DRIVER_SLICE_MAX_BYTES = 64 << 20
# second bound on the DECODED size, from parquet metadata: a highly
# compressed single-row-group file (zstd text compresses 10-100x) must
# not materialize gigabytes on the driver just because its footprint on
# disk is small.  total_uncompressed_size is post-ENCODING (dictionary
# pages count once, not per reference), so a row-count cap backs it up —
# metadata cannot price the decoded blow-up of a dictionary column
# referenced by millions of rows
_DRIVER_SLICE_MAX_UNCOMPRESSED = 256 << 20
_DRIVER_SLICE_MAX_ROWS = 2_000_000


def slice_table_to_blocks(tbl, blocks_per_cpu: int = 4):
    """In-memory Arrow table -> Dataset of ~``blocks_per_cpu`` blocks per
    CPU (zero-copy slices, no repartition exchange).  Shared block-shaping
    policy for every driver-side small-input read (parquet / JSONL / CSV)."""
    import ray
    import ray.data

    from deduce_ray.raytune import tune_data_context

    tune_data_context()
    n = tbl.num_rows
    cpus = (
        int(ray.cluster_resources().get("CPU", 32))
        if ray.is_initialized()
        else 32
    )
    # ~blocks_per_cpu blocks per CPU for parallelism, but never blocks so
    # tiny that downstream shuffle metadata explodes (min 64 rows)
    block_rows = max(64, -(-n // max(1, cpus * blocks_per_cpu)))
    blocks = [tbl.slice(i, block_rows) for i in range(0, n, block_rows)]
    return ray.data.from_arrow(blocks if blocks else [tbl])


def read_parquet_sliced(path, columns: list[str] | None = None,
                        blocks_per_cpu: int = 4):
    """``read_parquet`` with a fix for the one-file/one-row-group artifact.

    Block-shape note: the test-SF inputs are ONE parquet file with ONE row
    group, which ``read_parquet`` yields as a single block — and Ray Data
    parallelizes per block, so every downstream per-row stage (annotate
    above all) would serialize onto one task (measured: ~1k docs/s vs
    ~35k with proper blocks at 32 CPUs).  Such files are therefore read
    driver-side (bounded: single file, one row group, <=64 MB compressed,
    column-pruned) and pre-sliced into ~``blocks_per_cpu`` blocks per CPU
    via ``from_arrow`` — the same proven pattern as the bench corpus
    builder, with no repartition exchange.  Real corpora are thousands of
    files / many row groups and take the streaming ``read_parquet`` path
    unchanged; this never materializes anything a real deployment would
    stream.
    """
    import pyarrow.parquet as pq
    import ray.data
    from pathlib import Path

    from deduce_ray.raytune import tune_data_context

    tune_data_context()
    p = Path(path)
    if p.is_file() and p.stat().st_size <= _DRIVER_SLICE_MAX_BYTES:
        # one handle for metadata AND data (no second open / footer parse;
        # closed deterministically rather than leaking the fd until GC)
        with pq.ParquetFile(p) as pf:
            meta = pf.metadata
            if (
                meta.num_row_groups == 1
                and meta.num_rows <= _DRIVER_SLICE_MAX_ROWS
            ):
                # size only the columns the read will materialize —
                # summing all columns would demote a pruned read of a
                # wide file back to the one-block streaming path
                wanted = set(columns) if columns is not None else None
                rg = meta.row_group(0)
                uncompressed = sum(
                    rg.column(i).total_uncompressed_size
                    for i in range(meta.num_columns)
                    if wanted is None
                    or rg.column(i).path_in_schema.split(".", 1)[0] in wanted
                )
                if uncompressed <= _DRIVER_SLICE_MAX_UNCOMPRESSED:
                    return slice_table_to_blocks(
                        pf.read(columns=columns), blocks_per_cpu
                    )
    return ray.data.read_parquet(str(path), columns=columns)


def read_repo_table(sf_dir: str, columns: list[str] | None = None):
    """documents.parquet -> repo-shaped Dataset (column-pruned; block
    shaping via read_parquet_sliced)."""
    ds = read_parquet_sliced(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    ds = ds.map_batches(decorate_batch, batch_format="pyarrow")
    if columns:
        ds = ds.select_columns(columns)
    return ds


def _sql_floormod(expr: str, n: int) -> str:
    """SQL for Python's floored ``expr % n``: SQL ``%`` truncates toward
    zero, so a negative doc_id picks a DIFFERENT snippet/repo than the
    Python decoration (found by the adversarial-sf sweep: doc_id=-1
    misaligned every downstream KG row)."""
    return f"((({expr}) % {n} + {n}) % {n})"


def sql_content_expr(text_col: str = "text", doc_id_col: str = "doc_id") -> str:
    """DuckDB expression that reconstructs ``content`` exactly."""
    cases = " ".join(
        f"WHEN {i} THEN '{s.replace(chr(39), chr(39) * 2)}'"
        for i, s in enumerate(SNIPPETS)
    )
    return (
        f"(coalesce({text_col}, '') || ' ' || "
        f"(CASE {_sql_floormod(doc_id_col, len(SNIPPETS))} {cases} END))"
    )


def sql_repo_expr(doc_id_col: str = "doc_id") -> str:
    return (
        f"(CASE WHEN {_sql_floormod(doc_id_col, 100)} < {HOT_REPO_PCT} "
        f"THEN 'org/monorepo' ELSE 'org/repo-' || "
        f"lpad(CAST({_sql_floormod(doc_id_col, N_COLD_REPOS)} AS VARCHAR), 4, '0') END)"
    )
