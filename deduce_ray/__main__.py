"""Command-line entry points.

    python -m deduce_ray extract --input docs.parquet --output /tmp/graph
    python -m deduce_ray extract --input corpus.jsonl --text-key text
    python -m deduce_ray extract --input /data/repos --format text-tree
    python -m deduce_ray deidentify --text "Jan Jansen, bsn 111222333"
    python -m deduce_ray compile-lexicon

``extract`` reads parquet, JSONL, CSV, or a text-file tree (format
inferred from the path, ``--format`` overrides).  Parquet accepts either
the repo schema (repo,path,commit,lang,content) or the documents schema
(doc_id,text,lang) — the latter is decorated into the repo shape
deterministically (corpus.py); other formats map through
deduce_ray.sources.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _init_ray(num_cpus: int | None) -> None:
    import ray

    from deduce_ray.raytune import tune_data_context

    if not ray.is_initialized():
        kwargs = {"address": "local", "include_dashboard": False}
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    tune_data_context()


def _expand_enabled(engine, enabled: set[str] | None) -> set[str] | None:
    """CLI convenience: the engine's enabled-set semantics (mirroring
    docdeid) require BOTH the group name and the member names.  Expand a
    bare group name to the whole group, and a bare member name to
    {its group, member}, so ``--enabled bsn`` does what it says."""
    if enabled is None:
        return None
    out: set[str] = set()
    for name in enabled:
        if name in engine.processor_groups:
            out |= engine.group_names(name)
            continue
        for group, members in engine.processor_groups.items():
            if any(name == member for member, _ in members):
                out |= {group, name}
                break
        else:
            out.add(name)
    return out


def _infer_format(path: str) -> str:
    from pathlib import Path

    p = Path(path)
    if not p.exists():
        raise SystemExit(f"--input path does not exist: {path}")
    suffix = p.suffix.lower()
    if suffix == ".gz":
        # look through the compression suffix: docs.jsonl.gz / docs.csv.gz
        # (the readers decompress transparently)
        suffix = Path(p.stem).suffix.lower()
    if suffix in (".jsonl", ".ndjson"):
        return "jsonl"
    if suffix == ".json":
        # a bare .json is usually a top-level array, which the NDJSON
        # reader rejects with an opaque parse error — fail intelligibly
        raise SystemExit(
            "cannot infer the format of a .json file: if it is "
            "newline-delimited pass --format jsonl, otherwise convert "
            "the array to NDJSON first"
        )
    if suffix == ".csv":
        return "csv"
    if suffix == ".orc":
        return "orc"
    if p.is_file():
        if suffix == ".parquet":
            return "parquet"
        raise SystemExit(
            f"cannot infer the format of {path!r} from its suffix — "
            "pass --format parquet|jsonl|csv|orc"
        )
    # a directory: classify by what its TOP level holds (sharded-corpus
    # layouts put part files directly under the directory).  Deliberately
    # not recursive — a full tree walk on a repository checkout blocks
    # startup for minutes, and one stray vendored file deep inside a repo
    # must not reclassify the whole tree (--format overrides either way)
    if any(p.glob("*.parquet")):
        return "parquet"
    for pat, fmt in (
        ("*.jsonl", "jsonl"),
        ("*.ndjson", "jsonl"),
        ("*.jsonl.gz", "jsonl"),
        ("*.ndjson.gz", "jsonl"),
        ("*.csv", "csv"),
        ("*.csv.gz", "csv"),
        ("*.orc", "orc"),
    ):
        if any(p.glob(pat)):
            return fmt
    return "text-tree"


def _read_corpus(args, decorate: bool = True):
    """``decorate`` applies the deterministic repo-table synthesis
    (deduce_ray.corpus.decorate_batch: repo/path/commit columns +
    PHI-snippet-decorated ``content``) to a bare (doc_id, text, lang)
    parquet — the KG-extraction demo input per the driver contract.
    ONLY the extract command wants that; prep and report must see the
    corpus bytes untouched (decoration appends synthetic snippets,
    which would corrupt dedup/statistics semantics)."""
    from deduce_ray.corpus import decorate_batch, read_parquet_sliced
    from deduce_ray.sources import (
        read_csv_corpus,
        read_jsonl_corpus,
        read_text_tree_corpus,
    )

    fmt = args.format or _infer_format(args.input)
    if fmt == "jsonl":
        return read_jsonl_corpus(args.input, text_key=args.text_key)
    if fmt == "csv":
        return read_csv_corpus(args.input, text_key=args.text_key)
    if fmt == "orc":
        from deduce_ray.sources import read_orc_corpus

        return read_orc_corpus(args.input, text_key=args.text_key)
    if fmt == "text-tree":
        return read_text_tree_corpus(
            args.input,
            extensions=args.extensions.split(",") if args.extensions else None,
            on_decode_error=args.on_decode_error,
        )
    ds = read_parquet_sliced(args.input)
    names = set(ds.schema().names)
    if decorate and "content" not in names and "text" in names:
        ds = ds.map_batches(decorate_batch, batch_format="pyarrow")
    return ds


def _corpus_text_col(ds) -> str:
    """The corpus text-column convention, shared by prep and report."""
    return "content" if "content" in set(ds.schema().names) else "text"


def cmd_extract(args) -> int:
    import ray

    from deduce_ray.rayops.annotate import broadcast_lexicon, extract_triples
    from deduce_ray.rayops.kg import dedup_triples, materialize_graph

    _init_ray(args.num_cpus)
    ds = _read_corpus(args)

    lexicon_ref = broadcast_lexicon(lookup_data_path=args.lookup_data_path)
    enabled = set(args.enabled.split(",")) if args.enabled else None
    triples = extract_triples(
        ds,
        lexicon_ref=lexicon_ref,
        enabled=enabled,
        with_redacted=args.with_redacted,
    )

    if args.output:
        metrics = materialize_graph(
            triples, args.output, resume=not args.no_resume
        ).to_pandas()
        print(
            json.dumps(
                {
                    "partitions_written": int(len(metrics)),
                    "rows": int(metrics["rows"].sum()) if len(metrics) else 0,
                    "docs": int(metrics["docs"].sum()) if len(metrics) else 0,
                    "output": str(args.output),
                }
            )
        )
    else:
        graph = dedup_triples(triples)
        print(json.dumps({"triples": graph.count()}))
    ray.shutdown()
    return 0


def cmd_analyze(args) -> int:
    """KG analytics: extract triples, build the entity co-occurrence
    graph, rank entities by (optionally weighted) PageRank, print the
    top-k — the read-side complement of `extract`."""
    import ray

    from deduce_ray.rayops.annotate import broadcast_lexicon, extract_triples
    from deduce_ray.rayops.kg import cooccurrence_edges, pagerank

    _init_ray(args.num_cpus)
    ds = _read_corpus(args)

    lexicon_ref = broadcast_lexicon(lookup_data_path=args.lookup_data_path)
    enabled = set(args.enabled.split(",")) if args.enabled else None
    triples = extract_triples(ds, lexicon_ref=lexicon_ref, enabled=enabled)
    edges = cooccurrence_edges(
        triples, max_mentions_per_doc=args.max_mentions_per_doc
    )
    if getattr(args, "state_dir", None):
        # incremental mode: persist THIS batch's additive edge aggregate,
        # then analyze the merged store — new batches never re-annotate
        # old corpora (disjoint-batch contract, see state/kg_store.py)
        from deduce_ray.state.kg_store import KGStore

        store = KGStore(args.state_dir)
        label = args.state_label or os.path.basename(
            os.path.normpath(args.input)
        )
        manifest = store.ingest_edges(label, edges)
        print(
            f"kg-state: committed {manifest['n_edges']} edges as "
            f"{label!r}; analyzing {len(store.committed_labels())} "
            f"committed ingest(s)"
        )
        edges = store.merged_edges()
    if args.communities or args.components:
        # several consumers read the edge set: materialize ONCE so the
        # extraction actor pool and the co-occurrence shuffle do not
        # re-execute per consumer (Ray re-runs lineage on each use)
        edges = edges.materialize()
    ranks = pagerank(
        edges,
        damping=args.damping,
        n_iter=args.iterations,
        weight_col="n_docs" if args.weighted else None,
    )
    # top-k the repo way: per-block local prune, then a tiny driver
    # merge (<= top x blocks rows) — never a global sort or a full
    # rank-table pull
    import pyarrow as pa

    k = args.top
    if k <= 0:
        raise SystemExit("--top must be positive")

    def local_top(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().sort_values(
            ["score", "pred", "obj"], ascending=[False, True, True]
        )
        return pa.Table.from_pandas(df.head(k), preserve_index=False)

    n_entities = ranks.count()
    if n_entities:
        merged = (
            ranks.map_batches(local_top, batch_format="pyarrow")
            .to_pandas()
            .sort_values(
                ["score", "pred", "obj"], ascending=[False, True, True]
            )
            .head(k)
        )
        top = [
            {"pred": r.pred, "obj": r.obj, "score": float(r.score)}
            for r in merged.itertuples()
        ]
    else:
        # an edge-free graph (e.g. every doc yields < 2 distinct
        # mentions): to_pandas on the empty dataset drops the schema,
        # so short-circuit instead of sorting nonexistent columns
        top = []
    result = {
        "entities": int(n_entities),
        "top": top,
    }
    def _group_sizes(ds, key_cols: list[str]) -> tuple[int, list[int]]:
        """(group count, k largest sizes) — one materialized size table,
        local prune + tiny driver merge; empty input -> (0, [])."""
        sizes = ds.groupby(key_cols).count().materialize()
        n = sizes.count()
        if not n:
            return 0, []
        largest = (
            sizes.map_batches(
                lambda t: t.sort_by([("count()", "descending")]).slice(0, k),
                batch_format="pyarrow",
            )
            .to_pandas()
            .sort_values("count()", ascending=False)
            .head(k)
        )
        return int(n), [int(x) for x in largest["count()"].tolist()]

    if args.communities:
        from deduce_ray.rayops.kg import label_propagation

        labs = label_propagation(edges, n_iter=args.iterations)
        n, largest = _group_sizes(labs, ["label_pred", "label_obj"])
        result["communities"] = n
        result["largest_communities"] = largest
    if args.components:
        from deduce_ray.rayops.kg import graph_components

        n, largest = _group_sizes(graph_components(edges), ["component_id"])
        result["components"] = n
        result["largest_components"] = largest
    print(json.dumps(result))
    ray.shutdown()
    return 0


def _probe_ubiquitous_shingle(
    ds, text_col: str, sample: int = 1000, frac: float = 0.25
) -> None:
    """Bounded pre-flight for the measured LSH hazard: a short phrase
    present in a constant fraction of ALL documents concentrates r=2
    band buckets, making the near-dup candidate stage Theta(n^2) in
    rejected pairs even below max_bucket (see minhash_lsh_pairs and
    scripts/stress_funnel.py).  One ``limit(sample)`` driver pull; when
    the most document-frequent 3-shingle appears in >= ``frac`` of the
    sample, say so and name the knobs BEFORE the expensive pass runs."""
    from collections import Counter

    from deduce_ray.ops.textstats import split_words

    rows = ds.limit(sample).take_all()
    if len(rows) < 50:  # too small to call a fraction ubiquitous
        return
    df: Counter = Counter()
    for r in rows:
        ws = split_words((r.get(text_col) or "").lower())
        df.update({" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)})
    if not df:
        return
    top, n = df.most_common(1)[0]
    if n >= frac * len(rows):
        print(
            f"prep: the 3-gram {top!r} appears in {n}/{len(rows)} sampled "
            "documents — ubiquitous shared phrases make the near-dup "
            "candidate stage quadratic under the default 32x2 banding "
            "(rejected candidates grow with corpus^2 even below "
            "--minhash-max-bucket); consider --minhash-bands 16, "
            "--strip-dup-ngrams, or a tighter --minhash-max-bucket",
            file=sys.stderr,
        )


def cmd_prep(args) -> int:
    """LLM data-prep funnel over any supported corpus format: language /
    quality filters -> exact dedup -> MinHash near-dup removal ->
    surviving rows as parquet."""
    import ray

    from deduce_ray.ops.funnel import prep_corpus

    from pathlib import Path

    out_dir = Path(args.output)
    if "://" in args.output:
        raise SystemExit(
            "prep writes and counts local directories; for object stores "
            "use the library (deduce_ray.ops.funnel.prep_corpus + "
            "Dataset.write_parquet) directly"
        )
    if not args.resume and out_dir.exists() and any(out_dir.iterdir()):
        raise SystemExit(
            f"--output {args.output} exists and is not empty — survivors "
            "would mix with stale files; point prep at a fresh directory "
            "(or pass --resume to continue a manifest-tracked run)"
        )

    _init_ray(args.num_cpus)
    # no decoration: prep must dedup/filter the corpus bytes as given
    ds = _read_corpus(args, decorate=False)

    text_col = _corpus_text_col(ds)

    ds = _ensure_doc_id(ds, "prep")

    threshold = None if args.minhash_threshold <= 0 else args.minhash_threshold
    if threshold is not None and args.minhash_bands is None:
        _probe_ubiquitous_shingle(ds, text_col)
    out = prep_corpus(
        ds,
        text_col=text_col,
        langs=tuple(args.langs.split(",")) if args.langs else None,
        min_chars=args.min_chars,
        max_digit_ppm=args.max_digit_ppm,
        max_dup_line_ppm=args.max_dup_line_ppm,
        max_top_2gram_ppm=args.max_top_2gram_ppm,
        max_dup_5gram_ppm=args.max_dup_5gram_ppm,
        minhash_threshold=threshold,
        neardup_keep=args.neardup_keep,
        strip_dup_ngrams=args.strip_dup_ngrams or None,
        max_bucket=args.minhash_max_bucket or None,
        minhash_bands=args.minhash_bands,
        max_ppl=args.max_ppl,
        lm_min_count=args.lm_min_count,
        semantic_threshold=args.semantic_threshold,
        embed_dim=args.embed_dim,
    )
    if args.decontaminate:
        # benchmark file: one document per line; the small side of the
        # broadcast, read on the driver by design
        from deduce_ray.ops.decontaminate import benchmark_grams, decontaminate

        with open(args.decontaminate, encoding="utf-8") as f:
            grams = benchmark_grams(f, n=args.decontaminate_n)
        out = decontaminate(out, grams, n=args.decontaminate_n, text_col=text_col)

    # store commits are DEFERRED until the survivors are safely written:
    # a crash anywhere before write_parquet completes leaves every store
    # label uncommitted (resumable with the same label), never a
    # committed batch whose output was lost
    commits = []
    label = args.state_label or out_dir.name
    if args.state_dir:
        # cross-RUN dedup: drop funnel survivors already retained by a
        # previous ingest, then remember the new ones.  Runs after the
        # funnel so the store records only documents worth remembering.
        from deduce_ray.state import incremental_dedup

        out, commit = incremental_dedup(
            out,
            args.state_dir,
            label,
            text_col=text_col,
            n_shards=args.state_shards,
            defer_commit=True,
        )
        commits.append(commit)
    if args.neardup_state_dir:
        # cross-RUN near-dup (SimHash Hamming <= 3): runs after exact
        # cross-run dedup so byte-identical repeats never reach the
        # near-dup index
        from deduce_ray.state import incremental_neardup

        out, commit = incremental_neardup(
            out,
            args.neardup_state_dir,
            label,
            text_col=text_col,
            n_shards=args.state_shards,
            defer_commit=True,
        )
        commits.append(commit)
    if args.chunk_words:
        # training-window prep runs LAST: the funnel and the incremental
        # stores operate on whole documents; the written rows become
        # chunks (or packs), so the printed count reflects those
        from deduce_ray.ops.chunking import chunk_documents, pack_chunks

        out = chunk_documents(
            out,
            window=args.chunk_words,
            stride=args.chunk_stride,
            text_col=text_col,
        )
        if args.pack_words:
            out = pack_chunks(out, max_words=args.pack_words)
    elif args.pack_words or args.chunk_stride:
        raise SystemExit(
            "--pack-words / --chunk-stride require --chunk-words"
        )

    if args.resume:
        from deduce_ray.sinks import write_parquet_resumable

        # rows are packs after --pack-words, chunks after --chunk-words
        # (bucketed by doc_id so a document's windows stay together),
        # documents otherwise
        if args.pack_words:
            id_col, sort_cols = "pack_id", ("pack_id",)
        elif args.chunk_words:
            id_col, sort_cols = "doc_id", ("doc_id", "chunk_id")
        else:
            id_col, sort_cols = "doc_id", ("doc_id",)
        summary = write_parquet_resumable(
            out,
            out_dir,
            id_col=id_col,
            sort_cols=sort_cols,
            n_buckets=args.resume_buckets,
            run_id=label,
        )
        for commit in commits:
            commit()
        print(
            json.dumps(
                {
                    "survivors": summary["rows_total"],
                    "output": str(args.output),
                    "buckets_written": summary["buckets_written"],
                    "buckets_skipped": summary["buckets_skipped"],
                }
            )
        )
        ray.shutdown()
        return 0

    out.write_parquet(args.output)
    for commit in commits:
        commit()

    import pyarrow.parquet as pq
    from pathlib import Path

    survivors = sum(
        pq.ParquetFile(f).metadata.num_rows
        for f in Path(args.output).glob("*.parquet")
    )
    print(json.dumps({"survivors": survivors, "output": str(args.output)}))
    ray.shutdown()
    return 0


def _ensure_doc_id(ds, cmd: str):
    """Derive stable 63-bit doc ids from (repo|path|commit) when the
    corpus has no doc_id column — shared by prep and vectorize (both run
    re-executable multi-pass pipelines, so positional ids would differ
    between executions)."""
    import hashlib

    import pyarrow as pa

    names = set(ds.schema().names)
    if "doc_id" not in names and {"repo", "path", "commit"} <= names:
        # refuse corpora whose rows carry NO identity (bare
        # {"content": ...} JSONL fills all three with "") — every row
        # would share one id, and id-keyed stages would then conflate
        # the whole corpus
        probe = ds.limit(1).take_all()
        if probe and not any(
            (probe[0].get(k) or "") for k in ("repo", "path", "commit")
        ):
            raise SystemExit(
                f"{cmd} needs per-row identity to derive stable doc ids: "
                "give the corpus repo/path/commit (or doc_id) columns — "
                "bare content-only rows would all hash to one id"
            )

    def add_id(batch: pa.Table) -> pa.Table:
        ids = [
            int.from_bytes(
                hashlib.sha256(f"{r}|{p}|{c}".encode()).digest()[:8], "big"
            )
            >> 1
            for r, p, c in zip(
                batch.column("repo").to_pylist(),
                batch.column("path").to_pylist(),
                batch.column("commit").to_pylist(),
            )
        ]
        return batch.append_column("doc_id", pa.array(ids, type=pa.int64()))

    if "doc_id" not in set(ds.schema().names):
        ds = ds.map_batches(add_id, batch_format="pyarrow")
    return ds


def cmd_report(args) -> int:
    import ray

    from deduce_ray.ops.textstats import corpus_report

    _init_ray(args.num_cpus)
    # no decoration: statistics must describe the corpus bytes as given
    ds = _read_corpus(args, decorate=False)
    print(json.dumps(corpus_report(ds, text_col=_corpus_text_col(ds))))
    ray.shutdown()
    return 0


def cmd_vectorize(args) -> int:
    """Corpus -> dense TF-IDF vector parquet in the embeddings-table
    shape (vec_id, embedding) — feed the output to ``ann --build`` for
    the partitioned on-disk IVF index, or read it with the similarity
    ops directly.  The vocabulary (term -> position + idf, and N) is
    written to ``<output>/_vocab.json``; vectorize QUERY text with
    ``--vocab-in <that file>`` so both sides share one vector space."""
    from pathlib import Path

    import pyarrow.parquet as pq
    import ray

    from deduce_ray.ops.vectorize import build_tfidf_vocab, tfidf_dense

    out_dir = Path(args.output)
    if out_dir.exists() and any(out_dir.iterdir()):
        raise SystemExit(
            f"--output {args.output} exists and is not empty — vectors "
            "of a different vocabulary/dimension would mix with stale "
            "files; point vectorize at a fresh directory"
        )

    _init_ray(args.num_cpus)
    # no decoration: vectors must describe the corpus bytes as given
    ds = _read_corpus(args, decorate=False)
    text_col = _corpus_text_col(ds)
    ds = _ensure_doc_id(ds, "vectorize")
    if args.encoder == "hashing":
        # model-based path: the actor-pool hashing encoder (ops/embed.py)
        # — no vocabulary pass, no _vocab.json; two corpora encoded with
        # the same --embed-dim share one vector space by construction
        if args.vocab_in:
            raise SystemExit(
                "--vocab-in applies to the tfidf encoder only (the "
                "hashing encoder's space is fixed by --embed-dim)"
            )
        from deduce_ray.ops.embed import embed_documents

        dense = embed_documents(
            ds, text_col=text_col, dim=args.embed_dim
        ).map_batches(
            lambda b: b.rename_columns(
                ["vec_id" if c == "doc_id" else c for c in b.column_names]
            ),
            batch_format="pyarrow",
        )
        dense.write_parquet(args.output)
        n_vectors = sum(
            pq.read_metadata(fp).num_rows for fp in out_dir.glob("*.parquet")
        )
        print(json.dumps({
            "encoder": "hashing",
            "n_vectors": n_vectors,
            "dim": args.embed_dim,
            "output": args.output,
        }))
        ray.shutdown()
        return 0
    if args.vocab_in:
        with open(args.vocab_in, encoding="utf-8") as f:
            raw = json.load(f)
        vocab = {
            "terms": {t: (int(i), float(idf)) for t, i, idf in raw["terms"]},
            "n_docs": int(raw["n_docs"]),
        }
    else:
        vocab = build_tfidf_vocab(
            ds, text_col=text_col, vocab_size=args.vocab_size
        )
    dense = tfidf_dense(ds, text_col=text_col, vocab=vocab).map_batches(
        lambda b: b.rename_columns(
            ["vec_id" if c == "doc_id" else c for c in b.column_names]
        ),
        batch_format="pyarrow",
    )
    dense.write_parquet(args.output)
    out_dir.mkdir(parents=True, exist_ok=True)
    with open(out_dir / "_vocab.json", "w", encoding="utf-8") as f:
        json.dump(
            {
                "n_docs": vocab["n_docs"],
                "terms": [
                    [t, i, idf] for t, (i, idf) in vocab["terms"].items()
                ],
            },
            f,
        )
    n_vectors = sum(
        pq.read_metadata(fp).num_rows
        for fp in out_dir.glob("*.parquet")
    )
    # docs whose text holds no vocabulary term have no direction and
    # emit no vector — count them instead of dropping silently
    print(
        json.dumps(
            {
                "n_docs": vocab["n_docs"],
                "n_vectors": n_vectors,
                "n_no_vocab_term": vocab["n_docs"] - n_vectors
                if not args.vocab_in
                else None,
                "dim": len(vocab["terms"]),
                "vocab": str(out_dir / "_vocab.json"),
                "output": args.output,
            }
        )
    )
    ray.shutdown()
    return 0


def cmd_ann(args) -> int:
    """Build / search the partitioned on-disk IVF index.

    build: one streaming pass over the embeddings parquet — assign each
    vector a coarse list, write hive-partitioned parquet (one directory
    per list) + a tiny centroid table.  search: query vectors come from
    rows of the same-schema parquet given by --queries (pruned read);
    only the probed list DIRECTORIES are opened."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray

    from deduce_ray.corpus import read_parquet_sliced
    from deduce_ray.ops.similarity import ivf_build, ivf_search

    _init_ray(args.num_cpus)
    if args.build:
        ds = read_parquet_sliced(
            args.input, columns=[args.id_col, args.vec_col]
        )
        ivf_build(
            ds,
            args.index_dir,
            n_lists=args.n_lists,
            vec_col=args.vec_col,
        )
        n_lists = len(
            pq.read_table(f"{args.index_dir}/_centroids").column("list_id")
        )
        print(json.dumps({"index_dir": args.index_dir, "n_lists": n_lists}))
    else:
        if not args.queries:
            raise SystemExit("search needs --queries (a parquet of vectors)")
        qt = pq.read_table(
            args.queries, columns=[args.id_col, args.vec_col]
        )
        qids = qt.column(args.id_col).to_pylist()
        qmat = np.asarray(qt.column(args.vec_col).to_pylist(), dtype=np.float64)
        hits = ivf_search(
            args.index_dir,
            qmat,
            k=args.k,
            n_probe=args.n_probe,
            id_col=args.id_col,
            vec_col=args.vec_col,
        ).take_all()
        # ivf_search numbers queries by row position; map back to ids
        for h in hits:
            h["query_id"] = qids[h["query_id"]]
        print(json.dumps({"hits": hits}, default=str))
    ray.shutdown()
    return 0


def cmd_dedup_state(args) -> int:
    """Inspect (and optionally compact) an incremental dedup/near-dup
    store of either kind.  Stats are footer-metadata only — never opens
    data pages, needs no Ray."""
    from deduce_ray.state import DedupStore, SimHashStore
    from deduce_ray.state.base import META_FILE

    with open(os.path.join(args.state_dir, META_FILE)) as f:
        kind = json.load(f).get("kind", DedupStore.KIND)
    from deduce_ray.state import EmbeddingLSHStore

    cls = {
        SimHashStore.KIND: SimHashStore,
        EmbeddingLSHStore.KIND: EmbeddingLSHStore,
    }.get(kind, DedupStore)
    store = cls.open(args.state_dir)
    if args.compact:
        store.compact()
    st = store.stats()
    # per-ingest counters (bounded: manifests are one tiny json each)
    st["ingest_details"] = {
        label: store.ingest_info(label) for label in st["ingests"][:100]
    }
    print(json.dumps(st))
    return 0


def cmd_deidentify(args) -> int:
    from deduce_ray.engine import DeduceEngine
    from deduce_ray.person import Person

    kwargs = (
        {"lookup_data_path": args.lookup_data_path} if args.lookup_data_path else {}
    )
    engine = DeduceEngine(**kwargs)
    metadata = None
    if args.patient_first_names or args.patient_surname or args.patient_initials:
        metadata = {
            "patient": Person.from_keywords(
                patient_first_names=args.patient_first_names or "",
                patient_initials=args.patient_initials or "",
                patient_surname=args.patient_surname or "",
            )
        }
    text = args.text if args.text is not None else sys.stdin.read()
    doc = engine.deidentify(
        text,
        metadata=metadata,
        enabled=_expand_enabled(
            engine, set(args.enabled.split(",")) if args.enabled else None
        ),
        disabled=set(args.disabled.split(",")) if args.disabled else None,
    )
    print(
        json.dumps(
            {
                "annotations": [
                    {
                        "text": a.text,
                        "start_char": a.start_char,
                        "end_char": a.end_char,
                        "tag": a.tag,
                    }
                    for a in doc.annotations.sorted_by(("start_char",))
                ],
                "deidentified_text": doc.deidentified_text,
            },
            ensure_ascii=False,
        )
    )
    return 0


def cmd_compile_lexicon(args) -> int:
    import time

    from deduce_ray.lexicon import DEFAULT_LOOKUP_PATH, load_or_build_lexicon

    t0 = time.time()
    structs, _ = load_or_build_lexicon(
        args.lookup_data_path or DEFAULT_LOOKUP_PATH,
        cache_dir=args.cache_dir,
        build=args.force,
    )
    print(
        json.dumps(
            {
                "lists": sorted(structs),
                "sizes": {name: len(struct) for name, struct in structs.items()},
                "seconds": round(time.time() - t0, 1),
            }
        )
    )
    return 0


def main() -> int:
    parser = argparse.ArgumentParser(prog="deduce_ray")
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser(
        "extract", help="corpus (parquet/jsonl/csv/text tree) -> triple graph"
    )
    p.add_argument("--input", required=True)
    p.add_argument(
        "--format",
        choices=["parquet", "jsonl", "csv", "orc", "text-tree"],
        help="input format (default: inferred from the path)",
    )
    p.add_argument(
        "--text-key",
        default="content",
        help="jsonl/csv column holding the document text",
    )
    p.add_argument(
        "--extensions",
        help="text-tree only: comma-separated file suffixes to read "
        "(e.g. txt,md,py); other files are never opened",
    )
    p.add_argument(
        "--on-decode-error",
        choices=["raise", "skip"],
        default="raise",
        help="text-tree only: skip counts-and-drops undecodable files",
    )
    p.add_argument("--output", help="graph directory (omit: just count triples)")
    p.add_argument(
        "--enabled",
        help="comma-separated group and/or annotator names (bare names are "
        "expanded: a group enables all its members, a member enables "
        "itself within its group)",
    )
    p.add_argument("--with-redacted", action="store_true")
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--num-cpus", type=int)
    p.add_argument("--lookup-data-path")
    p.set_defaults(fn=cmd_extract)

    p = sub.add_parser(
        "analyze",
        help="KG analytics: extract -> entity co-occurrence graph -> "
        "PageRank -> top-k entities",
    )
    p.add_argument("--input", required=True)
    p.add_argument(
        "--format",
        choices=["parquet", "jsonl", "csv", "orc", "text-tree"],
        help="input format (default: inferred from the path)",
    )
    p.add_argument("--text-key", default="content")
    p.add_argument("--extensions")
    p.add_argument("--on-decode-error", choices=["raise", "skip"], default="raise")
    p.add_argument(
        "--enabled",
        help="comma-separated group/annotator names (same expansion as "
        "extract)",
    )
    p.add_argument("--top", type=int, default=20)
    p.add_argument("--damping", type=float, default=0.85)
    p.add_argument("--iterations", type=int, default=5)
    p.add_argument(
        "--weighted",
        action="store_true",
        help="weight arcs by co-occurrence n_docs instead of unweighted",
    )
    p.add_argument(
        "--max-mentions-per-doc",
        type=int,
        default=None,
        help="opt-in scale guard: skip documents with more distinct "
        "mentions than this (pair generation is quadratic per doc)",
    )
    p.add_argument(
        "--components",
        action="store_true",
        help="also report connected-component count and the largest "
        "component sizes",
    )
    p.add_argument(
        "--communities",
        action="store_true",
        help="also report label-propagation community count and the "
        "largest community sizes (synchronous LPA, --iterations rounds)",
    )
    p.add_argument(
        "--state-dir",
        help="incremental KG store directory: commit this batch's "
        "additive co-occurrence edge aggregate, then analyze the "
        "merged store — new batches never re-annotate old corpora "
        "(batches must be doc-disjoint; created on first use)",
    )
    p.add_argument(
        "--state-label",
        help="ingest label for --state-dir (default: the input's base "
        "name); must be fresh per batch — a crashed run's label can be "
        "re-run, a committed one is refused",
    )
    p.add_argument("--num-cpus", type=int)
    p.add_argument("--lookup-data-path")
    p.set_defaults(fn=cmd_analyze)

    p = sub.add_parser(
        "prep",
        help="LLM data-prep funnel: lang/quality filter -> exact dedup -> "
        "near-dup removal -> parquet",
    )
    p.add_argument("--input", required=True)
    p.add_argument(
        "--format", choices=["parquet", "jsonl", "csv", "orc", "text-tree"]
    )
    p.add_argument("--text-key", default="content")
    p.add_argument("--extensions")
    p.add_argument("--on-decode-error", choices=["raise", "skip"], default="raise")
    p.add_argument("--output", required=True)
    p.add_argument(
        "--langs", help="comma-separated allowed languages (omit: no filter)"
    )
    p.add_argument("--min-chars", type=int, default=1)
    p.add_argument("--max-digit-ppm", type=int, default=None)
    p.add_argument(
        "--max-dup-line-ppm",
        type=int,
        default=None,
        help="Gopher-style repetition filter: drop documents whose "
        "duplicate-line fraction exceeds this (parts per million; e.g. "
        "300000 = 30%%)",
    )
    p.add_argument(
        "--max-top-2gram-ppm",
        type=int,
        default=None,
        help="drop documents whose most frequent word 2-gram covers more "
        "than this fraction of 2-gram character mass (ppm)",
    )
    p.add_argument(
        "--max-dup-5gram-ppm",
        type=int,
        default=None,
        help="drop documents whose duplicated word 5-grams cover more "
        "than this fraction of 5-gram character mass (ppm)",
    )
    p.add_argument(
        "--minhash-bands",
        type=int,
        default=None,
        help="LSH band count override (default: library 32x2 banding); "
        "use fewer/wider bands (e.g. 16 -> 4 rows/band) for corpora "
        "where a short phrase appears in nearly every document",
    )
    p.add_argument(
        "--minhash-threshold",
        type=float,
        default=0.7,
        help="near-dup Jaccard threshold; <=0 disables the near-dup stage",
    )
    p.add_argument(
        "--neardup-keep",
        choices=["min_id", "longest"],
        default="min_id",
        help="near-dup cluster survivor: min_id (cheapest) or longest "
        "(max characters, ties to the smaller id — keep the fullest "
        "copy; one extra bounded pass over the cluster members)",
    )
    p.add_argument(
        "--max-ppl",
        type=float,
        default=None,
        help="CCNet-style LM quality filter: drop documents whose bigram "
        "perplexity against a model self-trained on the deduplicated "
        "survivors exceeds this value (omit: no LM filter; documents "
        "with <2 words always survive)",
    )
    p.add_argument(
        "--lm-min-count",
        type=int,
        default=1,
        help="prune LM bigrams below this training count at the merge "
        "(the --max-ppl model-size knob: the broadcast model must fit "
        "one worker heap; raise this when build_model refuses with "
        "'model exceeds driver_max_rows'.  Pruning is deterministic "
        "but output-changing, so the default is 1/off)",
    )
    p.add_argument(
        "--semantic-threshold",
        type=float,
        default=None,
        help="semantic near-dup stage (after MinHash, before the LM "
        "filter): embed survivors with the actor-pool hashing encoder "
        "and drop cosine near-duplicate cluster members above this "
        "threshold, keeping each cluster's minimum id (omit: no "
        "semantic stage; word-permuted duplicates embed identically)",
    )
    p.add_argument(
        "--embed-dim",
        type=int,
        default=32,
        help="embedding components for --semantic-threshold",
    )
    p.add_argument(
        "--state-dir",
        help="incremental dedup store directory: drop documents already "
        "retained by a previous prep run, then remember the new ones "
        "(created on first use)",
    )
    p.add_argument(
        "--state-label",
        help="ingest label for --state-dir (default: the output dir name); "
        "must be fresh per batch — a crashed run's label can be re-run, a "
        "committed one is refused",
    )
    p.add_argument(
        "--state-shards",
        type=int,
        default=64,
        help="shard count if --state-dir creates a new store (fixed for "
        "its lifetime; size for the TARGET corpus: one membership task "
        "holds total_hashes*16/K bytes)",
    )
    p.add_argument(
        "--minhash-max-bucket",
        type=int,
        default=4096,
        help="cap LSH bucket membership in the near-dup pass at this "
        "many distinct texts (drops beyond the cap are LOGGED; bounded "
        "recall loss on pathological boilerplate in exchange for "
        "bounded compute — the library default is uncapped/exact; "
        "0 disables the cap)",
    )
    p.add_argument(
        "--strip-dup-ngrams",
        type=int,
        default=0,
        help="substring-level dedup: rewrite surviving documents with "
        "every word span shared verbatim by >= 2 survivors removed "
        "(this value is the n-gram window, e.g. 13; 0 disables; runs "
        "between the exact and near-dup passes so shared boilerplate "
        "cannot blow up the MinHash buckets)",
    )
    p.add_argument(
        "--decontaminate",
        help="benchmark file (one document per line): drop documents "
        "sharing any word n-gram with it (runs after the funnel, before "
        "the state stores)",
    )
    p.add_argument(
        "--decontaminate-n",
        type=int,
        default=13,
        help="n-gram length for --decontaminate (default 13)",
    )
    p.add_argument(
        "--neardup-state-dir",
        help="incremental NEAR-dup store (SimHash, Hamming <= 3): drop "
        "documents near-duplicate of any previous ingest's survivors; "
        "applied after --state-dir's exact pass; shares --state-label "
        "and --state-shards",
    )
    p.add_argument(
        "--chunk-words",
        type=int,
        default=None,
        help="split surviving documents into training windows of this "
        "many words (runs LAST, after dedup and the stores; written "
        "rows become chunks)",
    )
    p.add_argument(
        "--chunk-stride",
        type=int,
        default=None,
        help="window stride for --chunk-words (default: the window, "
        "i.e. disjoint; smaller = overlapping context windows)",
    )
    p.add_argument(
        "--pack-words",
        type=int,
        default=None,
        help="greedily pack chunks into sequences of at most this many "
        "words (per-block first-fit; requires --chunk-words)",
    )
    p.add_argument(
        "--resume",
        action="store_true",
        help="write output as hash-bucketed parquet units with completion "
        "manifests (deduce_ray.sinks): a restarted run skips finished "
        "buckets instead of refusing a non-empty directory; the funnel "
        "still re-executes to regenerate the missing rows.  Pairs with "
        "the state stores' deferred commits: a crashed run leaves its "
        "--state-label uncommitted, so the resumed run may reuse it",
    )
    p.add_argument(
        "--resume-buckets",
        type=int,
        default=64,
        help="bucket count for --resume (fixed for the output dir's "
        "lifetime; size so corpus/buckets fits one worker's heap)",
    )
    p.add_argument("--num-cpus", type=int)
    p.set_defaults(fn=cmd_prep)

    p = sub.add_parser(
        "dedup-state",
        help="incremental dedup store: stats (and optional compaction)",
    )
    p.add_argument("--state-dir", required=True)
    p.add_argument(
        "--compact",
        action="store_true",
        help="merge each shard's per-ingest files into one before printing "
        "stats (single-writer maintenance; do not run during an ingest)",
    )
    p.set_defaults(fn=cmd_dedup_state)

    p = sub.add_parser(
        "vectorize",
        help="corpus -> dense vector parquet (vec_id, embedding): TF-IDF "
        "by default, or the actor-pool hashing encoder with "
        "--encoder hashing; feed the output to `ann --build`",
    )
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--format", choices=["parquet", "jsonl", "csv", "orc", "text-tree"])
    p.add_argument("--text-key", default="content")
    p.add_argument("--extensions")
    p.add_argument("--on-decode-error", choices=["raise", "skip"], default="raise")
    p.add_argument(
        "--vocab-size",
        type=int,
        default=4096,
        help="TF-IDF vocabulary / vector dimension (top-k terms by "
        "document frequency, ties by term)",
    )
    p.add_argument(
        "--vocab-in",
        help="reuse the _vocab.json a previous vectorize run wrote into "
        "its output dir, instead of building a new vocabulary — REQUIRED "
        "when vectorizing queries against an existing index (a fresh "
        "vocabulary would assign different term positions/idf, making "
        "the spaces incomparable)",
    )
    p.add_argument(
        "--encoder",
        choices=["tfidf", "hashing"],
        default="tfidf",
        help="tfidf: corpus-derived vocabulary + idf weights (writes "
        "_vocab.json; reuse with --vocab-in).  hashing: the model-based "
        "signed feature-hashing encoder (ops/embed.py, actor pool) — "
        "vocabulary-free, so two corpora at the same --embed-dim share "
        "one vector space with no artifact to carry",
    )
    p.add_argument(
        "--embed-dim",
        type=int,
        default=256,
        help="vector dimension for --encoder hashing",
    )
    p.add_argument("--num-cpus", type=int)
    p.set_defaults(fn=cmd_vectorize)

    p = sub.add_parser(
        "ann",
        help="partitioned on-disk IVF index over an embeddings parquet: "
        "--build writes hive list_id partitions + centroids; otherwise "
        "searches, opening ONLY the probed list directories",
    )
    p.add_argument("--input", help="embeddings parquet (build)")
    p.add_argument("--index-dir", required=True)
    p.add_argument("--build", action="store_true")
    p.add_argument("--queries", help="parquet of query vectors (search)")
    p.add_argument("--id-col", default="vec_id")
    p.add_argument("--vec-col", default="embedding")
    p.add_argument("--n-lists", type=int, default=16)
    p.add_argument("--n-probe", type=int, default=4)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--num-cpus", type=int)
    p.set_defaults(fn=cmd_ann)

    p = sub.add_parser(
        "report",
        help="streaming corpus statistics: docs/words/chars, language "
        "mix, approximate exact-dup rate (HLL) — one pass, no shuffle",
    )
    p.add_argument("--input", required=True)
    p.add_argument(
        "--format",
        choices=["parquet", "jsonl", "csv", "orc", "text-tree"],
        help="input format (default: inferred from the path)",
    )
    p.add_argument(
        "--text-key",
        default="content",
        help="jsonl/csv column holding the document text",
    )
    p.add_argument("--extensions")
    p.add_argument(
        "--on-decode-error", choices=["raise", "skip"], default="raise"
    )
    p.add_argument("--num-cpus", type=int)
    p.set_defaults(fn=cmd_report)

    p = sub.add_parser("deidentify", help="one document -> annotations JSON")
    p.add_argument("--text", help="document text (default: stdin)")
    p.add_argument("--enabled")
    p.add_argument("--disabled")
    p.add_argument("--patient-first-names")
    p.add_argument("--patient-initials")
    p.add_argument("--patient-surname")
    p.add_argument("--lookup-data-path")
    p.set_defaults(fn=cmd_deidentify)

    p = sub.add_parser("compile-lexicon", help="build + cache the lexicon")
    p.add_argument("--lookup-data-path")
    p.add_argument("--cache-dir")
    p.add_argument("--force", action="store_true")
    p.set_defaults(fn=cmd_compile_lexicon)

    args = parser.parse_args()
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
