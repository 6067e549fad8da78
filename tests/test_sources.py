"""Non-parquet corpus sources: JSONL, CSV, text trees (deduce_ray.sources).

Each reader must emit the exact repo-table schema from BASELINE.json's
input_hint and preserve document content byte-for-byte (the sha256
invariant every pipeline run is graded on)."""

import hashlib
import json

import pyarrow as pa
import pytest

from deduce_ray.sources import (
    REPO_SCHEMA_NAMES,
    read_csv_corpus,
    read_jsonl_corpus,
    read_text_tree_corpus,
    write_triples_jsonl,
)

DOCS = [
    {
        "repo": "org/alpha",
        "path": "notes/a.txt",
        "commit": "c" * 40,
        "lang": "nl",
        "content": "Patient Jan Jansen, bsn 111222333.",
    },
    {
        "repo": "org/beta",
        "path": "notes/b.txt",
        "commit": "d" * 40,
        "lang": "nl",
        "content": "Opname op 14-03-2021 in het UMCU.",
    },
    {
        "repo": "org/alpha",
        "path": "notes/c.txt",
        "commit": "e" * 40,
        "lang": "nl",
        "content": "Contact via m.vdberg@ziekenhuis.nl graag.",
    },
]


def _rows(ds):
    rows = ds.take_all()
    return sorted(rows, key=lambda r: r["path"])


def _assert_repo_shape(ds):
    assert set(ds.schema().names) == set(REPO_SCHEMA_NAMES)


class TestJsonl:
    def test_roundtrip(self, ray_session, tmp_path):
        f = tmp_path / "docs.jsonl"
        f.write_text("\n".join(json.dumps(d) for d in DOCS) + "\n")
        ds = read_jsonl_corpus(f)
        _assert_repo_shape(ds)
        rows = _rows(ds)
        assert len(rows) == len(DOCS)
        for row, doc in zip(rows, sorted(DOCS, key=lambda d: d["path"])):
            assert row == doc
            # content sha256 invariant survives ingestion
            assert (
                hashlib.sha256(row["content"].encode()).hexdigest()
                == hashlib.sha256(doc["content"].encode()).hexdigest()
            )

    def test_gzip_single_file_inferred(self, ray_session, tmp_path):
        import gzip

        f = tmp_path / "docs.jsonl.gz"
        raw = ("\n".join(json.dumps(d) for d in DOCS) + "\n").encode()
        f.write_bytes(gzip.compress(raw))
        ds = read_jsonl_corpus(f)  # compression inferred from .gz
        _assert_repo_shape(ds)
        assert _rows(ds) == sorted(DOCS, key=lambda d: d["path"])

    def test_gzip_directory_of_shards(self, ray_session, tmp_path):
        import gzip

        d = tmp_path / "gz_shards"
        d.mkdir()
        for i, doc in enumerate(DOCS):
            (d / f"part-{i}.jsonl.gz").write_bytes(
                gzip.compress((json.dumps(doc) + "\n").encode())
            )
        # directory: per-file detect inside the streaming read tasks
        ds = read_jsonl_corpus(d)
        _assert_repo_shape(ds)
        assert _rows(ds) == sorted(DOCS, key=lambda d_: d_["path"])

    def test_gzip_ndjson_directory(self, ray_session, tmp_path):
        # Ray's read_json default file_extensions excludes *.ndjson.gz —
        # the readers pass an explicit list so these shards are not
        # silently filtered into "No input files found"
        import gzip

        d = tmp_path / "ndjson_gz"
        d.mkdir()
        for i, doc in enumerate(DOCS):
            (d / f"part-{i}.ndjson.gz").write_bytes(
                gzip.compress((json.dumps(doc) + "\n").encode())
            )
        ds = read_jsonl_corpus(d)
        assert _rows(ds) == sorted(DOCS, key=lambda d_: d_["path"])

    def test_zstd_single_file_inferred(self, ray_session, tmp_path):
        f = tmp_path / "docs.jsonl.zst"
        raw = ("\n".join(json.dumps(d) for d in DOCS) + "\n").encode()
        buf = pa.BufferOutputStream()
        with pa.CompressedOutputStream(buf, "zstd") as out:
            out.write(raw)
        f.write_bytes(buf.getvalue().to_pybytes())
        ds = read_jsonl_corpus(f)
        assert _rows(ds) == sorted(DOCS, key=lambda d: d["path"])

    def test_gzip_explicit_codec_without_suffix(self, ray_session, tmp_path):
        import gzip

        f = tmp_path / "docs.jsonl"  # no .gz suffix: detect would fail
        raw = ("\n".join(json.dumps(d) for d in DOCS) + "\n").encode()
        f.write_bytes(gzip.compress(raw))
        ds = read_jsonl_corpus(f, compression="gzip")
        assert _rows(ds) == sorted(DOCS, key=lambda d: d["path"])

    def test_missing_columns_filled_empty(self, ray_session, tmp_path):
        f = tmp_path / "bare.jsonl"
        f.write_text(
            "\n".join(json.dumps({"content": d["content"]}) for d in DOCS) + "\n"
        )
        ds = read_jsonl_corpus(f)
        rows = ds.take_all()
        assert len(rows) == len(DOCS)
        for row in rows:
            assert row["repo"] == "" and row["commit"] == "" and row["lang"] == ""

    def test_custom_column_map(self, ray_session, tmp_path):
        f = tmp_path / "renamed.jsonl"
        f.write_text(
            "\n".join(
                json.dumps({"project": d["repo"], "text": d["content"]})
                for d in DOCS
            )
            + "\n"
        )
        ds = read_jsonl_corpus(
            f, column_map={"project": "repo", "text": "content"}
        )
        rows = ds.take_all()
        assert sorted(r["repo"] for r in rows) == sorted(d["repo"] for d in DOCS)
        assert sorted(r["content"] for r in rows) == sorted(
            d["content"] for d in DOCS
        )

    def test_no_content_column_raises(self, ray_session, tmp_path):
        f = tmp_path / "nocontent.jsonl"
        f.write_text(json.dumps({"repo": "org/x"}) + "\n")
        with pytest.raises(Exception, match="content"):
            read_jsonl_corpus(f).materialize()

    def test_row_level_null_metadata_filled(self, ray_session, tmp_path):
        # a line missing one key yields a ROW-level null in a present
        # column — must become "" like the fully-absent-column case
        f = tmp_path / "mixed.jsonl"
        f.write_text(
            json.dumps({"content": "a", "repo": "org/x"})
            + "\n"
            + json.dumps({"content": "b"})
            + "\n"
        )
        rows = sorted(read_jsonl_corpus(f).take_all(), key=lambda r: r["content"])
        assert rows[0]["repo"] == "org/x" and rows[1]["repo"] == ""

    def test_null_content_raises(self, ray_session, tmp_path):
        f = tmp_path / "nullcontent.jsonl"
        f.write_text(
            json.dumps({"content": "ok"}) + "\n" + json.dumps({"content": None}) + "\n"
        )
        with pytest.raises(Exception, match="null content"):
            read_jsonl_corpus(f).materialize()

    def test_feeds_annotate(self, ray_session, tmp_path):
        from deduce_ray.rayops.annotate import extract_triples

        f = tmp_path / "docs.jsonl"
        f.write_text("\n".join(json.dumps(d) for d in DOCS) + "\n")
        triples = extract_triples(read_jsonl_corpus(f)).take_all()
        preds = {t["pred"] for t in triples}
        # the three snippets carry a bsn, a date+hospital, and an email
        assert "bsn" in preds and "datum" in preds and "emailadres" in preds
        by_doc = {t["doc_id"] for t in triples}
        assert len(by_doc) == len(DOCS)


class TestCsv:
    def test_roundtrip(self, ray_session, tmp_path):
        import csv as _csv

        f = tmp_path / "docs.csv"
        with open(f, "w", newline="") as fh:
            w = _csv.DictWriter(fh, fieldnames=list(DOCS[0]))
            w.writeheader()
            for d in DOCS:
                w.writerow(d)
        ds = read_csv_corpus(f)
        _assert_repo_shape(ds)
        rows = _rows(ds)
        assert rows == sorted(DOCS, key=lambda d: d["path"])

    def test_gzip_csv_inferred(self, ray_session, tmp_path):
        import csv as _csv
        import gzip
        import io

        buf = io.StringIO()
        w = _csv.DictWriter(buf, fieldnames=list(DOCS[0]))
        w.writeheader()
        for d in DOCS:
            w.writerow(d)
        f = tmp_path / "docs.csv.gz"
        f.write_bytes(gzip.compress(buf.getvalue().encode()))
        ds = read_csv_corpus(f)
        _assert_repo_shape(ds)
        assert _rows(ds) == sorted(DOCS, key=lambda d: d["path"])

    def test_numeric_looking_values_not_rewritten(self, ray_session, tmp_path):
        # type inference would parse "1.50" as double (rendered "1.5") and
        # "0123456" as int (leading zero lost) — both must survive
        # byte-for-byte or sha256(content) doc_ids silently change
        f = tmp_path / "nums.csv"
        f.write_text(
            "content,commit,path\n"
            '"1.50",0123456,a\n'
            '"2021-03-14",00ff,b\n'
        )
        rows = sorted(read_csv_corpus(f).take_all(), key=lambda r: r["path"])
        assert rows[0]["content"] == "1.50"
        assert rows[0]["commit"] == "0123456"
        assert rows[1]["content"] == "2021-03-14"


class TestJsonlTypes:
    def test_datelike_content_not_rewritten(self, ray_session, tmp_path):
        # pyarrow json inference turns ISO-date strings into timestamps
        # ("2021-03-14" -> "2021-03-14 00:00:00") — explicit string schema
        # must preserve the source bytes
        f = tmp_path / "dates.jsonl"
        f.write_text(
            json.dumps({"content": "2021-03-14", "path": "a"})
            + "\n"
            + json.dumps({"content": "123", "path": "b"})
            + "\n"
        )
        rows = sorted(read_jsonl_corpus(f).take_all(), key=lambda r: r["path"])
        assert rows[0]["content"] == "2021-03-14"
        assert rows[1]["content"] == "123"

    def test_directory_of_shards(self, ray_session, tmp_path):
        # the natural sharded-corpus layout: part-*.jsonl under one dir
        d = tmp_path / "shards"
        d.mkdir()
        for i, doc in enumerate(DOCS):
            (d / f"part-{i:04d}.jsonl").write_text(json.dumps(doc) + "\n")
        rows = _rows(read_jsonl_corpus(d))
        assert rows == sorted(DOCS, key=lambda x: x["path"])


class TestOrc:
    def test_single_file_roundtrip(self, ray_session, tmp_path):
        import pyarrow.orc as orc

        from deduce_ray.sources import read_orc_corpus

        f = tmp_path / "docs.orc"
        orc.write_table(
            pa.table({k: pa.array([d[k] for d in DOCS]) for k in DOCS[0]}), f
        )
        ds = read_orc_corpus(f)
        _assert_repo_shape(ds)
        assert _rows(ds) == sorted(DOCS, key=lambda d: d["path"])

    def test_directory_of_orc_files(self, ray_session, tmp_path):
        import pyarrow.orc as orc

        from deduce_ray.sources import read_orc_corpus

        d = tmp_path / "orcdir"
        d.mkdir()
        for i, doc in enumerate(DOCS):
            orc.write_table(
                pa.table({k: pa.array([doc[k]]) for k in doc}),
                d / f"part-{i:04d}.orc",
            )
        rows = _rows(read_orc_corpus(d))
        assert rows == sorted(DOCS, key=lambda x: x["path"])

    def test_typed_columns_cast_to_string(self, ray_session, tmp_path):
        import pyarrow.orc as orc

        from deduce_ray.sources import read_orc_corpus

        f = tmp_path / "typed.orc"
        orc.write_table(
            pa.table(
                {
                    "content": pa.array(["a", "b"]),
                    "commit": pa.array([1, 2], type=pa.int64()),
                }
            ),
            f,
        )
        rows = sorted(read_orc_corpus(f).take_all(), key=lambda r: r["content"])
        assert [r["commit"] for r in rows] == ["1", "2"]


class TestTextTree:
    def test_tree_layout(self, ray_session, tmp_path):
        root = tmp_path / "corpus"
        for d in DOCS:
            p = root / d["repo"].replace("org/", "org__") / d["path"]
            p.parent.mkdir(parents=True, exist_ok=True)
            p.write_text(d["content"])
        ds = read_text_tree_corpus(root, lang="nl")
        _assert_repo_shape(ds)
        rows = _rows(ds)
        assert len(rows) == len(DOCS)
        assert {r["repo"] for r in rows} == {"org__alpha", "org__beta"}
        assert sorted(r["content"] for r in rows) == sorted(
            d["content"] for d in DOCS
        )
        assert all(r["commit"] == "" and r["lang"] == "nl" for r in rows)
        # path is relative to the repo directory
        assert {r["path"] for r in rows} == {d["path"] for d in DOCS}

    def test_relative_and_symlinked_root(self, ray_session, tmp_path, monkeypatch):
        # Ray returns normalized absolute paths; a relative or symlinked
        # root must still attribute repo/path correctly
        root = tmp_path / "corpus"
        p = root / "org__alpha" / "notes" / "a.txt"
        p.parent.mkdir(parents=True)
        p.write_text("x")
        link = tmp_path / "link-to-corpus"
        link.symlink_to(root)
        for entry in (link, root):
            rows = read_text_tree_corpus(entry).take_all()
            assert len(rows) == 1
            assert rows[0]["repo"] == "org__alpha"
            assert rows[0]["path"] == "notes/a.txt"
        monkeypatch.chdir(tmp_path)
        rows = read_text_tree_corpus("corpus").take_all()
        assert rows[0]["repo"] == "org__alpha" and rows[0]["path"] == "notes/a.txt"

    def test_hidden_and_binary_handling(self, ray_session, tmp_path):
        root = tmp_path / "checkout"
        (root / "org__x" / ".git").mkdir(parents=True)
        (root / "org__x" / ".git" / "blob").write_bytes(b"\xff\xfe\x00\x80")
        (root / "org__x" / "readme.txt").write_text("hello")
        (root / "org__x" / "data.bin").write_bytes(b"\x80\x81\x82\xff")
        # default skip_hidden drops .git; the non-hidden binary raises...
        with pytest.raises(Exception):
            read_text_tree_corpus(root).materialize()
        # ...unless on_decode_error="skip" counts-and-drops it
        rows = read_text_tree_corpus(root, on_decode_error="skip").take_all()
        assert [(r["repo"], r["path"], r["content"]) for r in rows] == [
            ("org__x", "readme.txt", "hello")
        ]
        # extension filter prunes at discovery time (binary never read)
        rows = read_text_tree_corpus(root, extensions=["txt"]).take_all()
        assert [r["path"] for r in rows] == ["readme.txt"]

    def test_symlinked_file_inside_tree_keeps_attribution(
        self, ray_session, tmp_path
    ):
        # a symlinked ENTRY inside the tree must keep its in-tree repo and
        # path — resolving reported paths would rewrite it to the target
        # outside the root
        outside = tmp_path / "shared" / "real.txt"
        outside.parent.mkdir(parents=True)
        outside.write_text("shared doc")
        root = tmp_path / "corpus2"
        d = root / "org__beta" / "notes"
        d.mkdir(parents=True)
        (d / "linked.txt").symlink_to(outside)
        rows = read_text_tree_corpus(root).take_all()
        assert len(rows) == 1
        assert rows[0]["repo"] == "org__beta"
        assert rows[0]["path"] == "notes/linked.txt"
        assert rows[0]["content"] == "shared doc"


class TestRepoBatchProperties:
    """Property tests over the pure column mapper (no Ray needed)."""

    def test_arbitrary_content_preserved(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from deduce_ray.sources import _default_column_map, _to_repo_batch

        cmap = _default_column_map("content")

        @settings(max_examples=150, deadline=None)
        @given(
            st.lists(
                st.text(min_size=1).filter(lambda s: "\x00" not in s),
                min_size=1,
                max_size=8,
            )
        )
        def check(contents):
            batch = pa.table({"content": pa.array(contents, type=pa.string())})
            out = _to_repo_batch(batch, cmap)
            assert out.schema.names == REPO_SCHEMA_NAMES
            assert out.column("content").to_pylist() == contents
            for c in ("repo", "path", "commit", "lang"):
                assert out.column(c).to_pylist() == [""] * len(contents)

        check()

    def test_tricky_content_roundtrips_through_jsonl(self, ray_session, tmp_path):
        # newlines, quotes, unicode, backslashes — everything json.dumps
        # escapes must come back byte-identical through the real reader
        tricky = [
            'line1\nline2\t"quoted" \\backslash\\',
            "unicode: Ĳsselmeer 患者 émile ß €",
            " leading and trailing  ",
            "{}[],:",
        ]
        f = tmp_path / "tricky.jsonl"
        f.write_text(
            "\n".join(json.dumps({"content": c}) for c in tricky) + "\n"
        )
        rows = read_jsonl_corpus(f).take_all()
        assert sorted(r["content"] for r in rows) == sorted(tricky)


class TestParquetSliced:
    def _write(self, path, n_rows=2000, row_group_size=None, text="t"):
        import pyarrow.parquet as pq

        tbl = pa.table(
            {
                "doc_id": pa.array(range(n_rows), type=pa.int64()),
                "text": pa.array([f"{text}{i}" for i in range(n_rows)]),
            }
        )
        pq.write_table(tbl, path, row_group_size=row_group_size or n_rows)
        return tbl

    def test_single_file_is_pre_sliced(self, ray_session, tmp_path):
        from deduce_ray.corpus import read_parquet_sliced

        f = tmp_path / "one.parquet"
        tbl = self._write(f)
        ds = read_parquet_sliced(f, columns=["doc_id"])
        # more than one block despite a single input file, column pruned
        assert ds.num_blocks() > 1
        assert ds.schema().names == ["doc_id"]
        assert ds.count() == tbl.num_rows

    def test_multi_row_group_streams(self, ray_session, tmp_path):
        from deduce_ray.corpus import read_parquet_sliced

        f = tmp_path / "multi.parquet"
        tbl = self._write(f, row_group_size=500)
        ds = read_parquet_sliced(f)
        assert ds.count() == tbl.num_rows  # falls back, still correct

    def test_uncompressed_cap_falls_back_to_streaming(
        self, ray_session, tmp_path, monkeypatch
    ):
        # a file tiny on disk but huge decoded must NOT be driver-read
        from deduce_ray import corpus

        f = tmp_path / "dense.parquet"
        tbl = self._write(f, text="x" * 200)  # repetitive -> compresses well
        monkeypatch.setattr(corpus, "_DRIVER_SLICE_MAX_UNCOMPRESSED", 1024)
        ds = corpus.read_parquet_sliced(f)
        assert ds.count() == tbl.num_rows  # streaming path, still correct

    def test_row_cap_falls_back_to_streaming(
        self, ray_session, tmp_path, monkeypatch
    ):
        # dictionary decode blow-up is invisible to byte metadata; the row
        # cap is the backstop
        from deduce_ray import corpus

        f = tmp_path / "many.parquet"
        tbl = self._write(f, n_rows=1000)
        monkeypatch.setattr(corpus, "_DRIVER_SLICE_MAX_ROWS", 100)
        assert corpus.read_parquet_sliced(f).count() == tbl.num_rows

    def test_uncompressed_cap_counts_only_requested_columns(
        self, ray_session, tmp_path, monkeypatch
    ):
        # a pruned read of a wide file must be sized on the pruned
        # columns, not the whole file — otherwise it silently demotes to
        # the one-block streaming path this function exists to fix
        import pyarrow.parquet as pq

        from deduce_ray import corpus

        n = 2000
        tbl = pa.table(
            {
                "doc_id": pa.array(range(n), type=pa.int64()),
                "fat": pa.array(["y" * 500 for _ in range(n)]),
            }
        )
        f = tmp_path / "wide.parquet"
        pq.write_table(tbl, f, row_group_size=n)
        # cap sits between the slim column (~16KB) and the fat one (~1MB)
        monkeypatch.setattr(corpus, "_DRIVER_SLICE_MAX_UNCOMPRESSED", 200_000)
        pruned = corpus.read_parquet_sliced(f, columns=["doc_id"])
        assert pruned.num_blocks() > 1  # pre-sliced fast path
        assert pruned.count() == n
        full = corpus.read_parquet_sliced(f)
        assert full.count() == n  # over cap -> streaming, still correct


class TestJsonlSink:
    def test_write_triples_jsonl(self, ray_session, tmp_path):
        import ray.data

        triples = ray.data.from_items(
            [
                {"doc_id": "a", "pred": "bsn", "obj": "111222333"},
                {"doc_id": "b", "pred": "datum", "obj": "14-03-2021"},
            ]
        )
        out = tmp_path / "triples_out"
        write_triples_jsonl(triples, out)
        back = []
        for f in out.glob("*.json"):
            back.extend(json.loads(line) for line in f.read_text().splitlines())
        assert sorted(back, key=lambda r: r["doc_id"]) == [
            {"doc_id": "a", "pred": "bsn", "obj": "111222333"},
            {"doc_id": "b", "pred": "datum", "obj": "14-03-2021"},
        ]


class TestReadCorpusDecoration:
    def test_prep_and_report_see_raw_bytes(self, ray_session, tmp_path):
        """Regression: prep/report previously routed a bare (doc_id,
        text, lang) parquet through the KG-demo repo-table synthesis,
        which appends a synthetic PHI snippet per doc — byte-identical
        texts became distinct (breaking dedup) and statistics described
        mutated text.  decorate=False must return the corpus bytes
        untouched; the default (extract path) still decorates."""
        import argparse

        import pyarrow as pa
        import pyarrow.parquet as pq

        import sys, os
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        from deduce_ray.__main__ import _corpus_text_col, _read_corpus

        f = tmp_path / "docs.parquet"
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([1, 2], type=pa.int64()),
                    "text": pa.array(["same text", "same text"]),
                    "lang": pa.array(["en", "en"]),
                }
            ),
            f,
        )
        args = argparse.Namespace(
            input=str(f), format=None, text_key="content",
            extensions=None, on_decode_error="raise",
        )
        raw = _read_corpus(args, decorate=False)
        assert _corpus_text_col(raw) == "text"
        texts = {r["text"] for r in raw.take_all()}
        assert texts == {"same text"}  # identical bytes stay identical

        decorated = _read_corpus(args)  # extract default
        rows = decorated.take_all()
        assert {"repo", "path", "commit", "content"} <= set(rows[0])
        # decoration appends per-doc snippets: contents now differ
        assert len({r["content"] for r in rows}) == 2
