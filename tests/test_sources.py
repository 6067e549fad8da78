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
        rows = _rows(ds) if "path" in ds.schema().names else ds.take_all()
        assert sorted(r["repo"] for r in rows) == sorted(d["repo"] for d in DOCS)
        assert sorted(r["content"] for r in rows) == sorted(
            d["content"] for d in DOCS
        )

    def test_no_content_column_raises(self, ray_session, tmp_path):
        f = tmp_path / "nocontent.jsonl"
        f.write_text(json.dumps({"repo": "org/x"}) + "\n")
        with pytest.raises(Exception, match="content"):
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
