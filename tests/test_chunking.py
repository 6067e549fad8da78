"""Training-window chunking + packing (deduce_ray/ops/chunking.py).
Semantics under test: word windows per the module word class, stride
overlap, exactly-once partial tails, per-block greedy packing with
deterministic pack ids and no silent drops."""

from __future__ import annotations

import os
import sys

import pytest
import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deduce_ray.ops.chunking import chunk_documents, pack_chunks


def _docs(rows):
    return ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in rows]
    )


class TestChunkDocuments:
    def test_disjoint_windows_with_partial_tail(self, ray_session):
        text = " ".join(f"w{i}" for i in range(10))
        out = sorted(
            chunk_documents(_docs([(1, text)]), window=4).take_all(),
            key=lambda r: r["chunk_id"],
        )
        assert [(r["chunk_id"], r["text"], r["n_words"]) for r in out] == [
            (0, "w0 w1 w2 w3", 4),
            (1, "w4 w5 w6 w7", 4),
            (2, "w8 w9", 2),
        ]

    def test_exact_multiple_has_no_empty_tail(self, ray_session):
        text = " ".join(f"w{i}" for i in range(8))
        out = chunk_documents(_docs([(1, text)]), window=4).take_all()
        assert sorted(r["chunk_id"] for r in out) == [0, 1]
        assert all(r["n_words"] == 4 for r in out)

    def test_overlapping_stride(self, ray_session):
        text = " ".join(f"w{i}" for i in range(6))
        out = sorted(
            chunk_documents(
                _docs([(1, text)]), window=4, stride=2
            ).take_all(),
            key=lambda r: r["chunk_id"],
        )
        # starts 0, 2; the window starting at 2 reaches the end -> stop
        assert [r["text"] for r in out] == [
            "w0 w1 w2 w3",
            "w2 w3 w4 w5",
        ]

    def test_short_null_and_empty_docs(self, ray_session):
        out = chunk_documents(
            _docs([(1, "one two"), (2, None), (3, ""), (4, "   ")]),
            window=5,
        ).take_all()
        assert [(r["doc_id"], r["text"], r["n_words"]) for r in out] == [
            (1, "one two", 2)
        ]

    def test_whitespace_normalization_matches_word_class(self, ray_session):
        # tabs/newlines/multiple spaces separate words; text is rejoined
        # with single spaces (the substring-dedup rewrite convention)
        out = chunk_documents(
            _docs([(1, "a\t\tb\n c   d")]), window=10
        ).take_all()
        assert out[0]["text"] == "a b c d"

    def test_matches_duckdb(self, ray_session):
        """Window semantics reproduced independently in SQL: starts at
        0, stride, ...; emission stops with the first window reaching
        the document end (oracle-minded parity for the library op)."""
        import duckdb
        import pandas as pd

        docs = [
            (1, " ".join(f"a{i}" for i in range(11))),
            (2, " ".join(f"b{i}" for i in range(4))),
            (3, None),
            (4, "solo"),
        ]
        window, stride = 4, 3
        got = (
            chunk_documents(_docs(docs), window=window, stride=stride)
            .to_pandas()
            .sort_values(["doc_id", "chunk_id"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        df = pd.DataFrame(docs, columns=["doc_id", "text"])
        con.register("documents", df)
        want = con.execute(f"""
            WITH w AS (
              SELECT doc_id,
                     regexp_extract_all(coalesce(text, ''),
                                        '[^ \t\n\r\f\x0b]+') AS ws
              FROM documents
            ),
            starts AS (
              SELECT doc_id, ws, (i - 1) * {stride} AS s,
                     row_number() OVER (PARTITION BY doc_id ORDER BY i) - 1
                       AS chunk_id
              FROM w, UNNEST(generate_series(
                     1, greatest(len(ws) - 1, 0) // {stride} + 1)) AS t(i)
              WHERE len(ws) > 0 AND ((i - 1) = 0
                    OR (i - 2) * {stride} + {window} < len(ws))
            )
            SELECT doc_id, chunk_id,
                   array_to_string(ws[s + 1 : s + {window}], ' ') AS text,
                   CAST(least({window}, len(ws) - s) AS BIGINT) AS n_words
            FROM starts
            ORDER BY doc_id, chunk_id
        """).df().reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got.astype({"doc_id": "int64", "chunk_id": "int64",
                        "n_words": "int64"}),
            want.astype({"doc_id": "int64", "chunk_id": "int64",
                         "n_words": "int64"}),
        )

    def test_validation(self, ray_session):
        with pytest.raises(ValueError):
            chunk_documents(_docs([(1, "x")]), window=0)
        with pytest.raises(ValueError):
            chunk_documents(_docs([(1, "x")]), window=4, stride=0)
        # stride beyond the window would silently drop words between
        # windows (sampling, not chunking) — rejected up front
        with pytest.raises(ValueError):
            chunk_documents(_docs([(1, "x")]), window=4, stride=5)

    def test_string_doc_ids_pass_through(self, ray_session):
        """doc_id keeps the input column type: string-keyed corpora
        chunk and pack without an int64 cast crash, and pack ids stay
        unambiguous for ids containing the key separators."""
        ds = ray.data.from_items(
            [
                {"doc_id": "doc:a,1", "text": "one two three four five"},
                {"doc_id": "doc:b", "text": "six seven"},
            ]
        )
        chunks = chunk_documents(ds, window=3)
        rows = sorted(
            chunks.take_all(), key=lambda r: (r["doc_id"], r["chunk_id"])
        )
        assert [r["doc_id"] for r in rows] == ["doc:a,1", "doc:a,1", "doc:b"]
        packs = pack_chunks(chunks, max_words=5).take_all()
        assert sum(r["n_words"] for r in packs) == 7
        assert all(
            isinstance(d, str) for r in packs for d in r["doc_ids"]
        )


class TestPackChunks:
    def _chunks(self, rows):
        # rows: (doc_id, chunk_id, n_words)
        return ray.data.from_items(
            [
                {
                    "doc_id": d,
                    "chunk_id": c,
                    "text": " ".join(["w"] * n),
                    "n_words": n,
                }
                for d, c, n in rows
            ]
        )

    def test_greedy_budget_and_no_drops(self, ray_session):
        rows = [(1, 0, 3), (1, 1, 3), (2, 0, 3), (3, 0, 2)]
        out = pack_chunks(self._chunks(rows), max_words=6).take_all()
        # 3+3 fills the first pack exactly; 3+2 fits the second
        packed = sorted(
            [sorted(zip(r["doc_ids"], r["chunk_ids"])) for r in out]
        )
        assert packed == [[(1, 0), (1, 1)], [(2, 0), (3, 0)]]
        assert all(r["n_words"] <= 6 for r in out)
        total = sum(r["n_words"] for r in out)
        assert total == sum(n for _, _, n in rows)  # nothing dropped

    def test_oversize_chunk_gets_own_pack(self, ray_session):
        rows = [(1, 0, 2), (2, 0, 50), (3, 0, 2)]
        out = pack_chunks(self._chunks(rows), max_words=10).take_all()
        sizes = sorted(r["n_words"] for r in out)
        assert 50 in sizes  # kept whole, never truncated or dropped
        assert sum(sizes) == 54

    def test_pack_id_deterministic_across_runs(self, ray_session):
        rows = [(7, 0, 4), (7, 1, 4), (8, 0, 4)]
        a = {r["pack_id"] for r in pack_chunks(self._chunks(rows), max_words=8).take_all()}
        b = {r["pack_id"] for r in pack_chunks(self._chunks(rows), max_words=8).take_all()}
        assert a == b and len(a) == 2

    def test_separator_join(self, ray_session):
        rows = [(1, 0, 1), (2, 0, 1)]
        out = pack_chunks(
            self._chunks(rows), max_words=4, separator=" | "
        ).take_all()
        assert out[0]["text"] == "w | w"

    def test_chunk_then_pack_end_to_end(self, ray_session):
        docs = _docs(
            [(i, " ".join(f"t{i}_{j}" for j in range(13))) for i in range(20)]
        )
        chunks = chunk_documents(docs, window=5)
        packs = pack_chunks(chunks, max_words=12).take_all()
        assert all(r["n_words"] <= 12 for r in packs)
        # every chunk word survives into exactly one pack
        total_words = sum(r["n_words"] for r in packs)
        assert total_words == 20 * 13
