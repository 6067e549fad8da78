"""Gopher-style repetition signals (textstats.repetition_batch).
Semantics under test: non-empty-line duplicate fractions, n-gram mass
fractions (top-2-gram, duplicated-5-gram), the integer floor-division
ppm contract, zero-evidence rows, and full DuckDB parity against
oracles.repetition_sql on both testdata and an adversarial corpus."""

from __future__ import annotations

import os
import sys

import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deduce_ray.ops.textstats import repetition_batch

SF_DIR = os.environ.get("GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")


def _rows(texts):
    ds = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts, 1)]
    )
    out = ds.map_batches(repetition_batch, batch_format="pyarrow").take_all()
    return {r["doc_id"]: r for r in out}


class TestHandComputed:
    def test_duplicate_lines(self, ray_session):
        r = _rows(["x\ny\nx\n\nz"])[1]
        # lines [x, y, x, z] (empty segment dropped): one beyond-first
        # occurrence out of 4 lines, 1 of 4 line chars
        assert r["n_lines"] == 4
        assert r["dup_line_ppm"] == 250_000
        assert r["dup_line_char_ppm"] == 250_000
        # 2-grams "x y" / "y x" / "x z" each mass 3 -> top 3 of total 9
        assert r["top_2gram_ppm"] == 333_333
        assert r["dup_5gram_ppm"] == 0  # < 5 words

    def test_fully_repetitive(self, ray_session):
        r = _rows(["a a a a a a"])[1]
        assert r["n_lines"] == 1
        assert r["dup_line_ppm"] == 0  # a single line never duplicates
        assert r["top_2gram_ppm"] == 1_000_000  # "a a" is every 2-gram
        assert r["dup_5gram_ppm"] == 1_000_000  # "a a a a a" occurs twice

    def test_zero_evidence_rows(self, ray_session):
        rows = _rows(["", None, "one"])
        for i in (1, 2, 3):
            r = rows[i]
            assert r["dup_line_ppm"] == 0
            assert r["dup_line_char_ppm"] == 0
            assert r["top_2gram_ppm"] == 0
            assert r["dup_5gram_ppm"] == 0
        assert rows[3]["n_lines"] == 1  # "one" is a real line

    def test_no_dup_grams(self, ray_session):
        # all-distinct words: no 5-gram repeats, top 2-gram is whichever
        # single occurrence is longest
        r = _rows(["alpha beta gamma delta epsilon zeta"])[1]
        assert r["dup_5gram_ppm"] == 0
        assert 0 < r["top_2gram_ppm"] < 1_000_000


class TestDuckDBParity:
    @staticmethod
    def _parity(ds, path_sql):
        import duckdb
        import pandas as pd

        from deduce_ray.oracles import repetition_sql

        got = (
            ds.map_batches(repetition_batch, batch_format="pyarrow")
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS {path_sql}")
        want = (
            con.execute(repetition_sql())
            .df()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert len(got) > 0
        pd.testing.assert_frame_equal(
            got,
            want[
                [
                    "doc_id",
                    "n_lines",
                    "dup_line_ppm",
                    "dup_line_char_ppm",
                    "top_2gram_ppm",
                    "dup_5gram_ppm",
                ]
            ],
            check_dtype=False,
        )

    def test_matches_duckdb_on_testdata(self, ray_session):
        path = f"{SF_DIR}/documents.parquet"
        self._parity(
            ray.data.read_parquet(path, columns=["doc_id", "text"]),
            f"SELECT doc_id, text FROM read_parquet('{path}')",
        )

    def test_matches_duckdb_adversarial(self, ray_session, tmp_path):
        # boilerplate-heavy, newline-odd, unicode, and null docs
        import pyarrow as pa
        import pyarrow.parquet as pq

        texts = [
            "header line\nbody one\nheader line\nbody two\nheader line",
            "\n\n\nx\n\n\nx\n",
            "tab\tseparated words tab\tseparated words tab\tseparated",
            "a a a a a a a a a a a a",
            "une ligne accentuée\nune ligne accentuée\n一二三 一二三",
            None,
            "",
            "solo",
            ("lorem ipsum dolor sit amet " * 8).strip(),
        ]
        path = str(tmp_path / "docs.parquet")
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(
                        range(1, len(texts) + 1), type=pa.int64()
                    ),
                    "text": pa.array(texts, type=pa.string()),
                }
            ),
            path,
        )
        self._parity(
            ray.data.read_parquet(path),
            f"SELECT doc_id, text FROM read_parquet('{path}')",
        )
