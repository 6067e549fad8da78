"""TF-IDF vectorization (deduce_ray/ops/vectorize.py).
Semantics under test: df/N via the sentinel-row exchange, (df DESC,
term ASC) vocabulary order, smoothed idf, per-doc L2 normalization,
no-vocab-term docs absent, dense/long equivalence, and DuckDB parity."""

from __future__ import annotations

import math
import os
import sys

import pytest
import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deduce_ray.ops.vectorize import (
    build_tfidf_vocab,
    tfidf_dense,
    tfidf_terms,
)

SF_DIR = os.environ.get("GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")


def _docs(rows):
    return ray.data.from_items([{"doc_id": i, "text": t} for i, t in rows])


class TestVocab:
    def test_df_order_and_n(self, ray_session):
        ds = _docs(
            [
                (1, "a b b"),  # df: a+1 b+1
                (2, "a c"),  # a+1 c+1
                (3, "a"),  # a+1
                (4, None),  # counts toward N only
            ]
        )
        vocab = build_tfidf_vocab(ds, vocab_size=2)
        assert vocab["n_docs"] == 4
        # df: a=3, b=1, c=1 -> top-2 = a then b (term ASC tie-break)
        assert list(vocab["terms"]) == ["a", "b"]
        assert vocab["terms"]["a"][0] == 0 and vocab["terms"]["b"][0] == 1
        assert vocab["terms"]["a"][1] == pytest.approx(
            math.log(5 / 4) + 1.0
        )
        assert vocab["terms"]["b"][1] == pytest.approx(
            math.log(5 / 2) + 1.0
        )

    def test_bad_vocab_size(self, ray_session):
        with pytest.raises(ValueError, match="vocab_size"):
            build_tfidf_vocab(_docs([(1, "a")]), vocab_size=0)


class TestWeights:
    def test_hand_computed(self, ray_session):
        ds = _docs([(1, "a b b"), (2, "a c"), (3, "a"), (4, None)])
        rows = sorted(
            (r["doc_id"], r["term"], r["weight"])
            for r in tfidf_terms(ds, vocab_size=2).take_all()
        )
        idf_a = math.log(5 / 4) + 1.0
        idf_b = math.log(5 / 2) + 1.0
        n1 = math.hypot(idf_a, 2 * idf_b)
        expect = [
            (1, "a", round(idf_a / n1, 6)),
            (1, "b", round(2 * idf_b / n1, 6)),
            (2, "a", 1.0),  # only vocab term -> unit weight
            (3, "a", 1.0),
            # doc 4: no vocab terms -> absent
        ]
        assert rows == expect

    def test_dense_matches_long(self, ray_session):
        ds = _docs([(1, "x y x z"), (2, "y q"), (3, "zz")])
        vocab = build_tfidf_vocab(ds, vocab_size=3)
        import ray as _ray

        ref = _ray.put(vocab)
        long = {
            (r["doc_id"], r["term"]): r["weight"]
            for r in tfidf_terms(ds, vocab=ref).take_all()
        }
        for r in tfidf_dense(ds, vocab=ref).take_all():
            vec = r["embedding"]
            assert len(vec) == len(vocab["terms"])
            for term, (idx, _idf) in vocab["terms"].items():
                want = long.get((r["doc_id"], term), 0.0)
                assert vec[idx] == pytest.approx(want, abs=2e-6)
        assert set(r["doc_id"] for r in tfidf_dense(ds, vocab=ref).take_all()) == set(
            d for d, _ in long
        )


class TestAnnBridge:
    def test_dense_vectors_feed_ann_topk(self, ray_session):
        # the advertised bridge: text -> tfidf_dense -> the ANN ops,
        # using the embeddings-table column names.  Querying with doc
        # 1's own vector must rank doc 1 first (cosine 1.0) and the
        # vocabulary-overlapping doc 2 above the disjoint doc 3.
        import numpy as np

        from deduce_ray.ops.similarity import brute_force_topk

        ds = _docs(
            [
                (1, "apple banana cherry apple"),
                (2, "apple banana plum"),
                (3, "qq rr ss tt"),
            ]
        )
        dense = tfidf_dense(
            ds, vocab_size=8
        ).map_batches(  # ANN ops use the embeddings-table column names
            lambda b: b.rename_columns(
                ["vec_id" if c == "doc_id" else c for c in b.column_names]
            ),
            batch_format="pyarrow",
        )
        rows = {r["vec_id"]: r["embedding"] for r in dense.take_all()}
        assert set(rows) == {1, 2, 3}
        out = sorted(
            (r["rank"], r["vec_id"], r["score"])
            for r in brute_force_topk(
                dense, np.array([rows[1]]), k=3
            ).take_all()
        )
        assert [v for _, v, _ in out] == [1, 2, 3]
        assert out[0][2] == pytest.approx(1.0)
        assert out[2][2] == pytest.approx(0.0)  # disjoint vocabulary


class TestDuckDBParity:
    def test_matches_duckdb_on_testdata(self, ray_session):
        import duckdb
        import pandas as pd

        from deduce_ray.oracles import tfidf_sql

        path = f"{SF_DIR}/documents.parquet"
        ds = ray.data.read_parquet(path, columns=["doc_id", "text"])
        got = (
            tfidf_terms(ds, vocab_size=64)
            .to_pandas()
            .sort_values(["doc_id", "term"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS "
            f"SELECT doc_id, text FROM read_parquet('{path}')"
        )
        want = (
            con.execute(tfidf_sql(vocab_size=64))
            .df()
            .sort_values(["doc_id", "term"])
            .reset_index(drop=True)
        )
        assert len(got) > 0
        pd.testing.assert_frame_equal(
            got, want[["doc_id", "term", "weight"]], check_dtype=False
        )
