"""Bigram LM perplexity scoring (deduce_ray/ops/lm.py).
Semantics under test: shared word class, add-one smoothing over
(pair count, left-context sum, exact vocabulary), docs with < 2 words
absent, min_count pruning, the bounded model broadcast, and full DuckDB
parity of the self-perplexity pipeline (the oracle-minded value check
for the library op)."""

from __future__ import annotations

import math
import os
import sys

import pytest
import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deduce_ray.ops.lm import (
    build_model,
    lm_perplexity,
    score_bigram_logprob,
    train_bigram_counts,
)

SF_DIR = os.environ.get("GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")


def _docs(rows):
    return ray.data.from_items([{"doc_id": i, "text": t} for i, t in rows])


def _rows(ds):
    return sorted(ds.take_all(), key=lambda r: r["doc_id"])


class TestBigramModel:
    def test_counts_and_model(self, ray_session):
        ds = _docs([(1, "a b a b"), (2, "a b"), (3, "c"), (4, None)])
        model = build_model(train_bigram_counts(ds))
        assert model["vocab"] == 3  # {a, b, c}
        assert model["bi"] == {("a", "b"): 3, ("b", "a"): 1}
        assert model["ctx"] == {"a": 3, "b": 1}

    def test_hand_computed_scores(self, ray_session):
        ds = _docs([(1, "a b a b"), (2, "a b"), (3, "c"), (4, None)])
        out = _rows(lm_perplexity(ds))
        assert [r["doc_id"] for r in out] == [1, 2]  # <2-word docs absent
        p_ab = math.log((3 + 1) / (3 + 3))  # P(b|a) = 2/3
        p_ba = math.log((1 + 1) / (1 + 3))  # P(a|b) = 1/2
        d1 = (2 * p_ab + p_ba) / 3
        assert out[0]["n_bigrams"] == 3
        assert out[0]["avg_logprob"] == pytest.approx(round(d1, 4), abs=0)
        assert out[0]["ppl"] == pytest.approx(round(math.exp(-d1), 2), abs=0)
        assert out[1]["n_bigrams"] == 1
        assert out[1]["avg_logprob"] == round(p_ab, 4)
        assert out[1]["ppl"] == 1.5  # exp(-ln(2/3)) exactly

    def test_unseen_pairs_hit_the_smoothing_floor(self, ray_session):
        train = _docs([(1, "a b a b")])
        model = build_model(train_bigram_counts(train))
        scored = _rows(
            score_bigram_logprob(_docs([(9, "x y x")]), model)
        )
        # every pair unseen, contexts unseen: P = (0+1)/(0+V), V = 2
        floor = math.log(1 / 2)
        assert scored[0]["avg_logprob"] == round(floor, 4)
        assert scored[0]["n_bigrams"] == 2

    def test_min_count_prunes_pairs_not_vocab(self, ray_session):
        ds = _docs([(1, "a b a b"), (2, "a c")])
        model = build_model(train_bigram_counts(ds, min_count=2))
        assert model["bi"] == {("a", "b"): 2}  # (b,a) and (a,c) pruned
        assert model["ctx"] == {"a": 2}
        assert model["vocab"] == 3  # pruning never shrinks V
        scored = _rows(score_bigram_logprob(_docs([(5, "b a")]), model))
        assert scored[0]["avg_logprob"] == round(math.log(1 / 3), 4)

    def test_model_broadcast_ref(self, ray_session):
        ds = _docs([(1, "a b a b"), (2, "a b")])
        model_ref = ray.put(build_model(train_bigram_counts(ds)))
        direct = _rows(score_bigram_logprob(ds, build_model(train_bigram_counts(ds))))
        via_ref = _rows(score_bigram_logprob(ds, model_ref))
        assert direct == via_ref

    def test_oversize_model_refused(self, ray_session):
        ds = _docs([(1, "a b c d e f g h")])
        with pytest.raises(ValueError, match="driver_max_rows"):
            build_model(train_bigram_counts(ds), driver_max_rows=3)

    def test_empty_vocab_model_refused(self, ray_session):
        # a model trained on an all-null corpus has vocab 0; scoring a
        # multi-word doc against it must say so, not ZeroDivisionError
        # deep inside a Ray task
        model = build_model(train_bigram_counts(_docs([(1, None)])))
        assert model["vocab"] == 0
        with pytest.raises(Exception, match="empty vocabulary"):
            _rows(score_bigram_logprob(_docs([(2, "a b")]), model))
        # scoring only <2-word docs emits nothing and must NOT raise
        assert _rows(score_bigram_logprob(_docs([(3, "solo")]), model)) == []

    def test_bad_min_count_refused(self, ray_session):
        with pytest.raises(ValueError, match="min_count"):
            train_bigram_counts(_docs([(1, "a b")]), min_count=0)


class TestDuckDBParity:
    def test_matches_duckdb_on_testdata(self, ray_session):
        """Self-perplexity over the sf0.001 documents table matches the
        independent SQL recomputation (oracles.lm_perplexity_sql) on
        rows, columns, and rounded values."""
        import duckdb
        import pandas as pd

        from deduce_ray.oracles import lm_perplexity_sql

        path = f"{SF_DIR}/documents.parquet"
        ds = ray.data.read_parquet(path, columns=["doc_id", "text"])
        got = (
            lm_perplexity(ds)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS "
            f"SELECT doc_id, text FROM read_parquet('{path}')"
        )
        want = (
            con.execute(lm_perplexity_sql())
            .df()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert len(got) > 0
        pd.testing.assert_frame_equal(
            got, want[["doc_id", "n_bigrams", "avg_logprob", "ppl"]],
            check_dtype=False,
        )
