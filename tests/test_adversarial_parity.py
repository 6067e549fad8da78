"""Degenerate-input DuckDB parity: adversarial corpora the synthetic
testdata never produces (zero-norm vectors, null texts) run through the
REGISTERED queries against their REGISTERED oracles — pinning the
contracts fixed in round 4: zero vectors score cosine 0.0 (DuckDB 1.0's
list_cosine_similarity returns -1.0 for them, not NaN), and null text
keys as the empty string in the exact-dedup family (the engine's
md5(text or '') contract)."""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _canon(df):
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _run(qname, sf_dir, con):
    import pandas as pd

    import __ray_entry__ as entrymod

    mine = _canon(entrymod.queries()[qname](sf_dir).to_pandas())
    want = _canon(con.execute(entrymod.oracle_sql()[qname]).df())
    pd.testing.assert_frame_equal(mine, want, check_dtype=False)
    return len(mine)


class TestDegenerateVectors:
    def test_ann_family_zero_and_extreme_vectors(self, ray_session, tmp_path):
        import duckdb

        vecs = [
            [1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0],
            [0.5, 0.5, 0.5, 0.5], [-1.0, -1.0, 0.0, 0.0],
            [1e-30, 0.0, 0.0, 0.0],      # queries are vec_id < 5
            [0.0, 0.0, 0.0, 0.0],        # zero vector -> cosine 0.0
            [1e30, 1e30, 0.0, 0.0], [-0.5, 0.5, -0.5, 0.5],
            [1.0, 0.0, 0.0, 0.0],        # exact duplicate of query 0
            [1e-30, 1e-30, 1e-30, 1e-30],
        ]
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(range(len(vecs)), type=pa.int64()),
                    "embedding": pa.array(vecs, type=pa.list_(pa.float32())),
                }
            ),
            str(tmp_path / "embeddings.parquet"),
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{tmp_path}/embeddings.parquet')"
        )
        for q in ("ann_topk", "ann_topk_lsh", "ann_topk_ivf"):
            assert _run(q, str(tmp_path), con) == 50


class TestNullTextDedup:
    def test_null_keys_as_empty(self, ray_session, tmp_path):
        import duckdb

        texts = [None, "", "same", "same", "other"]
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(
                        range(1, len(texts) + 1), type=pa.int64()
                    ),
                    "text": pa.array(texts, type=pa.string()),
                    "lang": pa.array(["en"] * len(texts)),
                    "source": pa.array(["adv"] * len(texts)),
                    "n_chars": pa.array(
                        [len(t or "") for t in texts], type=pa.int64()
                    ),
                }
            ),
            str(tmp_path / "documents.parquet"),
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{tmp_path}/documents.parquet')"
        )
        # null and "" share one group of 2; "same" groups; 3 groups total
        assert _run("exact_dedup", str(tmp_path), con) == 3
        assert _run("dedup_survivors", str(tmp_path), con) == 3
