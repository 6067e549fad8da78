"""Incremental KG store (state/kg_store.py): two-batch ingest equals a
from-scratch run over the union corpus, crashed ingests stay invisible,
committed labels are refused, and the analyze --state-dir CLI drives the
whole path end-to-end."""

from __future__ import annotations

import json
import os
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# two disjoint doc batches over shared planted 8-digit `id` entities, so
# cross-batch edges genuinely merge (entity A co-occurs with B in both)
BATCH1 = [
    (1, "zie 11112222 en 33334444 hier"),
    (2, "nummer 11112222 naast 55556666"),
]
BATCH2 = [
    (3, "weer 11112222 en 33334444 samen"),
    (4, "nieuw 77778888 bij 55556666"),
]


def _write(tmp_path, name, rows):
    path = str(tmp_path / f"{name}.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "text": pa.array([r[1] for r in rows]),
                "lang": pa.array(["nl"] * len(rows)),
            }
        ),
        path,
    )
    return path


def _edges_of(corpus_paths):
    import ray.data

    from deduce_ray.corpus import decorate_batch
    from deduce_ray.rayops.annotate import broadcast_lexicon, extract_triples
    from deduce_ray.rayops.kg import cooccurrence_edges

    ds = ray.data.read_parquet(corpus_paths).map_batches(
        decorate_batch, batch_format="pyarrow"
    )
    triples = extract_triples(
        ds, lexicon_ref=broadcast_lexicon(), enabled={"identifiers", "identifier"}
    )
    return cooccurrence_edges(triples)


def _canon_edges(ds):
    df = ds.to_pandas()
    return (
        df.sort_values(["pred_a", "obj_a", "pred_b", "obj_b"])
        .reset_index(drop=True)
    )


class TestKGStore:
    def test_two_batch_equals_from_scratch(self, ray_session, tmp_path):
        import pandas as pd

        from deduce_ray.state.kg_store import KGStore
        from deduce_ray.rayops.kg import pagerank

        p1 = _write(tmp_path, "b1", BATCH1)
        p2 = _write(tmp_path, "b2", BATCH2)
        store = KGStore(str(tmp_path / "store"))
        store.ingest_edges("b1", _edges_of([p1]))
        store.ingest_edges("b2", _edges_of([p2]))
        merged = _canon_edges(store.merged_edges())
        scratch = _canon_edges(_edges_of([p1, p2]))
        pd.testing.assert_frame_equal(merged, scratch, check_dtype=False)
        # the shared edge (11112222, 33334444) really merged: n_docs = 2
        key = merged.set_index(["obj_a", "obj_b"])["n_docs"]
        assert key.loc[("11112222", "33334444")] == 2

        # downstream analytics over merged == from-scratch
        ranks_inc = (
            pagerank(store.merged_edges()).to_pandas()
            .sort_values(["pred", "obj"]).reset_index(drop=True)
        )
        ranks_scr = (
            pagerank(_edges_of([p1, p2])).to_pandas()
            .sort_values(["pred", "obj"]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(ranks_inc, ranks_scr, check_dtype=False)

    def test_crash_invisible_and_committed_refused(self, ray_session, tmp_path):
        import pytest
        import ray.data

        from deduce_ray.state.kg_store import KGStore

        p1 = _write(tmp_path, "b1", BATCH1)
        store = KGStore(str(tmp_path / "store"))
        store.ingest_edges("b1", _edges_of([p1]))

        # simulate a crashed ingest: edge files exist, no manifest
        crashed = tmp_path / "store" / "edges" / "crashed"
        os.makedirs(crashed)
        shutil.copy(
            next((tmp_path / "store" / "edges" / "b1").glob("*.parquet")),
            crashed / "part.parquet",
        )
        assert store.committed_labels() == ["b1"]
        n_before = store.merged_edges().count()

        # re-running the crashed label rebuilds and commits cleanly
        store.ingest_edges("crashed", _edges_of([p1]))
        assert store.committed_labels() == ["b1", "crashed"]
        assert store.merged_edges().count() >= n_before

        # committed label is refused
        with pytest.raises(ValueError, match="already committed"):
            store.ingest_edges("b1", _edges_of([p1]))
        with pytest.raises(ValueError, match="bad ingest label"):
            store.ingest_edges("../evil", _edges_of([p1]))

    def test_empty_store_and_single_ingest(self, ray_session, tmp_path):
        from deduce_ray.state.kg_store import KGStore

        store = KGStore(str(tmp_path / "store"))
        assert store.merged_edges() is None
        p1 = _write(tmp_path, "b1", BATCH1)
        m = store.ingest_edges("b1", _edges_of([p1]))
        assert m["n_edges"] == store.merged_edges().count()

    def test_analyze_cli_state_dir(self, tmp_path):
        """Driving surface (subprocess: the CLI owns its own Ray
        session): two analyze --state-dir runs; the second reports the
        merged graph — same result as a from-scratch run over both
        batches."""
        import subprocess

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        os.makedirs(tmp_path / "c1")
        os.makedirs(tmp_path / "c2")
        os.makedirs(tmp_path / "all")
        _write(tmp_path / "c1", "b1", BATCH1)
        _write(tmp_path / "c2", "b2", BATCH2)
        _write(tmp_path / "all", "b1", BATCH1)
        _write(tmp_path / "all", "b2", BATCH2)
        store = str(tmp_path / "store")

        def run(extra):
            out = subprocess.run(
                [sys.executable, "-m", "deduce_ray", "analyze",
                 "--enabled", "identifiers,identifier", "--top", "10",
                 "--num-cpus", "2"] + extra,
                cwd=repo, capture_output=True, text=True, timeout=300,
            )
            assert out.returncode == 0, out.stderr[-2000:]
            last = [ln for ln in out.stdout.splitlines()
                    if ln.startswith("{")][-1]
            return json.loads(last)

        run(["--input", str(tmp_path / "c1"), "--state-dir", store,
             "--state-label", "b1"])
        inc = run(["--input", str(tmp_path / "c2"), "--state-dir", store,
                   "--state-label", "b2"])
        scratch = run(["--input", str(tmp_path / "all")])
        assert inc["entities"] == scratch["entities"]
        assert inc["top"] == scratch["top"]
