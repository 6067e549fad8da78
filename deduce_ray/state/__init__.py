"""Persistent, shared state for multi-invocation pipelines.

The modules here hold the state a single streaming Dataset pipeline
cannot express: indexes that must survive across ingest runs (the
incremental dedup store).  Everything is plain partitioned parquet on a
directory the whole cluster can read — no actor holds the truth, so a
driver crash never loses state and any number of read-only consumers can
run concurrently.
"""

from deduce_ray.state.dedup_store import DedupStore, incremental_dedup
from deduce_ray.state.embedding_store import (
    EmbeddingLSHStore,
    incremental_embedding_neardup,
)
from deduce_ray.state.simhash_store import SimHashStore, incremental_neardup

__all__ = [
    "DedupStore",
    "EmbeddingLSHStore",
    "SimHashStore",
    "incremental_dedup",
    "incremental_embedding_neardup",
    "incremental_neardup",
]
