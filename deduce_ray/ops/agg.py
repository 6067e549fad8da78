"""Partial-aggregation helper: combiner inside map_batches, then one small
shuffle to merge — the scale-correct shape for high-cardinality inputs with
low-cardinality group keys (pre-aggregate before the all-to-all exchange).

Aggregation spec: {out_col: (in_col, kind)} with kind in
{"sum", "min", "max", "count", "sum_sq"}; "count" ignores in_col.
Merges are exact (sums of partials), so integer aggregates reproduce SQL
bit-for-bit — use integer cents for money columns to avoid float drift.
"""

from __future__ import annotations

import pandas as pd

_PARTIAL_KIND = {"sum": "sum", "min": "min", "max": "max", "count": "sum", "sum_sq": "sum"}


def grouped_agg(
    ds,
    keys: list[str],
    aggs: dict[str, tuple[str | None, str]],
    n_shards: int = 256,
):
    """Dataset -> one row per key combination with named aggregate columns.

    The merge shuffle is keyed on ``hash(keys) % n_shards`` rather than the
    raw keys: Ray's ``map_groups`` invokes the UDF once per group, which at
    high key cardinality means one pandas call per key (measured ~50 s of
    UDF time for 139k customer keys).  Sharding keeps it to <= n_shards
    vectorized pandas merges while every copy of a key still lands in one
    task, so results are exact.
    """

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        out = {}
        grouped = df.groupby(keys, as_index=False, sort=True)
        base = grouped.size().rename(columns={"size": "__n"})
        out = base[keys].copy()
        for out_col, (in_col, kind) in aggs.items():
            if kind == "count":
                out[out_col] = base["__n"].astype("int64")
            elif kind == "sum_sq":
                sq = df.assign(__sq=df[in_col] * df[in_col])
                out[out_col] = sq.groupby(keys, sort=True)["__sq"].sum().values
            else:
                out[out_col] = getattr(grouped[in_col], kind)()[in_col].values
        # deterministic shard of the key tuple (fixed pandas hash_key)
        out["__shard"] = (
            pd.util.hash_pandas_object(out[keys], index=False) % n_shards
        ).astype("int64")
        return out

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["__shard"])
        grouped = df.groupby(keys, as_index=False, sort=True)
        out = grouped.size()[keys].copy()
        for out_col, (_, kind) in aggs.items():
            out[out_col] = getattr(grouped[out_col], _PARTIAL_KIND[kind])()[out_col].values
        return out

    partial = ds.map_batches(combine, batch_format="pandas")
    return partial.groupby("__shard").map_groups(merge, batch_format="pandas")
