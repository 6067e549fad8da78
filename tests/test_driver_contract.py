"""Driver-contract harness tests.

Round 2 lesson: the driver evaluates ``queries()`` in dict order and
recorded only the first 50 rows — two registered queries silently never
reached CORRECTNESS_r02.  These tests make any such silent skip (or a
query that errors only under the driver's call pattern) a local failure:

- the registry is capped at 50 entries, value-checked (oracled) entries
  strictly before rows-only ones;
- every oracle key has a query; every oracle parses in DuckDB against the
  sf0.001 views;
- every query EXECUTES end-to-end at sf0.001 and yields a stable,
  non-degenerate schema.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def entrymod():
    import __ray_entry__

    return __ray_entry__


def test_registry_cap_and_oracled_first(entrymod):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) <= 50, (
        f"{len(qs)} queries registered; the driver records at most 50 — "
        "retire or merge one per extra entry"
    )
    missing = set(oracles) - set(qs)
    assert not missing, f"oracles without a query: {sorted(missing)}"
    keys = list(qs)
    seen_rows_only = False
    for key in keys:
        if key in oracles:
            assert not seen_rows_only, (
                f"oracled query {key!r} is ordered after a rows-only query; "
                "a driver cutoff would drop a value check instead of a "
                "rows-only row"
            )
        else:
            seen_rows_only = True


def test_every_oracle_parses(entrymod):
    con = duckdb.connect()
    for table in TABLES:
        con.execute(
            f"CREATE VIEW {table} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{table}.parquet')"
        )
    for name, sql in entrymod.oracle_sql().items():
        try:
            con.execute(f"SELECT * FROM ({sql}) LIMIT 1").fetchall()
        except Exception as exc:  # noqa: BLE001
            pytest.fail(f"oracle {name!r} failed to run: {exc}")


def test_every_query_executes(ray_session, entrymod):
    """Each registered query must run end-to-end at sf0.001 and produce a
    schema with at least one column.  (Value equality vs the oracle is the
    driver's job / scripts/check_oracles.py; this guards EXECUTION so a
    broken query can never silently vanish from the correctness file
    again.)"""
    import pandas as pd
    import pyarrow as pa

    failures = []
    for name, fn in entrymod.queries().items():
        try:
            result = fn(SF_DIR)
            if isinstance(result, pd.DataFrame):
                n_rows, cols = len(result), list(result.columns)
            elif isinstance(result, pa.Table):
                n_rows, cols = result.num_rows, result.column_names
            else:  # ray Dataset
                n_rows, cols = result.count(), result.columns()
            if not cols:
                failures.append(f"{name}: empty schema")
            if n_rows < 0:
                failures.append(f"{name}: negative row count")
        except Exception as exc:  # noqa: BLE001
            failures.append(f"{name}: {type(exc).__name__}: {exc}")
    assert not failures, "\n".join(failures)


def test_entry_runs(ray_session, entrymod):
    result = entrymod.entry()
    assert result.count() > 0
    assert "doc_id" in result.columns()


def test_bench_references_resolve(entrymod):
    """Every ``queries["name"]`` subscript and every ``entry._q_*`` direct
    call in bench.py must resolve — a registry reshuffle (the 50-cap
    retires rows-only entries when a new oracled query lands) must not be
    able to crash the benchmark at driver time (regression: kg_entities
    was retired by the decontaminate query and bench.py kept subscripting
    the registry)."""
    import re

    src = open(os.path.join(os.path.dirname(__file__), "..", "bench.py")).read()
    qs = entrymod.queries()
    for name in set(re.findall(r'queries\["([a-z_]+)"\]', src)):
        assert name in qs, f"bench.py subscripts retired query {name!r}"
    for attr in set(re.findall(r"entry\.(_q_[a-z_]+)", src)):
        assert hasattr(entrymod, attr), f"bench.py calls missing {attr}"
