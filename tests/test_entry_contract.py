"""Replicates the driver's correctness harness: every ``queries()``
entry runs at sf0.001 and, when an ``oracle_sql()`` twin exists, must
match DuckDB value-for-value (order-insensitive, like the driver's
sorted value-hash).  Rows-only queries must at least run and keep a
stable schema."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as E

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def test_entry_smoke(spark):
    df = E.entry(spark)
    assert df.count() > 0
    assert df.columns == ["id", "rank"]


def test_oracle_keys_subset_of_queries():
    qs, os_ = E.queries(), E.oracle_sql()
    assert set(os_) <= set(qs)


@pytest.mark.parametrize("name", sorted(E.queries()))
def test_query_vs_oracle(spark, duck, name):
    fn = E.queries()[name]
    df = fn(spark, SF_DIR)
    sp = sorted(tuple(r) for r in df.collect())
    sql = E.oracle_sql().get(name)
    if sql is None:
        assert df.columns  # rows-only: runs with a stable schema
        return
    dk = sorted(tuple(r) for r in duck.execute(sql).fetchall())
    assert len(sp) == len(dk), f"{name}: rowcount {len(sp)} != {len(dk)}"
    assert sp == dk, (
        f"{name}: value mismatch; "
        f"spark_only={list(set(sp) - set(dk))[:3]} "
        f"duck_only={list(set(dk) - set(sp))[:3]}"
    )
