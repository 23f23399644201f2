"""Oracle-differential tests — every registered SQL-expressible query must
match DuckDB exactly at sf0.01 (the driver's correctness gate, replicated
locally and stricter: exact value equality, not hashes)."""

from __future__ import annotations

import pytest

from logspout_kinesis_tests_spark.plans import REGISTRY
from tests.oracle import compare, duckdb_connection

SQL_QUERIES = sorted(name for name, spec in REGISTRY.items() if spec.oracle)


@pytest.fixture(scope="module")
def con(sf_correct):
    con = duckdb_connection(sf_correct)
    yield con
    con.close()


@pytest.mark.parametrize("name", SQL_QUERIES)
def test_oracle_parity(spark, sf_correct, con, name):
    spec = REGISTRY[name]
    df = spec.build(spark, sf_correct)
    ok, msg = compare(df, con, spec.oracle)
    assert ok, f"{name}: {msg}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()) <= set(e.queries())
