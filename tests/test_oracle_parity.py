"""Oracle-differential tests — every registered SQL-expressible query must
match DuckDB exactly at sf0.01 (the driver's correctness gate, replicated
locally and stricter: exact value equality, not hashes)."""

from __future__ import annotations

import pytest as _pytest_mark_mod

#: registry-wide sweep / heavy e2e — excluded from the fast dev loop
pytestmark = _pytest_mark_mod.mark.slow

import pytest

from logspout_kinesis_tests_spark.plans import REGISTRY
from tests.oracle import compare, duckdb_connection

SQL_QUERIES = sorted(name for name, spec in REGISTRY.items() if spec.oracle)


@pytest.fixture(scope="module")
def con(sf_correct):
    con = duckdb_connection(sf_correct)
    yield con
    con.close()


def test_oracle_type_lint(con):
    """Registry lint: no oracle may emit a type Spark cannot produce.

    DuckDB widens integer SUM / windowed SUM / list_sum to HUGEINT and
    decimal SUMs to DECIMAL(38,x); the driver's value hash is type-sensitive,
    so an unguarded sum silently hash-fails at the driver even when every
    Python value matches (the r3 root cause, 8 queries).  ``rel.types`` binds
    the query without executing it, so this sweeps all oracles in seconds and
    names every offending column."""
    from tests.oracle import canon_duck_type

    bad = {}
    for name in SQL_QUERIES:
        rel = con.sql(REGISTRY[name].oracle)
        offenders = [
            f"{c}:{t}"
            for c, t in zip(rel.columns, rel.types)
            if canon_duck_type(t) in ("int128", "uint64")
            # r4 calibration: ANY decimal final column is driver-unsafe —
            # c2_unpivot matched DECIMAL(28,2) exactly on both sides and
            # still hash-failed.  Round then CAST AS DOUBLE instead.
            or canon_duck_type(t).startswith("decimal")
        ]
        if offenders:
            bad[name] = offenders
    assert not bad, (
        "oracles emitting Spark-unrepresentable types (add CAST(... AS "
        f"BIGINT) / align decimal precision): {bad}"
    )


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
