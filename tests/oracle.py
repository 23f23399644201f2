"""Local replica of the driver's oracle-differential check.

Runs a registered Spark query and its DuckDB oracle on the same parquet
tables, canonicalizes both result sets (columns sorted by name, rows sorted),
and compares values EXACTLY — stricter than any hash, so passing here means
the driver's hash comparison passes too.
"""

from __future__ import annotations

import datetime as dt
import math

import duckdb


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Register the driver's table views, as the verify harness does."""
    con = duckdb.connect()
    for name in (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ):
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def _canon_value(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # exact repr — catches any cross-engine float drift
        return repr(v)
    if isinstance(v, dt.datetime):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon_value(x) for x in v)
    return v

def _canon(rows: list[dict]) -> list[tuple]:
    if not rows:
        return []
    cols = sorted(rows[0].keys())
    out = [tuple(_canon_value(r[c]) for c in cols) for r in rows]
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> tuple[bool, str]:
    spark_rows = [r.asDict() for r in spark_df.collect()]
    rel = con.sql(sql)
    oracle_cols = [c.lower() for c in rel.columns]
    oracle_rows = [dict(zip(oracle_cols, row)) for row in rel.fetchall()]

    spark_cols = sorted(c.lower() for c in spark_df.columns)
    if spark_cols != sorted(oracle_cols):
        return False, f"column mismatch: spark={spark_cols} oracle={sorted(oracle_cols)}"
    if len(spark_rows) != len(oracle_rows):
        return False, f"rowcount mismatch: spark={len(spark_rows)} oracle={len(oracle_rows)}"

    s, o = _canon(spark_rows), _canon(oracle_rows)
    if s != o:
        diffs = [(a, b) for a, b in zip(s, o) if a != b][:3]
        return False, f"value mismatch, first diffs: {diffs}"
    return True, "ok"
