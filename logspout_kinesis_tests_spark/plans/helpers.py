"""Oracle-parity helpers.

The driver hashes result values, so float aggregates must be bit-identical
between Spark and DuckDB.  Double summation is order-dependent; summing over
different partitionings/orders yields different last bits.  Fix: aggregate in
fixed-point decimal (exact, associative, order-independent) in BOTH engines,
then cast the final value back to double.  The same policy exists on the SQL
side as string templates.

Timestamps are emitted as fixed-width strings (µs) so driver-side value
representation can't drift between engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from logspout_kinesis_tests_spark.sources.tables import spread_for_compute

#: decimal(18,2) covers money columns; decimal(38,8) for products of decimals.
MONEY = "decimal(18,2)"


def dec_sum(col: Column | str, scale: int = 2) -> Column:
    """Order-independent SUM: sum in decimal, return double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


def dec_avg(col: Column | str, scale: int = 2) -> Column:
    """Order-independent AVG: exact decimal sum / count, divided in double.

    Matches the SQL template ``CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE)
    / COUNT(x)`` — identical inputs to one double division on both engines.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double") / F.count(c)


def money(col: Column | str) -> Column:
    """Cast to the shared money decimal type for exact arithmetic."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(MONEY)


def spread(df, key: str):
    """Repartition a SMALL input across the cluster before a huge fan-out
    (shingle/resample explode), hash-partitioned on ``key``.

    The test corpus ships one single-row-group parquet file per table, so
    a scan + explode + map-side combine otherwise runs in ONE task.  The
    partition count must be EXPLICIT (defaultParallelism): a bare
    ``repartition(col)`` gets AQE-coalesced straight back to one partition
    because the pre-fan-out shuffle is tiny, and the fan-out cost is
    invisible to AQE's size-based planning.  Values are unaffected — every
    downstream aggregate in this repo is order-independent by policy.

    Delegates to ``sources.tables.spread_for_compute``, whose partition
    count guard makes this a NO-OP when the input already has >= cluster
    parallelism splits (the production many-file case) — no extra shuffle.
    """
    return spread_for_compute(df, key=key)


def ts_str(col: Column | str) -> Column:
    """Timestamp → 'YYYY-MM-DD HH:MM:SS.ffffff' (µs, fixed width)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")


def date_str(col: Column | str) -> Column:
    """Timestamp → 'YYYY-MM-DD'."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyy-MM-dd")


# --- SQL-side templates (DuckDB) -------------------------------------------

def sql_dec_sum(expr: str, scale: int = 2) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"


def sql_dec_avg(expr: str, scale: int = 2) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE) / COUNT({expr})"


def sql_ts_str(expr: str) -> str:
    return f"strftime({expr}, '%Y-%m-%d %H:%M:%S.%f')"


def sql_date_str(expr: str) -> str:
    return f"strftime({expr}, '%Y-%m-%d')"
