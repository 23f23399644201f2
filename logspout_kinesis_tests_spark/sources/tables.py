"""Batch loaders for the driver's parquet tables.

One quirk handled here: ``events.ts`` is Parquet TIMESTAMP(NANOS), which
Spark's vectorized reader rejects outright.  We flip the runtime conf
``spark.sql.legacy.parquet.nanosAsLong`` so the column arrives as raw int64
nanoseconds, then convert with integer division (``ts DIV 1000`` — floor,
exact; float division would lose precision on 1.7e18-scale longs) into a µs
TimestampType.  DuckDB's reader truncates ns→µs the same way, so oracle
comparisons line up bit-for-bit.

At 100 TB this is still the right shape: the conversion is a single
whole-stage-codegen projection on top of the scan; predicate pushdown and
column pruning on every other column are unaffected.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logspout_kinesis_tests_spark.session import ensure_runtime_confs

#: All driver tables (TESTDATA.md).
TABLES = (
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
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table, normalizing types (events ns→µs timestamps)."""
    ensure_runtime_confs(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # int64 nanoseconds → µs TimestampType (floor division, matches the
        # DuckDB oracle's ns→µs truncation).
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Load several tables at once; all of them when no names are given."""
    return {name: load_table(spark, sf_dir, name) for name in (names or TABLES)}


def spread_for_compute(
    df: DataFrame, partitions: int | None = None, key: str | None = None
) -> DataFrame:
    """Repartition iff the input has fewer partitions than the cluster has
    cores — the guard against a scan stage serializing expensive fused
    compute.  With ``key`` the respread hash-partitions on that column
    (``plans.helpers.spread`` delegates here), so a downstream
    groupBy/window on the same key can reuse the distribution.

    Spark fuses per-row work (shingling, hashing, n-gram explodes) into the
    scan stage, so its parallelism equals the input split count.  A
    consolidated corpus file with one row group therefore runs ALL per-doc
    compute on a single core regardless of cluster size (measured:
    winnowing 4.9 s → 1.0 s at sf0.1 on local[32] after the respread).
    Production tables have many splits, in which case this is a no-op —
    the check reads the physical partition count, not a heuristic.  The
    shuffle it may add moves raw input rows once, strictly cheaper than
    leaving O(per-doc work) single-threaded.
    """
    target = partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    if key is not None:
        return df.repartition(target, F.col(key))
    return df.repartition(target)


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register the driver tables as temp views so the whole relational
    surface is reachable through ``spark.sql`` — the same table names the
    DuckDB oracle uses, making any oracle string in the registry directly
    runnable against Spark too."""
    for name, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(name)
