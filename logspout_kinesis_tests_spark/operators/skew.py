"""Skew-mitigation utilities — salting for hot keys (SCALE.md).

AQE's skew-join splitting handles most runtime skew; these exist for the
cases AQE can't fix: a single group key receiving a large share of all rows
(hot partition in an aggregation), or a hash join where one key's build side
exceeds memory.  Both are classic at 100 TB (one chatty docker_host, one
boilerplate document fingerprint).

Both utilities are result-identical to their unsalted forms — asserted by
tests — because they only re-associate algebraic operations.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    sum_cols: dict[str, Column | str],
    salt_buckets: int = 16,
    salt_source: str | None = None,
) -> DataFrame:
    """Two-phase SUM/COUNT aggregation with a salted first phase.

    Phase 1 groups by (keys, salt) — a hot key's rows spread over
    ``salt_buckets`` reducers; phase 2 folds the partials by the true keys.
    Only algebraic aggregates re-associate this way (sum/count/min/max);
    the helper exposes sums + row count, which cover the hot-key cases.

    ``salt_source``: a column whose hash provides the salt; defaults to
    ``spark_partition_id()`` (cheap, uniform enough — the goal is spreading,
    not randomness).
    """
    salt = (
        F.pmod(F.xxhash64(F.col(salt_source)), F.lit(salt_buckets))
        if salt_source
        else F.pmod(F.spark_partition_id(), F.lit(salt_buckets))
    )
    partial_aggs = [
        F.sum(F.col(c) if isinstance(c, str) else c).alias(f"_p_{name}")
        for name, c in sum_cols.items()
    ] + [F.count("*").alias("_p_n")]
    partial = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(*partial_aggs)
    final_aggs = [
        F.sum(f"_p_{name}").alias(name) for name in sum_cols
    ] + [F.sum("_p_n").alias("n")]
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 8,
    big_salt_source: str | None = None,
) -> DataFrame:
    """Inner equi-join with the small side replicated ``salt_buckets``×.

    The big side adds a salt to its join key (derived from
    ``big_salt_source``'s hash, or the partition id); the small side is
    exploded across every salt value, so each (key, salt) bucket joins a
    1/salt_buckets slice of the hot key's rows.  Use when one key's matches
    overwhelm a task and the small side is too big to broadcast outright
    but cheap to replicate salt_buckets times.
    """
    salt = (
        F.pmod(F.xxhash64(F.col(big_salt_source)), F.lit(salt_buckets))
        if big_salt_source
        else F.pmod(F.spark_partition_id(), F.lit(salt_buckets))
    )
    big_salted = big.withColumn("_salt", salt)
    small_salted = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = big_salted.join(small_salted, [key, "_salt"])
    return out.drop("_salt")
