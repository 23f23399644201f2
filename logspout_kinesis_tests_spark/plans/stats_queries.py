"""Round-4d distributed order-statistics queries: two-sample
Kolmogorov–Smirnov test and exact rank-selected percentiles.

The interesting part is the SCALE shape: both need cumulative counts over
a globally ordered value axis, which a naive plan serializes through one
unpartitioned window.  `c2_ks_test` instead uses the bucketed-CDF pattern
(the shard-offset trick from plans/llm_sampling.py): a bounded 256-row
bucket table carries exclusive prefix offsets, per-bucket windows do the
rest in parallel, and the reassembled cumulative counts are the *same
integers* a global cumsum would produce — so the DuckDB oracle can use the
simple global-window formulation and still hash-match bit-for-bit.

Registered LAST (see plans/__init__) so longer-waiting unverified queries
keep their place at the front of the driver's correctness window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from logspout_kinesis_tests_spark.plans.registry import register
from logspout_kinesis_tests_spark.sources.tables import load_table

#: Bucket fan-out for the distributed CDF: the bucket table is AT MOST this
#: many rows by construction (a constant, independent of input scale), so
#: its prefix-sum window is a justified bounded global window.
_KS_BUCKETS = 256

_KS_A, _KS_B = "click", "view"


@register(
    "c2_ks_test",
    # The oracle uses plain global cumsums — legal in an oracle that only
    # ever runs at sf0.01.  The Spark side reconstructs the identical
    # integers via bucket offsets, so the doubles they divide into are
    # bit-identical.  Window SUM over BIGINT widens to HUGEINT — cast back.
    oracle=f"""
    WITH pv AS (
        SELECT value AS v,
               CAST(sum(CASE WHEN event_type = '{_KS_A}' THEN 1 ELSE 0 END)
                    AS BIGINT) AS c1,
               CAST(sum(CASE WHEN event_type = '{_KS_B}' THEN 1 ELSE 0 END)
                    AS BIGINT) AS c2
        FROM events
        WHERE event_type IN ('{_KS_A}', '{_KS_B}') AND value IS NOT NULL
        GROUP BY value),
    tot AS (
        SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2
        FROM pv),
    cum AS (
        SELECT CAST(sum(c1) OVER (ORDER BY v) AS BIGINT) AS k1,
               CAST(sum(c2) OVER (ORDER BY v) AS BIGINT) AS k2
        FROM pv),
    d AS (
        SELECT max(abs(CAST(k1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                       - CAST(k2 AS DOUBLE) / CAST(n2 AS DOUBLE))) AS d_stat
        FROM cum, tot)
    SELECT round(d_stat, 9) AS d_stat, n1, n2,
           round(sqrt(CAST(n1 * n2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
                 * d_stat, 9) AS ks_scaled
    FROM d, tot
    """,
    doc="C2+: two-sample Kolmogorov–Smirnov test (click vs view value "
    "distributions) — the distribution-free drift detector, computed as a "
    "DISTRIBUTED CDF: per-value counts, a ≤256-row bucket table carrying "
    "exclusive prefix offsets (the only global window, bounded by "
    "construction), per-bucket cumulative windows in parallel, then one "
    "max-reduce of |F1−F2|.  No global sort at any scale; the reassembled "
    "cumulative counts are exactly the global cumsum's integers, so every "
    "division input is bit-identical to the oracle's single-window "
    "formulation.  Supremum over data points is exact for the two-sample "
    "statistic (the max of a right-continuous step difference occurs at "
    "a sample).",
)
def c2_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(_KS_A, _KS_B) & F.col("value").isNotNull()
    )
    pv = ev.groupBy(F.col("value").alias("v")).agg(
        F.sum(F.when(F.col("event_type") == _KS_A, 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("event_type") == _KS_B, 1).otherwise(0)).alias("c2"),
    )
    mm = pv.agg(
        F.min("v").alias("vmin"),
        F.max("v").alias("vmax"),
        F.sum("c1").alias("n1"),
        F.sum("c2").alias("n2"),
    )
    # monotone bucket id: floor of a positive-affine map is non-decreasing
    # in v, so (bucket asc, v asc) is the global value order
    span = F.col("vmax") - F.col("vmin")
    raw = F.floor((F.col("v") - F.col("vmin")) / span * _KS_BUCKETS)
    b = pv.crossJoin(F.broadcast(mm)).withColumn(
        "bucket",
        F.when(span > 0, F.least(raw, F.lit(_KS_BUCKETS - 1)))
        .otherwise(F.lit(0))
        .cast("int"),
    )
    bucket_tot = b.groupBy("bucket").agg(
        F.sum("c1").alias("t1"), F.sum("c2").alias("t2")
    )
    wb = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offs = bucket_tot.select(
        "bucket",
        F.coalesce(F.sum("t1").over(wb), F.lit(0)).alias("off1"),
        F.coalesce(F.sum("t2").over(wb), F.lit(0)).alias("off2"),
    )
    wv = Window.partitionBy("bucket").orderBy("v")
    cum = b.join(F.broadcast(offs), "bucket").select(
        (F.col("off1") + F.sum("c1").over(wv)).alias("k1"),
        (F.col("off2") + F.sum("c2").over(wv)).alias("k2"),
        "n1",
        "n2",
    )
    d = cum.agg(
        F.max(
            F.abs(
                F.col("k1").cast("double") / F.col("n1").cast("double")
                - F.col("k2").cast("double") / F.col("n2").cast("double")
            )
        ).alias("d_stat"),
        F.max("n1").alias("n1"),
        F.max("n2").alias("n2"),
    )
    scaled = (
        F.sqrt(
            (F.col("n1") * F.col("n2")).cast("double")
            / (F.col("n1") + F.col("n2")).cast("double")
        )
        * F.col("d_stat")
    )
    return d.select(
        F.round("d_stat", 9).alias("d_stat"),
        "n1",
        "n2",
        F.round(scaled, 9).alias("ks_scaled"),
    )


_PCT_QS = ((0.5, "p50"), (0.9, "p90"), (0.99, "p99"))


@register(
    "c2_exact_percentiles",
    # Rank selection: the value at row ceil(q·n) of the per-type value
    # order.  No arithmetic touches the selected values, and the rank
    # itself is the same double→ceil on both engines — exact parity.
    oracle=f"""
    WITH r AS (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM events WHERE value IS NOT NULL)
    SELECT event_type, CAST(max(n) AS BIGINT) AS n,
           {", ".join(
               f"max(CASE WHEN rn = CAST(ceil({q!r} * n) AS BIGINT) "
               f"THEN value END) AS {name}"
               for q, name in _PCT_QS
           )}
    FROM r GROUP BY event_type
    """,
    doc="C2+: exact p50/p90/p99 per event type by rank selection — the "
    "value at row ceil(q·n) of the per-type order, the discrete inverse "
    "CDF.  Ranks come from a per-type window (partitioned — parallel "
    "across types; within a type, AQE splits skewed partitions), and no "
    "arithmetic touches the selected values so parity is exact, unlike "
    "percentile_approx (`c2_percentile_sketch`, which this exact variant "
    "cross-checks at small scale).  At 100 TB the bucketed-CDF pattern of "
    "c2_ks_test generalizes this to a two-pass selection without the "
    "per-type sort.",
)
def c2_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = Window.partitionBy("event_type").orderBy("value")
    wn = Window.partitionBy("event_type")
    r = ev.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    aggs = [F.max("n").cast("long").alias("n")]
    for q, name in _PCT_QS:
        rank = F.ceil(F.lit(q) * F.col("n")).cast("long")
        aggs.append(F.max(F.when(F.col("rn") == rank, F.col("value"))).alias(name))
    return r.groupBy("event_type").agg(*aggs)
