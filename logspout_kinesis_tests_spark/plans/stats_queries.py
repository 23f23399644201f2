"""Round-4d statistics queries: two-sample Kolmogorov–Smirnov test, exact
rank-selected percentiles (single-sort and bucketed two-pass forms),
one-way ANOVA, and per-group Gini inequality.

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


# --- C2+: one-way ANOVA ----------------------------------------------------


@register(
    "c2_anova_f",
    # Sums-of-squares identity form: every group statistic is an exact
    # decimal sum; per-group terms S_g²/n_g are one double expression
    # quantized to DECIMAL(28,9) so the cross-group totals stay exact and
    # order-independent (the Welch-test policy at three levels of nesting).
    oracle="""
    WITH g AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s,
               CAST(sum(CAST(value AS DECIMAL(18,2))
                        * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS q
        FROM events WHERE value IS NOT NULL GROUP BY event_type),
    terms AS (
        SELECT n, CAST(round(s, 2) AS DECIMAL(18,2)) AS s_dec,
               CAST(round(q, 4) AS DECIMAL(28,4)) AS q_dec,
               CAST(round(s * s / n, 9) AS DECIMAL(28,9)) AS t
        FROM g),
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n) AS BIGINT) AS nn,
               CAST(sum(s_dec) AS DOUBLE) AS s,
               CAST(sum(q_dec) AS DOUBLE) AS q,
               CAST(sum(t) AS DOUBLE) AS t
        FROM terms)
    SELECT k, nn AS n,
           CASE WHEN k <= 1 OR nn <= k OR q - t <= 0 THEN NULL
                ELSE round(((t - s * s / nn) / (k - 1))
                           / ((q - t) / (nn - k)), 9) END AS f_stat,
           round(t - s * s / nn, 6) AS ss_between,
           round(q - t, 6) AS ss_within
    FROM tot
    """,
    doc="C2+: one-way ANOVA F-statistic across event types — does the "
    "metric's mean differ by group more than within-group noise explains, "
    "the k-group generalization of c2_welch_ttest.  Sums-of-squares "
    "identity form: one map-combined scan emits (n, Σx, Σx²) per group in "
    "exact decimals, per-group S²/n terms and the cross-group totals are "
    "decimal-quantized so every reduction is exact and order-independent, "
    "and the final F is a handful of double ops written identically in "
    "both engines.  No second scan, no variance UDF, no per-row state.",
)
def c2_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    dec = F.col("value").cast("decimal(18,2)")
    g = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(dec).cast("double").alias("s"),
        F.sum(dec * dec).cast("double").alias("q"),
    )
    terms = g.select(
        "n",
        F.round("s", 2).cast("decimal(18,2)").alias("s_dec"),
        F.round("q", 4).cast("decimal(28,4)").alias("q_dec"),
        F.round(F.col("s") * F.col("s") / F.col("n"), 9)
        .cast("decimal(28,9)")
        .alias("t"),
    )
    tot = terms.agg(
        F.count("*").alias("k"),
        F.sum("n").alias("nn"),
        F.sum("s_dec").cast("double").alias("s"),
        F.sum("q_dec").cast("double").alias("q"),
        F.sum("t").cast("double").alias("t"),
    )
    ssb = F.col("t") - F.col("s") * F.col("s") / F.col("nn")
    ssw = F.col("q") - F.col("t")
    # zero within-group variance (constant groups) or degenerate dof → NULL:
    # ssw == 0 makes the F denominator 0/0 (ANSI Spark raises); ssw can also
    # round to a tiny negative, hence <= 0 on both sides
    degenerate = (
        (F.col("k") <= 1) | (F.col("nn") <= F.col("k")) | (ssw <= 0)
    )
    return tot.select(
        "k",
        F.col("nn").alias("n"),
        F.when(degenerate, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                (ssb / (F.col("k") - 1)) / (ssw / (F.col("nn") - F.col("k"))), 9
            )
        )
        .alias("f_stat"),
        F.round(ssb, 6).alias("ss_between"),
        F.round(ssw, 6).alias("ss_within"),
    )


# --- C2+: Gini inequality per nation ---------------------------------------


@register(
    "c2_gini_spend",
    # Rank-weighted form G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n over the per-nation
    # spend order.  i·xᵢ has exactly 2 decimals (integer rank × 2-decimal
    # value), so round(…, 2) recovers the exact product and the rank-sum is
    # an exact decimal; ties contribute the same Σ i·x under any tie order,
    # so the statistic is deterministic even where row_number is not.
    oracle="""
    WITH spend AS (
        SELECT c.c_custkey, c.c_nationkey,
               CAST(coalesce(sum(CAST(o.o_totalprice AS DECIMAL(18,2))), 0)
                    AS DOUBLE) AS x
        FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey, c.c_nationkey),
    ranked AS (
        SELECT c_nationkey, x,
               row_number() OVER (
                   PARTITION BY c_nationkey ORDER BY x, c_custkey) AS i,
               count(*) OVER (PARTITION BY c_nationkey) AS n
        FROM spend),
    per_nation AS (
        SELECT c_nationkey, CAST(max(n) AS BIGINT) AS n_customers,
               CAST(sum(CAST(round(CAST(i AS DOUBLE) * x, 2)
                             AS DECIMAL(28,2))) AS DOUBLE) AS t,
               CAST(sum(CAST(round(x, 2) AS DECIMAL(18,2))) AS DOUBLE) AS s
        FROM ranked GROUP BY c_nationkey)
    SELECT nat.n_name AS nation, n_customers,
           round(2.0 * t / (n_customers * s)
                 - CAST(n_customers + 1 AS DOUBLE)
                   / CAST(n_customers AS DOUBLE), 9) AS gini
    FROM per_nation JOIN nation nat ON nat.n_nationkey = per_nation.c_nationkey
    WHERE s > 0
    """,
    doc="C2+: Gini coefficient of customer spend per nation — the standard "
    "inequality/concentration statistic in its rank-weighted form "
    "G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n (0 = perfectly equal spend, →1 = one "
    "customer owns the nation).  Per-customer spend is an exact decimal "
    "sum off one join, ranks come from a window PARTITIONED by nation "
    "(parallel across nations, never global), rank-weighted terms are "
    "decimal-quantized (i·x has exactly 2 decimals, so the quantization "
    "is lossless) and the closing expression is written identically in "
    "both engines.  Zero-order customers count as zero-spend rows — "
    "inequality includes the inactive tail.",
)
def c2_gini_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    spend = (
        cust.join(
            orders, orders["o_custkey"] == cust["c_custkey"], "left"
        )
        .groupBy("c_custkey", "c_nationkey")
        .agg(
            F.coalesce(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")), F.lit(0)
            )
            .cast("double")
            .alias("x")
        )
    )
    wr = Window.partitionBy("c_nationkey").orderBy("x", "c_custkey")
    wn = Window.partitionBy("c_nationkey")
    ranked = spend.select(
        "c_nationkey",
        "x",
        F.row_number().over(wr).alias("i"),
        F.count("*").over(wn).alias("n"),
    )
    per_nation = ranked.groupBy("c_nationkey").agg(
        F.max("n").cast("long").alias("n_customers"),
        F.sum(
            F.round(F.col("i").cast("double") * F.col("x"), 2).cast(
                "decimal(28,2)"
            )
        )
        .cast("double")
        .alias("t"),
        F.sum(F.round("x", 2).cast("decimal(18,2)")).cast("double").alias("s"),
    )
    gini = (
        F.lit(2.0) * F.col("t") / (F.col("n_customers") * F.col("s"))
        - (F.col("n_customers") + 1).cast("double")
        / F.col("n_customers").cast("double")
    )
    return (
        per_nation.join(
            F.broadcast(nation),
            nation["n_nationkey"] == per_nation["c_nationkey"],
        )
        .filter(F.col("s") > 0)
        .select(
            F.col("n_name").alias("nation"),
            "n_customers",
            F.round(gini, 9).alias("gini"),
        )
    )


@register(
    "c2_percentiles_twopass",
    # Values equal the plain rank-selection form (bucket decomposition
    # preserves the value order, as in c2_ks_test), so the oracle IS the
    # simple form — the Spark side earns the same hash with bounded sorts.
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
    doc="C2+: exact quantiles WITHOUT sorting any series — the two-pass "
    "bucketed selection the c2_exact_percentiles doc promises for 100 TB. "
    "Pass 1 aggregates per-(series, bucket) counts (bucket = monotone "
    "affine map of the value, ≤256 per series) and walks the bounded "
    "bucket table's running counts to locate, per quantile, the target "
    "bucket and the residual rank inside it.  Pass 2 ranks ONLY the rows "
    "of target buckets — sort sizes are n/256-ish regardless of series "
    "size, vs the full per-series sort of the rank-selection form.  "
    "Because the bucket map is monotone, the reassembled ranks equal the "
    "global ones, so this hash-matches the simple formulation exactly.",
)
def c2_percentiles_twopass(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    # pass 1: per-(type, bucket) histogram
    mm = ev.groupBy("event_type").agg(
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
        F.count("*").alias("n"),
    )
    span = F.col("vmax") - F.col("vmin")
    raw = F.floor((F.col("value") - F.col("vmin")) / span * _KS_BUCKETS)
    bucketed = ev.join(F.broadcast(mm), "event_type").withColumn(
        "bucket",
        F.when(span > 0, F.least(raw, F.lit(_KS_BUCKETS - 1)))
        .otherwise(F.lit(0))
        .cast("int"),
    )
    hist = bucketed.groupBy("event_type", "bucket").agg(
        F.count("*").alias("cnt")
    )
    wb = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = hist.withColumn(
        "cum_before", F.coalesce(F.sum("cnt").over(wb), F.lit(0))
    ).join(F.broadcast(mm.select("event_type", "n")), "event_type")
    # per quantile: the bucket holding global rank ceil(q*n), and the
    # residual rank within it
    targets = None
    for q, name in _PCT_QS:
        rank = F.ceil(F.lit(q) * F.col("n")).cast("long")
        t = cum.filter(
            (F.col("cum_before") < rank)
            & (rank <= F.col("cum_before") + F.col("cnt"))
        ).select(
            "event_type",
            "bucket",
            F.lit(name).alias("q_name"),
            (rank - F.col("cum_before")).alias("residual_rank"),
        )
        targets = t if targets is None else targets.unionAll(t)
    # pass 2: rank ONLY the target buckets' rows (n/256-ish sorts)
    hits = (
        bucketed.join(
            F.broadcast(targets.select("event_type", "bucket").distinct()),
            ["event_type", "bucket"],
        )
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("event_type", "bucket").orderBy("value")
            ),
        )
        .join(F.broadcast(targets), ["event_type", "bucket"])
        .filter(F.col("rk") == F.col("residual_rank"))
        .select("event_type", "q_name", "value", "n")
    )
    agg = [F.max("n").cast("long").alias("n")]
    for _, name in _PCT_QS:
        agg.append(
            F.max(F.when(F.col("q_name") == name, F.col("value"))).alias(name)
        )
    return hits.groupBy("event_type").agg(*agg)
