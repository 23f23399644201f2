"""Extended relational coverage beyond the §2 C-list minimums.

The reference has none of these (SURVEY.md §2 Part B); they exist because a
"complete" engine a reference user could switch to needs the standard
relational surface: rollup/cube grouping, richer window functions, scalar
subqueries, explicit sort-merge joins, session and sliding event-time
windows.  All fully oracle-matched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from logspout_kinesis_tests_spark.plans.helpers import (
    dec_sum,
    money,
    sql_dec_sum,
    sql_ts_str,
    ts_str,
)
from logspout_kinesis_tests_spark.plans.registry import register
from logspout_kinesis_tests_spark.sources.tables import load_table


@register(
    "c2_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dec_sum('l_quantity')} AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
    doc="C2+: ROLLUP grouping sets (subtotals + grand total).",
)
def c2_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        dec_sum("l_quantity").alias("sum_qty"), F.count("*").alias("n")
    )


@register(
    "c2_cube",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           {sql_dec_sum('o_totalprice')} AS total,
           COUNT(*) AS n
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
    doc="C2+: CUBE grouping sets.",
)
def c2_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        dec_sum("o_totalprice").alias("total"), F.count("*").alias("n")
    )


@register(
    "c3_sort_merge_join",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_lineitems,
           {sql_dec_sum('l_extendedprice')} AS total_price
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="C3: fact-to-fact equi-join forced onto the sort-merge path "
    "(merge hint) — the strategy the optimizer picks at 100 TB when "
    "neither side broadcasts.",
)
def c3_sort_merge_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        o.hint("merge")
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lineitems"),
            dec_sum("l_extendedprice").alias("total_price"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "tpch_q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="C3/C4: TPC-H Q3 shape — segment-filtered join, grouped revenue, "
    "top-10 by revenue.",
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logspout_kinesis_tests_spark.plans.helpers import date_str, money

    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-03-15")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-03-15")
    rev = money("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - money("l_discount"))
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            "revenue",
            date_str("o_orderdate").alias("orderdate"),
            "o_orderpriority",
        )
    )


@register(
    "tpch_q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="C1/C2: TPC-H Q6 shape — pure filter-aggregate, fully pushed down.",
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logspout_kinesis_tests_spark.plans.helpers import money

    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(money("l_extendedprice") * money("l_discount"))
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n"),
        )
    )


@register(
    "c2_pivot",
    oracle="""
    SELECT user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) FILTER (WHERE event_type = 'click')    AS DOUBLE) AS click,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) FILTER (WHERE event_type = 'error')    AS DOUBLE) AS error,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) FILTER (WHERE event_type = 'purchase') AS DOUBLE) AS purchase,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) FILTER (WHERE event_type = 'signup')   AS DOUBLE) AS signup,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) FILTER (WHERE event_type = 'view')     AS DOUBLE) AS view
    FROM events
    GROUP BY user_id
    """,
    doc="C2+: pivot — per-user value totals spread across event-type "
    "columns (explicit pivot values keep the schema static, which is also "
    "the scale-safe form: no driver-side distinct scan).",
)
def c2_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .agg(dec_sum("value"))
    )


@register(
    "c3_shuffle_hash_join",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    doc="C3: shuffle-hash join (hint) — the middle strategy between "
    "broadcast and sort-merge; right choice when both sides are large but "
    "one side's per-partition slice fits memory (skips both sorts).",
)
def c3_shuffle_hash_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").hint("shuffle_hash")
    return (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("c_mktsegment")
    )


@register(
    "c6_union_all",
    oracle="""
    SELECT user_id, 'purchase' AS src FROM events WHERE event_type = 'purchase'
    UNION ALL
    SELECT user_id, 'signup' AS src FROM events WHERE event_type = 'signup'
    """,
    doc="C6: UNION ALL (bag union, no dedup shuffle).",
)
def c6_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchase = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.lit("purchase").alias("src")
    )
    signup = ev.filter(F.col("event_type") == "signup").select(
        "user_id", F.lit("signup").alias("src")
    )
    return purchase.union(signup)


@register(
    "c4_multi_key_sort",
    oracle=f"""
    SELECT c_mktsegment, c_nationkey, c_custkey, c_acctbal
    FROM customer
    ORDER BY c_mktsegment, c_acctbal DESC, c_custkey
    LIMIT 100
    """,
    doc="C4: multi-key mixed-direction sort with limit.",
)
def c4_multi_key_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return (
        c.orderBy("c_mktsegment", F.col("c_acctbal").desc(), "c_custkey")
        .limit(100)
        .select("c_mktsegment", "c_nationkey", "c_custkey", "c_acctbal")
    )


@register(
    "c5_rank_dense_ntile_lead",
    oracle="""
    SELECT event_id, user_id,
           RANK()       OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           NTILE(4)     OVER w AS quartile,
           LEAD(event_id) OVER w AS next_event
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY value DESC, event_id)
    """,
    doc="C5: rank / dense_rank / ntile / lead window functions.",
)
def c5_rank_dense_ntile_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("value").desc(), F.col("event_id"))
    return ev.select(
        "event_id",
        "user_id",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.lead("event_id").over(w).alias("next_event"),
    )


@register(
    "c_scalar_subquery",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice >
          (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                  / COUNT(*) * 1.5
           FROM orders)
    """,
    doc="C+: scalar subquery — orders 1.5× above the mean price "
    "(broadcast one-row aggregate against the scan).",
)
def c_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    avg_df = o.agg(
        (
            F.sum(money("o_totalprice")).cast("double") / F.count("*") * F.lit(1.5)
        ).alias("threshold")
    )
    return (
        o.crossJoin(F.broadcast(avg_df))
        .filter(F.col("o_totalprice") > F.col("threshold"))
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "c7_session_window",
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, ts, value,
               -- >= not >: Spark's session_window merge is end-exclusive,
               -- so a gap of exactly 30 minutes starts a NEW session.
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id)
                         >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ), numbered AS (
        SELECT user_id, ts, value,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    )
    SELECT user_id,
           {sql_ts_str('MIN(ts)')} AS session_start,
           COUNT(*) AS n_events,
           {sql_dec_sum('value')} AS session_value
    FROM numbered
    GROUP BY user_id, session_id
    """,
    doc="C7+: session windows (30-minute inactivity gap) — "
    "F.session_window vs the SQL gaps-and-islands emulation.",
)
def c7_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), dec_sum("value").alias("session_value"))
        .select(
            "user_id",
            ts_str(F.col("w.start")).alias("session_start"),
            "n_events",
            "session_value",
        )
    )


@register(
    "c7_sliding_window",
    oracle=f"""
    WITH assigned AS (
        SELECT time_bucket(INTERVAL 30 MINUTE, ts) AS window_start, value FROM events
        UNION ALL
        SELECT time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE, value FROM events
    )
    SELECT {sql_ts_str('window_start')} AS window_start,
           COUNT(*) AS n,
           {sql_dec_sum('value')} AS total_value
    FROM assigned
    GROUP BY window_start
    ORDER BY window_start
    """,
    doc="C7+: sliding window (1 hour, 30-minute slide) — each event lands "
    "in two windows; oracle assigns via shifted 30-minute buckets.",
)
def c7_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n"), dec_sum("value").alias("total_value"))
        .select(
            ts_str(F.col("w.start")).alias("window_start"), "n", "total_value"
        )
        .orderBy("window_start")
    )


@register(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
    doc="C3: TPC-H Q4 shape — correlated EXISTS as a left-semi join with a "
    "non-equi residual (l_shipdate > o_orderdate), then a counting agg "
    "(adapted to the driver schema: shipdate-after-orderdate in place of "
    "receipt-after-commit).",
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "tpch_q12_priority_counts",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY l_returnflag
    """,
    doc="C2/C3: TPC-H Q12 shape — fact-fact equi-join with conditional "
    "counting aggregates (integer CASE sums: exact, order-independent; "
    "adapted to the driver schema: returnflag in place of shipmode).",
)
def tpch_q12_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_returnflag")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "c2_grouping_sets",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dec_sum('l_quantity')} AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
    """,
    doc="C2+: explicit GROUPING SETS (asymmetric set list — neither ROLLUP "
    "nor CUBE) through the native DataFrame.groupingSets API.",
)
def c2_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupingSets(
        [["l_returnflag", "l_linestatus"], ["l_linestatus"], []],
        "l_returnflag",
        "l_linestatus",
    ).agg(dec_sum("l_quantity").alias("sum_qty"), F.count("*").alias("n"))


@register(
    "c5_range_frame_window",
    oracle="""
    SELECT event_id, user_id, value,
           CAST(SUM(CAST(value AS DECIMAL(18,2)))
                OVER (PARTITION BY user_id ORDER BY value
                      RANGE BETWEEN 10 PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS near_sum
    FROM events
    """,
    doc="C5+: value-RANGE window frame (peers included on ties — the frame "
    "rows are a deterministic set, and the decimal sum is order-free, so "
    "the oracle matches bit-for-bit).",
)
def c5_range_frame_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("value").rangeBetween(-10, 0)
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double").alias("near_sum"),
    )


@register(
    "c6_multiset_ops",
    oracle="""
    WITH a AS (SELECT event_type FROM events WHERE event_id % 2 = 0),
         b AS (SELECT event_type FROM events WHERE event_id % 3 = 0)
    SELECT 'except_all' AS op, event_type, COUNT(*) AS n
    FROM (SELECT event_type FROM a EXCEPT ALL SELECT event_type FROM b)
    GROUP BY event_type
    UNION ALL
    SELECT 'intersect_all', event_type, COUNT(*)
    FROM (SELECT event_type FROM a INTERSECT ALL SELECT event_type FROM b)
    GROUP BY event_type
    """,
    doc="C6+: multiset EXCEPT ALL / INTERSECT ALL (duplicate-preserving set "
    "ops), compared as per-type multiplicity counts.",
)
def c6_multiset_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_id") % 2 == 0).select("event_type")
    b = ev.filter(F.col("event_id") % 3 == 0).select("event_type")
    ex = (
        a.exceptAll(b)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .select(F.lit("except_all").alias("op"), "event_type", "n")
    )
    inter = (
        a.intersectAll(b)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .select(F.lit("intersect_all").alias("op"), "event_type", "n")
    )
    return ex.unionByName(inter)


@register(
    "c3_full_outer_join",
    # Asymmetric sides (purchases by even users vs errors by users % 3 = 0)
    # so BOTH null-extended directions actually occur in the result.
    oracle="""
    WITH a AS (
        SELECT user_id, COUNT(*) AS n_purchase FROM events
        WHERE event_type = 'purchase' AND user_id % 2 = 0 GROUP BY user_id),
    b AS (
        SELECT user_id, COUNT(*) AS n_error FROM events
        WHERE event_type = 'error' AND user_id % 3 = 0 GROUP BY user_id)
    SELECT COALESCE(a.user_id, b.user_id) AS user_id, a.n_purchase, b.n_error
    FROM a FULL OUTER JOIN b ON a.user_id = b.user_id
    """,
    doc="C3: full outer join with both null-extended sides exercised; "
    "completes the join-type matrix (inner/left/semi/anti/full).",
)
def c3_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    a = (
        ev.filter((F.col("event_type") == "purchase") & (F.col("user_id") % 2 == 0))
        .groupBy("user_id")
        .agg(F.count("*").alias("n_purchase"))
    )
    b = (
        ev.filter((F.col("event_type") == "error") & (F.col("user_id") % 3 == 0))
        .groupBy("user_id")
        .agg(F.count("*").alias("n_error"))
        .withColumnRenamed("user_id", "user_id_b")
    )
    return a.join(b, F.col("user_id") == F.col("user_id_b"), "full").select(
        F.coalesce(F.col("user_id"), F.col("user_id_b")).alias("user_id"),
        "n_purchase",
        "n_error",
    )


@register(
    "c2_stat_aggregates",
    # Second-moment aggregates are accumulation-order-sensitive in the last
    # few ULPs; 6dp rounding (the TF-IDF trick) absorbs that while still
    # pinning the statistics.  Verified stable at sf0.01 and sf0.1.
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 6) AS sd_qty,
           round(var_samp(l_quantity), 6) AS var_qty,
           CASE WHEN stddev_samp(l_quantity) > 0
                 AND stddev_samp(l_extendedprice) > 0
                THEN round(covar_samp(l_quantity, l_extendedprice)
                           / (stddev_samp(l_quantity)
                              * stddev_samp(l_extendedprice)), 6) END
               AS corr_qty_price,
           round(covar_samp(l_quantity, l_extendedprice), 6) AS covar_qty_price
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="C2+: statistical aggregates (sample stddev/variance, correlation, "
    "covariance) — one map-combined groupBy; partials merge exactly like "
    "sums at 100 TB.  The correlation is the guarded quotient "
    "covar/(sd·sd) rather than corr(): a zero-variance group makes corr() "
    "divide by zero INSIDE the aggregate (ANSI Spark raises, no lazy CASE "
    "can reach it) — the quotient form moves the division into the "
    "projection where the zero-variance guard short-circuits it to NULL "
    "on both engines.",
)
def c2_stat_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    g = li.groupBy("l_returnflag").agg(
        F.stddev_samp("l_quantity").alias("_sdq"),
        F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
        F.stddev_samp("l_extendedprice").alias("_sdp"),
        F.covar_samp("l_quantity", "l_extendedprice").alias("_cov"),
    )
    return g.select(
        "l_returnflag",
        F.round(F.col("_sdq"), 6).alias("sd_qty"),
        "var_qty",
        F.when(
            (F.col("_sdq") > 0) & (F.col("_sdp") > 0),
            F.round(F.col("_cov") / (F.col("_sdq") * F.col("_sdp")), 6),
        ).alias("corr_qty_price"),
        F.round(F.col("_cov"), 6).alias("covar_qty_price"),
    )


@register(
    "c5_funnel_stages",
    # Ordered-sequence funnel: first signup, first click strictly after it,
    # first purchase strictly after that.  Every stage join shuffles on the
    # SAME key (user_id), so at 100 TB the exchanges reuse one
    # co-partitioning (bucketed storage makes the event side exchange-free);
    # stage tables shrink monotonically and broadcast once small.
    oracle="""
    WITH s1 AS (
        SELECT user_id, MIN(ts) AS t1 FROM events
        WHERE event_type = 'signup' GROUP BY user_id),
    s2 AS (
        SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
        JOIN s1 USING (user_id)
        WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id),
    s3 AS (
        SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
        JOIN s2 USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id)
    SELECT 'signup' AS stage, COUNT(*) AS n_users FROM s1
    UNION ALL SELECT 'click_after_signup', COUNT(*) FROM s2
    UNION ALL SELECT 'purchase_after_click', COUNT(*) FROM s3
    """,
    doc="C5+: funnel analysis — users completing an ordered event sequence "
    "(signup -> click -> purchase), each stage strictly after the previous "
    "stage's first occurrence; per-stage user counts.",
)
def c5_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    s1 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )

    def stage(df: DataFrame, label: str) -> DataFrame:
        return df.agg(F.count("*").alias("n_users")).select(
            F.lit(label).alias("stage"), "n_users"
        )

    return (
        stage(s1, "signup")
        .unionByName(stage(s2, "click_after_signup"))
        .unionByName(stage(s3, "purchase_after_click"))
    )


@register(
    "tpch_q14_promo_revenue",
    oracle="""
    SELECT CAST(100.0 * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                   THEN CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2)))
                   ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
           / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
           AS DOUBLE) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-06-01'
      AND l_shipdate <  TIMESTAMP '1997-07-01'
    """,
    doc="C2/C3: TPC-H Q14 shape — conditional-aggregate revenue share "
    "through a fact-to-dimension join (part broadcastable).",
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-06-01") & (F.col("l_shipdate") < "1997-07-01")
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = money("l_extendedprice") * (
        F.lit(1).cast("decimal(18,2)") - money("l_discount")
    )
    promo = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(rev).cast("double")
            )
            .cast("double")
            .alias("promo_revenue_pct")
        )
    )


@register(
    "tpch_q18_large_orders",
    oracle=f"""
    SELECT c_custkey, o_orderkey,
           {sql_dec_sum('l_quantity')} AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING SUM(l_quantity) > 350)
    GROUP BY c_custkey, o_orderkey
    ORDER BY total_qty DESC, o_orderkey
    LIMIT 20
    """,
    doc="C3/C4: TPC-H Q18 shape — group-by-having IN-subquery (semi-join "
    "on an aggregated fact) feeding a three-way join and top-20.",
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_sq"))
        .filter(F.col("_sq") > 350)
        .select("l_orderkey")
    )
    return (
        li.join(big, "l_orderkey", "left_semi")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "o_orderkey")
        .agg(dec_sum("l_quantity").alias("total_qty"))
        .orderBy(F.col("total_qty").desc(), "o_orderkey")
        .limit(20)
    )


@register(
    "c2_histogram",
    oracle="""
    SELECT event_type,
           CAST(FLOOR(value / 10) AS BIGINT) AS bucket,
           COUNT(*) AS n,
           CAST(MIN(value) AS DOUBLE) AS lo,
           CAST(MAX(value) AS DOUBLE) AS hi
    FROM events
    GROUP BY event_type, CAST(FLOOR(value / 10) AS BIGINT)
    """,
    doc="C2+: fixed-width value histogram per event type — binning is a "
    "scan-side expression, so the groupBy shuffles (type, bucket) pairs "
    "with map-side combine; the canonical distribution profiler at scale.",
)
def c2_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bucket = F.floor(F.col("value") / 10).cast("long")
    return ev.groupBy("event_type", bucket.alias("bucket")).agg(
        F.count("*").alias("n"),
        F.min("value").cast("double").alias("lo"),
        F.max("value").cast("double").alias("hi"),
    )


@register(
    "c19_zorder_key",
    oracle="""
    SELECT event_id,
           CAST(list_sum(list_transform(range(0, 21),
               i -> (((user_id // (1 << i)) & 1) * (1 << (2 * i)))
                  + ((((event_id % 1024) // (1 << i)) & 1) * (1 << (2 * i + 1)))
           )) AS BIGINT) AS zkey
    FROM events
    """,
    doc="C19+: Z-curve (Morton) interleave of (user_id, event_id%1024) — "
    "the two-dimensional locality key for write-time clustering: sorting "
    "by it keeps both range predicates file-prunable.  Pure bit "
    "arithmetic, oracle-verified, codegen.",
)
def c19_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logspout_kinesis_tests_spark.sources.dataset import zorder_key

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", (F.col("event_id") % 1024).alias("_eb")
    )
    return ev.select("event_id", zorder_key("user_id", "_eb").alias("zkey"))


@register(
    "c5_transition_matrix",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS next_type
        FROM events),
    pairs AS (
        SELECT event_type, next_type, COUNT(*) AS n
        FROM seq WHERE next_type IS NOT NULL
        GROUP BY event_type, next_type),
    tot AS (SELECT event_type, SUM(n) AS n_from FROM pairs GROUP BY event_type)
    SELECT p.event_type AS from_type, p.next_type AS to_type, p.n,
           round(CAST(p.n AS DOUBLE) / t.n_from, 6) AS prob
    FROM pairs p JOIN tot t USING (event_type)
    """,
    doc="C5+: user-journey Markov transition matrix — per-user event "
    "sequences via lead() (one shuffle on user_id), pair counts "
    "map-combined, probabilities as exact rational n/total rounded 6dp.  "
    "The next-event model behind funnel/session analytics.",
)
def c5_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("next_type", F.lead("event_type").over(w)).filter(
        F.col("next_type").isNotNull()
    )
    pairs = seq.groupBy(
        F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type")
    ).agg(F.count("*").alias("n"))
    tot = pairs.groupBy("from_type").agg(F.sum("n").alias("n_from"))
    return pairs.join(F.broadcast(tot), "from_type").select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n").cast("double") / F.col("n_from"), 6).alias("prob"),
    )


@register(
    "c2_unpivot",
    oracle="""
    WITH p AS (
        SELECT user_id,
               SUM(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(18,2)) END) AS click,
               SUM(CASE WHEN event_type = 'view' THEN CAST(value AS DECIMAL(18,2)) END) AS view
        FROM events GROUP BY user_id)
    SELECT user_id, kind, CAST(total AS DOUBLE) AS total FROM (
        SELECT user_id, 'click' AS kind, click AS total FROM p
        UNION ALL
        SELECT user_id, 'view', view FROM p) u
    WHERE total IS NOT NULL
    """,
    doc="C2+: unpivot/melt — the inverse of pivot via DataFrame.unpivot "
    "(STACK under the hood): wide per-type totals back to long "
    "(user, kind, total) rows, NULL cells dropped.  Scan-side expression "
    "fan-out, no shuffle beyond the originating aggregate.",
)
def c2_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    wide = (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "view"])
        .agg(dec_sum("value"))
    )
    return (
        wide.unpivot("user_id", ["click", "view"], "kind", "total")
        .withColumn("total", F.col("total").cast("double"))
        .filter(F.col("total").isNotNull())
    )


@register(
    "c16_twap",
    oracle="""
    WITH seq AS (
        SELECT user_id, value, ts,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
        FROM events),
    seg AS (
        SELECT user_id, value,
               epoch_us(next_ts) - epoch_us(ts) AS dt_us
        FROM seq WHERE next_ts IS NOT NULL)
    SELECT user_id,
           round(CAST(SUM(CAST(value AS DECIMAL(18,2)) * dt_us) AS DOUBLE)
                 / SUM(dt_us), 6) AS twap,
           CAST(SUM(dt_us) AS BIGINT) AS span_us
    FROM seg GROUP BY user_id
    HAVING SUM(dt_us) > 0
    """,
    doc="C16+: time-weighted average (TWAP) per user — each reading "
    "weighted by its holding interval to the next event (lead(), one "
    "shuffle), exact integer second weights, 6dp-rounded ratio.  The "
    "irregular-sampling mean that a plain AVG gets wrong.",
)
def c16_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").select("user_id", "value", "ts", "event_id")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seg = (
        ev.withColumn("next_ts", F.lead("ts").over(w))
        .filter(F.col("next_ts").isNotNull())
        .withColumn(
            "dt_us",
            # exact integer microseconds (sub-second parts truncate
            # DIFFERENTLY under per-side second casts — measured off-by-2s)
            F.unix_micros(F.col("next_ts").cast("timestamp"))
            - F.unix_micros(F.col("ts").cast("timestamp")),
        )
    )
    return (
        seg.groupBy("user_id")
        .agg(
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)") * F.col("dt_us")).cast("double")
                / F.sum("dt_us"),
                6,
            ).alias("twap"),
            F.sum("dt_us").alias("span_us"),
        )
        .filter(F.col("span_us") > 0)
    )


@register(
    "c5_cohort_retention",
    oracle="""
    WITH firsts AS (
        SELECT user_id, MIN(date_trunc('week', ts)) AS cohort_week
        FROM events GROUP BY user_id),
    activity AS (
        SELECT DISTINCT e.user_id, f.cohort_week,
               CAST(date_diff('week', f.cohort_week, date_trunc('week', e.ts)) AS BIGINT)
                   AS week_offset
        FROM events e JOIN firsts f USING (user_id)),
    sizes AS (
        SELECT cohort_week, COUNT(*) AS cohort_size
        FROM firsts GROUP BY cohort_week)
    SELECT strftime(a.cohort_week, '%Y-%m-%d') AS cohort,
           a.week_offset,
           COUNT(*) AS active_users,
           s.cohort_size
    FROM activity a JOIN sizes s USING (cohort_week)
    GROUP BY 1, 2, s.cohort_size
    """,
    doc="C5+: cohort retention matrix — users bucketed by first-seen week, "
    "activity counted per (cohort, week-offset); two map-combined "
    "aggregates plus a broadcast of the cohort-size table.  The classic "
    "retention triangle.",
)
def c5_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.floor(
                    (
                        F.date_trunc("week", F.col("ts")).cast("long")
                        - F.col("cohort_week").cast("long")
                    )
                    / (7 * 86400)
                )
            ).alias("week_offset"),
        )
        .distinct()
    )
    sizes = firsts.groupBy("cohort_week").agg(F.count("*").alias("cohort_size"))
    return (
        activity.groupBy("cohort_week", "week_offset")
        .agg(F.count("*").alias("active_users"))
        .join(F.broadcast(sizes), "cohort_week")
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort"),
            "week_offset",
            "active_users",
            "cohort_size",
        )
    )
