"""Relational core — SURVEY.md §2 C1-C7 (+ the flagship query).

Each query is declarative DataFrame code: Catalyst handles predicate
pushdown, column pruning and join planning; AQE (enabled in session.py)
handles runtime shuffle coalescing and skew.  Small dimensions are
explicitly broadcast so the star joins never shuffle the fact table against
a dim — at 100 TB the fact scan partitions stream past executor-local
hash tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from logspout_kinesis_tests_spark.plans.helpers import (
    dec_avg,
    dec_sum,
    money,
    sql_dec_avg,
    sql_dec_sum,
    sql_ts_str,
    ts_str,
)
from logspout_kinesis_tests_spark.plans.registry import register
from logspout_kinesis_tests_spark.sources.tables import load_table


# --------------------------------------------------------------------------
# Flagship (entry() smoke query): C2 aggregate over the events stream table.
# --------------------------------------------------------------------------
@register(
    "flagship_event_stats",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           {sql_dec_sum('value')} AS total_value,
           {sql_dec_avg('value')} AS avg_value,
           {sql_ts_str('MIN(ts)')} AS first_ts,
           {sql_ts_str('MAX(ts)')} AS last_ts
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Flagship: per-event-type stats over the events table (C2).",
)
def flagship_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            dec_sum("value").alias("total_value"),
            dec_avg("value").alias("avg_value"),
            ts_str(F.min("ts")).alias("first_ts"),
            ts_str(F.max("ts")).alias("last_ts"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# C1 — filter / predicate (pushed down to the parquet scan).
# --------------------------------------------------------------------------
@register(
    "c1_filter_pushdown",
    oracle=f"""
    SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice, l_discount,
           {sql_ts_str('l_shipdate')} AS shipdate
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="C1: conjunctive predicates + projection; filters reach the scan.",
)
def c1_filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).select(
        "l_orderkey",
        "l_partkey",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        ts_str("l_shipdate").alias("shipdate"),
    )


# --------------------------------------------------------------------------
# C2 — hash aggregate (TPC-H Q1 shape: partial agg map-side, then final).
# --------------------------------------------------------------------------
@register(
    "c2_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dec_sum('l_quantity')} AS sum_qty,
           {sql_dec_sum('l_extendedprice')} AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))
                    * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE)
               AS sum_charge,
           {sql_dec_avg('l_quantity')} AS avg_qty,
           {sql_dec_avg('l_extendedprice')} AS avg_price,
           {sql_dec_avg('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="C2: TPC-H Q1 pricing summary — grouped hash aggregate.",
)
def c2_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = money("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - money("l_discount"))
    charge = disc_price * (F.lit(1).cast("decimal(18,2)") + money("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= "2000-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum("l_quantity").alias("sum_qty"),
            dec_sum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            dec_avg("l_quantity").alias("avg_qty"),
            dec_avg("l_extendedprice").alias("avg_price"),
            dec_avg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# C3 — joins: 6-table star (broadcast dims), left, semi, anti.
# --------------------------------------------------------------------------
@register(
    "c3_star_join_revenue",
    oracle=f"""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS revenue,
           COUNT(*) AS n_lineitems
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    ORDER BY n_name
    """,
    doc="C3: TPC-H Q5 shape — fact⋈fact plus broadcast dimension joins.",
)
def c3_star_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = {n: load_table(spark, sf_dir, n) for n in
         ("customer", "orders", "lineitem", "supplier", "nation", "region")}
    rev = money("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - money("l_discount"))
    return (
        t["orders"]
        .filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1998-01-01")
        )
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(
            t["supplier"],
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("n_name")
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
        .orderBy("n_name")
    )


@register(
    "c3_left_join_counts",
    oracle="""
    SELECT c_custkey, COUNT(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
    doc="C3: left outer join preserving customers with zero orders.",
)
def c3_left_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "c3_semi_join",
    oracle="""
    SELECT c_nationkey, COUNT(*) AS n_customers_with_high_value_orders
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 200000)
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
    doc="C3: left-semi join (EXISTS).",
)
def c3_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_customers_with_high_value_orders"))
        .orderBy("c_nationkey")
    )


@register(
    "c3_anti_join",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    doc="C3: left-anti join (NOT EXISTS) — customers with no orders.",
)
def c3_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


# --------------------------------------------------------------------------
# C4 — sort / limit / top-k (Spark plans TakeOrderedAndProject: no full sort).
# --------------------------------------------------------------------------
@register(
    "c4_topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    doc="C4: global top-k with deterministic tie-break.",
)
def c4_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


# --------------------------------------------------------------------------
# C5 — window functions.
# --------------------------------------------------------------------------
@register(
    "c5_window_topk_per_user",
    oracle="""
    SELECT user_id, event_id, value, rn FROM (
        SELECT user_id, event_id, value,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY value DESC, event_id) AS rn
        FROM events
    ) WHERE rn <= 3
    """,
    doc="C5: row_number top-3 per partition key.",
)
def c5_window_topk_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("value").desc(), F.col("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("user_id", "event_id", "value", "rn")
    )


@register(
    "c5_window_running_lag",
    oracle=f"""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS running_value,
           LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
    FROM events
    """,
    doc="C5: running aggregate + lag over event time.",
)
def c5_window_running_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.sum(money("value"))
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("double")
        .alias("running_value"),
        F.lag("event_type").over(w).alias("prev_type"),
    )


# --------------------------------------------------------------------------
# C6 — distinct / set operations.
# --------------------------------------------------------------------------
@register(
    "c6_distinct",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
    doc="C6: dropDuplicates as grouped distinct.",
)
def c6_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select("c_mktsegment", "c_nationkey").dropDuplicates()


@register(
    "c6_setops",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'purchase'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'error'
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'signup'
    """,
    doc="C6: INTERSECT / EXCEPT set algebra.",
)
def c6_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchase = ev.filter(F.col("event_type") == "purchase").select("user_id")
    error = ev.filter(F.col("event_type") == "error").select("user_id")
    signup = ev.filter(F.col("event_type") == "signup").select("user_id")
    # INTERSECT / EXCEPT are the DISTINCT variants in both engines.
    return purchase.intersect(error).subtract(signup)


# --------------------------------------------------------------------------
# C7 — event-time tumbling window aggregate (batch emulation; the streaming
# form adds only a watermark — see streaming/pipeline.py).
# --------------------------------------------------------------------------
@register(
    "c7_tumbling_window",
    oracle=f"""
    SELECT {sql_ts_str("date_trunc('hour', ts)")} AS window_start,
           event_type,
           COUNT(*) AS n,
           {sql_dec_sum('value')} AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    doc="C7: 1-hour tumbling event-time window.",
)
def c7_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), dec_sum("value").alias("total_value"))
        .select(
            ts_str(F.col("w.start")).alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )
