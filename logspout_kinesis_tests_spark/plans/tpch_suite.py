"""TPC-H-shaped query suite beyond the shapes already in relational*.py.

The reference has no relational surface at all (SURVEY.md §2 Part B); these
exist for engine completeness — each pins a distinct *plan shape* the engine
must get right at 100 TB, over the driver's TPC-H-ish synthetic tables:

- Q7: dual-aliased dimension (nation joined twice) + OR'd pair predicate.
- Q10: fact→fact→dim aggregation with a wide group key and top-k on the agg.
- Q19: disjunction of conjunctive join+scan predicates (OR-of-ANDs) — the
  classic pushdown/CNF-conversion stress test.
- Q21-shape: correlated EXISTS + NOT EXISTS against the same fact (semi +
  anti join on the same key — one co-partitioned shuffle family).
- Q22-shape: uncorrelated scalar subquery feeding a filter + NOT EXISTS
  anti join (customers with no orders).

The synthetic schema lacks ``l_receiptdate``/``l_commitdate``/``c_phone``/
``p_container``, so Q21/Q22/Q19 keep their canonical plan shape but swap the
missing columns for present ones (``l_returnflag`` as the "failure" flag,
``c_mktsegment`` as the country-code analogue, brand/size/quantity only for
Q19's disjuncts).  Semantics are pinned by the DuckDB oracle either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logspout_kinesis_tests_spark.plans.helpers import (
    dec_sum,
    money,
    sql_dec_sum,
)
from logspout_kinesis_tests_spark.plans.registry import register
from logspout_kinesis_tests_spark.sources.tables import load_table

#: shared decimal revenue expression: extendedprice * (1 - discount), exact.
_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,2)) "
    "* (1 - CAST(l_discount AS DECIMAL(18,2)))"
)


def _rev() -> F.Column:
    return money("l_extendedprice") * (
        F.lit(1).cast("decimal(18,2)") - money("l_discount")
    )


@register(
    "tpch_q7_nation_volume",
    oracle=f"""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS ship_year,
           CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
    FROM supplier
    JOIN lineitem ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY n1.n_name, n2.n_name, CAST(EXTRACT(year FROM l_shipdate) AS BIGINT)
    """,
    doc="C3+: TPC-H Q7 shape — the same dimension (nation) joined twice "
    "under two aliases with an OR'd pair predicate, per-year revenue. "
    "Both nation sides broadcast; the OR filter runs after both joins "
    "(it references columns of both aliases), while the date range is "
    "pushed into the lineitem scan.",
)
def tpch_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("ship_year"),
        )
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


@register(
    "tpch_q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-04-01'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="C3/C4: TPC-H Q10 shape — returned-item revenue per customer over "
    "one quarter; wide group key, top-20 on the aggregate (deterministic "
    "via c_custkey tie-break).  Orders-side date filter prunes the fact "
    "join; nation broadcasts; top-k is TakeOrdered, never a global sort.",
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    ).select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "tpch_q19_disjunctive_join",
    oracle=f"""
    SELECT CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
    doc="C1/C3: TPC-H Q19 shape — disjunction of conjunctive predicates "
    "spanning both join sides (OR-of-ANDs).  Catalyst extracts the "
    "common-prefix filters it can (brand/size reach the part scan as an "
    "OR'd pushed filter; quantity bounds reach lineitem as "
    "quantity BETWEEN 1 AND 30), leaving the cross-side residual on the "
    "join — the standard CNF-extraction stress test.",
)
def tpch_q19_disjunctive_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")

    def disjunct(brand: str, size_hi: int, q_lo: int, q_hi: int) -> F.Column:
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(1, size_hi)
            & (q >= q_lo)
            & (q <= q_hi)
        )

    cond = (
        disjunct("Brand#12", 15, 1, 11)
        | disjunct("Brand#23", 25, 10, 20)
        | disjunct("Brand#34", 35, 20, 30)
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


@register(
    "tpch_q21_waiting_suppliers",
    # Canonical Q21 plan shape (correlated EXISTS + NOT EXISTS on the same
    # fact); the receipt>commit "late" predicate is replaced by
    # l_returnflag='R' ("the supplier whose item was returned") since the
    # synthetic schema has no receipt/commit dates.
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders      ON o_orderkey = l1.l_orderkey
    JOIN nation      ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_returnflag = 'R')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 10
    """,
    doc="C3+: TPC-H Q21 shape — sole-failing-supplier per multi-supplier "
    "order: correlated EXISTS (another supplier touched the order) and "
    "NOT EXISTS (no other supplier failed it) against the same fact. "
    "Both subqueries become per-order aggregate flags computed in ONE "
    "map-combined groupBy over the order's (suppkey, flag) pairs, then a "
    "single broadcast-able join back — one shuffle family on l_orderkey "
    "instead of two correlated re-scans.",
)
def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")
    ).select("n_nationkey")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )

    # Per-order supplier stats in one pass: how many distinct suppliers
    # touched the order, and how many distinct suppliers had a returned item.
    # EXISTS(other supplier)      ⇔ n_suppliers  > 1
    # NOT EXISTS(other R supplier)⇔ r_suppliers == 1 for an R row's supplier
    # (distinctness is per (orderkey, suppkey), so the flags are exact even
    # when one supplier has several lines in the order).
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("_n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("_r_supp"),
    )
    # l1 keeps every R row (Q21 counts rows, not distinct suppliers); the
    # per-order distinct flags stay exact regardless.
    l1 = li.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey")
    return (
        l1.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(per_order, "l_orderkey")
        .filter((F.col("_n_supp") > 1) & (F.col("_r_supp") == 1))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(10)
    )


@register(
    "tpch_q22_idle_customers",
    # Q22 plan shape; c_mktsegment stands in for the phone-prefix country
    # code the synthetic schema lacks.
    oracle=f"""
    SELECT c_mktsegment AS segment,
           COUNT(*) AS numcust,
           {sql_dec_sum('c_acctbal')} AS totacctbal
    FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE', 'MACHINERY')
      AND c_acctbal > (
          SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(c_acctbal)
          FROM customer
          WHERE c_acctbal > 0.0
            AND c_mktsegment IN ('BUILDING', 'AUTOMOBILE', 'MACHINERY'))
      AND NOT EXISTS (
          SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    doc="C3+: TPC-H Q22 shape — above-average-balance customers with no "
    "orders: uncorrelated scalar subquery (broadcast single-row "
    "cross join) + NOT EXISTS anti join against orders, grouped by the "
    "segment code.  The anti join shuffles only (o_custkey); the scalar "
    "average is exact decimal-sum arithmetic on both engines.",
)
def tpch_q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    segs = ("BUILDING", "AUTOMOBILE", "MACHINERY")
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin(*segs)
    ).select("c_custkey", "c_acctbal", "c_mktsegment")
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(money("c_acctbal")).cast("double") / F.count("c_acctbal")
        ).alias("_avg_bal")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(o, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("numcust"),
            dec_sum("c_acctbal").alias("totacctbal"),
        )
        .orderBy("segment")
    )
