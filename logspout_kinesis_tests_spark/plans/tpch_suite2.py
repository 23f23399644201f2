"""TPC-H shapes Q2/Q8/Q9/Q11/Q13/Q15/Q16/Q17/Q20 — completing all 22.

With these, every one of the 22 canonical TPC-H plan shapes has a registered,
oracle-matched query (Q1=c2_pricing_summary, Q3/Q6 in relational*, Q4/Q12/
Q14/Q18 in relational_ext, Q5=c3_star_join_revenue, Q7/Q10/Q19/Q21/Q22 in
tpch_suite).  The reference has no relational surface (SURVEY.md §2 Part B);
these pin distinct optimizer/physical shapes the engine must keep correct
and fast at 100 TB:

- Q2: correlated scalar MIN subquery over a join tree (de-correlated to a
  per-key window min — one shuffle, not a re-scan per row).
- Q8: two-level conditional market share (CASE inside an exact decimal sum).
- Q9: multi-fact profit expression with per-row decimal arithmetic.
- Q11: group-by + HAVING against an uncorrelated scalar total (broadcast).
- Q13: outer join with a compound ON condition, then an agg-of-agg
  distribution.
- Q15: agg view reused twice (revenue per supplier vs its global max).
- Q16: count-distinct over a deduplicated bridge with a NOT-IN anti join.
- Q17: correlated per-part average de-correlated to groupBy + join-back.
- Q20: nested semi-join chain through a HAVING-filtered aggregate.

The synthetic schema has no ``partsupp``; the distinct ``(l_partkey,
l_suppkey)`` pairs of ``lineitem`` stand in for it (noted per query), and
``s_acctbal`` stands in for ``ps_supplycost`` in Q2.  All float outputs go
through the exact-decimal-sum policy (``plans/helpers.py``) so the DuckDB
hash comparison is bit-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from logspout_kinesis_tests_spark.plans.helpers import (
    dec_sum,
    money,
    sql_dec_sum,
)
from logspout_kinesis_tests_spark.plans.registry import register
from logspout_kinesis_tests_spark.sources.tables import load_table

#: shared decimal revenue expression (same as tpch_suite).
_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,2)) "
    "* (1 - CAST(l_discount AS DECIMAL(18,2)))"
)

#: partsupp stand-in: every (part, supplier) pair that ever shipped together.
_PS_SQL = "(SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)"


def _rev() -> F.Column:
    return money("l_extendedprice") * (
        F.lit(1).cast("decimal(18,2)") - money("l_discount")
    )


def _pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (l_partkey, l_suppkey) bridge — the partsupp stand-in."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )


@register(
    "tpch_q2_min_cost_supplier",
    oracle=f"""
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name
    FROM part
    JOIN {_PS_SQL} ps ON p_partkey = ps.l_partkey
    JOIN supplier ON s_suppkey = ps.l_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE p_type = 'LARGE' AND p_size <= 10 AND r_name = 'EUROPE'
      AND s_acctbal = (
          SELECT MIN(s2.s_acctbal)
          FROM {_PS_SQL} ps2
          JOIN supplier s2 ON s2.s_suppkey = ps2.l_suppkey
          JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
          JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
          WHERE ps2.l_partkey = p_partkey AND r2.r_name = 'EUROPE')
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    doc="C3+: TPC-H Q2 shape — cheapest qualifying supplier per part via a "
    "correlated scalar MIN over the same join tree (s_acctbal stands in "
    "for ps_supplycost; the distinct lineitem pair bridge for partsupp). "
    "De-correlated: build the qualifying (part, supplier) rows ONCE, take "
    "the per-part min with a window, keep rows equal to it — one shuffle "
    "on p_partkey instead of a re-scan per outer row.  MIN of a raw "
    "column is exact, so double equality is safe cross-engine.",
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_type") == "LARGE") & (F.col("p_size") <= 10))
        .select("p_partkey", "p_name")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal", "s_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    r = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    ).select("r_regionkey")
    # Qualifying (part, supplier) candidates: the correlated subquery and the
    # outer query share this relation, so build it once.  All dims broadcast.
    euro_sup = s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")).join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    cand = (
        _pairs(spark, sf_dir)
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(euro_sup.select("s_suppkey", "s_name", "s_acctbal", "n_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
    )
    w = Window.partitionBy("p_partkey")
    return (
        cand.withColumn("_min_bal", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("_min_bal"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "tpch_q8_market_share",
    oracle=f"""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(CASE WHEN n2.n_name = 'NATION_5'
                         THEN CAST(l_extendedprice AS DECIMAL(18,2))
                         ELSE CAST(0 AS DECIMAL(18,2)) END
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS nation_volume,
           CAST(SUM({_REV_SQL}) AS DOUBLE) AS total_volume,
           CAST(SUM(CASE WHEN n2.n_name = 'NATION_5'
                         THEN CAST(l_extendedprice AS DECIMAL(18,2))
                         ELSE CAST(0 AS DECIMAL(18,2)) END
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               / CAST(SUM({_REV_SQL}) AS DOUBLE) AS mkt_share
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region    ON n1.n_regionkey = r_regionkey
    JOIN supplier  ON s_suppkey = l_suppkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
    GROUP BY CAST(EXTRACT(year FROM o_orderdate) AS BIGINT)
    ORDER BY o_year
    """,
    doc="C2/C3: TPC-H Q8 shape — one nation's share of a regional market "
    "per year: conditional revenue (CASE folded INSIDE the exact decimal "
    "sum) over a 7-table join with the same dimension aliased twice.  "
    "Every dimension broadcasts; the only shuffles are lineitem⋈orders "
    "and the year groupBy.  The share divides two doubles derived from "
    "exact decimal sums, so it is bit-identical cross-engine.",
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey", "l_extendedprice", "l_discount"
    )
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "ECONOMY"
    ).select("p_partkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation"))
    r = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "AMERICA"
    ).select("r_regionkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cond_price = (
        F.when(F.col("supp_nation") == "NATION_5", F.col("l_extendedprice"))
        .otherwise(F.lit(0))
        .cast("decimal(18,2)")
    )
    nation_vol = cond_price * (F.lit(1).cast("decimal(18,2)") - money("l_discount"))
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            F.sum(nation_vol).cast("double").alias("nation_volume"),
            F.sum(_rev()).cast("double").alias("total_volume"),
        )
        .withColumn("mkt_share", F.col("nation_volume") / F.col("total_volume"))
        .orderBy("o_year")
    )


@register(
    "tpch_q9_product_profit",
    oracle=f"""
    SELECT n_name AS nation,
           CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM({_REV_SQL}
                    - CAST(p_retailprice AS DECIMAL(18,2))
                      * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, CAST(EXTRACT(year FROM o_orderdate) AS BIGINT)
    ORDER BY nation, o_year DESC
    """,
    doc="C2/C3: TPC-H Q9 shape — profit per supplier-nation per year with a "
    "per-row decimal expression mixing columns of three tables "
    "(p_retailprice × l_quantity stands in for ps_supplycost × "
    "l_quantity).  part/supplier/nation broadcast; lineitem⋈orders is "
    "the one big shuffle.  The LIKE filter prunes part before the join.",
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey",
        "l_extendedprice", "l_discount", "l_quantity",
    )
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%red%")
    ).select("p_partkey", "p_retailprice")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    profit = _rev() - money("p_retailprice") * money("l_quantity")
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@register(
    "tpch_q11_important_parts",
    oracle=f"""
    SELECT l_partkey AS p_key, {sql_dec_sum(_REV_SQL, 4)} AS part_value
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_3'
    GROUP BY l_partkey
    HAVING {sql_dec_sum(_REV_SQL, 4)} > 0.001 * (
        SELECT {sql_dec_sum(_REV_SQL, 4)}
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_3')
    ORDER BY part_value DESC, p_key
    """,
    doc="C2+: TPC-H Q11 shape — per-part value within one nation, kept only "
    "when above a fraction of the nation's total: group-by + HAVING "
    "against an uncorrelated scalar subquery.  The total re-aggregates "
    "the per-part decimal sums (exact, so it equals the direct global "
    "sum) and broadcasts as a single row — the fact table is scanned "
    "once, not twice.",
)
def tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_3"
    ).select("n_nationkey")
    per_part = (
        li.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("l_partkey").alias("p_key"))
        # keep the exact decimal sum so the re-aggregated total is exact too
        .agg(F.sum(_rev().cast("decimal(38,4)")).alias("_val_dec"))
    )
    total = per_part.agg(
        F.sum("_val_dec").cast("double").alias("_total")
    )
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("_val_dec").cast("double") > 0.001 * F.col("_total"))
        .select("p_key", F.col("_val_dec").cast("double").alias("part_value"))
        .orderBy(F.col("part_value").desc(), "p_key")
    )


@register(
    "tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer
        LEFT JOIN orders ON c_custkey = o_custkey
                        AND o_orderpriority <> '5-LOW'
        GROUP BY c_custkey) per_cust
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    doc="C3/C2: TPC-H Q13 shape — how many customers placed how many "
    "orders: LEFT OUTER join with a compound ON condition (the priority "
    "exclusion must live in the ON clause, not WHERE, to keep zero-order "
    "customers), per-customer counts, then a distribution over the "
    "counts.  Two aggregations; the second one is tiny (≤ distinct "
    "counts) and runs after a shuffle of (c_count) longs only.",
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    per_cust = (
        c.join(
            o,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "5-LOW"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "tpch_q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               CAST(SUM({_REV_SQL}) AS DOUBLE) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    doc="C2/C3: TPC-H Q15 shape — the quarter's top supplier(s): an "
    "aggregate view consumed twice (row source + scalar MAX).  Spark "
    "computes the per-supplier revenue once, takes the max as a "
    "broadcast single-row join, and keeps ties exactly; equality on "
    "doubles is safe because both sides derive from the same exact "
    "decimal sum.",
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev()).cast("double").alias("total_revenue")
    )
    best = revenue.agg(F.max("total_revenue").alias("_max_rev"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(best))
        .filter(F.col("total_revenue") == F.col("_max_rev"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "tpch_q16_supplier_part_counts",
    oracle=f"""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT ps.l_suppkey) AS supplier_cnt
    FROM {_PS_SQL} ps
    JOIN part ON p_partkey = ps.l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type NOT IN ('PROMO', 'ECONOMY')
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND ps.l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    doc="C6/C3: TPC-H Q16 shape — distinct supplier counts per part facet "
    "over the deduplicated (part, supplier) bridge, excluding suppliers "
    "from a NOT-IN subquery (negative balance stands in for the "
    "complaints LIKE).  The NOT IN becomes a broadcast LEFT ANTI join "
    "(s_suppkey is never null, so the semantics coincide); "
    "COUNT(DISTINCT) rides the already-distinct bridge.",
)
def tpch_q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        load_table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#1")
            & ~F.col("p_type").isin("PROMO", "ECONOMY")
            & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad_sup = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        _pairs(spark, sf_dir)
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(
            F.broadcast(bad_sup),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@register(
    "tpch_q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
               AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23' AND p_type = 'SMALL'
      AND l_quantity < (
          SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2)))
                             AS DOUBLE) / COUNT(l2.l_quantity))
          FROM lineitem l2
          WHERE l2.l_partkey = p_partkey)
    """,
    doc="C2/C3: TPC-H Q17 shape — revenue lost to small-quantity orders: a "
    "correlated per-part AVG de-correlated into one groupBy over the "
    "part's lineitems + a join back (the classic TPC-H rewrite).  The "
    "per-part averages are restricted to the qualifying parts with a "
    "broadcast semi join BEFORE aggregating, so the avg shuffle carries "
    "only the filtered parts' rows.  avg = exact decimal sum / count, "
    "divided in double identically on both engines.",
)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#23") & (F.col("p_type") == "SMALL")
    ).select("p_partkey")
    li_p = li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
    # correlated scope is ALL lineitems of the part — which the semi-joined
    # rows already are (every row with that l_partkey survives the part join)
    per_part = li_p.groupBy(F.col("l_partkey").alias("_pk")).agg(
        (
            F.sum(money("l_quantity")).cast("double") / F.count("l_quantity")
        ).alias("_avg_qty")
    )
    return (
        li_p.join(F.broadcast(per_part), F.col("l_partkey") == F.col("_pk"))
        .filter(F.col("l_quantity") < 0.2 * F.col("_avg_qty"))
        .agg(
            (dec_sum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly")
        )
    )


@register(
    "tpch_q20_promotion_suppliers",
    oracle="""
    SELECT s_name, n_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name IN ('NATION_1', 'NATION_4', 'NATION_7')
      AND s_suppkey IN (
          SELECT l_suppkey
          FROM lineitem
          JOIN part ON p_partkey = l_partkey
          WHERE p_name LIKE '%blue%'
            AND l_shipdate >= TIMESTAMP '1997-01-01'
            AND l_shipdate <  TIMESTAMP '1998-01-01'
          GROUP BY l_suppkey, l_partkey
          HAVING SUM(CAST(l_quantity AS DECIMAL(18,2)))
                   > CAST(50 AS DECIMAL(18,2)))
    ORDER BY s_name
    """,
    doc="C3+: TPC-H Q20 shape — suppliers who moved real volume of a part "
    "family in a year: IN-subquery over a HAVING-filtered (supplier, "
    "part) aggregate, nested inside a dimension filter (the availqty "
    "threshold becomes a constant since the synthetic schema has no "
    "partsupp).  Spark shape: filtered-scan groupBy → distinct suppkeys "
    "→ broadcast LEFT SEMI into the 100-row supplier dim — the fact "
    "shuffle carries (suppkey, partkey, qty-sum) triples only.",
)
def tpch_q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    ).select("l_partkey", "l_suppkey", "l_quantity")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%blue%")
    ).select("p_partkey")
    movers = (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(money("l_quantity")).alias("_qty"))
        .filter(F.col("_qty") > F.lit(50).cast("decimal(18,2)"))
        .select("l_suppkey")
        .distinct()
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_4", "NATION_7")
    ).select("n_nationkey", "n_name")
    return (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(movers), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "n_name")
        .orderBy("s_name")
    )
