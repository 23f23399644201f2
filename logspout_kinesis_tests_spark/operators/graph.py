"""Iterative graph analytics over DataFrames — damped PageRank.

Companion to the min-label connected-components fixpoint in
``operators/dedup.py``: the same iterative-join shape (per-round
``localCheckpoint`` lineage cuts, map-side-combined aggregation per round),
but with a numeric recurrence instead of a label lattice, so determinism
needs care: per-edge contributions are quantized to ``DECIMAL(28,15)``
before the sum, making each round's aggregate exact and order-independent —
bit-identical across partitionings and engines (the helpers.py decimal-sum
policy applied to an iterative algorithm).

Scale shape: one symmetrized edge materialization, then per iteration one
equi-join on the source key + one shuffle on the destination key.  Degrees
ride along the edge table so the per-round join count stays at one.  No
driver-side collect beyond the single node-count scalar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Standard damping factor; 0.85 parses to the identical double literal in
#: every engine, and (0.15 / N + 0.85 * s) is written in the same
#: association order on both sides of the oracle.
DAMPING = 0.85


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
) -> DataFrame:
    """(node, pagerank) after ``iterations`` damped power-iteration rounds.

    ``edges`` must already contain both directions for undirected graphs
    (every node is assumed to have at least one out-edge — true for any
    symmetrized edge set).  Contributions pr/deg are rounded to 15 decimal
    places and summed in DECIMAL(28,15): exact, associative, and therefore
    independent of Spark's partitioning — the oracle replays the identical
    arithmetic in unrolled SQL CTEs.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    deg = e.groupBy("src").agg(F.count("*").cast("double").alias("deg"))
    ewd = e.join(deg, "src").localCheckpoint(eager=True)
    n_nodes = float(deg.count())  # single driver scalar, not a data collect

    pr = deg.select("src", (F.lit(1.0) / F.lit(n_nodes)).alias("pr"))
    for _ in range(iterations):
        contrib = (
            ewd.join(pr, "src")
            .groupBy("dst")
            .agg(
                F.sum(
                    F.round(F.col("pr") / F.col("deg"), 15).cast("decimal(28,15)")
                )
                .cast("double")
                .alias("s")
            )
        )
        pr = contrib.select(
            F.col("dst").alias("src"),
            (F.lit(0.15) / F.lit(n_nodes) + F.lit(DAMPING) * F.col("s")).alias("pr"),
        ).localCheckpoint(eager=True)
    return pr.select(F.col("src").alias("node"), F.col("pr").alias("pagerank"))
