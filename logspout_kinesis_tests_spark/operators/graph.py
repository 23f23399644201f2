"""Iterative graph analytics over DataFrames — damped PageRank, triangle
counting, and common-neighbor link prediction.

Companion to the min-label connected-components fixpoint in
``operators/dedup.py``: the same iterative-join shape (one checkpointed
edge materialization, map-side-combined aggregation per round),
but with a numeric recurrence instead of a label lattice, so determinism
needs care: per-edge contributions are quantized to fixed-point
(round(pr/deg · 1e15) as a 64-bit integer) before the sum, making each
round's aggregate exact, order-independent, AND long-backed (fast) —
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
    symmetrized edge set).  Contributions pr/deg are scaled by 1e15 and
    rounded to integers: the sum is exact, associative, and therefore
    independent of Spark's partitioning — the oracle replays the identical
    arithmetic in unrolled SQL CTEs.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    deg = e.groupBy("src").agg(F.count("*").cast("double").alias("deg"))
    # ONE materialization of the edge+degree table; everything downstream
    # (node count, every iteration) reads the checkpoint, never the
    # upstream edge derivation.  Keep node ids numeric where possible —
    # the per-round shuffle carries |edges| keys, and long keys halve the
    # shuffle payload vs strings (map to display ids after the last round).
    ewd = e.join(deg, "src").localCheckpoint(eager=True)
    # single driver scalar off the checkpoint, not a data collect
    n_nodes = float(ewd.select("src").distinct().count())

    # initial ranks also come off the checkpoint — deriving them from `deg`
    # would re-run the whole upstream edge derivation in round one
    pr = (
        ewd.select("src")
        .distinct()
        .select("src", (F.lit(1.0) / F.lit(n_nodes)).alias("pr"))
    )
    for _ in range(iterations):
        # fixed-point contributions: round(pr/deg · 1e15) as a LONG — exact,
        # associative, order-independent like the decimal path, but the
        # aggregate runs long-backed (sum(decimal(28,x)) accumulates in
        # BigDecimal — measured 1.3 s/round vs 0.35 s/round for long sums
        # at 1 M edges).  No overflow: pr mass sums to ≤ 1, so any node's
        # scaled in-sum is ≤ 1e15 ≪ 2^63.
        contrib = (
            ewd.join(pr, "src")
            .groupBy("dst")
            .agg(
                (
                    F.sum(
                        F.round(F.col("pr") / F.col("deg") * F.lit(1.0e15), 0).cast(
                            "long"
                        )
                    ).cast("double")
                    / F.lit(1.0e15)
                ).alias("s")
            )
        )
        # NO per-round checkpoint: unlike the CC fixpoint (where every round
        # and every probe RE-references earlier tables), each round here is
        # consumed exactly once by the next, so the 5-join lineage executes
        # as one pipelined action with no materialization barriers.  The
        # only multiply-referenced input, the edge+degree table, stays
        # checkpointed above.
        pr = contrib.select(
            F.col("dst").alias("src"),
            (F.lit(0.15) / F.lit(n_nodes) + F.lit(DAMPING) * F.col("s")).alias("pr"),
        )
    return pr.select(F.col("src").alias("node"), F.col("pr").alias("pagerank"))


def triangles(
    edges: DataFrame, u: str = "u", v: str = "v", materialize: bool = True
) -> DataFrame:
    """Enumerate triangles ``(a < b < c)`` of an undirected graph given as
    ORDERED distinct edge pairs (u < v, one row per edge).

    DEGREE-ordered compact-forward (the r11 hub-skew fix): every edge is
    re-oriented from its lower-(degree, id) endpoint to the higher, the
    wedge join runs on the middle vertex of that orientation, and one
    closing equi-join confirms the third edge.  The total order makes each
    triangle appear exactly once — no /6 correction — and the wedge
    fan-out at vertex m is in(m)·out(m) where out(m) counts only
    HIGHER-degree neighbors: a star hub of degree D has out = 0, so its
    D² wedge candidates vanish outright (id-ordering, the previous
    orientation, splits a mid-id hub ~(D/2)² — measured 26 s vs 3 s on a
    planted 3e4-degree hub, scripts/scale_probe_skew.py).  The classic
    arboricity bound caps out-degree at O(√E), so candidate pairs are
    O(E^1.5) worst-case and far lower on power-law graphs.  Output is
    re-sorted to ids via array_sort, so the (a < b < c) contract — and
    every oracle built on it — is unchanged.
    """
    e = edges.select(F.col(u).alias("eu"), F.col(v).alias("ev"))
    deg = (
        e.select(F.col("eu").alias("node"))
        .unionAll(e.select(F.col("ev").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    ranked = (
        e.join(deg.select(F.col("node").alias("eu"), F.col("d").alias("du")), "eu")
        .join(deg.select(F.col("node").alias("ev"), F.col("d").alias("dv")), "ev")
    )
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("eu") < F.col("ev"))
    )
    # one materialization: the oriented table feeds all three join branches.
    # ``materialize=False`` opts out for callers that only COMPOSE the plan
    # (constructing the DataFrame must not launch a job) or run on
    # preemptible executors where localCheckpoint blocks are lost on
    # executor death (ADVICE r11) — they trade 3x recompute of the cheap
    # orientation for schedulability.
    fwd = ranked.select(
        F.when(u_first, F.col("eu")).otherwise(F.col("ev")).alias("lo"),
        F.when(u_first, F.col("ev")).otherwise(F.col("eu")).alias("hi"),
    )
    if materialize:
        fwd = fwd.localCheckpoint(eager=True)
    e1 = fwd.select(F.col("lo").alias("x"), F.col("hi").alias("y"))
    e2 = fwd.select(F.col("lo").alias("y"), F.col("hi").alias("z"))
    e3 = fwd.select(F.col("lo").alias("x"), F.col("hi").alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"])
    srt = F.array_sort(F.array("x", "y", "z"))
    return tri.select(
        srt.getItem(0).alias("a"), srt.getItem(1).alias("b"), srt.getItem(2).alias("c")
    )


def common_neighbor_pairs(
    bip: DataFrame,
    left: str = "left",
    right: str = "right",
    max_right_degree: int = 50,
    min_common: int = 2,
) -> DataFrame:
    """Link-prediction candidates from a bipartite incidence list: left-node
    pairs ``(a < b)`` that share ≥ ``min_common`` right-neighbors, with
    exact common counts, degrees, and Jaccard over the degree-cut graph.

    The pair generation is the inverted-index pattern of the MinHash-LSH
    joins: per-right-node left lists self-joined, NEVER all left pairs.
    Right nodes with more than ``max_right_degree`` left-neighbors are
    dropped first (the stop-shingle df-cut): a hub right node contributes
    O(deg²) candidate pairs and near-zero signal, exactly like a stopword
    shingle.  Degrees are computed on the SAME cut edge set, so the
    Jaccard is exact for the graph the candidates came from (documented
    estimator under the cut, not an approximation of the uncut graph).
    """
    e = bip.select(F.col(left).alias("l"), F.col(right).alias("r")).distinct()
    keep = e.groupBy("r").agg(F.count("*").alias("rdeg")).filter(
        F.col("rdeg") <= max_right_degree
    )
    # THREE consumers read the cut edge set (degrees + both self-join
    # sides): checkpoint once so the upstream distinct + df-cut join isn't
    # re-derived per branch (same rationale as the pagerank edge table;
    # measured 2.6 s → 1.5 s at sf0.1 without it the plan scans the
    # bipartite input four times)
    cut = e.join(keep.select("r"), "r").localCheckpoint(eager=True)
    deg = cut.groupBy("l").agg(F.count("*").alias("deg"))
    a = cut.select(F.col("r"), F.col("l").alias("a"))
    b = cut.select(F.col("r"), F.col("l").alias("b"))
    pairs = (
        a.join(b, "r")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )
    return (
        pairs.join(deg.select(F.col("l").alias("a"), F.col("deg").alias("deg_a")), "a")
        .join(deg.select(F.col("l").alias("b"), F.col("deg").alias("deg_b")), "b")
        .select(
            "a",
            "b",
            "n_common",
            "deg_a",
            "deg_b",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("deg_a") + F.col("deg_b") - F.col("n_common")).cast(
                    "double"
                ),
                6,
            ).alias("jaccard"),
        )
    )


def local_clustering_coefficient(
    edges: DataFrame, u: str = "u", v: str = "v"
) -> DataFrame:
    """Per-node local clustering coefficient of an undirected graph given
    as ORDERED distinct edges (u < v): ``cc(n) = 2·tri(n) / (deg(n)·
    (deg(n)−1))`` — how close a node's neighborhood is to a clique, the
    node-level refinement of :func:`triangles`.

    Triangle membership comes from the same compact-forward enumeration
    (each triangle once), exploded to its three corners and counted per
    corner; degrees from the two edge orientations.  Nodes with degree 1
    are excluded (cc undefined); triangle-free nodes report 0.  Emits
    (node, degree, n_tri, cc) with cc exact-rational until the single
    closing division.  Scale: the triangle join dominates (wedge bound),
    the per-corner explode adds 3 rows per triangle — no new shuffle
    shape beyond :func:`triangles`.
    """
    deg = (
        edges.select(F.col(u).alias("node"))
        .unionAll(edges.select(F.col(v).alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("degree"))
    )
    tri = triangles(edges, u, v)
    corner = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("n_tri"))
    )
    return (
        deg.filter(F.col("degree") >= 2)
        .join(corner, "node", "left")
        .select(
            "node",
            "degree",
            F.coalesce(F.col("n_tri"), F.lit(0)).alias("n_tri"),
            F.round(
                2.0
                * F.coalesce(F.col("n_tri"), F.lit(0))
                / (F.col("degree") * (F.col("degree") - 1)),
                6,
            ).alias("cc"),
        )
    )
