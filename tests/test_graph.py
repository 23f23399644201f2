"""Semantic pins for the iterative graph operator (operators/graph.py) —
the oracle parity sweep covers value equality against the unrolled-CTE
replay; these pin the mathematical properties the oracle merely mirrors."""

from __future__ import annotations

from pyspark.sql import functions as F

from logspout_kinesis_tests_spark.operators.graph import pagerank
from logspout_kinesis_tests_spark.plans import REGISTRY


def test_triangles_materialize_flag_is_plan_only(spark):
    """ADVICE r11: materialize=False must compose the identical triangle
    set without eagerly launching the orientation checkpoint job."""
    from logspout_kinesis_tests_spark.operators.graph import triangles

    # K4 on {1,2,3,4} plus a pendant edge → 4 triangles
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)],
        "u long, v long",
    )
    eager = sorted(map(tuple, triangles(edges).collect()))
    lazy_df = triangles(edges, materialize=False)
    assert sorted(map(tuple, lazy_df.collect())) == eager == [
        (1, 2, 3), (1, 2, 4), (1, 3, 4), (2, 3, 4),
    ]


def test_pagerank_is_a_distribution_and_rewards_degree(spark):
    # star graph: hub h <-> leaves a,b,c — hub must dominate, mass sums to 1
    pairs = [("h", x) for x in "abc"] + [(x, "h") for x in "abc"]
    edges = spark.createDataFrame(pairs, "src string, dst string")
    rows = {r["node"]: r["pagerank"] for r in pagerank(edges, iterations=10).collect()}
    assert set(rows) == {"h", "a", "b", "c"}
    assert abs(sum(rows.values()) - 1.0) < 1e-9
    assert all(rows["h"] > rows[x] for x in "abc")
    # leaves are symmetric, so their ranks must be identical (determinism
    # across partitions AND symmetry of the recurrence)
    assert rows["a"] == rows["b"] == rows["c"]


def test_pagerank_query_mass_conserved(spark, sf_dir):
    rows = REGISTRY["c17_pagerank"].build(spark, sf_dir).collect()
    assert len(rows) > 0
    total = sum(r["pagerank"] for r in rows)
    # no dangling nodes in a symmetrized graph: damped mass stays ~1
    assert abs(total - 1.0) < 1e-6
    assert all(r["pagerank"] > 0 for r in rows)
    # bipartite namespacing survived end-to-end
    assert {r["node"][0] for r in rows} == {"c", "s"}
