"""Semantic pins for the distributed order-statistics queries (KS test,
exact percentiles) — the oracle parity sweep covers value equality; these
pin the statistics against independent numpy recomputation."""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

from logspout_kinesis_tests_spark.plans import REGISTRY


def _two_sample_ks(a: np.ndarray, b: np.ndarray) -> float:
    vs = np.unique(np.concatenate([a, b]))
    f1 = np.searchsorted(np.sort(a), vs, side="right") / len(a)
    f2 = np.searchsorted(np.sort(b), vs, side="right") / len(b)
    return float(np.max(np.abs(f1 - f2)))


def test_ks_statistic_matches_numpy(spark, sf_dir):
    row = REGISTRY["c2_ks_test"].build(spark, sf_dir).collect()[0]
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", "value"
    ).toPandas()
    a = ev[ev.event_type == "click"]["value"].to_numpy()
    b = ev[ev.event_type == "view"]["value"].to_numpy()
    assert row["n1"] == len(a) and row["n2"] == len(b)
    assert 0.0 <= row["d_stat"] <= 1.0
    assert abs(row["d_stat"] - _two_sample_ks(a, b)) < 1e-8
    expected_scaled = ((len(a) * len(b)) / (len(a) + len(b))) ** 0.5 * row["d_stat"]
    assert abs(row["ks_scaled"] - expected_scaled) < 1e-6


def test_ks_of_a_distribution_against_itself_is_zero(spark, sf_dir):
    # route the SAME sample through both branches: D must be exactly 0
    from logspout_kinesis_tests_spark.plans.stats_queries import c2_ks_test

    import tempfile, os

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").filter(
        F.col("event_type") == "click"
    )
    both = ev.withColumn("event_type", F.lit("click")).unionAll(
        ev.withColumn("event_type", F.lit("view"))
    )
    with tempfile.TemporaryDirectory() as d:
        both.write.parquet(os.path.join(d, "events.parquet"))
        row = c2_ks_test(spark, d).collect()[0]
    assert row["d_stat"] == 0.0


def test_exact_percentiles_match_numpy_rank_selection(spark, sf_dir):
    rows = REGISTRY["c2_exact_percentiles"].build(spark, sf_dir).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", "value"
    ).toPandas()
    assert rows
    for r in rows:
        vals = np.sort(ev[ev.event_type == r["event_type"]]["value"].to_numpy())
        assert r["n"] == len(vals)
        for q, name in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
            expected = vals[int(np.ceil(q * len(vals))) - 1]
            assert r[name] == expected
        assert r["p50"] <= r["p90"] <= r["p99"]
