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


def test_anova_f_matches_numpy(spark, sf_dir):
    row = REGISTRY["c2_anova_f"].build(spark, sf_dir).collect()[0]
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", "value"
    ).toPandas()
    groups = [g["value"].to_numpy() for _, g in ev.groupby("event_type")]
    k, n = len(groups), len(ev)
    grand = ev["value"].mean()
    ssb = sum(len(g) * (g.mean() - grand) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert row["k"] == k and row["n"] == n
    assert abs(row["f_stat"] - f) < 1e-6
    assert row["ss_between"] >= 0 and row["ss_within"] >= 0


def test_gini_bounds_and_known_extremes(spark, sf_dir):
    rows = REGISTRY["c2_gini_spend"].build(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # rank-weighted Gini with zero-spend tails stays in [0, 1)
        assert 0.0 <= r["gini"] < 1.0
        assert r["n_customers"] > 0
    # numpy replay for one nation
    import numpy as np

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    nat = spark.read.parquet(f"{sf_dir}/nation.parquet")
    nk = nat.filter(F.col("n_name") == rows[0]["nation"]).collect()[0]["n_nationkey"]
    spend = (
        cust.filter(F.col("c_nationkey") == nk)
        .join(orders, orders["o_custkey"] == cust["c_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)).alias("x"))
        .toPandas()["x"]
        .to_numpy()
    )
    x = np.sort(spend)
    n = len(x)
    expected = 2 * np.sum(np.arange(1, n + 1) * x) / (n * x.sum()) - (n + 1) / n
    assert abs(rows[0]["gini"] - expected) < 1e-6


def test_twopass_percentiles_equal_direct_rank_selection(spark, sf_dir):
    """The bucketed two-pass selection must reproduce the single-sort
    rank-selection result EXACTLY — bucket decomposition preserves order."""
    direct = {
        r["event_type"]: r
        for r in REGISTRY["c2_exact_percentiles"].build(spark, sf_dir).collect()
    }
    twopass = {
        r["event_type"]: r
        for r in REGISTRY["c2_percentiles_twopass"].build(spark, sf_dir).collect()
    }
    assert set(direct) == set(twopass)
    for t in direct:
        for col in ("n", "p50", "p90", "p99"):
            assert direct[t][col] == twopass[t][col], (t, col)
