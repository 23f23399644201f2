"""Semantic pins for the round-4b breadth queries (correlation matrix,
compaction planning, temperature resampling, rolling median, KL drift,
Holt smoothing) — the oracle parity sweep covers value equality against
DuckDB; these pin the semantics the oracles merely mirror."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from logspout_kinesis_tests_spark.plans import REGISTRY
from logspout_kinesis_tests_spark.plans.enrichment_queries import (
    _COMPACT_TARGET,
    _RESAMPLE_BUDGET,
)


def test_corr_matrix_values_are_valid_correlations(spark, sf_dir):
    rows = REGISTRY["c2_corr_matrix"].build(spark, sf_dir).collect()
    # 3 return flags x 3 pairs
    assert len(rows) == 9
    for r in rows:
        assert -1.0 <= r["corr_val"] <= 1.0
        assert r["n"] > 0
    # pin one group's value against an independent numpy recomputation
    import numpy as np

    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .filter(F.col("l_returnflag") == "A")
        .select("l_quantity", "l_extendedprice")
        .toPandas()
    )
    expected = np.corrcoef(li["l_quantity"], li["l_extendedprice"])[0, 1]
    got = next(
        r["corr_val"]
        for r in rows
        if r["l_returnflag"] == "A" and r["pair"] == "qty_price"
    )
    assert abs(got - expected) < 1e-8


def test_compaction_plan_groups_respect_target(spark, sf_dir):
    rows = REGISTRY["c19_compaction_plan"].build(spark, sf_dir).collect()
    by_month: dict[str, list] = {}
    for r in rows:
        by_month.setdefault(r["part_month"], []).append(r)
    for month, files in by_month.items():
        files.sort(key=lambda r: r["file_day"])
        # group ids are non-decreasing along the file order
        gids = [r["group_id"] for r in files]
        assert gids == sorted(gids)
        # every group except possibly the last was closed at >= target rows
        # (a group closes only once the cumulative stream passes the target)
        total = sum(r["size_rows"] for r in files)
        n_groups = len(set(gids))
        assert n_groups >= math.ceil(total / (2 * _COMPACT_TARGET)) or total < _COMPACT_TARGET


def test_temperature_resample_weights_normalize(spark, sf_dir):
    rows = REGISTRY["c14_temperature_resample"].build(spark, sf_dir).collect()
    assert abs(sum(r["weight"] for r in rows) - 1.0) < 1e-6
    # floor() quotas never overshoot the budget
    assert sum(r["quota"] for r in rows) <= _RESAMPLE_BUDGET
    # temperature < 1 damps skew: weight ordering follows count ordering
    ordered = sorted(rows, key=lambda r: r["n_docs"])
    weights = [r["weight"] for r in ordered]
    assert weights == sorted(weights)


def test_rolling_median_is_robust_to_one_spike(spark):
    # 5-tap lower median over a flat series with one spike: the spike shows
    # up in at most 1 of 5 taps, so the median never moves off the plateau.
    rows = [(i, 1, f"2024-01-01 00:00:{i:02d}", 1000.0 if i == 5 else 7.0) for i in range(10)]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts string, value double")
    df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    df.createOrReplaceTempView("_median_probe")
    from logspout_kinesis_tests_spark.plans.enrichment_queries import _MEDIAN_TAPS

    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    taps = df.select(
        "event_id",
        F.filter(
            F.array(
                *[F.lag("value", d).over(w) for d in range(1, _MEDIAN_TAPS)],
                F.col("value"),
            ),
            lambda x: x.isNotNull(),
        ).alias("vs"),
    )
    arr = F.array_sort(F.col("vs"))
    idx = F.floor((F.size("vs") + F.lit(1)) / F.lit(2)).cast("int")
    med = {
        r["event_id"]: r["m"]
        for r in taps.select("event_id", F.element_at(arr, idx).alias("m")).collect()
    }
    assert all(v == 7.0 for v in med.values())


def test_kl_divergence_nonnegative_and_zero_terms_absent(spark, sf_dir):
    rows = REGISTRY["c11_kl_divergence"].build(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # KL >= 0 up to the 1e-12 per-term quantization (n_terms of them)
        assert r["kl_nats"] >= -1e-9 * r["n_terms"]
        assert r["n_terms"] > 0


def test_holt_smoothing_tracks_linear_series_exactly_in_the_limit(spark):
    # On y_t = 2t the level converges toward the series and the trend
    # toward the true slope 2; both stay finite and ordered deterministically.
    rows = [(i, 1, f"2024-01-01 00:00:{i:02d}", 2.0 * i) for i in range(40)]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts string, value double")
    df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    import tempfile, os

    # route through the registered builder by writing a tiny parquet dir
    with tempfile.TemporaryDirectory() as d:
        df.select(
            "event_id", "ts", "user_id", F.lit("probe").alias("event_type"),
            F.col("value"), F.lit("{}").alias("props"),
        ).write.parquet(os.path.join(d, "events.parquet"))
        out = (
            REGISTRY["c16_holt_smoothing"]
            .build(spark, d)
            .orderBy("event_id")
            .collect()
        )
    assert len(out) == 40
    assert out[0]["level"] == 0.0 and out[0]["trend"] == 0.0
    # trend estimate approaches the true slope from below
    assert abs(out[-1]["trend"] - 2.0) < 0.1
    # level lags the series but converges: |level - y| shrinks
    errs = [abs(r["level"] - 2.0 * r["event_id"]) for r in out]
    assert errs[-1] < errs[5]


def test_holt_single_event_series(spark):
    df = spark.createDataFrame(
        [(1, 7, "2024-01-01 00:00:00", 3.5)],
        "event_id long, user_id long, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        df.select(
            "event_id", "ts", "user_id", F.lit("probe").alias("event_type"),
            F.col("value"), F.lit("{}").alias("props"),
        ).write.parquet(os.path.join(d, "events.parquet"))
        out = REGISTRY["c16_holt_smoothing"].build(spark, d).collect()
    assert len(out) == 1
    assert out[0]["level"] == 3.5 and out[0]["trend"] == 0.0
