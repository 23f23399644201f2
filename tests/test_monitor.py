"""Semantic pins for the monitoring queries (skew report, CUSUM) — the
oracle parity sweep covers value equality; these pin the semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from logspout_kinesis_tests_spark.plans import REGISTRY
from logspout_kinesis_tests_spark.plans.monitor_queries import (
    _CUSUM_SLACK,
    _CUSUM_TARGET,
    _CUSUM_THRESHOLD,
)


def test_skew_report_bounds_and_uniform_floor(spark, sf_dir):
    rows = REGISTRY["c2_skew_report"].build(spark, sf_dir).collect()
    assert {r["key_name"] for r in rows} == {"l_suppkey", "l_partkey", "o_custkey"}
    for r in rows:
        # shares are ordered: hottest key <= top-10 <= 1
        assert 0 < r["max_key_share"] <= r["top10_share"] <= 1.0
        # HHI is bounded below by the uniform value 1/n_keys (Cauchy-Schwarz)
        assert r["hhi"] >= 1.0 / r["n_keys"] - 1e-9
        assert r["hhi"] <= 1.0
        assert r["hhi_vs_uniform"] >= 1.0 - 1e-6
        # the single hottest key can never exceed the HHI-implied bound
        assert r["max_key_share"] ** 2 <= r["hhi"] + 1e-9


def test_cusum_walk_semantics(spark):
    # constructed series: flat at target (never alarms), then a persistent
    # +20 shift that a 100-threshold upper CUSUM must catch after ~7 points
    rows = []
    for i in range(30):
        v = _CUSUM_TARGET if i < 15 else _CUSUM_TARGET + _CUSUM_SLACK + 15.0
        rows.append((i, 1, "m", f"2024-01-01 00:00:{i:02d}", v))
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    import os
    import tempfile

    from logspout_kinesis_tests_spark.plans.monitor_queries import c16_cusum

    with tempfile.TemporaryDirectory() as d:
        df.select(
            "event_id", "ts", "user_id", "event_type", "value",
            F.lit("{}").alias("props"),
        ).write.parquet(os.path.join(d, "events.parquet"))
        out = sorted(c16_cusum(spark, d).collect(), key=lambda r: r["event_id"])
    # flat-at-target phase: every increment is -slack, clamped at 0
    assert all(r["cusum"] == 0.0 for r in out[:15])
    # shifted phase: S grows by exactly +15 per step until the alarm
    assert out[15]["cusum"] == 15.0 and out[16]["cusum"] == 30.0
    # k-th shifted point (event_id 15+k-1) has S = 15k; 15k > 100 first at k=7
    first_alarm = next(r["event_id"] for r in out if r["alarm"] == 1)
    assert first_alarm == 15 + 7 - 1
    assert all(r["alarm"] == 1 for r in out if r["event_id"] >= first_alarm)


def test_cusum_covers_every_event(spark, sf_dir):
    out = REGISTRY["c16_cusum"].build(spark, sf_dir)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    assert out.count() == ev.count()
    assert out.filter(F.col("cusum") < 0).count() == 0
    mismatch = out.filter(
        (F.col("alarm") == 1) != (F.col("cusum") > _CUSUM_THRESHOLD)
    )
    assert mismatch.count() == 0


def test_snapshot_fingerprint_order_invariant_and_mutation_sensitive(spark, sf_dir):
    from logspout_kinesis_tests_spark.plans.monitor_queries import (
        c20_snapshot_fingerprint,
    )
    import os
    import shutil
    import tempfile

    base = {r["table_name"]: r for r in
            c20_snapshot_fingerprint(spark, sf_dir).collect()}
    assert set(base) == {"documents", "orders", "lineitem"}

    with tempfile.TemporaryDirectory() as d:
        for t in ("orders", "lineitem"):
            shutil.copytree(f"{sf_dir}/{t}.parquet", f"{d}/{t}.parquet") \
                if os.path.isdir(f"{sf_dir}/{t}.parquet") \
                else shutil.copy(f"{sf_dir}/{t}.parquet", f"{d}/{t}.parquet")
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        # same rows, reversed order, different file layout → same fingerprint
        docs.orderBy(F.desc("doc_id")).repartition(7).write.parquet(
            f"{d}/documents.parquet"
        )
        shuffled = {r["table_name"]: r for r in
                    c20_snapshot_fingerprint(spark, d).collect()}
        assert shuffled["documents"]["content_fp"] == base["documents"]["content_fp"]
        assert shuffled["documents"]["n_rows"] == base["documents"]["n_rows"]

    with tempfile.TemporaryDirectory() as d:
        for t in ("orders", "lineitem"):
            shutil.copytree(f"{sf_dir}/{t}.parquet", f"{d}/{t}.parquet") \
                if os.path.isdir(f"{sf_dir}/{t}.parquet") \
                else shutil.copy(f"{sf_dir}/{t}.parquet", f"{d}/{t}.parquet")
        # one mutated row → fingerprint flips, row count unchanged
        docs.withColumn(
            "text",
            F.when(F.col("doc_id") == docs.limit(1).collect()[0]["doc_id"],
                   F.lit("tampered")).otherwise(F.col("text")),
        ).write.parquet(f"{d}/documents.parquet")
        tampered = {r["table_name"]: r for r in
                    c20_snapshot_fingerprint(spark, d).collect()}
        assert tampered["documents"]["content_fp"] != base["documents"]["content_fp"]
        assert tampered["documents"]["n_rows"] == base["documents"]["n_rows"]
