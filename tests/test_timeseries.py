"""Hypertable rollup consistency and Count-Min sketch error bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from logspout_kinesis_tests_spark.operators.timeseries import (
    cms_estimate,
    cms_merge,
    count_min_sketch,
    hypertable_rollup,
)
from logspout_kinesis_tests_spark.sources.tables import load_table


def test_rollup_levels_are_consistent(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = hypertable_rollup(ev, group_cols=("event_type",)).cache()
    total_raw = ev.count()
    by_res = {
        r["resolution"]: r["n"]
        for r in out.groupBy("resolution").agg(F.sum("n").alias("n")).collect()
    }
    # every resolution accounts for every raw row exactly once
    assert by_res == {"minute": total_raw, "hour": total_raw, "day": total_raw}
    # coarser levels have fewer-or-equal buckets
    buckets = {
        r["resolution"]: r["b"]
        for r in out.groupBy("resolution").agg(F.count("*").alias("b")).collect()
    }
    assert buckets["day"] <= buckets["hour"] <= buckets["minute"]


def test_cms_estimates_bound_true_counts(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    sketch = count_min_sketch(ev, "user_id", depth=4, width=1024)
    keys = ev.select("user_id").distinct()
    est = {
        r["user_id"]: r["estimate"]
        for r in cms_estimate(sketch, keys, "user_id", depth=4, width=1024).collect()
    }
    true = {
        r["user_id"]: r["n"]
        for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    n_total = ev.count()
    for uid, t in true.items():
        assert est[uid] >= t  # CMS never undercounts
        assert est[uid] - t <= 0.01 * n_total + 1  # ε ≈ e/width ≈ 0.0027


def test_cms_merge_equals_single_build(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_id") % 2 == 0)
    b = ev.filter(F.col("event_id") % 2 == 1)
    merged = cms_merge(
        count_min_sketch(a, "user_id"), count_min_sketch(b, "user_id")
    )
    single = count_min_sketch(ev, "user_id")
    m = {(r["row"], r["bucket"]): r["cnt"] for r in merged.collect()}
    s = {(r["row"], r["bucket"]): r["cnt"] for r in single.collect()}
    assert m == s  # sketches are mergeable cell-wise


def test_cms_absent_key_estimates_zero_or_collision(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    sketch = count_min_sketch(ev, "user_id", depth=4, width=1024)
    ghosts = spark.createDataFrame([(99999,), (123456,)], "user_id long")
    est = {
        r["user_id"]: r["estimate"]
        for r in cms_estimate(sketch, ghosts, "user_id").collect()
    }
    # absent keys: 0 unless all four hash rows collide (bounded overshoot)
    for v in est.values():
        assert v <= 0.01 * ev.count() + 1


def test_bloom_filter_merge_and_bounds(spark):
    """Merging half-sketches equals building over the union (bitset OR);
    inserted keys always probe present; false positives stay near the
    analytic rate."""
    from pyspark.sql import functions as F

    from logspout_kinesis_tests_spark.operators.timeseries import (
        bloom_build,
        bloom_merge,
        bloom_probe,
    )

    k, m = 5, 1 << 14
    keys = spark.range(2000).select(F.col("id").alias("key"))
    ins = keys.filter("key < 1000")
    merged = bloom_merge(
        bloom_build(ins.filter("key % 2 = 0"), "key", k, m),
        bloom_build(ins.filter("key % 2 = 1"), "key", k, m),
    )
    direct = bloom_build(ins, "key", k, m)
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0

    probed = {r["key"]: r["present"] for r in bloom_probe(merged, keys, "key", k, m).collect()}
    assert all(probed[i] for i in range(1000))  # no false negatives, ever
    fp = sum(probed[i] for i in range(1000, 2000))
    # p = (1 - e^{-kn/m})^k ≈ 0.0086 at n=1000 → expect ~9, gate generously
    assert fp <= 40, fp


def test_gap_fill_locf_semantics(spark):
    from logspout_kinesis_tests_spark.operators.timeseries import gap_fill

    rows = [
        ("a", "2026-01-01 00:10:00", 1.0),
        ("a", "2026-01-01 00:40:00", 2.0),   # same bucket as above
        ("a", "2026-01-01 03:05:00", 7.0),   # 2-hour hole before this
        ("b", "2026-01-01 01:00:00", 5.0),   # single-bucket key: no grid
    ]
    df = spark.createDataFrame(rows, "event_type string, ts string, value double").select(
        "event_type", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    out = {
        (r["event_type"], str(r["bucket_start"])): r
        for r in gap_fill(df).collect()
    }
    # key a: grid 00..03 inclusive = 4 buckets, 2 observed + 2 gaps
    assert len([k for k in out if k[0] == "a"]) == 4
    assert out[("a", "2026-01-01 00:00:00")]["n"] == 2
    assert out[("a", "2026-01-01 00:00:00")]["total_locf"] == 3.0
    for hour in ("01", "02"):
        gap = out[("a", f"2026-01-01 {hour}:00:00")]
        assert gap["is_gap"] and gap["n"] == 0 and gap["total_locf"] == 3.0
    assert out[("a", "2026-01-01 03:00:00")]["total_locf"] == 7.0
    # key b: bounds collapse to one bucket, no synthetic rows
    assert [k for k in out if k[0] == "b"] == [("b", "2026-01-01 01:00:00")]
    assert not out[("b", "2026-01-01 01:00:00")]["is_gap"]


def test_gap_fill_interpolate_blends_linearly(spark):
    """Hand-built series: observations at hours 0 and 3 with totals 10 and
    40 → gap hours 1, 2 interpolate to 20, 30; edges outside the observed
    range don't exist (grid spans min..max only)."""
    import datetime as dt

    from logspout_kinesis_tests_spark.operators.timeseries import (
        gap_fill_interpolate,
    )

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, t0, "a", 10.0),
        (2, t0 + dt.timedelta(hours=3), "a", 40.0),
        (3, t0, "b", 5.0),  # single-observation key: no gaps, no interp
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    got = {
        (r["event_type"], r["bucket_start"].hour): (r["n"], r["total_interp"], r["is_gap"])
        for r in gap_fill_interpolate(df).collect()
    }
    assert got[("a", 0)] == (1, 10.0, False)
    assert got[("a", 1)] == (0, 20.0, True)
    assert got[("a", 2)] == (0, 30.0, True)
    assert got[("a", 3)] == (1, 40.0, False)
    assert got[("b", 0)] == (1, 5.0, False)
    assert len(got) == 5
