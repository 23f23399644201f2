"""Semantic pins for the round-4 breadth queries (profiling, interval
overlap, novelty, EWMA) — the oracle parity sweep covers value equality;
these pin the semantics the oracle merely mirrors."""

from __future__ import annotations

from pyspark.sql import functions as F

from logspout_kinesis_tests_spark.plans import REGISTRY


def test_column_profile_counts_are_consistent(spark, sf_dir):
    rows = {
        r["column_name"]: r
        for r in REGISTRY["c2_column_profile"].build(spark, sf_dir).collect()
    }
    assert set(rows) == {
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    }
    n = {r["n_rows"] for r in rows.values()}
    assert len(n) == 1  # every branch profiles the same scan
    ok = rows["o_orderkey"]
    # primary key: no nulls, fully distinct
    assert ok["n_nulls"] == 0 and ok["n_distinct"] == ok["n_rows"]
    # low-cardinality enum is a subset
    assert rows["o_orderstatus"]["n_distinct"] <= 3


def test_interval_overlap_days_bounded_by_window_length(spark, sf_dir):
    out = REGISTRY["c15_interval_overlap_join"].build(spark, sf_dir).collect()
    assert 0 < len(out) <= 12
    for r in out:
        # inclusive 10-day windows: no overlap can exceed the window itself
        assert 1 <= r["total_overlap_days"] <= r["n_lineitems"] * 10


def test_ngram_novelty_bounds_and_first_doc(spark, sf_dir):
    df = REGISTRY["c11_ngram_novelty"].build(spark, sf_dir)
    bad = df.filter(
        (F.col("n_novel") < 0)
        | (F.col("n_novel") > F.col("n_shingles"))
        | (F.col("novelty") < 0)
        | (F.col("novelty") > 1)
    )
    assert bad.count() == 0
    # the smallest doc_id can only contain first-appearance shingles
    first = df.orderBy("doc_id").first()
    assert first["n_novel"] == first["n_shingles"]


def test_ewma_semantics_on_real_data(spark, sf_dir):
    from logspout_kinesis_tests_spark.sources.tables import load_table

    out = REGISTRY["c16_ewma"].build(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    assert out.count() == ev.count()  # one smoothed value per event
    # EWMA is a convex combination of trailing values: per-user min/max bound it
    joined = out.join(ev.select("event_id", "value"), "event_id")
    bounds = joined.groupBy("user_id").agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    viol = (
        joined.join(bounds, "user_id")
        .filter(
            (F.col("ewma").cast("double") < F.col("lo") - 1e-6)
            | (F.col("ewma").cast("double") > F.col("hi") + 1e-6)
        )
        .count()
    )
    assert viol == 0
    # the first event of every user has no trailing taps: ewma == value
    w_first = (
        ev.groupBy("user_id").agg(F.min_by("event_id", F.struct("ts", "event_id")).alias("event_id"))
    )
    firsts = (
        out.join(w_first, ["user_id", "event_id"])
        .join(ev.select("event_id", "value"), "event_id")
        .filter(
            F.abs(F.col("ewma").cast("double") - F.col("value")) > 1e-9
        )
        .count()
    )
    assert firsts == 0
