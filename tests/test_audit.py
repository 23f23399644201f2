"""Semantic pins for the round-4c audit queries (data card, seasonal-naive
MAE, Benford) — the oracle parity sweep covers value equality; these pin
the semantics the oracles merely mirror."""

from __future__ import annotations

from pyspark.sql import functions as F

from logspout_kinesis_tests_spark.plans import REGISTRY


def test_data_card_accounts_for_every_document(spark, sf_dir):
    rows = REGISTRY["c20_data_card"].build(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert sum(r["n_docs"] for r in rows) == docs.count()
    langs = {r["lang"] for r in docs.select("lang").distinct().collect()}
    for r in rows:
        assert 0.0 <= r["dup_rate"] <= 1.0
        assert 0.0 <= r["short_rate"] <= 1.0
        assert r["top_lang"] in langs
        assert 1 <= r["n_langs"] <= len(langs)
        assert abs(r["mean_tokens"] - r["total_tokens"] / r["n_docs"]) < 1e-6


def test_seasonal_naive_forecast_count_is_series_minus_season(spark, sf_dir):
    from logspout_kinesis_tests_spark.plans.audit_queries import _SEASON

    rows = REGISTRY["c16_seasonal_naive_mae"].build(spark, sf_dir).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    per_type = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert rows
    for r in rows:
        assert r["n_forecasts"] == max(0, per_type[r["event_type"]] - _SEASON)
        assert r["mae"] >= 0.0


def test_benford_shares_form_a_distribution(spark, sf_dir):
    rows = REGISTRY["c2_benford_audit"].build(spark, sf_dir).collect()
    assert {r["d"] for r in rows} <= set(range(1, 10))
    assert abs(sum(r["observed_share"] for r in rows) - 1.0) < 1e-6
    # Benford expectation itself sums to 1 over digits 1..9
    assert abs(sum(r["benford_share"] for r in rows) - 1.0) < 1e-6 or len(rows) < 9
    for r in rows:
        assert r["deviation"] >= 0.0
        assert abs(r["deviation"] - abs(r["observed_share"] - r["benford_share"])) < 2e-9


def test_phash_neardup_catches_planted_variants(spark, sf_dir):
    """Every planted single-word variant must pair with its source within
    the Hamming cut; pair hashes differ by at most the cut."""
    from logspout_kinesis_tests_spark.plans import REGISTRY

    rows = REGISTRY["c12_phash_neardup"].build(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    planted = {
        r["doc_id"]
        for r in docs.filter(F.col("doc_id") % 7 == 0).collect()
    }
    found = {
        r["id_a"] for r in rows if r["id_b"] - r["id_a"] == 7000000
    }
    assert found == planted  # 100% recall on planted near-dups
    assert all(0 <= r["hamming"] <= 3 for r in rows)
