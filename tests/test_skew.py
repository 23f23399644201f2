"""Salted aggregation/join equal their unsalted forms (skew utilities)."""

from __future__ import annotations

from pyspark.sql import functions as F

from logspout_kinesis_tests_spark.operators.skew import salted_aggregate, salted_join
from logspout_kinesis_tests_spark.plans.helpers import money
from logspout_kinesis_tests_spark.sources.tables import load_table


def test_salted_aggregate_matches_plain(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    salted = salted_aggregate(
        ev,
        keys=["event_type"],
        sum_cols={"total_value": money("value")},
        salt_buckets=16,
        salt_source="event_id",
    )
    plain = ev.groupBy("event_type").agg(
        F.sum(money("value")).alias("total_value"), F.count("*").alias("n")
    )
    s = {r["event_type"]: (r["total_value"], r["n"]) for r in salted.collect()}
    p = {r["event_type"]: (r["total_value"], r["n"]) for r in plain.collect()}
    assert s == p  # decimal sums: exact equality regardless of re-association


def test_salted_join_matches_plain(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    salted = salted_join(
        orders, customer, key="o_custkey", salt_buckets=8, big_salt_source="o_orderkey"
    )
    plain = orders.join(customer, "o_custkey")
    assert salted.count() == plain.count()
    s = sorted((r["o_orderkey"], r["c_name"]) for r in salted.select("o_orderkey", "c_name").collect())
    p = sorted((r["o_orderkey"], r["c_name"]) for r in plain.select("o_orderkey", "c_name").collect())
    assert s == p
