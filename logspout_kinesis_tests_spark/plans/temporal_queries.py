"""As-of and range join queries — verified against DuckDB's native ASOF
JOIN and a plain non-equi join respectively (the engine implements both as
scalable equi-join compositions; the oracle uses the naive/native forms, so
a match proves semantic equivalence, not shared implementation)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logspout_kinesis_tests_spark.operators.temporal import (
    asof_join,
    range_join_bucketized,
)
from logspout_kinesis_tests_spark.plans.helpers import sql_ts_str, ts_str
from logspout_kinesis_tests_spark.plans.registry import register
from logspout_kinesis_tests_spark.sources.tables import load_table


@register(
    "c15_asof_join",
    oracle=f"""
    SELECT l.event_id,
           l.user_id,
           {sql_ts_str('l.ts')} AS purchase_ts,
           r.event_id AS view_event_id,
           {sql_ts_str('r.ts')} AS view_ts
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') l
    ASOF LEFT JOIN
         (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view') r
      ON l.user_id = r.user_id AND r.ts <= l.ts
    """,
    doc="C15: as-of join — each purchase matched to the user's latest "
    "at-or-before view; union-and-carry implementation vs DuckDB's native "
    "ASOF JOIN.",
)
def c15_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "event_id", "ts"
    )
    joined = asof_join(
        purchases, views, on="user_id", right_cols=("event_id",)
    )
    return joined.select(
        "event_id",
        "user_id",
        ts_str("ts").alias("purchase_ts"),
        F.col("event_id_right").alias("view_event_id"),
        ts_str("ts_right").alias("view_ts"),
    )


#: Overlapping, non-aligned value tiers — each event value can land in
#: several (the overlap is the point: a plain equi-bucket can't express it).
TIERS = ((0.0, 15.0), (10.0, 40.0), (35.0, 90.0), (80.0, 200.0), (150.0, 500.0))


@register(
    "c15_range_join",
    oracle=f"""
    WITH tiers(tier_id, lo, hi) AS (VALUES
        {', '.join(f'({i}, {lo}, {hi})' for i, (lo, hi) in enumerate(TIERS))}
    )
    SELECT event_id, tier_id, value
    FROM events JOIN tiers ON value >= lo AND value < hi
    """,
    doc="C15: range join — events matched to overlapping value intervals; "
    "bucketized equi-join + residual refine vs the oracle's naive "
    "non-equi join.",
)
def c15_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    tiers = spark.createDataFrame(
        [(i, lo, hi) for i, (lo, hi) in enumerate(TIERS)],
        "tier_id int, lo double, hi double",
    )
    out = range_join_bucketized(ev, tiers, value_col="value", bucket_width=25.0)
    return out.select("event_id", "tier_id", "value")


@register(
    "c15_asof_join_forward",
    oracle=f"""
    SELECT l.event_id,
           l.user_id,
           {sql_ts_str('l.ts')} AS view_ts,
           r.event_id AS purchase_event_id,
           {sql_ts_str('r.ts')} AS purchase_ts
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view') l
    ASOF LEFT JOIN
         (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') r
      ON l.user_id = r.user_id AND r.ts >= l.ts
    """,
    doc="C15: FORWARD as-of join — each view matched to the user's next "
    "at-or-after purchase (the time-to-convert primitive); same "
    "union-and-carry plan as backward with the window frame flipped, vs "
    "DuckDB's native forward ASOF (ts >= bound).",
)
def c15_asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "event_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    joined = asof_join(
        views, purchases, on="user_id", right_cols=("event_id",), direction="forward"
    )
    return joined.select(
        "event_id",
        "user_id",
        ts_str("ts").alias("view_ts"),
        F.col("event_id_right").alias("purchase_event_id"),
        ts_str("ts_right").alias("purchase_ts"),
    )


@register(
    "c7_sessionize",
    oracle=f"""
    WITH s AS (
        SELECT event_id, user_id, ts,
               CASE WHEN ts - lag(ts) OVER
                        (PARTITION BY user_id ORDER BY ts, event_id)
                    >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
        FROM events)
    SELECT event_id, user_id,
           CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
    FROM s
    """,
    doc="C7+: row-level sessionization (gaps-and-islands lag+cumsum) — "
    "every event tagged with its per-user session number, >= 30min gap "
    "starts a session (end-exclusive, matching F.session_window merge); "
    "one shuffle on the key, event_id tie-break for determinism.",
)
def c7_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logspout_kinesis_tests_spark.operators.temporal import sessionize

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    return sessionize(ev, tiebreak_cols=("event_id",)).select(
        "event_id", "user_id", "session_seq"
    )


@register(
    "c15_asof_tolerance",
    # DuckDB's ASOF JOIN has no tolerance clause, so the oracle states the
    # semantics directly: the matched view must lie within 30 minutes of
    # the purchase; staler matches are nulled while the purchase row stays
    # (pandas merge_asof semantics).
    oracle=f"""
    WITH matched AS (
        SELECT l.event_id, l.user_id, l.ts AS purchase_ts,
               r.event_id AS view_event_id, r.ts AS view_ts
        FROM (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'purchase') l
        ASOF LEFT JOIN
             (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'view') r
          ON l.user_id = r.user_id AND r.ts <= l.ts)
    SELECT event_id, user_id,
           {sql_ts_str('purchase_ts')} AS purchase_ts,
           CASE WHEN view_ts >= purchase_ts - INTERVAL 30 MINUTE
                THEN view_event_id END AS view_event_id,
           CASE WHEN view_ts >= purchase_ts - INTERVAL 30 MINUTE
                THEN {sql_ts_str('view_ts')} END AS view_ts
    FROM matched
    """,
    doc="C15: as-of join with a staleness tolerance — each purchase "
    "matched to the user's latest at-or-before view ONLY if it happened "
    "within the last 30 minutes; staler matches null out while the "
    "purchase row survives (pandas merge_asof semantics).  The freshness "
    "bound every real feature-lookup/attribution as-of needs.",
)
def c15_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "event_id", "ts"
    )
    joined = asof_join(
        purchases,
        views,
        on="user_id",
        right_cols=("event_id",),
        tolerance="30 minutes",
    )
    return joined.select(
        "event_id",
        "user_id",
        ts_str("ts").alias("purchase_ts"),
        F.col("event_id_right").alias("view_event_id"),
        ts_str("ts_right").alias("view_ts"),
    )
