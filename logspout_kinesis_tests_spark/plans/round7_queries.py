"""Round-7 queries: the approximate-sketch error gate (closing the last
unpinned rows-only query, VERDICT r6 #5) and this round's new operators.

Registered LAST (see plans/__init__) so the staleness-ordered rotation
keeps the window's leftover slots on re-verifying the r2/r3-era greens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from logspout_kinesis_tests_spark.plans.registry import register
from logspout_kinesis_tests_spark.sources.tables import load_table

# --- C2+: approximate-sketch error gate --------------------------------------

#: Rank window for the percentile bound: percentile_approx(accuracy=10000)
#: guarantees rank error <= n/10000, far inside ±0.02 quantile mass at any
#: test SF, so the sketch value must lie between the exact continuous
#: quantiles at q∓0.02 (capped at 1).
_SK_RANK_EPS = 0.02
#: HLL bound: rsd=0.02 keeps |approx-exact| within ~6% at 3σ; gate at 10%
#: with an absolute floor of 3 so tiny groups can't false-fail.
_SK_HLL_REL = 0.1
_SK_HLL_ABS = 3


@register(
    "c2_sketch_error_gate",
    # The oracle cannot run Spark's HLL/GK sketches — but the sketches'
    # declared error bounds vs EXACT aggregates are themselves checkable:
    # Spark emits measured within-bound booleans next to the exact distinct
    # counts (computed identically in both engines); the oracle emits the
    # bounds' CONTRACT (all TRUE).  The row hash matches iff every sketch
    # lands inside its bound, which turns the approximate family's error
    # claim into a driver-hash-checked fact (VERDICT r6 #5) — the same gate
    # shape as the md5 bucketing gates, applied to error bounds instead of
    # assignments.  c2_approx_sketches itself stays rows-only (its VALUES
    # are estimator-internal); this gate pins it.
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS users_ok, TRUE AS p50_ok, TRUE AS p95_ok, TRUE AS p99_ok
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="C2+: within-ε gate for the approximate sketches — HLL distinct "
    "within max(3, 10%) of exact, percentile_approx(10000) values between "
    "the exact quantiles at q∓0.02; booleans hash-match the oracle's "
    "all-TRUE contract.",
)
def c2_sketch_error_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # exact distincts on their own scan: countDistinct mixed into the agg
    # below would drag every column through the ×(cols+1) Expand
    exact_users = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("exact_users")
    )
    pct = F.percentile_approx("value", [0.5, 0.95, 0.99], 10000)

    def _exact_q(q: float) -> F.Column:
        return F.expr(f"percentile(value, {q!r})")

    sketches = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        pct.getItem(0).alias("a50"),
        pct.getItem(1).alias("a95"),
        pct.getItem(2).alias("a99"),
        _exact_q(0.5 - _SK_RANK_EPS).alias("lo50"),
        _exact_q(0.5 + _SK_RANK_EPS).alias("hi50"),
        _exact_q(0.95 - _SK_RANK_EPS).alias("lo95"),
        _exact_q(min(1.0, 0.95 + _SK_RANK_EPS)).alias("hi95"),
        _exact_q(0.99 - _SK_RANK_EPS).alias("lo99"),
        _exact_q(1.0).alias("hi99"),
    )

    def _band_ok(a: str, lo: str, hi: str) -> F.Column:
        # vacuously TRUE when the group has no non-null values (both the
        # sketch and the exact quantiles are NULL — degenerate corpora)
        return (
            F.col(a).isNull() & F.col(lo).isNull()
        ) | F.col(a).between(F.col(lo), F.col(hi))

    users_eps = F.greatest(
        F.lit(_SK_HLL_ABS).cast("long"),
        F.ceil(F.lit(_SK_HLL_REL) * F.col("exact_users")),
    )
    return (
        exact_users.join(F.broadcast(sketches), "event_type")
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                <= users_eps
            ).alias("users_ok"),
            _band_ok("a50", "lo50", "hi50").alias("p50_ok"),
            _band_ok("a95", "lo95", "hi95").alias("p95_ok"),
            _band_ok("a99", "lo99", "hi99").alias("p99_ok"),
        )
        .orderBy("event_type")
    )
