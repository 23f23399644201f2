"""Property-based tests (Hypothesis) for the round-3 operators: RRF fusion
algebra, containment bounds/monotonicity, gap-fill grid invariants."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

_settings = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


ranking = st.lists(
    st.integers(min_value=1, max_value=30), min_size=1, max_size=8, unique=True
)


@_settings
@given(ids_a=ranking, ids_b=ranking)
def test_rrf_fuse_is_system_order_invariant(spark, ids_a, ids_b):
    """Fusing [A, B] and [B, A] gives identical scores — decimal addition
    of the rounded reciprocals is commutative by construction."""
    from logspout_kinesis_tests_spark.operators.similarity import rrf_fuse

    a = spark.createDataFrame(
        [(i, r + 1) for r, i in enumerate(ids_a)], "doc_id long, rank int"
    )
    b = spark.createDataFrame(
        [(i, r + 1) for r, i in enumerate(ids_b)], "doc_id long, rank int"
    )
    ab = {r["doc_id"]: r["rrf"] for r in rrf_fuse([a, b]).collect()}
    ba = {r["doc_id"]: r["rrf"] for r in rrf_fuse([b, a]).collect()}
    assert ab == ba
    # every fused score is the sum of per-system reciprocals
    for doc in set(ids_a) | set(ids_b):
        want = 0.0
        if doc in ids_a:
            want += round(1.0 / (60 + ids_a.index(doc) + 1), 9)
        if doc in ids_b:
            want += round(1.0 / (60 + ids_b.index(doc) + 1), 9)
        assert abs(ab[doc] - want) < 1e-12


words = st.lists(
    st.sampled_from([f"w{i}" for i in range(12)]), min_size=3, max_size=30
)


@_settings
@given(bench_words=words, extra=words)
def test_containment_bounds_and_extension_monotonicity(spark, bench_words, extra):
    """0 <= containment <= 1 always; appending text to a corpus doc that
    already contains the benchmark verbatim keeps containment at 1.0
    (denominator is the BENCHMARK's shingle count, not the doc's)."""
    from logspout_kinesis_tests_spark.operators.dedup import ngram_containment

    bench_text = " ".join(bench_words)
    doc_text = bench_text + " " + " ".join(extra)
    corpus = spark.createDataFrame(
        [(1, doc_text)], "doc_id long, text string"
    )
    bench = spark.createDataFrame([(9, bench_text)], "bench_id long, text string")
    rows = ngram_containment(corpus, bench, threshold=0.0).collect()
    assert len(rows) == 1
    assert rows[0]["containment"] == 1.0


ts_list = st.lists(
    st.integers(min_value=0, max_value=72), min_size=1, max_size=12, unique=True
)


@_settings
@given(hours=ts_list)
def test_gap_fill_grid_is_dense_and_locf_total(spark, hours):
    """Grid covers every hour between min and max exactly once; n sums to
    the input row count; total_locf is never NULL after the first bucket."""
    from logspout_kinesis_tests_spark.operators.timeseries import gap_fill

    rows = [("k", f"2026-02-01 {h % 24:02d}:30:00", float(h)) for h in hours]
    # spread across days for h >= 24
    rows = [
        ("k", f"2026-02-{1 + h // 24:02d} {h % 24:02d}:30:00", float(h))
        for h in hours
    ]
    df = spark.createDataFrame(
        rows, "event_type string, ts string, value double"
    ).select("event_type", F.col("ts").cast("timestamp").alias("ts"), "value")
    out = gap_fill(df).orderBy("bucket_start").collect()
    span = max(hours) - min(hours) + 1
    assert len(out) == span
    assert sum(r["n"] for r in out) == len(hours)
    assert all(r["total_locf"] is not None for r in out)
    assert not out[0]["is_gap"]  # grid starts at an observed bucket
    # bucket sequence is dense hourly
    starts = [r["bucket_start"] for r in out]
    assert all(
        int((b - a).total_seconds()) == 3600 for a, b in zip(starts, starts[1:])
    )
