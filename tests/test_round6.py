"""Semantic pins for the round-6 queries: the IVF/PQ assignment gates are
replayed brute-force in Python with the exact same quantized-decimal
arithmetic (the oracle sweep already pins cross-engine equality; these pin
that the assignment itself is the mathematically-correct argmax/argmin),
and the per-user ACF is replayed with plain Pearson on one series."""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import functions as F

from logspout_kinesis_tests_spark.plans import REGISTRY
from logspout_kinesis_tests_spark.sources.tables import load_table

_Q15 = Decimal("1e-15")


def _qsum(terms) -> Decimal:
    """Exact sum of round-half-up 15-dp quantized doubles — the same
    arithmetic as the gates' per-term DECIMAL(28,15) policy (Spark round()
    is HALF_UP; Python's round() is half-even, hence Decimal here)."""
    return sum(
        (Decimal(repr(t)).quantize(_Q15, rounding=ROUND_HALF_UP) for t in terms),
        Decimal(0),
    )


def test_ivf_gate_assignment_matches_bruteforce(spark, sf_dir):
    emb = [
        (r["vec_id"], [float(x) for x in r["embedding"]])
        for r in load_table(spark, sf_dir, "embeddings").collect()
    ]
    emb.sort(key=lambda t: t[0])
    cents = emb[:16]
    want = {}
    for vid, v in emb:
        best = None
        for cell, c in cents:
            csq = _qsum(x * x for x in c)
            if csq <= 0:
                continue
            dot = float(_qsum(a * b for a, b in zip(v, c)))
            sim = dot / math.sqrt(float(csq))
            # argmax with cell-ascending tie-break, as both engines order
            if best is None or sim > best[0] or (sim == best[0] and cell < best[1]):
                best = (sim, cell)
        want[vid] = best[1]
    got = {
        r["vec_id"]: r["cell"]
        for r in REGISTRY["c10_ivf_md5_gate"].build(spark, sf_dir).collect()
    }
    assert got == want


def test_pq_gate_codes_match_bruteforce(spark, sf_dir):
    emb = [
        (r["vec_id"], [float(x) for x in r["embedding"]])
        for r in load_table(spark, sf_dir, "embeddings").collect()
    ]
    emb.sort(key=lambda t: t[0])
    seeds, dsub = emb[:16], 16
    want = {}
    for vid, v in emb:
        for sub in range(4):
            vs = v[sub * dsub : (sub + 1) * dsub]
            best = None
            for cell, c in seeds:
                cs = c[sub * dsub : (sub + 1) * dsub]
                d2 = _qsum((a - b) * (a - b) for a, b in zip(vs, cs))
                if best is None or d2 < best[0] or (d2 == best[0] and cell < best[1]):
                    best = (d2, cell)
            want[(vid, sub)] = best[1]
    got = {
        (r["vec_id"], r["sub"]): r["code"]
        for r in REGISTRY["c10_pq_md5_gate"].build(spark, sf_dir).collect()
    }
    assert got == want


def test_pq_gate_codes_partition_corpus(spark, sf_dir):
    out = REGISTRY["c10_pq_md5_gate"].build(spark, sf_dir)
    n = load_table(spark, sf_dir, "embeddings").count()
    assert out.count() == n * 4  # one code per (vector, subspace)
    # codes refer to the 16 lowest vec_ids (the seed codebook)
    assert out.agg(F.max("code")).head()[0] < 16


def test_acf_by_user_lag1_matches_pearson_replay(spark, sf_dir):
    rows = (
        REGISTRY["c16_acf_by_user"].build(spark, sf_dir).filter(F.col("lag") == 1)
    ).collect()
    assert rows, "no lag-1 series produced"
    # replay the densest (user, type) series with plain float Pearson
    target = max(rows, key=lambda r: r["n_pairs"])
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(
            (F.col("user_id") == target["user_id"])
            & (F.col("event_type") == target["event_type"])
            & F.col("value").isNotNull()
        )
        .orderBy("ts", "event_id")
        .collect()
    )
    series = [float(r["value"]) for r in ev]
    xs, ys = series[1:], series[:-1]
    n = len(xs)
    assert n == target["n_pairs"]
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx, syy = sum(a * a for a in xs), sum(b * b for b in ys)
    den = (n * sxx - sx * sx) * (n * syy - sy * sy)
    want = (n * sxy - sx * sy) / math.sqrt(den)
    assert abs(target["acf"] - want) < 1e-6


def test_acf_by_user_constant_series_yields_null_not_nan(spark):
    """Zero-variance (constant-value) series: den <= 0 must produce NULL —
    Spark NaN where DuckDB yields NULL is the proven driver-divergence
    class, and near-zero variance can round den to a tiny NEGATIVE double
    (sqrt would raise in DuckDB and NaN in Spark)."""
    from logspout_kinesis_tests_spark.plans.round6_queries import c16_acf_by_user

    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        ev = spark.createDataFrame(
            [(i, 7, "click", 5.0, 1_700_000_000_000_000_000 + i * 10**9)
             for i in range(10)],
            "event_id long, user_id long, event_type string, value double, ts long",
        ).select(
            "event_id", "user_id", "event_type", "value",
            F.timestamp_micros(F.expr("ts DIV 1000")).alias("ts"),
        )
        ev.write.parquet(os.path.join(d, "events.parquet"))
        out = c16_acf_by_user(spark, d).collect()
        assert out, "constant series produced no rows"
        for r in out:
            assert r["acf"] is None, f"expected NULL acf, got {r['acf']}"
            assert not (
                isinstance(r["acf"], float) and math.isnan(r["acf"])
            )
