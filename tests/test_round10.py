"""Round-10 query pins: independent plain-Python replays of the trickiest
arithmetic (rank statistics, moment algebra, the bucketed rank lookup), so
a future refactor that keeps the oracle in sync but breaks BOTH sides
identically still trips a third, formula-level check."""

from __future__ import annotations

import math
from collections import Counter

import pytest as _pytest_mark_mod

#: registry-backed sweeps — excluded from the fast dev loop
pytestmark = _pytest_mark_mod.mark.slow

SF = "/root/testdata/sf0.001"


def test_rank_counts_ref_free_bucket(spark):
    """Regression for the bucketed rank lookup: a query value landing in a
    bucket that contains NO reference points must still count every ref in
    lower buckets (offsets built from refs only silently returned 0)."""
    from logspout_kinesis_tests_spark.plans.round10_queries import _rank_counts

    ref = spark.createDataFrame([(0,), (1,), (2,)], "v long")
    qry = spark.createDataFrame(
        [(1, 1, 10)], "user_id long, session_seq long, q long"
    )
    bounds = spark.createDataFrame([(0, 10)], "mn long, mx long")
    for strict in (False, True):
        out = _rank_counts(ref, qry, bounds, strict=strict).collect()
        assert out[0]["rank"] == 3, f"strict={strict}"


def test_rank_counts_tie_semantics(spark):
    """At tie values: strict=False counts refs == q, strict=True does not."""
    from logspout_kinesis_tests_spark.plans.round10_queries import _rank_counts

    ref = spark.createDataFrame([(5,), (5,), (3,)], "v long")
    qry = spark.createDataFrame(
        [(1, 1, 5)], "user_id long, session_seq long, q long"
    )
    bounds = spark.createDataFrame([(3, 5)], "mn long, mx long")
    assert _rank_counts(ref, qry, bounds, strict=False).collect()[0]["rank"] == 3
    assert _rank_counts(ref, qry, bounds, strict=True).collect()[0]["rank"] == 1


def test_session_overlap_matches_bruteforce(spark):
    """The rank-arithmetic overlap count equals the O(n²) pair count."""
    from logspout_kinesis_tests_spark.plans.round9_queries import _session_table
    from logspout_kinesis_tests_spark.plans.round10_queries import (
        c15_session_overlap,
    )

    iv = (
        _session_table(spark, SF)
        .select("user_id", "session_seq", "start_us", "end_us")
        .collect()
    )
    assert iv
    got = {
        (r["user_id"], r["session_seq"]): r["n_overlap"]
        for r in c15_session_overlap(spark, SF).collect()
    }
    assert len(got) == len(iv)
    for r in iv:
        n = (
            sum(
                1
                for o in iv
                if o["start_us"] <= r["end_us"] and o["end_us"] >= r["start_us"]
            )
            - 1
        )
        assert got[(r["user_id"], r["session_seq"])] == n


def test_kendall_tau_matches_textbook(spark):
    """τ-b from the doubled-integer cell formula equals the standard
    halved tau-b computed cell-by-cell in plain Python."""
    from logspout_kinesis_tests_spark.plans.round10_queries import c2_kendall_tau
    from logspout_kinesis_tests_spark.sources.tables import load_table

    import pyspark.sql.functions as F

    li = load_table(spark, SF, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.round("l_quantity", 0).cast("long").alias("qi"),
        F.round(F.col("l_discount") * 100, 0).cast("long").alias("di"),
    )
    cells: dict[str, Counter] = {}
    for r in li.collect():
        cells.setdefault(r["flag"], Counter())[(r["qi"], r["di"])] += 1
    got = {r["flag"]: r for r in c2_kendall_tau(spark, SF).collect()}
    for flag, c in cells.items():
        items = list(c.items())
        nc = nd = 0
        for i, ((q1, d1), f1) in enumerate(items):
            for (q2, d2), f2 in items[i + 1 :]:
                if q1 == q2 or d1 == d2:
                    continue
                if (q2 > q1) == (d2 > d1):
                    nc += f1 * f2
                else:
                    nd += f1 * f2
        n = sum(c.values())
        n0 = n * (n - 1) / 2
        tq = Counter()
        td = Counter()
        for (q, d), f in c.items():
            tq[q] += f
            td[d] += f
        n1 = sum(t * (t - 1) / 2 for t in tq.values())
        n2 = sum(t * (t - 1) / 2 for t in td.values())
        expect = (nc - nd) / math.sqrt((n0 - n1) * (n0 - n2))
        row = got[flag]
        assert row["concordant"] == nc and row["discordant"] == nd
        assert abs(row["tau_b"] - expect) < 2e-6


def _cents(spark):
    import pyspark.sql.functions as F

    from logspout_kinesis_tests_spark.sources.tables import load_table

    ev = load_table(spark, SF, "events").filter(F.col("value").isNotNull())
    out: dict[str, list[int]] = {}
    for r in ev.select(
        F.col("event_type").alias("g"),
        F.round(F.col("value") * 100, 0).cast("long").alias("x"),
    ).collect():
        out.setdefault(r["g"], []).append(r["x"])
    return out


def test_jarque_bera_matches_textbook(spark):
    import numpy as np

    from logspout_kinesis_tests_spark.plans.round10_queries import c2_jarque_bera

    groups = _cents(spark)
    got = {r["g"]: r for r in c2_jarque_bera(spark, SF).collect()}
    for g, xs in groups.items():
        x = np.array(xs, dtype=np.float64)
        n = len(x)
        m = x.mean()
        m2 = ((x - m) ** 2).mean()
        m3 = ((x - m) ** 3).mean()
        m4 = ((x - m) ** 4).mean()
        sk = m3 / (math.sqrt(m2) * m2)
        ku = m4 / (m2 * m2)
        jb = n / 6 * (sk * sk + (ku - 3) ** 2 / 4)
        row = got[g]
        assert row["n"] == n
        assert abs(row["skewness"] - sk) < 1e-5
        assert abs(row["kurtosis"] - ku) < 1e-5
        assert abs(row["jb"] - jb) < max(1e-4, 1e-7 * abs(jb))


def test_cohens_d_matches_textbook(spark):
    import numpy as np

    from logspout_kinesis_tests_spark.plans.round10_queries import c2_cohens_d

    groups = _cents(spark)
    got = {(r["g1"], r["g2"]): r["cohens_d"] for r in c2_cohens_d(spark, SF).collect()}
    names = sorted(groups)
    assert len(got) == len(names) * (len(names) - 1) // 2
    for i, g1 in enumerate(names):
        for g2 in names[i + 1 :]:
            a = np.array(groups[g1], dtype=np.float64)
            b = np.array(groups[g2], dtype=np.float64)
            v1, v2 = a.var(ddof=1), b.var(ddof=1)
            pooled = ((len(a) - 1) * v1 + (len(b) - 1) * v2) / (len(a) + len(b) - 2)
            expect = (a.mean() - b.mean()) / math.sqrt(pooled)
            assert abs(got[(g1, g2)] - expect) < 1e-5


def test_term_burstiness_matches_counter_replay(spark):
    from logspout_kinesis_tests_spark.plans.round10_queries import (
        c11_term_burstiness,
    )
    from logspout_kinesis_tests_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents").select("doc_id", "text").collect()
    per_doc: dict[str, Counter] = {}
    for r in docs:
        for t, c in Counter(
            w for w in (r["text"] or "").lower().split(" ") if w
        ).items():
            per_doc.setdefault(t, Counter())[r["doc_id"]] = c
    rows = c11_term_burstiness(spark, SF).collect()
    assert len(rows) == 20
    # deterministic top-20 by (df desc, term)
    expect_terms = sorted(per_doc, key=lambda t: (-len(per_doc[t]), t))[:20]
    assert [r["term"] for r in sorted(rows, key=lambda r: (-r["df"], r["term"]))] == (
        expect_terms
    )
    for r in rows:
        cs = list(per_doc[r["term"]].values())
        df, sc, sq = len(cs), sum(cs), sum(c * c for c in cs)
        assert (r["df"], r["total_cnt"]) == (df, sc)
        fano = (df * sq - sc * sc) / (df * sc)
        assert abs(r["fano"] - fano) < 2e-6
