"""Property-based tests (Hypothesis) for the round-9 statistics: the
oracle comparison proves Spark == DuckDB on the fixed testdata; these
prove the shared formulation == the TEXTBOOK DEFINITION on hostile random
inputs — ties everywhere, degenerate single-value groups, tiny n.

- Spearman: the joint-table midrank moments are checked against a literal
  rank-then-Pearson computed per row in plain Python.
- Brown–Forsythe: the doubled-integer-deviation F is checked against the
  textbook Levene-with-median statistic.
"""

from __future__ import annotations

import itertools

import pytest as _pytest_mark_mod

pytestmark = _pytest_mark_mod.mark.slow

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from logspout_kinesis_tests_spark.plans import REGISTRY

_settings = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_counter = itertools.count()


def _midranks(xs):
    order = sorted(range(len(xs)), key=lambda i: xs[i])
    ranks = [0.0] * len(xs)
    i = 0
    while i < len(order):
        j = i
        while j + 1 < len(order) and xs[order[j + 1]] == xs[order[i]]:
            j += 1
        mr = (i + j) / 2 + 1
        for k in range(i, j + 1):
            ranks[order[k]] = mr
        i = j + 1
    return ranks


@_settings
@given(
    pairs=st.lists(
        st.tuples(st.integers(1, 8), st.integers(0, 5)),
        min_size=3,
        max_size=40,
    )
)
def test_spearman_matches_rank_pearson(spark, tmp_path_factory, pairs):
    """Heavy-tie random (quantity, discount) pairs: the Spark rho equals
    rank-then-Pearson computed row-by-row (the definition), or both are
    undefined (constant variable)."""
    d = str(tmp_path_factory.mktemp(f"r9sp{next(_counter)}"))
    rows = [
        (1, float(q), dd / 100.0, "A") for q, dd in pairs
    ]
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_quantity double, l_discount double, l_returnflag string",
    ).write.mode("overwrite").parquet(f"{d}/lineitem.parquet")
    r = REGISTRY["c2_spearman_rho"].build(spark, d).head()
    assert r["n"] == len(pairs)

    rx = _midranks([q for q, _ in pairs])
    ry = _midranks([dd for _, dd in pairs])
    n = len(rx)
    sx, sy = sum(rx), sum(ry)
    vx = n * sum(x * x for x in rx) - sx * sx
    vy = n * sum(y * y for y in ry) - sy * sy
    if vx <= 0 or vy <= 0:
        assert r["rho"] is None
        return
    cov = n * sum(x * y for x, y in zip(rx, ry)) - sx * sy
    rho = cov / (vx * vy) ** 0.5
    assert abs(r["rho"] - rho) < 1e-6


@_settings
@given(
    groups=st.lists(
        st.lists(st.integers(-100, 100), min_size=2, max_size=20),
        min_size=2,
        max_size=4,
    )
)
def test_brown_forsythe_matches_textbook(spark, tmp_path_factory, groups):
    """Random integer-valued groups (values are whole cents via v/100):
    the Spark F equals the textbook Levene-with-median statistic, and the
    all-identical degenerate case yields NULL (within_ss = 0)."""
    import datetime

    d = str(tmp_path_factory.mktemp(f"r9bf{next(_counter)}"))
    rows = []
    eid = 0
    for g, vals in enumerate(groups):
        for v in vals:
            rows.append(
                (
                    eid,
                    datetime.datetime(2024, 1, 1)
                    + datetime.timedelta(minutes=eid),
                    1,
                    f"g{g}",
                    v / 100.0,
                    "{}",
                )
            )
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).write.mode("overwrite").parquet(f"{d}/events.parquet")
    r = REGISTRY["c2_brown_forsythe"].build(spark, d).head()
    assert (r["n"], r["k"]) == (sum(len(g) for g in groups), len(groups))

    def med2(xs):
        s = sorted(xs)
        m = len(s)
        return s[m // 2] * 2 if m % 2 else s[m // 2 - 1] + s[m // 2]

    zs = [[abs(2 * v - med2(g)) for v in g] for g in groups]
    k, n = len(zs), sum(len(z) for z in zs)
    grand = sum(sum(z) for z in zs) / n
    between = sum(len(z) * (sum(z) / len(z) - grand) ** 2 for z in zs)
    within = sum(sum((x - sum(z) / len(z)) ** 2 for x in z) for z in zs)
    if within <= 0:
        assert r["f_stat"] is None
        return
    f = (n - k) / (k - 1) * between / within
    # the builder quantizes per-group terms to 6dp before the cross-group
    # sum, so equality is to quantization tolerance, not bit-exact
    assert abs(r["f_stat"] - f) < 1e-3 * max(1.0, abs(f))
