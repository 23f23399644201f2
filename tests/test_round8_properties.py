"""Property-based tests (Hypothesis) for the round-8 operators: the
oracle comparison proves Spark == DuckDB on the fixed testdata; these
prove the shared formulation == the TEXTBOOK DEFINITION on hostile random
inputs — ties, negatives, duplicates, degenerate shapes.

- Pettitt: the exact-integer midrank identity U_t = Σ 2·midrank − t(n+1)
  is checked against the literal double-sum definition
  U_t = Σ_{i≤t} Σ_{j>t} sign(x_i − x_j).
- Skyline: the bucketed threshold reassembly is checked against O(n²)
  brute-force dominance.
- Kruskal–Wallis: the quantized distributed H is checked against an
  independently-associated textbook H (tolerance, not bit equality —
  bit parity is the oracle's job).
"""

from __future__ import annotations

import datetime
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


def _events_dir(spark, tmp_path_factory, values: list[int]) -> str:
    """One event per hour with an exact integer value (cents = 100·v)."""
    d = str(tmp_path_factory.mktemp(f"r8prop{next(_counter)}"))
    rows = [
        (
            i,
            datetime.datetime(2024, 1, 1) + datetime.timedelta(hours=i),
            1,
            "m",
            float(v),
            "{}",
        )
        for i, v in enumerate(values)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).write.mode("overwrite").parquet(f"{d}/events.parquet")
    return d


@_settings
@given(values=st.lists(st.integers(-50, 50), min_size=2, max_size=24))
def test_pettitt_matches_double_sum_definition(spark, tmp_path_factory, values):
    def sign(x):
        return (x > 0) - (x < 0)

    n = len(values)
    u = [
        sum(sign(values[i] - values[j]) for i in range(t + 1) for j in range(t + 1, n))
        for t in range(n - 1)
    ]
    k_want = max(abs(x) for x in u)
    arg_want = min(t for t, x in enumerate(u) if abs(x) == k_want)

    d = _events_dir(spark, tmp_path_factory, values)
    out = REGISTRY["c16_pettitt_changepoint"].build(spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n"] == n
    assert r["k_stat"] == k_want
    # change_hour is absolute (epoch-hour); the series starts at the
    # builder's own epoch-hour of 2024-01-01 00:00 in the session tz
    from pyspark.sql import functions as F

    base_hour = (
        spark.createDataFrame([("2024-01-01 00:00:00",)], "t string")
        .select(
            F.expr("unix_micros(CAST(t AS TIMESTAMP)) div 3600000000").alias("h")
        )
        .head()["h"]
    )
    assert r["change_hour"] == base_hour + arg_want


@_settings
@given(
    pts=st.lists(
        st.tuples(st.integers(0, 15), st.integers(1, 8)),
        min_size=1,
        max_size=20,
    )
)
def test_skyline_matches_bruteforce_on_random_points(
    spark, tmp_path_factory, pts
):
    d = str(tmp_path_factory.mktemp(f"r8prop{next(_counter)}"))
    rows = [
        (i, " ".join(f"w{k}" for k in range(b)), "en", "s", a)
        for i, (a, b) in enumerate(pts)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    got = {
        r["doc_id"]
        for r in REGISTRY["c14_pareto_skyline"].build(spark, d).collect()
    }
    want = {
        i
        for i, (a, b) in enumerate(pts)
        if not any(
            ea >= a and eb >= b and (ea > a or eb > b) for ea, eb in pts
        )
    }
    assert got == want


@_settings
@given(
    groups=st.lists(
        st.lists(st.integers(-9, 9), min_size=1, max_size=12),
        min_size=2,
        max_size=4,
    )
)
def test_kruskal_wallis_matches_textbook_h(spark, tmp_path_factory, groups):
    vals = [(f"g{gi}", float(v)) for gi, vs in enumerate(groups) for v in vs]
    d = str(tmp_path_factory.mktemp(f"r8prop{next(_counter)}"))
    rows = [
        (
            i,
            datetime.datetime(2024, 1, 1, 0, i % 60, i // 60),
            1,
            et,
            v,
            "{}",
        )
        for i, (et, v) in enumerate(vals)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).write.mode("overwrite").parquet(f"{d}/events.parquet")

    # textbook H with midranks, freely associated
    allv = sorted(v for _, v in vals)
    n = len(allv)
    rank = {}
    i = 0
    while i < n:
        j = i
        while j < n and allv[j] == allv[i]:
            j += 1
        for _ in range(i, j):
            rank.setdefault(allv[i], (i + j + 1) / 2)
        i = j
    h = 12 / (n * (n + 1)) * sum(
        (sum(rank[v] for v in vs)) ** 2 / len(vs)
        for vs in ([v for g2, v in vals if g2 == f"g{gi}"] for gi in range(len(groups)))
    ) - 3 * (n + 1)
    out = REGISTRY["c2_kruskal_wallis"].build(spark, d).collect()
    assert len(out) == len(groups)
    for r in out:
        assert abs(r["h_stat"] - h) < 1e-6
        assert r["n"] == n


@_settings
@given(
    edges=st.sets(
        st.tuples(st.integers(1, 5), st.integers(1, 5)),  # (cust, supp)
        min_size=1,
        max_size=12,
    )
)
def test_label_propagation_matches_python_lpa(spark, tmp_path_factory, edges):
    """The registered 4-round self-vote LPA equals an independent plain-
    Python synchronous implementation on random bipartite trade graphs."""
    d = str(tmp_path_factory.mktemp(f"r8prop{next(_counter)}"))
    orders = [(i + 1, c) for i, (c, _) in enumerate(sorted(edges))]
    li = [(i + 1, s, 50.0) for i, (_, s) in enumerate(sorted(edges))]
    spark.createDataFrame(orders, "o_orderkey long, o_custkey long").write.mode(
        "overwrite"
    ).parquet(f"{d}/orders.parquet")
    spark.createDataFrame(
        li, "l_orderkey long, l_suppkey long, l_quantity double"
    ).write.mode("overwrite").parquet(f"{d}/lineitem.parquet")

    # independent replay: nodes c*2 / s*2+1, neighbor votes + self label,
    # max count then min label, 4 synchronous rounds
    und = set()
    for c, s in edges:
        und.add((c * 2, s * 2 + 1))
        und.add((s * 2 + 1, c * 2))
    nodes = {a for a, _ in und}
    label = {v: v for v in nodes}
    for _ in range(4):
        new = {}
        for v in nodes:
            votes = [label[u] for u, w in und if w == v] + [label[v]]
            counts = {}
            for x in votes:
                counts[x] = counts.get(x, 0) + 1
            new[v] = min(counts, key=lambda x: (-counts[x], x))
        label = new
    want = {}
    for v, lb in label.items():
        name = f"c{lb // 2}" if lb % 2 == 0 else f"s{(lb - 1) // 2}"
        want[name] = want.get(name, 0) + 1

    got = {
        r["community"]: r["size"]
        for r in REGISTRY["c17_label_propagation"].build(spark, d).collect()
    }
    assert got == want


@_settings
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 47),      # hour within two days
            st.integers(-500, 500),  # cents
        ),
        min_size=1,
        max_size=30,
    )
)
def test_ohlc_matches_python_replay(spark, tmp_path_factory, rows):
    """Bars replay exactly: open/close by (ts, event_id), duplicates and
    negative values included (event_id = list index breaks ts ties)."""
    d = str(tmp_path_factory.mktemp(f"r8prop{next(_counter)}"))
    data = [
        (
            i,
            datetime.datetime(2024, 1, 1) + datetime.timedelta(hours=h),
            1,
            "m",
            c / 100.0,
            "{}",
        )
        for i, (h, c) in enumerate(rows)
    ]
    spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).write.mode("overwrite").parquet(f"{d}/events.parquet")

    bars = {}
    for i, (h, c) in enumerate(rows):
        day = (datetime.datetime(2024, 1, 1) + datetime.timedelta(hours=h)).strftime("%Y-%m-%d")
        bars.setdefault(day, []).append((h, i, c))
    want = {}
    for day, pts in bars.items():
        pts.sort(key=lambda t: (t[0], t[1]))
        cs = [c for _, _, c in pts]
        want[day] = (pts[0][2], max(cs), min(cs), pts[-1][2], len(cs), sum(cs))

    got = {
        r["day"]: (
            r["open_c"], r["high_c"], r["low_c"], r["close_c"],
            r["volume"], r["turnover_c"],
        )
        for r in REGISTRY["c16_ohlc_bars"].build(spark, d).collect()
    }
    assert got == want
