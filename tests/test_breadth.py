"""Semantic pins for the round-5 breadth operators — the oracle parity
sweep covers cross-engine value equality; these pin the mathematical
properties the oracles merely mirror (closed-form identities, brute-force
replays, format-parsing edge cases)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from logspout_kinesis_tests_spark.operators.graph import (
    common_neighbor_pairs,
    triangles,
)
from logspout_kinesis_tests_spark.plans import REGISTRY


# --- triangle counting ------------------------------------------------------


def test_triangles_on_known_graph(spark):
    # K4 on {1,2,3,4} has C(4,3)=4 triangles; adding a pendant edge (4,5)
    # adds none.  Edges stored once as (min, max).
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges = spark.createDataFrame(k4 + [(4, 5)], "u long, v long")
    tris = {tuple(r) for r in triangles(edges).collect()}
    assert len(tris) == 4
    assert (1, 2, 3) in tris and (2, 3, 4) in tris
    # every triangle ordered a < b < c and emitted exactly once
    assert all(a < b < c for a, b, c in tris)


def test_triangle_count_query_matches_bruteforce(spark, sf_dir):
    row = REGISTRY["c17_triangle_count"].build(spark, sf_dir).collect()[0]
    from logspout_kinesis_tests_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    op = {(r["l_orderkey"], r["l_partkey"]) for r in li.collect()}
    by_order: dict[int, set[int]] = {}
    for o, p in op:
        by_order.setdefault(o, set()).add(p)
    support: dict[tuple[int, int], int] = {}
    for parts in by_order.values():
        ps = sorted(parts)
        for i, u in enumerate(ps):
            for v in ps[i + 1 :]:
                support[(u, v)] = support.get((u, v), 0) + 1
    edges = {e for e, s in support.items() if s >= 2}
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
    n_tri = sum(
        1
        for u, vs in adj.items()
        for v in vs
        for w in adj.get(v, ())
        if w in vs
    )
    assert row["n_edges"] == len(edges)
    assert row["n_triangles"] == n_tri


# --- common-neighbor link prediction ---------------------------------------


def test_common_neighbors_exact_on_small_graph(spark):
    # left 1 shares rights {a,b} with left 2; hub right 'z' (degree 3 > cap)
    # must be cut and contribute nothing.
    bip = spark.createDataFrame(
        [
            (1, "a"), (1, "b"), (1, "z"),
            (2, "a"), (2, "b"), (2, "z"),
            (3, "b"), (3, "z"),
        ],
        "left long, right string",
    )
    rows = common_neighbor_pairs(
        bip, max_right_degree=2, min_common=1
    ).collect()
    got = {(r["a"], r["b"]): r for r in rows}
    # after cutting 'z': 1-{a,b}, 2-{a,b}, 3-{b}
    assert set(got) == {(1, 2), (1, 3), (2, 3)}
    r12 = got[(1, 2)]
    assert r12["n_common"] == 2 and r12["deg_a"] == 2 and r12["deg_b"] == 2
    assert r12["jaccard"] == 1.0  # identical sets under the cut
    assert got[(1, 3)]["jaccard"] == round(1 / 2, 6)


# --- CUSUM closed form ------------------------------------------------------


def test_cusum_closed_form_equals_step_recurrence(spark, sf_dir):
    """S_t = C_t − min(0, min_{j≤t} C_j) must equal the literal
    max(0, S_{t-1} + y_t) walk — the identity the r5 rewrite rests on."""
    from logspout_kinesis_tests_spark.plans.monitor_queries import (
        _CUSUM_SLACK,
        _CUSUM_TARGET,
        _CUSUM_THRESHOLD,
    )

    out = REGISTRY["c16_cusum"].build(spark, sf_dir)
    got = {
        r["event_id"]: (r["cusum"], r["alarm"]) for r in out.collect()
    }
    from logspout_kinesis_tests_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts", "value"
    )
    series: dict[tuple, list] = {}
    for r in ev.collect():
        series.setdefault((r["user_id"], r["event_type"]), []).append(r)
    checked = 0
    for rows in series.values():
        rows.sort(key=lambda r: (r["ts"], r["event_id"]))
        s_cents = 0
        for r in rows:
            y = round(r["value"] * 100) - round(
                (_CUSUM_TARGET + _CUSUM_SLACK) * 100
            )
            s_cents = max(0, s_cents + y)
            want = s_cents / 100
            got_cusum, got_alarm = got[r["event_id"]]
            assert got_cusum == want, (r["event_id"], got_cusum, want)
            assert got_alarm == (1 if want > _CUSUM_THRESHOLD else 0)
            checked += 1
    assert checked == len(got) > 0


# --- interval-union coverage ------------------------------------------------


def test_interval_coverage_matches_python_merge(spark, sf_dir):
    from logspout_kinesis_tests_spark.plans.breadth_queries import _IC_BASE_S
    from logspout_kinesis_tests_spark.sources.tables import load_table

    got = {
        r["user_id"]: (r["n_islands"], r["covered_us"])
        for r in REGISTRY["c15_interval_coverage"].build(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    ).select(
        F.unix_micros(F.col("ts").cast("timestamp")).alias("s"),
        "user_id",
        "value",
    )
    per_user: dict[int, list[tuple[int, int]]] = {}
    for r in ev.collect():
        dur = (_IC_BASE_S + round(abs(r["value"]))) * 1_000_000
        per_user.setdefault(r["user_id"], []).append((r["s"], r["s"] + dur))
    for uid, ivs in per_user.items():
        ivs.sort()
        merged = []
        for s, e in ivs:
            if merged and s <= merged[-1][1]:
                merged[-1] = (merged[-1][0], max(merged[-1][1], e))
            else:
                merged.append((s, e))
        want = (len(merged), sum(e - s for s, e in merged))
        assert got[uid] == want, (uid, got[uid], want)


# --- Mann–Whitney -----------------------------------------------------------


def test_mann_whitney_matches_rank_replay(spark, sf_dir):
    from logspout_kinesis_tests_spark.plans.breadth_queries import _MW_A, _MW_B
    from logspout_kinesis_tests_spark.sources.tables import load_table

    row = REGISTRY["c2_mann_whitney"].build(spark, sf_dir).collect()[0]
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(_MW_A, _MW_B) & F.col("value").isNotNull()
    )
    xs = [(r["value"], r["event_type"]) for r in ev.collect()]
    xs.sort()
    # midranks with ties
    ranks: dict[float, float] = {}
    i = 0
    while i < len(xs):
        j = i
        while j < len(xs) and xs[j][0] == xs[i][0]:
            j += 1
        ranks[xs[i][0]] = (i + 1 + j) / 2  # average of ranks i+1..j
        i = j
    n1 = sum(1 for _, t in xs if t == _MW_A)
    n2 = len(xs) - n1
    r1 = sum(ranks[v] for v, t in xs if t == _MW_A)
    u1 = r1 - n1 * (n1 + 1) / 2
    assert row["n1"] == n1 and row["n2"] == n2
    assert abs(row["u1"] - u1) < 1e-6
    # tie-corrected z replay
    from collections import Counter

    t_counts = Counter(v for v, _ in xs)
    tie3 = sum(t**3 - t for t in t_counts.values())
    n = n1 + n2
    var = n1 * n2 / 12 * ((n + 1) - tie3 / (n * (n - 1)))
    z = (u1 - n1 * n2 / 2) / math.sqrt(var)
    assert abs(row["z"] - z) < 1e-6


# --- Zipf slope -------------------------------------------------------------


def test_zipf_slope_matches_ols_replay(spark, sf_dir):
    from logspout_kinesis_tests_spark.operators.text_analysis import words
    from logspout_kinesis_tests_spark.sources.tables import load_table

    row = REGISTRY["c11_zipf_slope"].build(spark, sf_dir).collect()[0]
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(F.explode(words("text")).alias("term"))
        .groupBy("term")
        .count()
        .orderBy(F.col("count").desc(), "term")
        .limit(100)
        .collect()
    )
    pts = [
        (math.log(i + 1), math.log(r["count"])) for i, r in enumerate(tf)
    ]
    k = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    slope = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    assert row["n_terms"] == k
    assert abs(row["slope"] - slope) < 1e-6
    # natural-ish corpus: slope must be negative (frequency falls with rank)
    assert row["slope"] < 0
    assert 0 <= row["r2"] <= 1


# --- GIF header decode ------------------------------------------------------


def test_gif_header_roundtrip_and_bitfields(spark):
    from logspout_kinesis_tests_spark.operators.multimodal import (
        parse_gif_header,
        synth_gif_payload,
    )

    src = spark.createDataFrame(
        [
            (1, 320, 200, 0xF7),  # GCT on, size 2^8=256
            (2, 1, 1, 0x00),      # GCT off
            (3, 65535, 65535, 0x81),  # max dims, GCT size 2^2=4
        ],
        "doc_id long, width long, height long, packed long",
    )
    rows = {
        r["doc_id"]: r
        for r in parse_gif_header(synth_gif_payload(src)).collect()
    }
    assert rows[1]["gif_valid"] and rows[1]["gif_width"] == 320
    assert rows[1]["gif_height"] == 200
    assert rows[1]["has_gct"] is True and rows[1]["gct_size"] == 256
    assert rows[2]["has_gct"] is False and rows[2]["gct_size"] is None
    assert rows[3]["gif_width"] == 65535 and rows[3]["gct_size"] == 4

    # GIF87a (older signature) and garbage must both fail the strict check
    bad = spark.createDataFrame(
        [(1, bytearray.fromhex("474946383761" + "40010001" + "00" * 3)),
         (2, bytearray.fromhex("00ff00ff"))],
        "doc_id long, payload binary",
    )
    out = {r["doc_id"]: r for r in parse_gif_header(bad).collect()}
    assert out[1]["gif_valid"] is False and out[1]["gif_width"] is None
    assert out[2]["gif_valid"] is False


# --- zone-map pruning stats -------------------------------------------------


def test_pruning_stats_consistency(spark, sf_dir):
    from logspout_kinesis_tests_spark.plans.breadth_queries import (
        _PRUNE_HI,
        _PRUNE_LO,
    )
    from logspout_kinesis_tests_spark.sources.tables import load_table

    rows = REGISTRY["c19_pruning_stats"].build(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_skipped"] <= r["n_files"]
        assert 0 <= r["rows_skipped"] <= r["rows_total"]
        assert abs(r["skip_ratio"] - round(r["rows_skipped"] / r["rows_total"], 6)) < 1e-9
    # replay the zone-map verdict from the raw manifest
    from pyspark.sql import functions as G

    li = load_table(spark, sf_dir, "lineitem")
    man = (
        li.groupBy(G.date_format("l_shipdate", "yyyy-MM-dd").alias("d"))
        .agg(G.min("l_partkey").alias("zmin"), G.max("l_partkey").alias("zmax"))
        .collect()
    )
    want_skipped = sum(
        1 for r in man if not (r["zmax"] >= _PRUNE_LO and r["zmin"] <= _PRUNE_HI)
    )
    assert sum(r["n_skipped"] for r in rows) == want_skipped


# --- ACF --------------------------------------------------------------------


def test_acf_lag1_matches_pearson_replay(spark, sf_dir):
    from logspout_kinesis_tests_spark.sources.tables import load_table

    got = {
        (r["event_type"], r["lag"]): r
        for r in REGISTRY["c16_acf"].build(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    series: dict[str, list] = {}
    for r in ev.select("event_type", "ts", "event_id", "value").collect():
        series.setdefault(r["event_type"], []).append(r)
    for etype, rows in series.items():
        rows.sort(key=lambda r: (r["ts"], r["event_id"]))
        vals = [round(r["value"], 2) for r in rows]
        pairs = list(zip(vals[1:], vals[:-1]))
        n = len(pairs)
        sx = sum(x for x, _ in pairs)
        sy = sum(y for _, y in pairs)
        sxy = sum(x * y for x, y in pairs)
        sxx = sum(x * x for x, _ in pairs)
        syy = sum(y * y for _, y in pairs)
        den = (n * sxx - sx * sx) * (n * syy - sy * sy)
        r = got[(etype, 1)]
        assert r["n_pairs"] == n
        if den > 0:
            want = (n * sxy - sx * sy) / math.sqrt(den)
            assert abs(r["acf"] - want) < 1e-6
