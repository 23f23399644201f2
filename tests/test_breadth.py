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
    # hub right 'z' (degree 3 > cap 2) must be cut and contribute nothing;
    # 'a' and 'b' (degree 2) survive.
    bip = spark.createDataFrame(
        [
            (1, "a"), (1, "b"), (1, "z"),
            (2, "a"), (2, "z"),
            (3, "b"), (3, "z"),
        ],
        "left long, right string",
    )
    rows = common_neighbor_pairs(
        bip, max_right_degree=2, min_common=1
    ).collect()
    got = {(r["a"], r["b"]): r for r in rows}
    # after cutting 'z': 1-{a,b}, 2-{a}, 3-{b} — (2,3) share nothing
    assert set(got) == {(1, 2), (1, 3)}
    r12 = got[(1, 2)]
    assert r12["n_common"] == 1 and r12["deg_a"] == 2 and r12["deg_b"] == 1
    assert r12["jaccard"] == 0.5  # 1 / (2 + 1 - 1)
    assert got[(1, 3)]["jaccard"] == 0.5


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
        # HALF_UP like Spark/DuckDB round(), not Python's banker's rounding
        dur = (_IC_BASE_S + math.floor(abs(r["value"]) + 0.5)) * 1_000_000
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


# --- Poisson bootstrap ------------------------------------------------------


def test_bootstrap_weights_match_md5_replay(spark, sf_dir):
    """The hex-string threshold compare must select exactly the weights the
    md5-uniform → Poisson(1)-inverse-CDF definition implies (the identity
    the oracle relies on), and the CI must bracket the resample means."""
    import hashlib

    from logspout_kinesis_tests_spark.plans.breadth_queries import (
        _BOOT_B,
        _BOOT_CDF,
    )
    from logspout_kinesis_tests_spark.sources.tables import load_table

    rows = {
        r["event_type"]: r
        for r in REGISTRY["c2_bootstrap_ci"].build(spark, sf_dir).collect()
    }
    assert rows
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    data = [
        (r["event_type"], r["event_id"], round(r["value"] * 100))
        for r in ev.select("event_type", "event_id", "value").collect()
    ]
    # python replay of the resample means for every (type, b)
    sums: dict[tuple, list] = {}
    for etype, eid, cents in data:
        for g in range(_BOOT_B // 4):
            digest = hashlib.md5(f"{eid}:{g}".encode()).hexdigest()
            for sl in range(4):
                raw = int(digest[8 * sl : 8 * sl + 8], 16)
                u = raw / 2**32
                w = sum(1 for t in _BOOT_CDF if u >= t)
                s = sums.setdefault((etype, g * 4 + sl), [0, 0])
                s[0] += w * cents
                s[1] += w
    for etype, r in rows.items():
        means = sorted(
            s / (sw * 100)
            for (t, _), (s, sw) in sums.items()
            if t == etype and sw > 0
        )
        lo = means[math.ceil(0.025 * len(means)) - 1]
        hi = means[math.ceil(0.975 * len(means)) - 1]
        assert r["ci_lo"] == round(lo, 9), (etype, r["ci_lo"], lo)
        assert r["ci_hi"] == round(hi, 9), (etype, r["ci_hi"], hi)
        assert r["ci_lo"] <= r["mean_val"] <= r["ci_hi"]
        assert r["n"] == sum(1 for t, _, _ in data if t == etype)


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


# --- LTTB downsampling ------------------------------------------------------


def test_lttb_picks_max_area_point_per_bucket(spark, sf_dir):
    """One survivor per non-empty (user, bucket), and it is the bucket's
    argmax-area point against the neighbor-bucket centroids (replayed in
    Python for every bucket of a few users)."""
    from logspout_kinesis_tests_spark.plans.breadth_queries import (
        _LTTB_BUCKET_S,
    )
    from logspout_kinesis_tests_spark.sources.tables import load_table

    out = REGISTRY["c16_lttb_downsample"].build(spark, sf_dir)
    got = [r.asDict() for r in out.collect()]
    assert len(got) == len({(r["user_id"], r["bucket"]) for r in got})

    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    pts = ev.select(
        "user_id",
        "event_id",
        F.expr("unix_micros(cast(ts as timestamp)) div 1000000").alias("x"),
        F.round(F.col("value") * 100, 0).cast("long").alias("y"),
    ).collect()
    users = sorted({r["user_id"] for r in pts})[:3]
    by_bucket: dict[tuple, list] = {}
    for r in pts:
        if r["user_id"] in users:
            by_bucket.setdefault(
                (r["user_id"], r["x"] // _LTTB_BUCKET_S), []
            ).append(r)
    chosen = {(r["user_id"], r["bucket"]): r for r in got}
    for (uid, b), rows in by_bucket.items():
        buckets = sorted(k[1] for k in by_bucket if k[0] == uid)
        i = buckets.index(b)

        def centroid(bb):
            rs = by_bucket[(uid, bb)]
            return (
                sum(r["x"] for r in rs) / len(rs),
                sum(r["y"] for r in rs) / len(rs),
            )

        ax, ay = centroid(buckets[i - 1] if i > 0 else b)
        bx, by = centroid(buckets[i + 1] if i + 1 < len(buckets) else b)
        best = max(
            rows,
            key=lambda r: (
                abs((ax - bx) * (r["y"] - ay) - (ax - r["x"]) * (by - ay)),
                -r["event_id"],
            ),
        )
        assert chosen[(uid, b)]["event_id"] == best["event_id"], (uid, b)


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


# --- last-touch attribution -------------------------------------------------


def test_attribution_matches_sequential_replay(spark, sf_dir):
    from logspout_kinesis_tests_spark.sources.tables import load_table

    got = {
        r["touch"]: (r["n_purchases"], r["attributed_value"])
        for r in REGISTRY["c5_attribution"].build(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id", "value"
    )
    series: dict[int, list] = {}
    for r in ev.collect():
        series.setdefault(r["user_id"], []).append(r)
    want: dict[str, list] = {}
    for rows in series.values():
        rows.sort(key=lambda r: (r["ts"], r["event_id"]))
        touch = None
        for r in rows:
            if r["event_type"] == "purchase":
                want.setdefault(touch or "none", []).append(r["value"])
            if r["event_type"] in ("click", "view"):
                touch = r["event_type"]
    assert set(got) == set(want)
    for k, vals in want.items():
        assert got[k][0] == len(vals)
        assert abs(got[k][1] - round(sum(round(v, 2) for v in vals), 2)) < 1e-6


# --- Tukey fences -----------------------------------------------------------


def test_tukey_outliers_matches_replay(spark, sf_dir):
    from logspout_kinesis_tests_spark.sources.tables import load_table

    got = {
        r["event_type"]: r
        for r in REGISTRY["c2_tukey_outliers"].build(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    series: dict[str, list[float]] = {}
    for r in ev.select("event_type", "value").collect():
        series.setdefault(r["event_type"], []).append(r["value"])
    for etype, vals in series.items():
        vals.sort()
        n = len(vals)
        q1 = vals[math.ceil(0.25 * n) - 1]
        q3 = vals[math.ceil(0.75 * n) - 1]
        lo, hi = q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1)
        n_out = sum(1 for v in vals if v < lo or v > hi)
        r = got[etype]
        assert (r["n"], r["q1"], r["q3"]) == (n, q1, q3)
        assert (r["lo"], r["hi"], r["n_outliers"]) == (lo, hi, n_out)
        assert q1 <= q3 and r["outlier_rate"] == round(n_out / n, 6)


# --- vocabulary overlap -----------------------------------------------------


def test_vocab_overlap_matches_set_replay(spark, sf_dir):
    from logspout_kinesis_tests_spark.sources.tables import load_table

    rows = REGISTRY["c11_vocab_overlap"].build(spark, sf_dir).collect()
    got = {(r["src_a"], r["src_b"]): r for r in rows}
    docs = load_table(spark, sf_dir, "documents")
    vocab: dict[str, set] = {}
    for r in docs.select("source", "text").collect():
        vocab.setdefault(r["source"], set()).update(
            r["text"].lower().split(" ")
        )
    for (a, b), r in got.items():
        common = vocab[a] & vocab[b]
        assert r["n_common"] == len(common)
        assert r["vocab_a"] == len(vocab[a]) and r["vocab_b"] == len(vocab[b])
        j = len(common) / len(vocab[a] | vocab[b])
        assert r["jaccard"] == round(j, 6)
    # every source pair with shared vocabulary is present
    srcs = sorted(vocab)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            if vocab[a] & vocab[b]:
                assert (a, b) in got


# --- grouped-agg pandas UDF -------------------------------------------------


def test_grouped_agg_trimmed_mean_matches_replay(spark, sf_dir):
    from logspout_kinesis_tests_spark.plans.breadth_queries import _TRIM_FRAC
    from logspout_kinesis_tests_spark.sources.tables import load_table

    got = {
        r["event_type"]: r
        for r in REGISTRY["c13_grouped_agg_trimmed_mean"]
        .build(spark, sf_dir)
        .collect()
    }
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    series: dict[str, list[int]] = {}
    for r in ev.select("event_type", "value").collect():
        series.setdefault(r["event_type"], []).append(
            math.floor(abs(r["value"]) * 100 + 0.5)
            * (1 if r["value"] >= 0 else -1)
        )
    assert set(got) == set(series)
    for etype, cents in series.items():
        cents.sort()
        k = math.floor(_TRIM_FRAC * len(cents))
        kept = cents[k : len(cents) - k]
        want = sum(kept) / (len(kept) * 100)
        r = got[etype]
        assert r["n"] == len(cents) and r["n_kept"] == len(kept)
        assert r["trimmed_mean"] == want, (etype, r["trimmed_mean"], want)
        # trimmed mean must be robust: inside the untrimmed value range
        assert kept[0] / 100 <= r["trimmed_mean"] <= kept[-1] / 100


# --- Cramér's V -------------------------------------------------------------


def test_cramers_v_bounds_and_shape(spark, sf_dir):
    row = REGISTRY["c2_cramers_v"].build(spark, sf_dir).collect()[0]
    assert row["n_rows_cat"] == 5  # five event types
    assert 1 <= row["n_cols_cat"] <= 7
    assert row["chi2"] >= 0
    assert 0 <= row["cramers_v"] <= 1
    # uniform synthetic weekday×type traffic should show WEAK association
    assert row["cramers_v"] < 0.2


# --- clustering depth -------------------------------------------------------


def test_clustering_depth_matches_bruteforce(spark, sf_dir):
    from logspout_kinesis_tests_spark.sources.tables import load_table
    from pyspark.sql import functions as G

    got = {
        r["part_month"]: (r["n_files"], r["max_depth"])
        for r in REGISTRY["c19_clustering_depth"].build(spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem")
    man = (
        li.groupBy(
            G.date_format(G.date_trunc("month", "l_shipdate"), "yyyy-MM-dd").alias("m"),
            G.date_format("l_shipdate", "yyyy-MM-dd").alias("d"),
        )
        .agg(G.min("l_partkey").alias("lo"), G.max("l_partkey").alias("hi"))
        .collect()
    )
    per_month: dict[str, list] = {}
    for r in man:
        per_month.setdefault(r["m"], []).append((r["lo"], r["hi"]))
    for m, ivs in per_month.items():
        depth = max(
            sum(1 for lo, hi in ivs if lo <= p <= hi)
            for lo, _ in ivs
            for p in (lo,)
        )
        assert got[m] == (len(ivs), depth), (m, got[m], (len(ivs), depth))


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


def test_triangles_degree_ordered_matches_bruteforce(spark):
    """The degree-ordered compact-forward enumeration (r11 hub-skew fix)
    must return the IDENTICAL triangle set as a brute-force adjacency
    check on a random graph dense enough to carry degree ties — the
    orientation change may alter join order, never the output."""
    import itertools
    import random

    rnd = random.Random(7)
    nodes = list(range(30))
    edge_set = {
        (u, v)
        for u, v in itertools.combinations(nodes, 2)
        if rnd.random() < 0.25
    }
    adj = {n: set() for n in nodes}
    for u, v in edge_set:
        adj[u].add(v)
        adj[v].add(u)
    expected = {
        (a, b, c)
        for a, b, c in itertools.combinations(nodes, 3)
        if b in adj[a] and c in adj[a] and c in adj[b]
    }
    edges = spark.createDataFrame(sorted(edge_set), "u long, v long")
    got = {tuple(r) for r in triangles(edges).collect()}
    assert got == expected and len(got) > 50


def test_two_hop_hub_cut_reports_exposure(spark, tmp_path):
    """Planted star wired over the mid cap: nodes whose only 2-hop paths
    ride the hub mid report the cut via n_hub_mids > 0 (count lower-bound,
    documented); nodes with n_hub_mids == 0 stay exact.  Graph: hub h
    adjacent to s1..sk (k > cap via monkeypatched cap=3) plus an exact
    chain x - y - z off one spoke."""
    from logspout_kinesis_tests_spark.plans import round10_queries as r10

    # star: hub 100 with spokes 1..5 (deg 5 > cap 3), chain 1-201, 201-202
    edges = [(1, 100), (2, 100), (3, 100), (4, 100), (5, 100),
             (1, 201), (201, 202)]
    rows = []
    for k, (u, v) in enumerate(edges):
        rows += [(2 * k, u), (2 * k, v), (2 * k + 1, u), (2 * k + 1, v)]
    sf = str(tmp_path)
    spark.createDataFrame(rows, "l_orderkey long, l_partkey long").write.parquet(
        f"{sf}/lineitem.parquet"
    )
    old = r10._TWOHOP_MID_CAP
    r10._TWOHOP_MID_CAP = 3
    try:
        out = {r["node"]: r for r in r10.c17_two_hop_neighborhood(spark, sf).collect()}
    finally:
        r10._TWOHOP_MID_CAP = old
    # spokes 2..5: their only mid is the hub (cut) -> n_2hop 0, flagged
    for s in (2, 3, 4, 5):
        assert out[s]["n_hub_mids"] == 1 and out[s]["n_2hop"] == 0
    # node 1: hub mid cut, but mid 201 is not a hub -> exactly reaches 202
    assert out[1]["n_hub_mids"] == 1 and out[1]["n_2hop"] == 1
    # node 202: no hub neighbors -> exact; reaches only 1 (via 201)
    assert out[202]["n_hub_mids"] == 0 and out[202]["n_2hop"] == 1
    # hub itself: mids are its spokes (non-hub) -> exact; reaches 201
    assert out[100]["n_hub_mids"] == 0 and out[100]["n_2hop"] == 1
    # node 201: neighbors 1 and 202 are mids -> reaches 100 and nothing new
    assert out[201]["n_hub_mids"] == 0 and out[201]["n_2hop"] == 1
