"""Behavioral pins for the round-9 queries — planted synthetic-table cases
the driver's oracle comparison can't express (gap boundaries, known
breach/drawdown geometry, hand-checkable graph coefficients, plain-Python
statistic replays)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from logspout_kinesis_tests_spark.plans import REGISTRY


def _write_events(spark, sf_dir: str, rows: list[tuple]) -> None:
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{sf_dir}/events.parquet")


def _write_lineitem(spark, sf_dir: str, rows: list[tuple], schema: str) -> None:
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        f"{sf_dir}/lineitem.parquet"
    )


def _write_docs(spark, sf_dir: str, rows: list[tuple]) -> None:
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")


def _t(minutes: float) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(minutes=minutes)


# --------------------------------------------------------------------------
# C7 sessionization
# --------------------------------------------------------------------------


def test_session_gap_boundary_is_end_exclusive(spark, tmp_path):
    """A gap of EXACTLY 30 minutes starts a new session (>= semantics,
    matching F.session_window's end-exclusive merge); 29:59 does not."""
    rows = [
        (1, _t(0), 1, "view", 1.0, "{}"),
        (2, _t(29.5), 1, "view", 1.0, "{}"),      # 29:30 gap — same session
        (3, _t(59.5), 1, "view", 1.0, "{}"),      # exactly 30:00 later — new
    ]
    _write_events(spark, str(tmp_path), rows)
    out = REGISTRY["c7_session_stats"].build(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_sessions"] == 2 and r["max_events"] == 2
    # session 1 spans 0 → 29.5 min; session 2 is a single event (0 µs)
    assert r["total_dur_us"] == 29 * 60 * 1_000_000 + 30 * 1_000_000
    assert r["max_dur_us"] == r["total_dur_us"]


def test_session_conversion_session_grain(spark, tmp_path):
    """Two purchases INSIDE one session count that session once; a
    purchase-free session drags the rate down."""
    rows = [
        (1, _t(0), 1, "view", 1.0, "{}"),
        (2, _t(1), 1, "purchase", 1.0, "{}"),
        (3, _t(2), 1, "purchase", 1.0, "{}"),
        (4, _t(120), 1, "view", 1.0, "{}"),  # second session, no purchase
    ]
    _write_events(spark, str(tmp_path), rows)
    r = REGISTRY["c7_session_conversion"].build(spark, str(tmp_path)).head()
    assert (r["n_sessions"], r["converted_sessions"], r["conv_rate"]) == (2, 1, 0.5)


def test_inter_session_gap_is_end_to_start(spark, tmp_path):
    """The gap runs from a session's LAST event to the next session's
    FIRST — not start-to-start."""
    rows = [
        (1, _t(0), 1, "view", 1.0, "{}"),
        (2, _t(10), 1, "view", 1.0, "{}"),   # session 1 ends at minute 10
        (3, _t(55), 1, "view", 1.0, "{}"),   # session 2 starts at minute 55
    ]
    _write_events(spark, str(tmp_path), rows)
    r = REGISTRY["c7_inter_session_gap"].build(spark, str(tmp_path)).head()
    assert r["n_gaps"] == 1
    assert r["sum_gap_us"] == r["max_gap_us"] == int(45 * 60 * 1e6)


def test_entry_exit_tiebreak_on_event_id(spark, tmp_path):
    """Two events at the SAME timestamp: the lower event_id is the entry,
    the higher the exit — the deterministic struct pick."""
    ts = _t(0)
    rows = [
        (5, ts, 1, "signup", 1.0, "{}"),
        (2, ts, 1, "view", 1.0, "{}"),
    ]
    _write_events(spark, str(tmp_path), rows)
    r = REGISTRY["c7_session_entry_exit"].build(spark, str(tmp_path)).head()
    assert (r["entry_type"], r["exit_type"], r["n_sessions"]) == ("view", "signup", 1)


# --------------------------------------------------------------------------
# C16 timeseries geometry
# --------------------------------------------------------------------------


def test_bollinger_breach_flags_the_spike_only(spark, tmp_path):
    """6 flat bars + a spike: the spike bar's deviation (6d/7)² exceeds
    4σ² = 24d²/49 → breach; the following flat bar (d/7)² does not."""
    vals = [1.0] * 7 + [9.0] + [1.0]
    rows = [
        (i, _t(i * 60), 1, "m", v, "{}") for i, v in enumerate(vals)
    ]
    _write_events(spark, str(tmp_path), rows)
    out = {
        r["hb"] % 100000: r["breach"]
        for r in REGISTRY["c16_bollinger_breach"].build(spark, str(tmp_path)).collect()
    }
    hbs = sorted(out)
    assert len(hbs) == 3  # bars 6, 7, 8 have full windows
    assert out[hbs[0]] == 0  # all-flat window: 0 > 0 is false
    assert out[hbs[1]] == 1  # the spike
    assert out[hbs[2]] == 0  # flat bar after the spike


def test_max_drawdown_planted(spark, tmp_path):
    """Series 10, 20, 5, 15 (cents 1000/2000/500/1500): peak 2000 →
    trough 500 = 1500, at the third hour."""
    vals = [10.0, 20.0, 5.0, 15.0]
    rows = [(i, _t(i * 60), 1, "m", v, "{}") for i, v in enumerate(vals)]
    _write_events(spark, str(tmp_path), rows)
    r = REGISTRY["c16_max_drawdown"].build(spark, str(tmp_path)).head()
    assert r["max_dd_c"] == 1500
    first_hb = (
        spark.createDataFrame([(_t(0),)], "t timestamp")
        .select(F.expr("unix_micros(t) div 3600000000").alias("h"))
        .head()["h"]
    )
    assert r["trough_hb"] == first_hb + 2


def test_rsi_extremes(spark, tmp_path):
    """Monotone rising series → RSI 100 (no losses); flat series → the
    50 pin (no gains or losses)."""
    rows = [
        (i, _t(i * 60), 1, "up", float(i + 1), "{}") for i in range(15)
    ] + [
        (100 + i, _t(i * 60), 1, "flat", 5.0, "{}") for i in range(15)
    ]
    _write_events(spark, str(tmp_path), rows)
    out = {
        r["event_type"]: r["rsi"]
        for r in REGISTRY["c16_rsi"].build(spark, str(tmp_path)).collect()
    }
    assert out == {"up": 100.0, "flat": 50.0}


def test_longest_streak_counts_strict_rises(spark, tmp_path):
    """1,2,3,2,3,4,5,5 → rises at 4 consecutive positions max? runs are
    (1→2→3)=2 rises, (2→3→4→5)=3 rises, plateau breaks the run."""
    vals = [1.0, 2.0, 3.0, 2.0, 3.0, 4.0, 5.0, 5.0]
    rows = [(i, _t(i * 60), 1, "m", v, "{}") for i, v in enumerate(vals)]
    _write_events(spark, str(tmp_path), rows)
    r = REGISTRY["c16_longest_streak"].build(spark, str(tmp_path)).head()
    assert r["longest_up_streak"] == 3


def test_grid_percentiles_formula_replay(spark, tmp_path):
    """20 values in bucket 0 + 5 outliers: the bars equal the plain-Python
    replay of the frozen-grid ceil-rank arithmetic."""
    vals = [i / 100 for i in range(20)] + [300.0 + i for i in range(5)]
    rows = [(i, _t(i), 1, "m", v, "{}") for i, v in enumerate(vals)]
    _write_events(spark, str(tmp_path), rows)
    r = REGISTRY["c20_grid_percentiles"].build(spark, str(tmp_path)).head()
    mn, mx, B = 0, 49_999, 256
    span = mx - mn + 1
    counts = [0] * B
    for v in vals:
        c = int(v * 100 + 0.5)
        counts[min(max((c - mn) * B // span, 0), B - 1)] += 1
    n = sum(counts)

    def bar(q_num, q_den):
        k = max((q_num * n + q_den - 1) // q_den, 1)
        cum = 0
        for i, c in enumerate(counts):
            cum += c
            if cum >= k:
                return mn + ((i + 1) * span + B - 1) // B - 1
        raise AssertionError

    assert (r["n_events"], r["p50_c"], r["p95_c"], r["p99_c"]) == (
        n, bar(1, 2), bar(19, 20), bar(99, 100)
    )


# --------------------------------------------------------------------------
# C2 statistics — plain-Python replays
# --------------------------------------------------------------------------


def test_spearman_matches_python_replay(spark, tmp_path):
    """Deterministic pseudo-random (qty, discount) pairs: the Spark rho
    equals a plain-Python midrank Spearman to 6dp."""
    rows = []
    for i in range(200):
        qty = (i * 7) % 50 + 1
        disc = ((i * 13) % 11) / 100.0
        rows.append((1, float(qty), disc, "A"))
    _write_lineitem(
        spark, str(tmp_path), rows,
        "l_orderkey long, l_quantity double, l_discount double, l_returnflag string",
    )
    r = REGISTRY["c2_spearman_rho"].build(spark, str(tmp_path)).head()

    def midranks(xs):
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

    q = [(i * 7) % 50 + 1 for i in range(200)]
    d = [(i * 13) % 11 for i in range(200)]
    rx, ry = midranks(q), midranks(d)
    n = len(rx)
    sx, sy = sum(rx), sum(ry)
    sxx = sum(x * x for x in rx)
    syy = sum(y * y for y in ry)
    sxy = sum(x * y for x, y in zip(rx, ry))
    rho = (n * sxy - sx * sy) / (
        ((n * sxx - sx * sx) * (n * syy - sy * sy)) ** 0.5
    )
    assert r["n"] == 200
    assert abs(r["rho"] - rho) < 1e-6


def test_brown_forsythe_matches_python_replay(spark, tmp_path):
    """Two groups with very different spreads: Spark F equals the textbook
    Levene-with-median statistic computed in plain Python."""
    tight = [100.0 + (i % 3) / 100 for i in range(30)]          # spread ~1 cent
    wide = [100.0 + ((i * 17) % 200 - 100) / 10 for i in range(30)]  # ±10
    rows = [(i, _t(i), 1, "tight", v, "{}") for i, v in enumerate(tight)]
    rows += [(100 + i, _t(i), 1, "wide", v, "{}") for i, v in enumerate(wide)]
    _write_events(spark, str(tmp_path), rows)
    r = REGISTRY["c2_brown_forsythe"].build(spark, str(tmp_path)).head()

    def cents(v):
        return int(v * 100 + 0.5)

    def med2(xs):
        s = sorted(xs)
        m = len(s)
        return s[m // 2] * 2 if m % 2 else s[m // 2 - 1] + s[m // 2]

    groups = [[cents(v) for v in tight], [cents(v) for v in wide]]
    zs = [[abs(2 * x - med2(g)) for x in g] for g in groups]
    k = len(zs)
    n = sum(len(z) for z in zs)
    grand = sum(sum(z) for z in zs) / n
    between = sum(len(z) * (sum(z) / len(z) - grand) ** 2 for z in zs)
    within = sum(sum((x - sum(z) / len(z)) ** 2 for x in z) for z in zs)
    f = (n - k) / (k - 1) * between / within
    assert (r["n"], r["k"]) == (60, 2)
    assert abs(r["f_stat"] - f) < 1e-4
    assert r["f_stat"] > 10  # the spread difference is unmistakable


# --------------------------------------------------------------------------
# C17 graph coefficients on a hand-drawn graph
# --------------------------------------------------------------------------


def _write_copurchase(spark, sf_dir: str, baskets: list[list[int]]) -> None:
    """Each basket twice (support cut = 2), so edges = all within-basket
    pairs."""
    rows = []
    for rep in range(2):
        for o, parts in enumerate(baskets):
            for p in parts:
                rows.append((rep * 1000 + o, p))
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long"
    ).write.mode("overwrite").parquet(f"{sf_dir}/lineitem.parquet")


def test_clustering_coefficient_triangle_plus_tail(spark, tmp_path):
    """Graph: triangle {1,2,3} + pendant edge 1-4.  cc(1) = 2·1/(3·2) =
    1/3, cc(2) = cc(3) = 1, node 4 (degree 1) excluded."""
    _write_copurchase(spark, str(tmp_path), [[1, 2, 3], [1, 4]])
    out = {
        r["node"]: (r["degree"], r["n_tri"], r["cc"])
        for r in REGISTRY["c17_clustering_coefficient"]
        .build(spark, str(tmp_path))
        .collect()
    }
    assert out == {1: (3, 1, 0.333333), 2: (2, 1, 1.0), 3: (2, 1, 1.0)}


def test_degree_assortativity_python_replay(spark, tmp_path):
    """Star K1,3 + an extra triangle elsewhere: Spark r equals the plain
    Pearson over the doubled endpoint-degree list."""
    _write_copurchase(spark, str(tmp_path), [[1, 2], [1, 3], [1, 4], [5, 6, 7]])
    r = REGISTRY["c17_degree_assortativity"].build(spark, str(tmp_path)).head()
    edges = [(1, 2), (1, 3), (1, 4), (5, 6), (5, 7), (6, 7)]
    deg: dict[int, int] = {}
    for u, v in edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    pts = [(deg[u], deg[v]) for u, v in edges]
    pts += [(y, x) for x, y in pts]
    m = len(pts)
    sx = sum(x for x, _ in pts)
    sxx = sum(x * x for x, _ in pts)
    sxy = sum(x * y for x, y in pts)
    expect = (m * sxy - sx * sx) / (m * sxx - sx * sx)
    assert r["n_edges"] == 6
    assert abs(r["assortativity"] - round(expect, 6)) < 1e-9


# --------------------------------------------------------------------------
# C14/C20/C10 — curation and labeling pins
# --------------------------------------------------------------------------


def test_temporal_split_days_thresholds(spark, tmp_path):
    """10 days × 1 event: exact 80/10/10 day assignment, in time order."""
    rows = [
        (i, _t(i * 24 * 60), 1, "m", 1.0, "{}") for i in range(10)
    ]
    _write_events(spark, str(tmp_path), rows)
    out = {
        r["split"]: (r["n_days"], r["first_day"], r["last_day"])
        for r in REGISTRY["c14_temporal_split_days"]
        .build(spark, str(tmp_path))
        .collect()
    }
    assert out["train"] == (8, "2024-01-01", "2024-01-08")
    assert out["val"] == (1, "2024-01-09", "2024-01-09")
    assert out["test"] == (1, "2024-01-10", "2024-01-10")


def test_interleave_matches_python_md5_replay(spark, tmp_path):
    """The interleave order replays in plain Python (hashlib md5 of the
    decimal doc_id string == both engines' md5)."""
    import hashlib

    docs = [(i, f"doc {i} text", "en", f"s{i % 3}", 10) for i in range(12)]
    _write_docs(spark, str(tmp_path), docs)
    got = [
        (r["doc_id"], r["source"], r["rk"])
        for r in REGISTRY["c14_interleave_sources"]
        .build(spark, str(tmp_path))
        .collect()
    ]
    by_src: dict[str, list] = {}
    for i, _, _, src, _ in docs:
        by_src.setdefault(src, []).append(i)
    expect = []
    for src, ids in by_src.items():
        ordered = sorted(ids, key=lambda d: (hashlib.md5(str(d).encode()).hexdigest(), d))
        expect += [(d, src, rk + 1) for rk, d in enumerate(ordered)]
    expect.sort(key=lambda t: (t[2], t[1], t[0]))
    assert sorted(got, key=lambda t: (t[2], t[1], t[0])) == expect[: len(got)]


def test_knn_label_vote_planted_neighborhood(spark, tmp_path):
    """A query vector surrounded by 3 near-copies of label 1 and 2 of
    label 2 (all nearer than everything else) votes label 1."""
    dim = 4
    base = [1.0, 0.0, 0.0, 0.0]
    far = [0.0, 1.0, 0.0, 0.0]
    rows = [(0, base)]  # the query (vec_id < 20 ⇒ query side)
    # corpus ids ≥ 20; label = vec_id % 3
    near_l1 = [22, 25, 28]          # % 3 == 1
    near_l2 = [20, 23]              # % 3 == 2
    for j, vid in enumerate(near_l1 + near_l2):
        v = list(base)
        v[1] = 0.001 * (j + 1)
        rows.append((vid, v))
    for vid in (30, 33, 36):        # far distractors
        rows.append((vid, far))
    spark.createDataFrame(
        rows, f"vec_id long, embedding array<double>"
    ).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    out = REGISTRY["c10_knn_label_vote"].build(spark, str(tmp_path)).collect()
    assert len(out) == 1
    assert (out[0]["pred_label"], out[0]["votes"]) == (1, 3)


def test_vwap_exact_cents(spark, tmp_path):
    """Two months, hand-computed Σ(price·qty)/Σqty in exact cents."""
    import datetime

    rows = [
        # month 1: (10.00 × 2) + (20.00 × 3) → pv = 2000·2 + 2000·3... no:
        # price cents 1000·2 + 2000·3 = 8000, qty 5 → vwap_c 1600.0
        (1, 2.0, datetime.date(2024, 1, 5), 10.0),
        (1, 3.0, datetime.date(2024, 1, 20), 20.0),
        # month 2: single line → vwap = its own price in cents
        (2, 4.0, datetime.date(2024, 2, 10), 7.25),
    ]
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_quantity double, l_shipdate date, l_extendedprice double",
    ).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    out = {
        r["ship_month"]: (r["total_qty"], r["vwap_c"])
        for r in REGISTRY["c16_vwap"].build(spark, str(tmp_path)).collect()
    }
    assert out == {"2024-01": (5, 1600.0), "2024-02": (4, 725.0)}


def test_readability_counts_and_guards(spark, tmp_path):
    """Hand-counted words/syllables/sentences, plus the no-words NULL and
    the no-punctuation sentence floor."""
    docs = [
        (1, "The cat sat. It ran!", "en", "s0", 20),
        (2, "word word word", "en", "s0", 14),   # no terminators → floor 1
        (3, "12345 !!!", "en", "s0", 9),          # no words → NULL grade
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = {
        r["doc_id"]: r
        for r in REGISTRY["c11_readability"].build(spark, str(tmp_path)).collect()
    }
    # doc 1: words 6 (The cat sat It ran -> 5? 'The','cat','sat','It','ran' = 5)
    r1 = out[1]
    assert (r1["n_words"], r1["n_sent"]) == (5, 2)
    # syllables = vowel runs in lowercase: the(1) cat(1) sat(1) it(1) ran(1) = 5
    assert r1["n_syll"] == 5
    expect = round(0.39 * 5 / 2 + 11.8 * 5 / 5 - 15.59, 6)
    assert r1["fk_grade"] == expect
    r2 = out[2]
    assert (r2["n_words"], r2["n_sent"]) == (3, 1)
    assert out[3]["fk_grade"] is None


def test_vocab_coverage_replay(spark, tmp_path):
    """Tiny corpus with a known top-DF vocabulary: per-language coverage
    sums replay in plain Python."""
    docs = [
        (1, "alpha beta alpha", "en", "s0", 10),
        (2, "alpha gamma", "en", "s0", 10),
        (3, "beta beta delta", "fr", "s0", 10),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = {
        r["lang"]: (r["n_docs"], r["sum_coverage"])
        for r in REGISTRY["c20_vocab_coverage"].build(spark, str(tmp_path)).collect()
    }
    # DFs: alpha 2, beta 2, gamma 1, delta 1 — top-100 covers everything,
    # so every doc's coverage is 1.0
    assert out == {"en": (2, 2.0), "fr": (1, 1.0)}


def test_lexical_diversity_counts(spark, tmp_path):
    docs = [(1, "a b a c a", "en", "s0", 9)]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    r = REGISTRY["c11_lexical_diversity"].build(spark, str(tmp_path)).head()
    # tokens 5, types {a,b,c} = 3, hapax {b,c} = 2, ttr 0.6
    assert (r["n_tokens"], r["n_types"], r["n_hapax"], r["ttr"]) == (5, 3, 2, 0.6)
