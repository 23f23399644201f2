"""Round-8 queries: k-sample rank test, exact-integer changepoint, OHLC
bars, label-propagation communities, Pareto-skyline curation selection.

Registered LAST (see plans/__init__) so the staleness-ordered rotation
keeps the window's remaining slots on re-verifying the r2/r3-era greens —
five additions leave 45 of the 50 slots for the stale cohort (VERDICT
r7 #2 asks for ~44).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from logspout_kinesis_tests_spark.plans.registry import register
from logspout_kinesis_tests_spark.sources.tables import load_table

# --- C16+: OHLC bars ---------------------------------------------------------


@register(
    "c16_ohlc_bars",
    # first()/last() with ORDER BY on the DuckDB side, min_by/max_by over a
    # (ts, event_id) struct on the Spark side — same deterministic pick;
    # integer cents throughout so the hash is arithmetic-free.
    oracle="""
    SELECT event_type,
           strftime(ts, '%Y-%m-%d') AS day,
           first(CAST(round(value * 100, 0) AS BIGINT) ORDER BY ts, event_id)
               AS open_c,
           CAST(max(round(value * 100, 0)) AS BIGINT) AS high_c,
           CAST(min(round(value * 100, 0)) AS BIGINT) AS low_c,
           last(CAST(round(value * 100, 0) AS BIGINT) ORDER BY ts, event_id)
               AS close_c,
           CAST(count(*) AS BIGINT) AS volume,
           CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
               AS turnover_c
    FROM events
    WHERE value IS NOT NULL
    GROUP BY event_type, strftime(ts, '%Y-%m-%d')
    """,
    doc="C16+: OHLC candlestick resample per (metric, day) — the standard "
    "financial/telemetry downsample the timeseries family lacked.  One "
    "groupBy with map-side combine: open/close are min_by/max_by over a "
    "(ts, event_id) struct (deterministic under duplicate timestamps), "
    "high/low/volume/turnover plain aggregates over integer cents.  One "
    "shuffle on (event_type, day) — the same key the data would be "
    "time-partitioned by at 100 TB, so the combine happens scan-side.",
)
def c16_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logspout_kinesis_tests_spark.operators.timeseries import (
        ohlc_aggs,
        ohlc_projection,
    )

    ev = load_table(spark, sf_dir, "events")
    return (
        ohlc_projection(ev)
        .withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
        .groupBy("event_type", "day")
        .agg(*ohlc_aggs())
    )


# --- C2+: Kruskal–Wallis H test ---------------------------------------------

#: Bucket fan-out for the distributed rank CDF (same constant as
#: c2_ks_test / c2_mann_whitney).
_KW_BUCKETS = 256


@register(
    "c2_kruskal_wallis",
    # k-sample generalization of c2_mann_whitney, same parity discipline:
    # midranks from one plain global cumsum (oracle) vs the reassembled
    # bucket-offset integers (Spark); rank sums quantized DECIMAL(28,1)
    # (c·midrank has one .5 digit), per-group S²/n terms rounded to 6dp
    # and quantized DECIMAL(38,6) so the cross-group sum is exact, order-
    # independent, and faithful even at tiny n (round-to-units injected a
    # ±0.5/group bias that a Hypothesis minimal case exposed; DECIMAL(38,6)
    # holds S² up to 1e32, i.e. group rank sums to ~1e16 ≈ n·(n+1)/2 for
    # n ≈ 1.4e8 rows — drop the scale to 3dp past that); the closing H
    # expression is written with the identical association order on both
    # sides.
    oracle=f"""
    WITH pv AS (
        SELECT value AS v, event_type AS et, CAST(count(*) AS BIGINT) AS c
        FROM events WHERE value IS NOT NULL
        GROUP BY value, event_type),
    vv AS (
        SELECT v, CAST(sum(c) AS BIGINT) AS cnt FROM pv GROUP BY v),
    tot AS (
        SELECT CAST(sum(cnt) AS BIGINT) AS n,
               CAST(sum(CAST(round(
                   CAST(cnt AS DOUBLE) * CAST(cnt AS DOUBLE)
                   * CAST(cnt AS DOUBLE) - CAST(cnt AS DOUBLE), 0)
                   AS DECIMAL(38,0))) AS DOUBLE) AS tie3
        FROM vv),
    cum AS (
        SELECT v, cnt,
               CAST(sum(cnt) OVER (ORDER BY v) AS BIGINT) - cnt AS cum_before
        FROM vv),
    rs AS (
        SELECT p.et,
               CAST(sum(p.c) AS BIGINT) AS n_g,
               CAST(sum(CAST(round(
                   p.c * (m.cum_before + (CAST(m.cnt AS DOUBLE) + 1) / 2), 1)
                   AS DECIMAL(28,1))) AS DOUBLE) AS s_g
        FROM pv p JOIN cum m ON p.v = m.v
        GROUP BY p.et),
    st AS (
        SELECT CAST(sum(CAST(round(
                   s_g * s_g / CAST(n_g AS DOUBLE), 6)
                   AS DECIMAL(38,6))) AS DOUBLE) AS sumterm
        FROM rs),
    h AS (
        SELECT (12 * st.sumterm / (CAST(t.n AS DOUBLE) * (CAST(t.n AS DOUBLE) + 1))
                - 3 * (CAST(t.n AS DOUBLE) + 1)) AS h_raw,
               (CASE WHEN t.n > 1 THEN
                    1 - t.tie3 / (CAST(t.n AS DOUBLE) * CAST(t.n AS DOUBLE)
                                  * CAST(t.n AS DOUBLE) - CAST(t.n AS DOUBLE))
                END) AS tie_c,
               t.n AS n
        FROM st, tot t)
    SELECT r.et AS event_type, r.n_g,
           round(r.s_g, 1) AS rank_sum,
           h.n,
           round(h.h_raw, 9) AS h_stat,
           CASE WHEN h.n > 1 AND h.tie_c > 0
                THEN round(h.h_raw / h.tie_c, 9) END AS h_corrected
    FROM rs r, h
    """,
    doc="C2+: tie-corrected Kruskal–Wallis H — the k-sample rank ANOVA "
    "(are the k event types' value distributions the same?), completing "
    "the nonparametric family next to the two-sample Mann–Whitney and "
    "the pairwise KS test.  Midranks reuse the distributed-CDF pattern: "
    "per-value counts, a ≤256-row bucket-offset table (the only global "
    "window, bounded by construction), per-bucket cumulative windows — "
    "the reassembled prefix counts EQUAL a global cumsum's, so rank "
    "sums, the tie term and H hash-match the oracle bit-for-bit with no "
    "global sort at any scale.",
)
def c2_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    pv = ev.groupBy(F.col("value").alias("v"), F.col("event_type").alias("et")).agg(
        F.count("*").cast("long").alias("c")
    )
    vv = pv.groupBy("v").agg(F.sum("c").cast("long").alias("cnt"))
    cntd = F.col("cnt").cast("double")
    mm = vv.agg(
        F.min("v").alias("vmin"),
        F.max("v").alias("vmax"),
        F.sum("cnt").cast("long").alias("n"),
        F.sum(F.round(cntd * cntd * cntd - cntd, 0).cast("decimal(38,0)"))
        .cast("double")
        .alias("tie3"),
    )
    span = F.col("vmax") - F.col("vmin")
    safe_span = F.when(span > 0, span).otherwise(F.lit(1.0))
    raw = F.floor((F.col("v") - F.col("vmin")) / safe_span * _KW_BUCKETS)
    b = vv.crossJoin(F.broadcast(mm)).withColumn(
        "bucket",
        F.when(span > 0, F.least(raw, F.lit(_KW_BUCKETS - 1)))
        .otherwise(F.lit(0))
        .cast("int"),
    )
    bucket_tot = b.groupBy("bucket").agg(F.sum("cnt").alias("t"))
    wb = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offs = bucket_tot.select(
        "bucket", F.coalesce(F.sum("t").over(wb), F.lit(0)).alias("off")
    )
    wv = Window.partitionBy("bucket").orderBy("v")
    cum = b.join(F.broadcast(offs), "bucket").select(
        "v",
        "cnt",
        (F.col("off") + F.sum("cnt").over(wv) - F.col("cnt")).alias("cum_before"),
        "n",
        "tie3",
    )
    # midrank written as cum_before + (cnt_double + 1)/2 — identical
    # association order as the oracle's expression
    midrank = F.col("cum_before") + (F.col("cnt").cast("double") + 1) / 2
    rs = (
        pv.join(cum, pv["v"] == cum["v"])
        .groupBy("et")
        .agg(
            F.sum("c").cast("long").alias("n_g"),
            F.sum(F.round(F.col("c") * midrank, 1).cast("decimal(28,1)"))
            .cast("double")
            .alias("s_g"),
            F.first("n").alias("n"),
            F.first("tie3").alias("tie3"),
        )
        # ≤k rows (one per group); referenced by BOTH the H scalar and the
        # output projection — cut lineage so the whole rank pipeline isn't
        # planned (and computed) twice
        .localCheckpoint(eager=True)
    )
    st = rs.agg(
        F.sum(
            F.round(F.col("s_g") * F.col("s_g") / F.col("n_g").cast("double"), 6)
            .cast("decimal(38,6)")
        )
        .cast("double")
        .alias("sumterm"),
        F.first("n").alias("n"),
        F.first("tie3").alias("tie3"),
    )
    nd = F.col("n").cast("double")
    h_raw = 12 * F.col("sumterm") / (nd * (nd + 1)) - 3 * (nd + 1)
    # degenerate guards (ANSI division): n=1 zeroes the tie denominator,
    # an all-tied corpus zeroes tie_c itself — h_corrected is NULL there,
    # mirroring the oracle's CASE exactly
    tie_c = F.when(
        F.col("n") > 1, 1 - F.col("tie3") / (nd * nd * nd - nd)
    )
    hh = st.select(
        F.col("n"),
        h_raw.alias("h_raw"),
        tie_c.alias("tie_c"),
    )
    return rs.select("et", "n_g", "s_g").crossJoin(F.broadcast(hh)).select(
        F.col("et").alias("event_type"),
        "n_g",
        F.round("s_g", 1).alias("rank_sum"),
        "n",
        F.round("h_raw", 9).alias("h_stat"),
        F.when(
            (F.col("n") > 1) & (F.col("tie_c") > 0),
            F.round(F.col("h_raw") / F.col("tie_c"), 9),
        ).alias("h_corrected"),
    )


# --- C16+: Pettitt changepoint test -----------------------------------------

#: Series grain: exact integer hour buckets (div, not floor-divide — the
#: round-7 ADVICE parity rule) over per-type hourly value-cent sums.


@register(
    "c16_pettitt_changepoint",
    # Exact-integer form of Pettitt's U: with R2_i = 2·midrank_i (always an
    # integer, ties included), U_t = Σ_{i≤t} R2_i − t·(n+1) — derived from
    # Σ_j sign(x_i − x_j) = 2·midrank_i − n − 1 and the antisymmetric
    # within-prefix pair sum cancelling.  K = max |U_t| (t < n) and the
    # argmax hour are pure BIGINT arithmetic; only the closing p-value
    # approximation 2·exp(−6K²/(n³+n²)) touches doubles (one identically
    # associated expression, rounded 9dp).
    oracle="""
    WITH hb AS (
        SELECT event_type,
               epoch_us(ts) // 3600000000 AS hour,
               CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS x
        FROM events WHERE value IS NOT NULL
        GROUP BY event_type, epoch_us(ts) // 3600000000),
    rk AS (
        SELECT event_type, hour, x,
               CAST(rank() OVER (PARTITION BY event_type ORDER BY x)
                    AS BIGINT) AS rnk,
               CAST(count(*) OVER (PARTITION BY event_type, x) AS BIGINT)
                   AS ties,
               CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
               CAST(row_number() OVER (PARTITION BY event_type ORDER BY hour)
                    AS BIGINT) AS t
        FROM hb),
    u AS (
        SELECT event_type, hour, n, t,
               CAST(sum(2 * rnk + ties - 1)
                    OVER (PARTITION BY event_type ORDER BY hour)
                    AS BIGINT) - t * (n + 1) AS u_t
        FROM rk),
    k AS (
        SELECT event_type, n,
               CAST(max(abs(u_t)) AS BIGINT) AS k_stat
        FROM u WHERE t < n
        GROUP BY event_type, n)
    SELECT k.event_type, k.n, k.k_stat,
           CAST(min(u.hour) AS BIGINT) AS change_hour,
           round(2 * exp(-6.0 * k.k_stat * k.k_stat
                         / (CAST(k.n AS DOUBLE) * k.n * k.n
                            + CAST(k.n AS DOUBLE) * k.n)), 9) AS p_approx
    FROM k JOIN u ON u.event_type = k.event_type
                 AND abs(u.u_t) = k.k_stat AND u.t < u.n
    GROUP BY k.event_type, k.n, k.k_stat
    """,
    doc="C16+: Pettitt's nonparametric changepoint test per metric series "
    "(hourly value-cent sums) — WHERE did the distribution shift, the "
    "complement of CUSUM's WHEN-did-it-drift alarm and Hampel's point "
    "outliers.  All rank arithmetic is exact BIGINT via the midrank "
    "identity U_t = Σ 2·midrank − t(n+1); windows are partitioned per "
    "series (bounded by the series' hour count, never global), so the "
    "plan is one aggregation plus per-series windows at any scale.",
)
def c16_pettitt_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    hb = (
        ev.select(
            "event_type",
            # exact integer floor division over tz-agnostic epoch micros
            # (`div` + unix_micros — the proven hour-bucket parity pattern,
            # see _detrended_hourly)
            F.expr(
                "unix_micros(CAST(ts AS TIMESTAMP)) div 3600000000"
            ).alias("hour"),
            F.round(F.col("value") * 100, 0).cast("long").alias("c"),
        )
        .groupBy("event_type", "hour")
        .agg(F.sum("c").cast("long").alias("x"))
        # the hourly table (types × hours — tiny vs raw events) feeds two
        # parallel consumers below (the K max and its argmax); the cut
        # keeps the events scan + pre-aggregation single-pass while the
        # branch duplication stays on this bounded table
        .localCheckpoint(eager=True)
    )
    wt = Window.partitionBy("event_type")
    rk = hb.select(
        "event_type",
        "hour",
        F.rank().over(wt.orderBy("x")).cast("long").alias("rnk"),
        F.count("*").over(Window.partitionBy("event_type", "x")).cast("long").alias("ties"),
        F.count("*").over(wt).cast("long").alias("n"),
        F.row_number().over(wt.orderBy("hour")).cast("long").alias("t"),
    )
    u = rk.select(
        "event_type",
        "hour",
        "n",
        "t",
        (
            F.sum(2 * F.col("rnk") + F.col("ties") - 1)
            .over(wt.orderBy("hour"))
            .cast("long")
            - F.col("t") * (F.col("n") + 1)
        ).alias("u_t"),
    )
    # K and its argmax branch off u in PARALLEL (both recompute u's windows
    # from the checkpointed hourly table — cheap and concurrent, vs a
    # serial window-max chain which costs an extra stage round-trip)
    kmax = (
        u.filter(F.col("t") < F.col("n"))
        .groupBy("event_type", "n")
        .agg(F.max(F.abs("u_t")).cast("long").alias("k_stat"))
    )
    hits = u.filter(F.col("t") < F.col("n")).select(
        F.col("event_type").alias("et"), "hour", F.abs("u_t").alias("au")
    )
    k = (
        hits.join(
            F.broadcast(kmax),  # ≤|types| rows — the broadcast side
            (F.col("et") == F.col("event_type")) & (F.col("au") == F.col("k_stat")),
        )
        .groupBy("event_type", "n", "k_stat")
        .agg(F.min("hour").cast("long").alias("change_hour"))
    )
    nd = F.col("n").cast("double")
    p = F.round(
        2
        * F.exp(
            -6.0 * F.col("k_stat") * F.col("k_stat") / (nd * F.col("n") * F.col("n") + nd * F.col("n"))
        ),
        9,
    )
    return k.select("event_type", "n", "k_stat", "change_hour", p.alias("p_approx"))


# --- C17+: label propagation communities -------------------------------------

_LPA_ROUNDS = 4
_LPA_MIN_QTY = 45  # same trade-graph sparsifier as c17_kcore


def _lpa_oracle() -> str:
    """Unrolled synchronous LPA: one (count → argmax) CTE pair per round.
    ``e`` and every label round are AS MATERIALIZED — the k-core lesson:
    a CTE the next round references through both the join and the window
    re-expands exponentially if inlined."""
    rounds = []
    for r in range(1, _LPA_ROUNDS + 1):
        rounds.append(
            f"""l{r} AS MATERIALIZED (
        SELECT node, label FROM (
            SELECT m.node, m.label,
                   row_number() OVER (PARTITION BY m.node
                                      ORDER BY count(*) DESC, m.label) AS rn
            FROM (SELECT e.dst AS node, l.label
                  FROM e JOIN l{r - 1} l ON e.src = l.node
                  UNION ALL
                  SELECT node, label FROM l{r - 1}) m
            GROUP BY m.node, m.label)
        WHERE rn = 1)"""
        )
    return f"""
    WITH trade AS (
        SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE l.l_quantity >= {_LPA_MIN_QTY}),
    e AS MATERIALIZED (
        SELECT c * 2 AS src, s * 2 + 1 AS dst FROM trade
        UNION ALL
        SELECT s * 2 + 1 AS src, c * 2 AS dst FROM trade),
    l0 AS MATERIALIZED (
        SELECT DISTINCT src AS node, src AS label FROM e),
    {','.join(rounds)}
    SELECT CASE WHEN label % 2 = 0 THEN 'c' || CAST(label // 2 AS VARCHAR)
                ELSE 's' || CAST((label - 1) // 2 AS VARCHAR) END
               AS community,
           CAST(count(*) AS BIGINT) AS size
    FROM l{_LPA_ROUNDS}
    GROUP BY label
    """


@register(
    "c17_label_propagation",
    oracle=_lpa_oracle(),
    doc="C17+: synchronous label propagation (4 rounds, self-vote, "
    "deterministic max-count-then-min-label tiebreak) over the customer–"
    "supplier trade graph — community DETECTION next to c17_modularity's "
    "community SCORING (modularity evaluates a given partition; LPA finds "
    "one).  The self-vote keeps the bipartite graph from 2-color "
    "oscillation.  Each round is one edge×label join (shuffle on src) + "
    "a two-phase count/argmax aggregation with map-side combine; the "
    "edge table is localCheckpointed once (referenced every round), "
    "label rounds are linearly consumed so they need no lineage cuts.  "
    "All integer label ids until the display projection — the bounded-"
    "round output hash-matches an unrolled-CTE replay regardless of "
    "convergence.",
)
def c17_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity") >= _LPA_MIN_QTY
    )
    trade = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select("o_custkey", "l_suppkey")
        .distinct()
    )
    c = F.col("o_custkey") * 2
    s = F.col("l_suppkey") * 2 + 1
    e = (
        trade.select(c.alias("src"), s.alias("dst"))
        .unionAll(trade.select(s.alias("src"), c.alias("dst")))
        .localCheckpoint(eager=True)
    )
    labels = e.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    for _ in range(_LPA_ROUNDS):
        # neighbor votes + the node's own label (the standard self-vote:
        # without it, synchronous LPA 2-colors this bipartite graph and
        # oscillates instead of converging)
        votes = (
            e.join(labels, e["src"] == labels["node"])
            .select(F.col("dst").alias("node"), "label")
            .unionAll(labels.select("node", "label"))
        )
        counts = votes.groupBy("node", "label").agg(F.count("*").alias("cnt"))
        labels = counts.groupBy("node").agg(
            F.expr("min_by(label, struct(-cnt, label))").alias("label")
        )
    disp = F.when(
        F.col("label") % 2 == 0,
        F.concat(F.lit("c"), (F.col("label") / 2).cast("long").cast("string")),
    ).otherwise(
        F.concat(
            F.lit("s"), ((F.col("label") - 1) / 2).cast("long").cast("string")
        )
    )
    return (
        labels.groupBy("label")
        .agg(F.count("*").cast("long").alias("size"))
        .select(disp.alias("community"), "size")
    )


# --- C14+: Pareto-skyline curation selection ---------------------------------

_SKY_BUCKETS = 256


@register(
    "c14_pareto_skyline",
    # Quadratic NOT-EXISTS dominance on the oracle side; the Spark side is
    # the sort-free skyline: a doc survives iff its b is the max within its
    # a-group AND strictly beats every b at strictly larger a — the latter
    # reassembled from a ≤256-row bucket suffix-max table plus a
    # within-bucket running max over the DISTINCT-a rows, the same
    # bounded-window discipline as the rank CDF queries.
    oracle="""
    WITH m AS (
        SELECT doc_id, n_chars AS a,
               CAST(len(list_distinct(string_split(lower(text), ' ')))
                    AS BIGINT) AS b
        FROM documents)
    SELECT d.doc_id, d.a AS n_chars, d.b AS uniq_tokens
    FROM m d
    WHERE NOT EXISTS (
        SELECT 1 FROM m e
        WHERE e.a >= d.a AND e.b >= d.b AND (e.a > d.a OR e.b > d.b))
    """,
    doc="C14+: Pareto-skyline document selection — keep every doc not "
    "dominated in (length, distinct-token count) space, the multi-"
    "objective form of quality-percentile filtering (no weighting of the "
    "two axes, the frontier IS the answer).  No all-pairs anywhere: "
    "per-a group max, a ≤256-row bucket suffix-max table (the only "
    "global window, bounded by construction), a within-bucket running "
    "max over distinct a values, one broadcast join back to docs.",
)
def c14_pareto_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.col("n_chars").alias("a"),
            F.size(F.array_distinct(F.split(F.lower(F.col("text")), " ")))
            .cast("long")
            .alias("b"),
        )
        # consumed twice (per-a group max AND the final dominance join).
        # Without the cut both consumers re-tokenize the full text column —
        # two 100 TB scans for a 24-byte/doc projection; materializing the
        # projection costs a constant barrier (~0.5 s at sf0.1) and wins by
        # a scan at scale.  (A window-on-a variant was measured WORSE: it
        # adds a full doc shuffle and column-pruning divergence defeats
        # exchange reuse, so it still scans twice.)
        .localCheckpoint(eager=True)
    )
    ga = docs.groupBy("a").agg(F.max("b").alias("gb"))
    mm = ga.agg(F.min("a").alias("amin"), F.max("a").alias("amax"))
    span = F.col("amax") - F.col("amin")
    safe_span = F.when(span > 0, span).otherwise(F.lit(1))
    raw = F.floor(
        (F.col("a") - F.col("amin")) / safe_span.cast("double") * _SKY_BUCKETS
    )
    gb = ga.crossJoin(F.broadcast(mm)).withColumn(
        "bucket",
        F.when(span > 0, F.least(raw, F.lit(_SKY_BUCKETS - 1)))
        .otherwise(F.lit(0))
        .cast("int"),
    )
    # max b per bucket, then the strict-suffix max over HIGHER buckets —
    # a bounded ≤256-row table, the query's one global window
    bmax = gb.groupBy("bucket").agg(F.max("gb").alias("bm"))
    wb = Window.orderBy(F.col("bucket").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    suf = bmax.select(
        "bucket", F.coalesce(F.max("bm").over(wb), F.lit(-1)).alias("suf_gt")
    )
    # within-bucket running max over strictly larger a (distinct-a rows)
    wa = Window.partitionBy("bucket").orderBy(F.col("a").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    thr = (
        gb.join(F.broadcast(suf), "bucket")
        .select(
            "a",
            "gb",
            F.greatest(
                F.coalesce(F.max("gb").over(wa), F.lit(-1)), F.col("suf_gt")
            ).alias("max_gt"),
        )
    )
    return (
        docs.join(F.broadcast(thr), "a")
        .filter((F.col("b") == F.col("gb")) & (F.col("b") > F.col("max_gt")))
        .select("doc_id", F.col("a").alias("n_chars"), F.col("b").alias("uniq_tokens"))
    )
