"""Round-5 breadth queries: triangle counting and common-neighbor link
prediction (C17), lag-k autocorrelation (C16), interval-union coverage
(C15), the tie-corrected Mann–Whitney U test over a distributed CDF (C2),
Zipf's-law slope fitting (C11), GIF header decode (C12), and zone-map
pruning statistics (C19).

Registered LAST (see plans/__init__) so longer-waiting unverified queries
keep their place at the front of the driver's correctness window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from logspout_kinesis_tests_spark.plans.registry import register
from logspout_kinesis_tests_spark.sources.tables import load_table

# --- C17+: triangle counting over the co-purchase graph --------------------

#: Minimum number of distinct orders a part pair must co-occur in to count
#: as an edge — the support cut that keeps the pair table proportional to
#: genuinely recurring co-purchases, not one-off basket noise.
_TRI_SUPPORT = 2


@register(
    "c17_triangle_count",
    oracle=f"""
    WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    pe AS (
        SELECT a.p AS u, b.p AS v, count(*) AS support
        FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
        GROUP BY a.p, b.p),
    edges AS (SELECT u, v FROM pe WHERE support >= {_TRI_SUPPORT}),
    tri AS (
        SELECT count(*) AS n_triangles
        FROM edges e1
        JOIN edges e2 ON e2.u = e1.v
        JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v)
    SELECT CAST((SELECT count(*) FROM edges) AS BIGINT) AS n_edges,
           CAST(n_triangles AS BIGINT) AS n_triangles
    FROM tri
    """,
    doc="C17+: triangle count of the part co-purchase graph — the "
    "clustering/community primitive (friends-of-friends closure) over "
    "edges = part pairs co-ordered in ≥2 distinct orders.  Pair "
    "generation is per-order (fan-out bounded by max order size, never "
    "all part pairs); triangles come from the compact-forward edge "
    "iterator in operators/graph.py: every edge stored once as (min,max), "
    "wedge join on the middle vertex + one closing equi-join, so each "
    "triangle is emitted exactly once and hub fan-out is split across "
    "orientations.  Three shuffles total, all on vertex/order keys.",
)
def c17_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logspout_kinesis_tests_spark.operators.graph import triangles

    li = load_table(spark, sf_dir, "lineitem")
    op = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    a = op.select("o", F.col("p").alias("u"))
    b = op.select("o", F.col("p").alias("v"))
    edges = (
        a.join(b, "o")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= _TRI_SUPPORT)
        .select("u", "v")
    )
    # the edge table feeds FOUR consumers (count + three join branches):
    # checkpoint once so the order self-join isn't re-executed per branch
    edges = edges.localCheckpoint(eager=True)
    n_edges = edges.agg(F.count("*").cast("long").alias("n_edges"))
    n_tri = triangles(edges).agg(F.count("*").cast("long").alias("n_triangles"))
    return n_edges.crossJoin(n_tri)


# --- C17+: common-neighbor link prediction ---------------------------------

#: Parts bought by more than this many distinct customers are dropped
#: before pair generation (the df-cut / stop-shingle trick): a hub part
#: contributes O(deg²) candidate pairs and near-zero signal.  (The
#: supplier axis would be useless here: every supplier serves hundreds of
#: customers, so EVERY right-node would be a hub.)
_CN_MAX_DEG = 50
_CN_MIN_COMMON = 3
_CN_TOP = 50


@register(
    "c17_link_prediction",
    oracle=f"""
    WITH trade AS (
        SELECT DISTINCT o_custkey AS l, l_partkey AS r
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
    keep AS (SELECT r FROM trade GROUP BY r HAVING count(*) <= {_CN_MAX_DEG}),
    cut AS (SELECT t.l, t.r FROM trade t JOIN keep USING (r)),
    deg AS (SELECT l, count(*) AS deg FROM cut GROUP BY l),
    pairs AS (
        SELECT a.l AS a, b.l AS b, count(*) AS n_common
        FROM cut a JOIN cut b ON a.r = b.r AND a.l < b.l
        GROUP BY a.l, b.l
        HAVING count(*) >= {_CN_MIN_COMMON})
    SELECT a, b, CAST(n_common AS BIGINT) AS n_common,
           CAST(da.deg AS BIGINT) AS deg_a, CAST(db.deg AS BIGINT) AS deg_b,
           round(CAST(n_common AS DOUBLE)
                 / CAST(da.deg + db.deg - n_common AS DOUBLE), 6) AS jaccard
    FROM pairs
    JOIN deg da ON da.l = a
    JOIN deg db ON db.l = b
    ORDER BY jaccard DESC, a, b
    LIMIT {_CN_TOP}
    """,
    doc="C17+: common-neighbor link prediction over the customer–part "
    "bipartite graph — top-50 customer pairs by Jaccard overlap of their "
    "purchased-part sets, the who-behaves-alike primitive behind account-"
    "clustering and recommendation seeds.  operators/graph.py "
    "common_neighbor_pairs: inverted-index pair generation per part "
    "(NEVER all customer pairs) with a degree df-cut dropping hub parts "
    "(O(deg²) candidates, near-zero signal — the stop-shingle trick), "
    "degrees computed on the same cut set so the Jaccard is exact for "
    "the graph the candidates came from.  TakeOrdered top-50, total "
    "tie-broken order.",
)
def c17_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logspout_kinesis_tests_spark.operators.graph import common_neighbor_pairs

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    trade = orders.join(li, orders["o_orderkey"] == li["l_orderkey"]).select(
        F.col("o_custkey").alias("l"), F.col("l_partkey").alias("r")
    )
    pairs = common_neighbor_pairs(
        trade,
        left="l",
        right="r",
        max_right_degree=_CN_MAX_DEG,
        min_common=_CN_MIN_COMMON,
    )
    return pairs.orderBy(F.desc("jaccard"), "a", "b").limit(_CN_TOP)


# --- C16+: lag-k autocorrelation -------------------------------------------

_ACF_LAGS = (1, 2, 3)


@register(
    "c16_acf",
    # Pearson autocorrelation at lag k over the (x_t, x_{t-k}) pairs of the
    # per-type value series (the sample-ACF variant that is exact under the
    # repo's decimal-sum policy: all six sufficient statistics are exact
    # decimal sums, the closing expression is one double tree written
    # identically in both engines, zero-variance groups → NULL).
    oracle=f"""
    WITH s AS (
        SELECT event_type, value,
               {", ".join(
                   f"lag(value, {k}) OVER "
                   f"(PARTITION BY event_type ORDER BY ts, event_id) AS y{k}"
                   for k in _ACF_LAGS
               )}
        FROM events WHERE value IS NOT NULL),
    pairs AS (
        {" UNION ALL ".join(
            f"SELECT event_type, {k} AS lag, value AS x, y{k} AS y "
            f"FROM s WHERE y{k} IS NOT NULL"
            for k in _ACF_LAGS
        )}),
    g AS (
        SELECT event_type, lag, CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(sum(CAST(x AS DECIMAL(18,2))) AS DOUBLE) AS sx,
               CAST(sum(CAST(y AS DECIMAL(18,2))) AS DOUBLE) AS sy,
               CAST(sum(CAST(x AS DECIMAL(18,2))
                        * CAST(y AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
               CAST(sum(CAST(x AS DECIMAL(18,2))
                        * CAST(x AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
               CAST(sum(CAST(y AS DECIMAL(18,2))
                        * CAST(y AS DECIMAL(18,2))) AS DOUBLE) AS syy
        FROM pairs GROUP BY event_type, lag)
    SELECT event_type, lag, n_pairs,
           CASE WHEN (n_pairs * sxx - sx * sx) * (n_pairs * syy - sy * sy) = 0
                THEN NULL
                ELSE round((n_pairs * sxy - sx * sy)
                           / sqrt((n_pairs * sxx - sx * sx)
                                  * (n_pairs * syy - sy * sy)), 9) END AS acf
    FROM g
    """,
    doc="C16+: autocorrelation function at lags 1–3 per event-type series — "
    "the is-it-trending/seasonal probe run before picking a forecasting "
    "model (companion to c16_holt_smoothing / c16_seasonal_naive_mae).  "
    "ONE window pass computes all three lag taps (same spec ⇒ one sort, "
    "one shuffle on the series key), a 3-way tap unpivot feeds a single "
    "map-combined aggregate of exact decimal sufficient statistics, and "
    "the Pearson closing form (with zero-variance → NULL guard, the "
    "c2_corr_matrix policy) is bit-identical across engines.  O(1) window "
    "state per row; no per-series sort beyond the one shared window.",
)
def c16_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    s = ev.select(
        "event_type",
        F.col("value").alias("x"),
        *[F.lag("value", k).over(w).alias(f"y{k}") for k in _ACF_LAGS],
    )
    taps = None
    for k in _ACF_LAGS:
        t = s.filter(F.col(f"y{k}").isNotNull()).select(
            "event_type",
            F.lit(k).alias("lag"),
            "x",
            F.col(f"y{k}").alias("y"),
        )
        taps = t if taps is None else taps.unionAll(t)
    dx = F.col("x").cast("decimal(18,2)")
    dy = F.col("y").cast("decimal(18,2)")
    g = taps.groupBy("event_type", "lag").agg(
        F.count("*").alias("n_pairs"),
        F.sum(dx).cast("double").alias("sx"),
        F.sum(dy).cast("double").alias("sy"),
        F.sum(dx * dy).cast("double").alias("sxy"),
        F.sum(dx * dx).cast("double").alias("sxx"),
        F.sum(dy * dy).cast("double").alias("syy"),
    )
    n = F.col("n_pairs")
    den = (n * F.col("sxx") - F.col("sx") * F.col("sx")) * (
        n * F.col("syy") - F.col("sy") * F.col("sy")
    )
    acf = F.when(den == F.lit(0.0), F.lit(None).cast("double")).otherwise(
        F.round(
            (n * F.col("sxy") - F.col("sx") * F.col("sy")) / F.sqrt(den), 9
        )
    )
    return g.select("event_type", "lag", "n_pairs", acf.alias("acf"))


# --- C15+: interval-union coverage -----------------------------------------

#: Interval length: 60 s base + |value| seconds — derived from the row so
#: intervals genuinely vary and overlap.
_IC_BASE_S = 60


@register(
    "c15_interval_coverage",
    oracle=f"""
    WITH iv AS (
        SELECT user_id, epoch_us(ts) AS s_us,
               epoch_us(ts) + ({_IC_BASE_S} + CAST(round(abs(value), 0)
                   AS BIGINT)) * 1000000 AS e_us,
               event_id
        FROM events WHERE value IS NOT NULL),
    flagged AS (
        SELECT user_id, s_us, e_us,
               CASE WHEN CAST(max(e_us) OVER (
                       PARTITION BY user_id ORDER BY s_us, e_us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS BIGINT) >= s_us THEN 0 ELSE 1 END AS new_island
        FROM iv),
    islands AS (
        SELECT user_id, s_us, e_us,
               CAST(sum(new_island) OVER (
                   PARTITION BY user_id ORDER BY s_us, e_us
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS island
        FROM flagged),
    merged AS (
        SELECT user_id, island,
               min(s_us) AS m_start, max(e_us) AS m_end
        FROM islands GROUP BY user_id, island)
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_islands,
           CAST(sum(m_end - m_start) AS BIGINT) AS covered_us
    FROM merged GROUP BY user_id
    """,
    doc="C15+: interval-union coverage per user — merge overlapping "
    "activity intervals ([ts, ts + 60s + |value|s]) and report the merged "
    "count and total covered microseconds: the utilization/uptime "
    "calculation that double-counts unless intervals are unioned first, "
    "and the variable-length generalization of gap-based sessionization "
    "(c7_sessionize).  Classic parallel sweep-line: per-user running "
    "max(end) over the start order marks island starts, a running sum of "
    "the flags numbers the islands, and one aggregate per island closes "
    "the merge.  All integer-µs arithmetic (exact), one shuffle on "
    "user_id, O(1) window state per row — no pairwise overlap join "
    "anywhere.",
)
def c15_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    s_us = F.unix_micros(F.col("ts").cast("timestamp"))
    e_us = s_us + (
        F.lit(_IC_BASE_S) + F.round(F.abs(F.col("value")), 0).cast("long")
    ) * F.lit(1_000_000)
    iv = ev.select(
        "user_id", s_us.alias("s_us"), e_us.alias("e_us"), "event_id"
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s_us", "e_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.select(
        "user_id",
        "s_us",
        "e_us",
        F.when(
            F.max("e_us").over(w_prev).cast("long") >= F.col("s_us"), 0
        )
        .otherwise(1)
        .alias("new_island"),
    )
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("s_us", "e_us")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = flagged.select(
        "user_id",
        "s_us",
        "e_us",
        F.sum("new_island").over(w_cum).cast("long").alias("island"),
    )
    merged = islands.groupBy("user_id", "island").agg(
        F.min("s_us").alias("m_start"), F.max("e_us").alias("m_end")
    )
    return merged.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_islands"),
        F.sum(F.col("m_end") - F.col("m_start")).cast("long").alias("covered_us"),
    )


# --- C2+: Mann–Whitney U test ----------------------------------------------

_MW_A, _MW_B = "click", "view"
#: Bucket fan-out for the distributed rank CDF (same constant as c2_ks_test).
_MW_BUCKETS = 256


@register(
    "c2_mann_whitney",
    # Rank-sum form with midranks and tie correction.  The oracle uses one
    # plain global cumsum over distinct values; the Spark side reassembles
    # the IDENTICAL integers via the ≤256-row bucket-offset table, so every
    # double the closing expression touches is bit-identical.  R1 terms
    # c1·midrank have at most one .5 fraction digit → DECIMAL(28,1)
    # quantization is lossless and the cross-value sum exact.
    oracle=f"""
    WITH pv AS (
        SELECT value AS v,
               CAST(sum(CASE WHEN event_type = '{_MW_A}' THEN 1 ELSE 0 END)
                    AS BIGINT) AS c1,
               CAST(sum(CASE WHEN event_type = '{_MW_B}' THEN 1 ELSE 0 END)
                    AS BIGINT) AS c2
        FROM events
        WHERE event_type IN ('{_MW_A}', '{_MW_B}') AND value IS NOT NULL
        GROUP BY value),
    tot AS (
        SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2,
               CAST(sum((c1 + c2) * (c1 + c2) * (c1 + c2) - (c1 + c2))
                    AS BIGINT) AS tie3
        FROM pv),
    cum AS (
        SELECT c1, c2,
               CAST(sum(c1 + c2) OVER (ORDER BY v) AS BIGINT) - (c1 + c2)
                   AS cum_before
        FROM pv),
    r1 AS (
        SELECT CAST(sum(CAST(round(
                   c1 * (cum_before + (CAST(c1 + c2 AS DOUBLE) + 1) / 2), 1)
                   AS DECIMAL(28,1))) AS DOUBLE) AS rank_sum
        FROM cum),
    u AS (
        SELECT n1, n2, tie3,
               rank_sum - CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1) / 2
                   AS u1
        FROM r1, tot)
    SELECT n1, n2, round(u1, 1) AS u1,
           round((u1 - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2)
                 / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12
                        * ((CAST(n1 + n2 AS DOUBLE) + 1)
                           - CAST(tie3 AS DOUBLE)
                             / (CAST(n1 + n2 AS DOUBLE)
                                * (CAST(n1 + n2 AS DOUBLE) - 1)))), 9) AS z
    FROM u
    """,
    doc="C2+: tie-corrected Mann–Whitney U (Wilcoxon rank-sum) test, click "
    "vs view value distributions — the nonparametric two-sample location "
    "test that, unlike c2_welch_ttest, needs no normality and, unlike "
    "c2_ks_test's supremum, targets stochastic dominance.  Midranks come "
    "from the same distributed-CDF machinery as the KS test: per-value "
    "counts, a ≤256-row bucket-offset table (the only global window, "
    "bounded by construction), per-bucket cumulative windows — the "
    "reassembled prefix counts EQUAL the global cumsum's, so the "
    "rank-sum, tie term Σ(t³−t), U and z hash-match the oracle's "
    "single-window formulation bit-for-bit.  No global sort at any scale.",
)
def c2_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(_MW_A, _MW_B) & F.col("value").isNotNull()
    )
    pv = ev.groupBy(F.col("value").alias("v")).agg(
        F.sum(F.when(F.col("event_type") == _MW_A, 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("event_type") == _MW_B, 1).otherwise(0)).alias("c2"),
    )
    cnt = F.col("c1") + F.col("c2")
    mm = pv.agg(
        F.min("v").alias("vmin"),
        F.max("v").alias("vmax"),
        F.sum("c1").alias("n1"),
        F.sum("c2").alias("n2"),
        F.sum(cnt * cnt * cnt - cnt).alias("tie3"),
    )
    span = F.col("vmax") - F.col("vmin")
    raw = F.floor((F.col("v") - F.col("vmin")) / span * _MW_BUCKETS)
    b = pv.crossJoin(F.broadcast(mm)).withColumn(
        "bucket",
        F.when(span > 0, F.least(raw, F.lit(_MW_BUCKETS - 1)))
        .otherwise(F.lit(0))
        .cast("int"),
    )
    bucket_tot = b.groupBy("bucket").agg(F.sum(cnt).alias("t"))
    wb = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offs = bucket_tot.select(
        "bucket", F.coalesce(F.sum("t").over(wb), F.lit(0)).alias("off")
    )
    wv = Window.partitionBy("bucket").orderBy("v")
    # exclusive prefix count of ALL observations below v (bucket offset +
    # inclusive in-bucket cumsum − own count) — the global cumsum's integers
    cum = b.join(F.broadcast(offs), "bucket").select(
        "c1",
        "c2",
        (F.col("off") + F.sum(cnt).over(wv) - cnt).alias("cum_before"),
        "n1",
        "n2",
        "tie3",
    )
    # midrank written as cum_before + (cnt_double + 1)/2 — the identical
    # association order as the oracle's expression
    midrank = F.col("cum_before") + (
        (F.col("c1") + F.col("c2")).cast("double") + 1
    ) / 2
    r1 = cum.agg(
        F.sum(
            F.round(F.col("c1") * midrank, 1).cast("decimal(28,1)")
        )
        .cast("double")
        .alias("rank_sum"),
        F.max("n1").alias("n1"),
        F.max("n2").alias("n2"),
        F.max("tie3").alias("tie3"),
    )
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    nd = (F.col("n1") + F.col("n2")).cast("double")
    u1 = F.col("rank_sum") - n1d * (n1d + 1) / 2
    z = (u1 - n1d * n2d / 2) / F.sqrt(
        n1d * n2d / 12
        * ((nd + 1) - F.col("tie3").cast("double") / (nd * (nd - 1)))
    )
    return r1.select(
        "n1",
        "n2",
        F.round(u1, 1).alias("u1"),
        F.round(z, 9).alias("z"),
    )


# --- C11+: Zipf's-law slope ------------------------------------------------

_ZIPF_TOP = 100


@register(
    "c11_zipf_slope",
    # OLS of ln(freq) on ln(rank) over the top-100 terms.  ln() is
    # correctly-rounded-enough to agree across libm implementations on these
    # inputs (the KL-divergence precedent); per-term doubles are quantized
    # to DECIMAL(28,12) before the cross-term sums so the reduction is exact
    # and order-independent, and the closing OLS expressions are one double
    # tree written identically in both engines.
    oracle=f"""
    WITH tf AS (
        SELECT term, CAST(count(*) AS DOUBLE) AS n
        FROM (SELECT unnest(string_split(lower(text), ' ')) AS term
              FROM documents)
        GROUP BY term
        ORDER BY count(*) DESC, term
        LIMIT {_ZIPF_TOP}),
    ranked AS (
        SELECT CAST(row_number() OVER (ORDER BY n DESC, term) AS DOUBLE) AS r,
               n
        FROM tf),
    t AS (
        SELECT CAST(round(ln(r), 12) AS DECIMAL(28,12)) AS x,
               CAST(round(ln(n), 12) AS DECIMAL(28,12)) AS y,
               CAST(round(ln(r) * ln(n), 12) AS DECIMAL(28,12)) AS xy,
               CAST(round(ln(r) * ln(r), 12) AS DECIMAL(28,12)) AS xx,
               CAST(round(ln(n) * ln(n), 12) AS DECIMAL(28,12)) AS yy
        FROM ranked),
    s AS (
        SELECT CAST(count(*) AS DOUBLE) AS k,
               CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
               CAST(sum(xy) AS DOUBLE) AS sxy, CAST(sum(xx) AS DOUBLE) AS sxx,
               CAST(sum(yy) AS DOUBLE) AS syy
        FROM t)
    SELECT CAST(k AS BIGINT) AS n_terms,
           round((k * sxy - sx * sy) / (k * sxx - sx * sx), 9) AS slope,
           round((sy - (k * sxy - sx * sy) / (k * sxx - sx * sx) * sx) / k,
                 9) AS intercept,
           round((k * sxy - sx * sy) * (k * sxy - sx * sy)
                 / ((k * sxx - sx * sx) * (k * syy - sy * sy)), 9) AS r2
    FROM s
    """,
    doc="C11+: Zipf's-law fit over the corpus vocabulary — OLS slope of "
    "ln(frequency) on ln(rank) for the top-100 terms, with r².  Natural "
    "language sits near slope −1; a corpus that drifts far off is "
    "boilerplate- or spam-heavy, making this a one-row corpus-quality "
    "gate next to c11_kl_divergence.  The frequency table is the "
    "map-combined term count with a TakeOrdered(100) cut; the only "
    "unpartitioned window ranks that bounded 100-row list.  Per-term log "
    "terms are DECIMAL(28,12)-quantized so the five sufficient sums are "
    "exact; closing OLS algebra is bit-identical across engines.",
)
def c11_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logspout_kinesis_tests_spark.operators.text_analysis import words

    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(F.explode(words("text")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "term")
        .limit(_ZIPF_TOP)
        .select("term", F.col("cnt").cast("double").alias("n"))
    )
    ranked = tf.select(
        F.row_number()
        .over(Window.orderBy(F.desc("n"), "term"))
        .cast("double")
        .alias("r"),
        "n",
    )
    lr, ln_ = F.log(F.col("r")), F.log(F.col("n"))

    def q(col: F.Column) -> F.Column:
        return F.round(col, 12).cast("decimal(28,12)")

    t = ranked.select(
        q(lr).alias("x"),
        q(ln_).alias("y"),
        q(lr * ln_).alias("xy"),
        q(lr * lr).alias("xx"),
        q(ln_ * ln_).alias("yy"),
    )
    s = t.agg(
        F.count("*").cast("double").alias("k"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum("xy").cast("double").alias("sxy"),
        F.sum("xx").cast("double").alias("sxx"),
        F.sum("yy").cast("double").alias("syy"),
    )
    k = F.col("k")
    sx, sy = F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    slope = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    return s.select(
        k.cast("long").alias("n_terms"),
        F.round(slope, 9).alias("slope"),
        F.round((sy - slope * sx) / k, 9).alias("intercept"),
        F.round(
            (k * sxy - sx * sy) * (k * sxy - sx * sy)
            / ((k * sxx - sx * sx) * (k * syy - sy * sy)),
            9,
        ).alias("r2"),
    )


# --- C12+: GIF header decode -----------------------------------------------


@register(
    "c12_gif_header_decode",
    oracle="""
    WITH dims AS (
        SELECT doc_id, 16 + doc_id % 2032 AS w, 16 + doc_id % 1016 AS h,
               doc_id % 256 AS pk
        FROM documents),
    pay AS (
        SELECT doc_id, CASE WHEN doc_id % 41 = 0 THEN from_hex('00FF00FF')
            ELSE from_hex('474946383961'
                || substring(lpad(hex(w), 4, '0'), 3, 2)
                || substring(lpad(hex(w), 4, '0'), 1, 2)
                || substring(lpad(hex(h), 4, '0'), 3, 2)
                || substring(lpad(hex(h), 4, '0'), 1, 2)
                || lpad(hex(pk), 2, '0') || '00' || '00') END AS payload
        FROM dims),
    hx AS (SELECT doc_id, hex(payload) AS hh FROM pay),
    chk AS (
        -- hp: zero-padded to full header width so byte slices of CORRUPT
        -- (short) payloads stay castable — DuckDB's vectorized CASE may
        -- evaluate both branches, so ('0x' || '')::BIGINT must not occur
        SELECT doc_id, rpad(hh, 26, '0') AS hp,
               substring(hh, 1, 12) = '474946383961' AS gif_valid
        FROM hx),
    par AS (
        SELECT doc_id, gif_valid,
               ('0x' || substring(hp, 21, 2))::BIGINT AS pkb,
               ('0x' || substring(hp, 13, 2))::BIGINT
                   + ('0x' || substring(hp, 15, 2))::BIGINT * 256 AS w,
               ('0x' || substring(hp, 17, 2))::BIGINT
                   + ('0x' || substring(hp, 19, 2))::BIGINT * 256 AS h
        FROM chk)
    SELECT doc_id, gif_valid,
           CASE WHEN gif_valid THEN w END AS gif_width,
           CASE WHEN gif_valid THEN h END AS gif_height,
           CASE WHEN gif_valid THEN floor(pkb / 128) = 1 END AS has_gct,
           CASE WHEN gif_valid AND floor(pkb / 128) = 1
                THEN CAST(pow(2.0, CAST(pkb % 8 + 1 AS DOUBLE)) AS BIGINT)
                END AS gct_size
    FROM par
    """,
    doc="C12+: GIF89a logical-screen decode — synthesize structurally-valid "
    "13-byte GIF headers (planted corrupt payloads every 41st doc), then "
    "parse signature, little-endian dims, and the packed flags byte "
    "(global-color-table bit + 2^(N+1) palette size) entirely in "
    "scan-side JVM expressions — hex slicing, conv, and bit-field "
    "arithmetic; no UDF, binary never crosses to Python.  Completes the "
    "header-decode family (PNG big-endian, WAV little-endian, JPEG "
    "segment walk, TIFF IFD, MP4 boxes) with the bit-packed-flags case.",
)
def c12_gif_header_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logspout_kinesis_tests_spark.operators.multimodal import (
        parse_gif_header,
        synth_gif_payload,
    )

    dims = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        (F.lit(16) + F.col("doc_id") % 2032).alias("width"),
        (F.lit(16) + F.col("doc_id") % 1016).alias("height"),
        (F.col("doc_id") % 256).alias("packed"),
    )
    payloads = synth_gif_payload(dims).withColumn(
        "payload",
        F.when(F.col("doc_id") % 41 == 0, F.unhex(F.lit("00FF00FF"))).otherwise(
            F.col("payload")
        ),
    )
    return parse_gif_header(payloads).select(
        "doc_id", "gif_valid", "gif_width", "gif_height", "has_gct", "gct_size"
    )


# --- C19+: zone-map pruning statistics -------------------------------------

#: The probe predicate: a partkey range — narrow enough that most file
#: zone-maps miss it, wide enough that some survive.
_PRUNE_LO, _PRUNE_HI = 500, 700


@register(
    "c19_pruning_stats",
    oracle=f"""
    WITH manifest AS (
        SELECT strftime(date_trunc('month', l_shipdate), '%Y-%m-%d')
                   AS part_month,
               strftime(l_shipdate, '%Y-%m-%d') AS file_day,
               CAST(min(l_partkey) AS BIGINT) AS zmin,
               CAST(max(l_partkey) AS BIGINT) AS zmax,
               CAST(count(*) AS BIGINT) AS size_rows
        FROM lineitem GROUP BY 1, 2),
    judged AS (
        SELECT part_month, size_rows,
               CASE WHEN zmax >= {_PRUNE_LO} AND zmin <= {_PRUNE_HI}
                    THEN 0 ELSE 1 END AS skipped
        FROM manifest)
    SELECT part_month,
           CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(skipped) AS BIGINT) AS n_skipped,
           CAST(sum(size_rows) AS BIGINT) AS rows_total,
           CAST(sum(CASE WHEN skipped = 1 THEN size_rows ELSE 0 END)
                AS BIGINT) AS rows_skipped,
           round(CAST(sum(CASE WHEN skipped = 1 THEN size_rows ELSE 0 END)
                      AS DOUBLE) / CAST(sum(size_rows) AS DOUBLE), 6)
               AS skip_ratio
    FROM judged GROUP BY part_month
    """,
    doc="C19+: zone-map pruning statistics — for each partition month, how "
    "many of its per-day files a range predicate (l_partkey BETWEEN "
    f"{_PRUNE_LO} AND {_PRUNE_HI}) could skip on min/max footer stats "
    "alone, and what fraction of rows that saves.  The effectiveness "
    "audit for the c19_zorder_key layout: clustered files → tight "
    "zone-maps → high skip ratio; this query IS the measurement a layout "
    "job runs before/after re-clustering.  One map-combined scan builds "
    "the |files|-sized manifest (min/max/count per file), the verdict is "
    "scan-side arithmetic — the plan costs nothing at 100 TB because "
    "nothing downstream of the manifest is row-sized.",
)
def c19_pruning_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    manifest = li.groupBy(
        F.date_format(F.date_trunc("month", "l_shipdate"), "yyyy-MM-dd").alias(
            "part_month"
        ),
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("file_day"),
    ).agg(
        F.min("l_partkey").cast("long").alias("zmin"),
        F.max("l_partkey").cast("long").alias("zmax"),
        F.count("*").alias("size_rows"),
    )
    skipped = F.when(
        (F.col("zmax") >= _PRUNE_LO) & (F.col("zmin") <= _PRUNE_HI), 0
    ).otherwise(1)
    judged = manifest.select("part_month", "size_rows", skipped.alias("skipped"))
    return judged.groupBy("part_month").agg(
        F.count("*").cast("long").alias("n_files"),
        F.sum("skipped").cast("long").alias("n_skipped"),
        F.sum("size_rows").cast("long").alias("rows_total"),
        F.sum(F.when(F.col("skipped") == 1, F.col("size_rows")).otherwise(0))
        .cast("long")
        .alias("rows_skipped"),
        F.round(
            F.sum(
                F.when(F.col("skipped") == 1, F.col("size_rows")).otherwise(0)
            ).cast("double")
            / F.sum("size_rows").cast("double"),
            6,
        ).alias("skip_ratio"),
    )
