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
           CASE WHEN (n_pairs * sxx - sx * sx) * (n_pairs * syy - sy * sy) <= 0
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
    acf = F.when(den <= F.lit(0.0), F.lit(None).cast("double")).otherwise(
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
        SELECT user_id, s_us, e_us, event_id,
               CASE WHEN CAST(max(e_us) OVER (
                       PARTITION BY user_id ORDER BY s_us, e_us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS BIGINT) >= s_us THEN 0 ELSE 1 END AS new_island
        FROM iv),
    islands AS (
        SELECT user_id, s_us, e_us,
               CAST(sum(new_island) OVER (
                   PARTITION BY user_id ORDER BY s_us, e_us, event_id
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
        "event_id",
        F.when(
            F.max("e_us").over(w_prev).cast("long") >= F.col("s_us"), 0
        )
        .otherwise(1)
        .alias("new_island"),
    )
    # event_id tie-break: with duplicate (user_id, s_us, e_us) rows at an
    # island boundary the ROWS-frame peer order would be engine-dependent
    # without a total order — keep BOTH windows on the same full key.
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("s_us", "e_us", "event_id")
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
               -- cube term in DOUBLE (a value tied across ~2.1M+ rows
               -- overflows int64: DuckDB raises, Spark wraps silently),
               -- quantized per-term to DECIMAL(38,0) so the cross-value
               -- sum stays exact and order-independent
               CAST(sum(CAST(round(
                   CAST(c1 + c2 AS DOUBLE) * CAST(c1 + c2 AS DOUBLE)
                   * CAST(c1 + c2 AS DOUBLE) - CAST(c1 + c2 AS DOUBLE), 0)
                   AS DECIMAL(38,0))) AS DOUBLE) AS tie3
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
        FROM r1, tot),
    zc AS (
        SELECT n1, n2, u1,
               u1 - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2 AS znum,
               CASE WHEN CAST(n1 + n2 AS DOUBLE) <= 1 THEN NULL
                    ELSE CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12
                         * ((CAST(n1 + n2 AS DOUBLE) + 1)
                            - tie3
                              / (CAST(n1 + n2 AS DOUBLE)
                                 * (CAST(n1 + n2 AS DOUBLE) - 1))) END AS varu
        FROM u)
    SELECT n1, n2, round(u1, 1) AS u1,
           CASE WHEN varu IS NULL OR varu <= 0 THEN NULL
                ELSE round(znum / sqrt(varu), 9) END AS z
    FROM zc
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
    # tie cube term in DOUBLE (int64 overflows at a ~2.1M-row tie; DuckDB
    # raises, non-ANSI Spark wraps silently) — per-term double is
    # bit-identical across engines (same association order), DECIMAL(38,0)
    # quantization keeps the cross-value sum exact and order-independent
    cntd = cnt.cast("double")
    mm = pv.agg(
        F.min("v").alias("vmin"),
        F.max("v").alias("vmax"),
        F.sum("c1").alias("n1"),
        F.sum("c2").alias("n2"),
        F.sum(
            F.round(cntd * cntd * cntd - cntd, 0).cast("decimal(38,0)")
        )
        .cast("double")
        .alias("tie3"),
    )
    span = F.col("vmax") - F.col("vmin")
    # the divisor must be non-zero even on the branch the CASE discards:
    # ANSI Spark raises DIVIDE_BY_ZERO before the when() can mask it when
    # all values are equal (span == 0) — substitute 1.0, the bucket CASE
    # still routes the degenerate corpus to bucket 0
    safe_span = F.when(span > 0, span).otherwise(F.lit(1.0))
    raw = F.floor((F.col("v") - F.col("vmin")) / safe_span * _MW_BUCKETS)
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
    # tie-corrected variance of U; with every observation tied (one distinct
    # value) it is exactly 0 and z would be 0/0 — NULL on both engines, and
    # the nd <= 1 pre-guard keeps the tie term's own divisor non-zero
    varu = F.when(nd <= 1, F.lit(None).cast("double")).otherwise(
        n1d * n2d / 12 * ((nd + 1) - F.col("tie3") / (nd * (nd - 1)))
    )
    zc = r1.select(
        "n1",
        "n2",
        u1.alias("u1r"),
        (u1 - n1d * n2d / 2).alias("znum"),
        varu.alias("varu"),
    )
    return zc.select(
        "n1",
        "n2",
        F.round(F.col("u1r"), 1).alias("u1"),
        F.when(
            F.col("varu").isNull() | (F.col("varu") <= 0),
            F.lit(None).cast("double"),
        )
        .otherwise(F.round(F.col("znum") / F.sqrt(F.col("varu")), 9))
        .alias("z"),
    )


# --- C2+: Poisson-bootstrap confidence interval ----------------------------

#: Resample count.  64 means per group — the quantile selection runs over a
#: provably bounded table (64 rows per group).
_BOOT_B = 64
#: Poisson(1) inverse-CDF thresholds: cumulative P(X ≤ k) for k = 0..5;
#: u ≥ the last threshold caps the weight at 6 (P ≈ 8e-5, negligible).
#: Literal doubles, identical in both engines.
_BOOT_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.919698602928606,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
)


def _boot_u_sql() -> str:
    """Engine-portable uniform in [0,1): one md5 digest carries FOUR 32-bit
    slices, so resample b reads slice b%4 of the digest for group b//4 —
    4× fewer hash evaluations than one digest per resample (the hash is
    the hot-path cost of the ×B fan-out)."""
    return (
        "CAST(('0x' || substring(md5(CAST(event_id AS VARCHAR) || ':' "
        "|| CAST(b // 4 AS VARCHAR)), 1 + 8 * (b % 4), 8))::BIGINT "
        "AS DOUBLE) / 4294967296"
    )


def _boot_w_sql() -> str:
    branches = "".join(
        f"WHEN u < {t!r} THEN {k} " for k, t in enumerate(_BOOT_CDF)
    )
    return f"CASE {branches}ELSE 6 END"


@register(
    "c2_bootstrap_ci",
    oracle=f"""
    WITH fan AS (
        SELECT event_type, event_id,
               CAST(round(value * 100, 0) AS BIGINT) AS cents, b.b
        FROM events CROSS JOIN (SELECT unnest(range({_BOOT_B})) AS b) b
        WHERE value IS NOT NULL),
    u AS (
        SELECT event_type, cents, b, {_boot_u_sql()} AS u FROM fan),
    w AS (
        SELECT event_type, cents, b, {_boot_w_sql()} AS w FROM u),
    means AS (
        SELECT event_type, b,
               CAST(CAST(sum(w * cents) AS BIGINT) AS DOUBLE)
                   / CAST(sum(w) * 100 AS DOUBLE) AS m
        FROM w GROUP BY event_type, b
        HAVING sum(w) > 0),
    ranked AS (
        SELECT event_type, m,
               row_number() OVER (
                   PARTITION BY event_type ORDER BY m, b) AS rn,
               count(*) OVER (PARTITION BY event_type) AS nb
        FROM means),
    ci AS (
        SELECT event_type,
               max(CASE WHEN rn = CAST(ceil(0.025 * nb) AS BIGINT)
                   THEN m END) AS ci_lo,
               max(CASE WHEN rn = CAST(ceil(0.975 * nb) AS BIGINT)
                   THEN m END) AS ci_hi
        FROM ranked GROUP BY event_type),
    full_mean AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                   / count(value) AS mean_val
        FROM events WHERE value IS NOT NULL GROUP BY event_type)
    SELECT f.event_type, n, round(mean_val, 9) AS mean_val,
           round(ci_lo, 9) AS ci_lo, round(ci_hi, 9) AS ci_hi
    FROM full_mean f JOIN ci USING (event_type)
    """,
    doc="C2+: 95% bootstrap confidence interval for the per-type mean via "
    "the POISSON bootstrap — the distributed resampling scheme for data "
    "too large to multinomial-sample (each row enters resample b with an "
    "independent Poisson(1) weight, so no global coordination and one "
    "scan-side fan-out of B=64 instead of B data passes).  Weights are "
    "deterministic: the engine-portable md5-uniform of (event_id, b) "
    "pushed through the Poisson(1) inverse CDF (literal thresholds) — "
    "fully reproducible AND hash-verifiable cross-engine, unlike rand(). "
    "Each digest feeds FOUR resamples (32-bit slices), so the hash cost "
    "is ×B/4, not ×B; resample means are exact integer-cent sums (the "
    "long-fixed-point policy); the CI is rank-selected from the bounded "
    "64-row mean table per group (no arithmetic touches the selected "
    "quantiles).  At 100 TB: map-side fan-out, one shuffle of (type, b) "
    "partials — the textbook streaming-bootstrap plan.",
)
def c2_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    # fan out by digest GROUP (B/4), hash ONCE per group row (the regex
    # split into 8-char chunks evaluates the md5 a single time, unlike an
    # array of substrings, where codegen re-evaluates the digest per
    # element), posexplode the chunks, THEN weight the concrete slice
    # column.  The weight comparison never parses hex: fixed-width
    # lowercase hex compares lexicographically in numeric order, and
    # u < t ⟺ raw < t·2³² ⟺ hex8(raw) < hex8(ceil(t·2³²)) because t·2³²
    # is an exact power-of-two scaling of the double threshold and never
    # an integer — so the string form selects the IDENTICAL weights the
    # oracle derives from its double-division u.  (Measured at sf0.1:
    # 8.5 s naive per-resample md5 → 3.4 s this form.)
    import math

    hex_thresholds = [
        format(math.ceil(t * 2**32), "08x") for t in _BOOT_CDF
    ]
    # spread the input BEFORE the ×B/4 fan-out: the test corpus is one
    # single-row-group parquet file, so without this the explode + hash +
    # partial aggregation all run in ONE task.  The shuffle moves only the
    # narrow pre-fan-out rows (~2 MB); the EXPLICIT partition count
    # matters — a bare repartition(col) is AQE-coalesced right back to one
    # partition because the shuffle is tiny, and the fan-out cost is
    # invisible to AQE's size-based planning.  At real scale inputs
    # arrive in many files, but tiny-input/huge-fan-out is exactly where
    # an explicit repartition is the correct lever.
    n_spread = spark.sparkContext.defaultParallelism
    g_fan = ev.repartition(n_spread, F.col("event_id")).select(
        "event_type",
        "event_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B // 4 - 1))).alias("g"),
    )
    digest = F.md5(
        F.concat_ws(
            ":", F.col("event_id").cast("string"), F.col("g").cast("string")
        )
    )
    chunks = F.slice(F.split(digest, r"(?<=\G.{8})"), 1, 4)
    sl = g_fan.select(
        "event_type",
        "cents",
        (F.col("g") * 4).alias("g4"),
        F.posexplode(chunks).alias("slice", "s"),
    )
    w = F.lit(6)
    for k in range(len(hex_thresholds) - 1, -1, -1):
        w = F.when(F.col("s") < F.lit(hex_thresholds[k]), F.lit(k)).otherwise(w)
    weighted = sl.select(
        "event_type",
        "cents",
        (F.col("g4") + F.col("slice")).alias("b"),
        w.alias("w"),
    )
    means = (
        weighted.groupBy("event_type", "b")
        .agg(
            F.sum(F.col("w") * F.col("cents")).alias("s"),
            F.sum("w").alias("sw"),
        )
        .filter(F.col("sw") > 0)
        .select(
            "event_type",
            "b",
            (
                F.col("s").cast("double")
                / (F.col("sw") * 100).cast("double")
            ).alias("m"),
        )
    )
    wr = Window.partitionBy("event_type").orderBy("m", "b")
    wn = Window.partitionBy("event_type")
    ranked = means.select(
        "event_type",
        "m",
        F.row_number().over(wr).alias("rn"),
        F.count("*").over(wn).alias("nb"),
    )
    ci = ranked.groupBy("event_type").agg(
        F.max(
            F.when(
                F.col("rn") == F.ceil(F.lit(0.025) * F.col("nb")).cast("long"),
                F.col("m"),
            )
        ).alias("ci_lo"),
        F.max(
            F.when(
                F.col("rn") == F.ceil(F.lit(0.975) * F.col("nb")).cast("long"),
                F.col("m"),
            )
        ).alias("ci_hi"),
    )
    full_mean = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        (
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
            / F.count("value")
        ).alias("mean_val"),
    )
    return full_mean.join(ci, "event_type").select(
        "event_type",
        "n",
        F.round("mean_val", 9).alias("mean_val"),
        F.round("ci_lo", 9).alias("ci_lo"),
        F.round("ci_hi", 9).alias("ci_hi"),
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


# --- C16+: LTTB-style downsampling -----------------------------------------

#: Time-bucket width for the downsample grid (seconds).
_LTTB_BUCKET_S = 6 * 3600


@register(
    "c16_lttb_downsample",
    # Largest-Triangle variant with CENTROID neighbors: classic LTTB walks
    # buckets sequentially (the chosen point of bucket b-1 anchors bucket
    # b's triangle), which serializes the series; anchoring on the
    # NEIGHBOR-BUCKET CENTROIDS instead keeps the visual property (pick
    # the point that deviates most from the local trend line) while making
    # every bucket independent — fully parallel, deterministic, and
    # bit-exact (identical expression trees; sums are exact longs, the
    # division and products are the same IEEE ops in both engines).
    oracle=f"""
    WITH pts AS (
        SELECT user_id, event_id,
               epoch_us(ts) // 1000000 AS x,
               CAST(round(value * 100, 0) AS BIGINT) AS y,
               (epoch_us(ts) // 1000000) // {_LTTB_BUCKET_S} AS bucket
        FROM events WHERE value IS NOT NULL),
    summ AS (
        SELECT user_id, bucket,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               CAST(count(*) AS BIGINT) AS n
        FROM pts GROUP BY user_id, bucket),
    nb AS (
        SELECT user_id, bucket,
               CAST(lag(sx) OVER w AS BIGINT) AS psx,
               CAST(lag(sy) OVER w AS BIGINT) AS psy,
               CAST(lag(n) OVER w AS BIGINT) AS pn,
               CAST(lead(sx) OVER w AS BIGINT) AS nsx,
               CAST(lead(sy) OVER w AS BIGINT) AS nsy,
               CAST(lead(n) OVER w AS BIGINT) AS nn,
               sx, sy, n
        FROM summ WINDOW w AS (PARTITION BY user_id ORDER BY bucket)),
    anch AS (
        SELECT user_id, bucket,
               CAST(coalesce(psx, sx) AS DOUBLE)
                   / CAST(coalesce(pn, n) AS DOUBLE) AS ax,
               CAST(coalesce(psy, sy) AS DOUBLE)
                   / CAST(coalesce(pn, n) AS DOUBLE) AS ay,
               CAST(coalesce(nsx, sx) AS DOUBLE)
                   / CAST(coalesce(nn, n) AS DOUBLE) AS bx,
               CAST(coalesce(nsy, sy) AS DOUBLE)
                   / CAST(coalesce(nn, n) AS DOUBLE) AS by
        FROM nb),
    scored AS (
        SELECT p.user_id, p.bucket, p.event_id, p.x, p.y,
               abs((ax - bx) * (CAST(p.y AS DOUBLE) - ay)
                   - (ax - CAST(p.x AS DOUBLE)) * (by - ay)) AS area,
               row_number() OVER (
                   PARTITION BY p.user_id, p.bucket
                   ORDER BY abs((ax - bx) * (CAST(p.y AS DOUBLE) - ay)
                       - (ax - CAST(p.x AS DOUBLE)) * (by - ay)) DESC,
                       p.event_id) AS rn
        FROM pts p JOIN anch a USING (user_id, bucket))
    SELECT user_id, CAST(bucket AS BIGINT) AS bucket, event_id,
           CAST(x AS BIGINT) AS x_sec,
           CAST(CAST(y AS DOUBLE) / 100 AS DOUBLE) AS value,
           CAST(round(area, 0) AS BIGINT) AS area
    FROM scored WHERE rn = 1
    """,
    doc="C16+: largest-triangle time-series downsampling (LTTB family) — "
    "per (user, 6 h bucket) keep the ONE point with the largest triangle "
    "area against the neighbor buckets' centroids: the standard "
    "dashboard/preview decimation that preserves spikes and inflections "
    "where averaging flattens them.  Classic LTTB anchors on the previous "
    "CHOSEN point, serializing each series; the centroid-anchored variant "
    "keeps the deviation-from-local-trend selection but every bucket "
    "scores independently — one groupBy for bucket sums, one lag/lead "
    "window over the |buckets|-sized summary, one join back, one "
    "partitioned rank.  Integer-second/cent inputs make the sums exact; "
    "the centroid divisions and area products are identical IEEE trees "
    "in both engines, with (area DESC, event_id) total tie-break.",
)
def c16_lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    # integral `div`, not floor(double /): double division can round up at
    # exact boundaries where DuckDB's integer // never does
    x = F.expr("unix_micros(cast(ts as timestamp)) div 1000000")
    pts = ev.select(
        "user_id",
        "event_id",
        x.alias("x"),
        F.round(F.col("value") * 100, 0).cast("long").alias("y"),
        F.expr(
            f"(unix_micros(cast(ts as timestamp)) div 1000000) div {_LTTB_BUCKET_S}"
        ).alias("bucket"),
    )
    summ = pts.groupBy("user_id", "bucket").agg(
        F.sum("x").alias("sx"), F.sum("y").alias("sy"), F.count("*").alias("n")
    )
    wb = Window.partitionBy("user_id").orderBy("bucket")
    nb = summ.select(
        "user_id",
        "bucket",
        F.lag("sx").over(wb).alias("psx"),
        F.lag("sy").over(wb).alias("psy"),
        F.lag("n").over(wb).alias("pn"),
        F.lead("sx").over(wb).alias("nsx"),
        F.lead("sy").over(wb).alias("nsy"),
        F.lead("n").over(wb).alias("nn"),
        "sx",
        "sy",
        "n",
    )
    anch = nb.select(
        "user_id",
        "bucket",
        (
            F.coalesce("psx", "sx").cast("double")
            / F.coalesce("pn", "n").cast("double")
        ).alias("ax"),
        (
            F.coalesce("psy", "sy").cast("double")
            / F.coalesce("pn", "n").cast("double")
        ).alias("ay"),
        (
            F.coalesce("nsx", "sx").cast("double")
            / F.coalesce("nn", "n").cast("double")
        ).alias("bx"),
        (
            F.coalesce("nsy", "sy").cast("double")
            / F.coalesce("nn", "n").cast("double")
        ).alias("by"),
    )
    area = F.abs(
        (F.col("ax") - F.col("bx")) * (F.col("y").cast("double") - F.col("ay"))
        - (F.col("ax") - F.col("x").cast("double"))
        * (F.col("by") - F.col("ay"))
    )
    wr = Window.partitionBy("user_id", "bucket").orderBy(
        area.desc(), "event_id"
    )
    scored = pts.join(anch, ["user_id", "bucket"]).select(
        "user_id",
        "bucket",
        "event_id",
        "x",
        "y",
        area.alias("area"),
        F.row_number().over(wr).alias("rn"),
    )
    return scored.filter(F.col("rn") == 1).select(
        "user_id",
        F.col("bucket").cast("long").alias("bucket"),
        "event_id",
        F.col("x").cast("long").alias("x_sec"),
        (F.col("y").cast("double") / 100).alias("value"),
        # area magnitudes reach ~1e9 (bucket-width seconds × cent deltas):
        # rounding THAT to 6 dp needs 16 significant digits, where the two
        # engines' round() differ in the last ulp — emit the integer-
        # rounded area instead (≤10 digits, exact in both; explicit round
        # before the cast because DuckDB's CAST rounds while Spark's
        # truncates).  The selection itself uses the UNROUNDED area.
        F.round("area", 0).cast("long").alias("area"),
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


# --- C2+: Tukey outlier fences ---------------------------------------------


@register(
    "c2_tukey_outliers",
    # Quartiles by rank selection (the c2_exact_percentiles machinery —
    # no arithmetic touches the selected values), then the classic
    # 1.5·IQR fences.  1.5 is exactly representable and the quartiles are
    # 2-decimal doubles, so fence arithmetic is identical IEEE ops in
    # both engines; the outlier comparison is exact.
    oracle="""
    WITH r AS (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type ORDER BY value)
                   AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM events WHERE value IS NOT NULL),
    q AS (
        SELECT event_type, CAST(max(n) AS BIGINT) AS n,
               max(CASE WHEN rn = CAST(ceil(0.25 * n) AS BIGINT)
                   THEN value END) AS q1,
               max(CASE WHEN rn = CAST(ceil(0.75 * n) AS BIGINT)
                   THEN value END) AS q3
        FROM r GROUP BY event_type),
    f AS (
        SELECT event_type, n, q1, q3,
               q1 - 1.5 * (q3 - q1) AS lo, q3 + 1.5 * (q3 - q1) AS hi
        FROM q)
    SELECT f.event_type, f.n, q1, q3, lo, hi,
           CAST(sum(CASE WHEN e.value < lo OR e.value > hi
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           round(CAST(sum(CASE WHEN e.value < lo OR e.value > hi
                    THEN 1 ELSE 0 END) AS DOUBLE) / f.n, 6) AS outlier_rate
    FROM f JOIN events e ON e.event_type = f.event_type
    WHERE e.value IS NOT NULL
    GROUP BY f.event_type, f.n, q1, q3, lo, hi
    """,
    doc="C2+: Tukey outlier fences per event type — exact quartiles by "
    "rank selection (the discrete inverse CDF, no interpolation "
    "arithmetic), 1.5·IQR fences, and the per-type outlier count/rate: "
    "the distribution-free anomaly screen that pairs with the "
    "z-score/MAD detectors (c16_rolling_zscore, c2_mad_outliers) for "
    "skewed metrics where mean±kσ misfires.  One partitioned ranking "
    "window, a broadcast 5-row fence join back to the scan, one "
    "map-combined count — two passes, no global sort.",
)
def c2_tukey_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = Window.partitionBy("event_type").orderBy("value")
    wn = Window.partitionBy("event_type")
    r = ev.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    q = r.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        F.max(
            F.when(
                F.col("rn") == F.ceil(F.lit(0.25) * F.col("n")).cast("long"),
                F.col("value"),
            )
        ).alias("q1"),
        F.max(
            F.when(
                F.col("rn") == F.ceil(F.lit(0.75) * F.col("n")).cast("long"),
                F.col("value"),
            )
        ).alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    f = q.select(
        "event_type",
        "n",
        "q1",
        "q3",
        (F.col("q1") - F.lit(1.5) * iqr).alias("lo"),
        (F.col("q3") + F.lit(1.5) * iqr).alias("hi"),
    )
    out = F.when(
        (F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi")), 1
    ).otherwise(0)
    return (
        ev.join(F.broadcast(f), "event_type")
        .groupBy("event_type", "n", "q1", "q3", "lo", "hi")
        .agg(
            F.sum(out).cast("long").alias("n_outliers"),
            F.round(
                F.sum(out).cast("double") / F.col("n").cast("double"), 6
            ).alias("outlier_rate"),
        )
    )


# --- C11+: cross-source vocabulary overlap ---------------------------------


@register(
    "c11_vocab_overlap",
    oracle="""
    WITH tok AS (
        SELECT DISTINCT source, unnest(string_split(lower(text), ' ')) AS term
        FROM documents),
    deg AS (SELECT source, CAST(count(*) AS BIGINT) AS vocab
            FROM tok GROUP BY source),
    pairs AS (
        SELECT a.source AS src_a, b.source AS src_b,
               CAST(count(*) AS BIGINT) AS n_common
        FROM tok a JOIN tok b ON a.term = b.term AND a.source < b.source
        GROUP BY a.source, b.source)
    SELECT src_a, src_b, n_common,
           da.vocab AS vocab_a, db.vocab AS vocab_b,
           round(CAST(n_common AS DOUBLE)
                 / CAST(da.vocab + db.vocab - n_common AS DOUBLE), 6)
               AS jaccard
    FROM pairs
    JOIN deg da ON da.source = src_a
    JOIN deg db ON db.source = src_b
    """,
    doc="C11+: pairwise source vocabulary overlap — Jaccard similarity of "
    "the distinct-term sets of every source pair: the corpus-level "
    "similarity matrix that flags mirrored/syndicated sources before "
    "doc-level near-dup even runs, and the redundancy input to mixture "
    "design (c14_domain_mixture).  Inverted-index pair generation per "
    "term (pairs bounded by C(sources,2) per term, NEVER doc-pairs); "
    "with thousands of sources the hub-term df-cut from "
    "common_neighbor_pairs applies — at 20 sources the exact full "
    "matrix is 190 rows.",
)
def c11_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logspout_kinesis_tests_spark.operators.text_analysis import words

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode(words("text")).alias("term")
    ).distinct()
    deg = tok.groupBy("source").agg(F.count("*").alias("vocab"))
    a = tok.select(F.col("source").alias("src_a"), "term")
    b = tok.select(F.col("source").alias("src_b"), "term")
    pairs = (
        a.join(b, "term")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count("*").alias("n_common"))
    )
    return (
        pairs.join(
            F.broadcast(deg.select(F.col("source").alias("src_a"),
                                   F.col("vocab").alias("vocab_a"))),
            "src_a",
        )
        .join(
            F.broadcast(deg.select(F.col("source").alias("src_b"),
                                   F.col("vocab").alias("vocab_b"))),
            "src_b",
        )
        .select(
            "src_a",
            "src_b",
            "n_common",
            "vocab_a",
            "vocab_b",
            F.round(
                F.col("n_common").cast("double")
                / (
                    F.col("vocab_a") + F.col("vocab_b") - F.col("n_common")
                ).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )


# --- C13+: grouped-aggregate pandas UDF ------------------------------------

#: Fraction trimmed from EACH end of the sorted group (10% trimmed mean).
_TRIM_FRAC = 0.1


@register(
    "c13_grouped_agg_trimmed_mean",
    # Rank-based replica of the UDF's sort-trim-mean: drop floor(0.1·n)
    # rows from each end of the per-type cent order, exact integer sum of
    # the kept cents, one double division.  Trimming by sorted POSITION is
    # well-defined under ties because only the (interchangeable) values
    # are summed, never the row identities.
    oracle=f"""
    WITH c AS (
        SELECT event_type,
               CAST(round(value * 100, 0) AS BIGINT) AS cents
        FROM events WHERE value IS NOT NULL),
    r AS (
        SELECT event_type, cents,
               row_number() OVER (
                   PARTITION BY event_type ORDER BY cents) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM c),
    kept AS (
        SELECT event_type, cents, n,
               CAST(floor({_TRIM_FRAC!r} * n) AS BIGINT) AS k
        FROM r WHERE rn > CAST(floor({_TRIM_FRAC!r} * n) AS BIGINT)
             AND rn <= n - CAST(floor({_TRIM_FRAC!r} * n) AS BIGINT))
    SELECT event_type, CAST(max(n) AS BIGINT) AS n,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(CAST(sum(cents) AS BIGINT) AS DOUBLE)
               / CAST(count(*) * 100 AS DOUBLE) AS trimmed_mean
    FROM kept GROUP BY event_type
    """,
    doc="C13+: 10% trimmed mean per event type via a GROUPED_AGG pandas "
    "UDF — the third Arrow UDF shape (after scalar pandas_udf and "
    "mapInPandas): the executor receives each group's column as ONE "
    "pandas Series inside groupBy().agg(), the robust-statistics pattern "
    "for custom reducers no builtin expresses.  The UDF sorts, trims "
    "floor(0.1·n) from each end, and sums exact integer cents (numpy "
    "int64 — order-independent, so the arbitrary Arrow partition order "
    "cannot drift the result), closing with one double division that "
    "hash-matches the rank-based DuckDB replay.  Shuffle is the normal "
    "hash-partition on the group key; each group materializes once.",
)
def c13_grouped_agg_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    import pandas as pd
    from pyspark.sql.functions import PandasUDFType, pandas_udf
    from pyspark.sql.types import DoubleType

    # explicit functionType: `from __future__ import annotations` turns the
    # signature into strings, which pandas_udf's inference rejects
    @pandas_udf(DoubleType(), PandasUDFType.GROUPED_AGG)
    def trimmed_mean_cents(cents: pd.Series) -> float:
        vals = cents.sort_values().to_numpy()
        k = math.floor(_TRIM_FRAC * len(vals))
        kept = vals[k : len(vals) - k]
        return float(int(kept.sum()) / (len(kept) * 100))

    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    c = ev.select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    # a GROUPED_AGG pandas UDF cannot share one agg() with JVM aggregates
    # (INVALID_PANDAS_UDF_PLACEMENT) — split and broadcast-join the 5-row
    # count table back
    n = F.count("*")
    k = F.floor(F.lit(_TRIM_FRAC) * n).cast("long")
    counts = c.groupBy("event_type").agg(
        n.cast("long").alias("n"),
        (n - F.lit(2) * k).cast("long").alias("n_kept"),
    )
    means = c.groupBy("event_type").agg(
        trimmed_mean_cents("cents").alias("trimmed_mean")
    )
    return counts.join(F.broadcast(means), "event_type").select(
        "event_type", "n", "n_kept", "trimmed_mean"
    )


# --- C5+: last-touch attribution -------------------------------------------

_ATTR_TOUCHES = ("click", "view")


@register(
    "c5_attribution",
    oracle=f"""
    WITH touched AS (
        SELECT user_id, event_type, value,
               last_value(CASE WHEN event_type IN {_ATTR_TOUCHES!r}
                          THEN event_type END IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS touch
        FROM events)
    SELECT coalesce(touch, 'none') AS touch,
           CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
               AS attributed_value
    FROM touched
    WHERE event_type = 'purchase'
    GROUP BY touch
    """,
    doc="C5+: last-touch attribution — every purchase credited to the most "
    "recent PRIOR click/view in the user's event stream (the marketing "
    "attribution primitive; 'none' buckets purchases with no preceding "
    "touch).  Exercises the IGNORE-NULLS last_value window frame — a "
    "carry-forward that gap-fill (c16_gap_fill) uses on time grids, here "
    "on raw event order.  One shuffle on user_id, O(1) window state, "
    "exact decimal value sums; three-row result from any corpus size.",
)
def c5_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col("event_type").isin(*_ATTR_TOUCHES), F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    return (
        ev.withColumn("touch", touch)
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("touch", F.lit("none")).alias("touch"))
        .agg(
            F.count("*").alias("n_purchases"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("attributed_value"),
        )
    )


# --- C2+: Cramér's V association strength ----------------------------------


@register(
    "c2_cramers_v",
    # χ² over the (event_type × ISO weekday) contingency table, then
    # V = sqrt(χ² / (n · min(r−1, c−1))).  Per-cell (o−e)²/e terms are
    # DECIMAL(28,9)-quantized (the c2_chi_squared policy) so the cell sum
    # is exact and order-independent; the closing sqrt is one double op.
    oracle="""
    WITH cells AS (
        SELECT event_type AS r, isodow(ts) AS c, CAST(count(*) AS BIGINT) AS o
        FROM events GROUP BY 1, 2),
    tots AS (
        SELECT CAST(sum(o) AS BIGINT) AS n,
               CAST(count(DISTINCT r) AS BIGINT) AS nr,
               CAST(count(DISTINCT c) AS BIGINT) AS nc
        FROM cells),
    rt AS (SELECT r, CAST(sum(o) AS BIGINT) AS row_t FROM cells GROUP BY r),
    ct AS (SELECT c, CAST(sum(o) AS BIGINT) AS col_t FROM cells GROUP BY c),
    terms AS (
        SELECT CAST(round(
            (CAST(o AS DOUBLE)
             - CAST(row_t AS DOUBLE) * CAST(col_t AS DOUBLE)
               / CAST(n AS DOUBLE))
            * (CAST(o AS DOUBLE)
               - CAST(row_t AS DOUBLE) * CAST(col_t AS DOUBLE)
                 / CAST(n AS DOUBLE))
            / (CAST(row_t AS DOUBLE) * CAST(col_t AS DOUBLE)
               / CAST(n AS DOUBLE)), 9) AS DECIMAL(28,9)) AS t
        FROM cells JOIN rt USING (r) JOIN ct USING (c) CROSS JOIN tots),
    chi AS (SELECT CAST(sum(t) AS DOUBLE) AS chi2 FROM terms)
    SELECT n, nr AS n_rows_cat, nc AS n_cols_cat,
           round(chi2, 6) AS chi2,
           round(sqrt(chi2 / (CAST(n AS DOUBLE)
                 * CAST(least(nr - 1, nc - 1) AS DOUBLE))), 9) AS cramers_v
    FROM chi, tots
    """,
    doc="C2+: Cramér's V for event-type × ISO-weekday association — the "
    "normalized effect size the raw χ² (c2_chi_squared) lacks: 0 = "
    "independent, 1 = fully determined, comparable across table shapes.  "
    "One map-combined scan to the r×c cell table, broadcast row/column "
    "margins, decimal-quantized per-cell terms (exact, order-independent "
    "sum), closing normalization written identically in both engines.",
)
def c2_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        F.col("event_type").alias("r"),
        F.expr("extract(dayofweek_iso from ts)").cast("long").alias("c"),
    ).agg(F.count("*").alias("o"))
    tots = cells.agg(
        F.sum("o").alias("n"),
        F.countDistinct("r").alias("nr"),
        F.countDistinct("c").alias("nc"),
    )
    rt = cells.groupBy("r").agg(F.sum("o").alias("row_t"))
    ct = cells.groupBy("c").agg(F.sum("o").alias("col_t"))
    e = (
        F.col("row_t").cast("double")
        * F.col("col_t").cast("double")
        / F.col("n").cast("double")
    )
    term = F.round(
        (F.col("o").cast("double") - e) * (F.col("o").cast("double") - e) / e,
        9,
    ).cast("decimal(28,9)")
    chi = (
        cells.join(F.broadcast(rt), "r")
        .join(F.broadcast(ct), "c")
        .crossJoin(F.broadcast(tots))
        .agg(F.sum(term).cast("double").alias("chi2"))
    )
    v = F.sqrt(
        F.col("chi2")
        / (
            F.col("n").cast("double")
            * F.least(F.col("nr") - 1, F.col("nc") - 1).cast("double")
        )
    )
    return chi.crossJoin(F.broadcast(tots)).select(
        "n",
        F.col("nr").alias("n_rows_cat"),
        F.col("nc").alias("n_cols_cat"),
        F.round("chi2", 6).alias("chi2"),
        F.round(v, 9).alias("cramers_v"),
    )


# --- C19+: clustering depth of the layout ----------------------------------


@register(
    "c19_clustering_depth",
    # Sweep-line max overlap of the per-file [zmin, zmax] zone-map
    # intervals per month: +1 at each interval start, −1 after its end,
    # running sum over the boundary order, max = how many files a point
    # lookup must read.  All integer arithmetic; the window runs over the
    # 2·|files| boundary table, never rows.
    oracle="""
    WITH manifest AS (
        SELECT strftime(date_trunc('month', l_shipdate), '%Y-%m-%d')
                   AS part_month,
               strftime(l_shipdate, '%Y-%m-%d') AS file_day,
               CAST(min(l_partkey) AS BIGINT) AS zmin,
               CAST(max(l_partkey) AS BIGINT) AS zmax
        FROM lineitem GROUP BY 1, 2),
    bounds AS (
        -- ends (at zmax+1) carry kind 0 so they sort BEFORE starts at the
        -- same position: an interval ending at zmax is not active at
        -- zmax+1, so its -1 must land before any +1 opening there
        SELECT part_month, zmin AS pos, 1 AS delta, 1 AS kind FROM manifest
        UNION ALL
        SELECT part_month, zmax + 1, -1, 0 FROM manifest),
    swept AS (
        SELECT part_month,
               CAST(sum(delta) OVER (
                   PARTITION BY part_month ORDER BY pos, kind
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS depth
        FROM bounds)
    SELECT part_month,
           CAST((SELECT count(*) FROM manifest m
                 WHERE m.part_month = s.part_month) AS BIGINT) AS n_files,
           CAST(max(depth) AS BIGINT) AS max_depth
    FROM swept s GROUP BY part_month
    """,
    doc="C19+: clustering depth of the layout's zone maps — per month, the "
    "maximum number of per-day files whose [min,max] l_partkey intervals "
    "overlap at any point: exactly how many files a point lookup must "
    "read, the metric lakehouse table services expose to decide when to "
    "re-cluster (depth 1 = perfectly clustered; ≈ n_files = unclustered). "
    "Parallel sweep-line over the 2·|files| boundary table (+1 at starts, "
    "−1 past ends, running-sum max) — the c15_interval_coverage machinery "
    "pointed at the file manifest; companion to c19_pruning_stats, which "
    "measures one predicate while this bounds ALL of them.",
)
def c19_clustering_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    manifest = li.groupBy(
        F.date_format(F.date_trunc("month", "l_shipdate"), "yyyy-MM-dd").alias(
            "part_month"
        ),
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("file_day"),
    ).agg(
        F.min("l_partkey").cast("long").alias("zmin"),
        F.max("l_partkey").cast("long").alias("zmax"),
    )
    # ends sort before starts at equal pos (kind 0 < 1): an interval
    # ending at zmax is not active at zmax+1
    starts = manifest.select(
        "part_month",
        F.col("zmin").alias("pos"),
        F.lit(1).alias("delta"),
        F.lit(1).alias("kind"),
    )
    ends = manifest.select(
        "part_month",
        (F.col("zmax") + 1).alias("pos"),
        F.lit(-1).alias("delta"),
        F.lit(0).alias("kind"),
    )
    w = (
        Window.partitionBy("part_month")
        .orderBy("pos", "kind")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    swept = starts.unionAll(ends).select(
        "part_month", F.sum("delta").over(w).alias("depth")
    )
    n_files = manifest.groupBy("part_month").agg(
        F.count("*").alias("n_files")
    )
    return (
        swept.groupBy("part_month")
        .agg(F.max("depth").cast("long").alias("max_depth"))
        .join(F.broadcast(n_files), "part_month")
        .select("part_month", "n_files", "max_depth")
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
