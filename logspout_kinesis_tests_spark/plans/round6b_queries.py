"""Round-6 breadth additions: robust regression (Theil–Sen), information
theory (mutual information), classical decomposition (trend + seasonal
indices), and robust filtering (Hampel) — four statistics-adjacent
operators a curation pipeline reaches for when means and OLS are too
fragile, each hash-verifiable end-to-end.

Portability recipes reused from the established families:
- element SELECTION instead of float arithmetic wherever a median is
  needed (the c5_rolling_median rule — no arithmetic touches the values,
  so parity is exact by construction);
- per-term double expressions with IDENTICAL trees in both engines,
  quantized to DECIMAL before any order-dependent sum (the
  c11_kl_divergence rule);
- integer-only comparisons for threshold tests (the Hampel 3·1.4826·MAD
  fence is ×10000 an exact integer, so the outlier predicate never
  touches a float).

Registered after round6_queries (see plans/__init__) so the rotation's
unseen-frontier group picks these up first next verify.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from logspout_kinesis_tests_spark.plans.registry import register
from logspout_kinesis_tests_spark.sources.tables import load_table

# --- C2+: Theil–Sen robust slope ---------------------------------------------


def _theil_sen(spark: SparkSession, sf_dir: str, keys: list[str]) -> DataFrame:
    """Disjoint rank-pairing Theil-Sen over integer cents, partitioned on
    ``keys`` — shared by the per-type and per-entity variants (identical
    arithmetic; only the partition axis differs)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    base = ev.select(
        *keys,
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        "event_id",
    )
    w = Window.partitionBy(*keys).orderBy("us", "event_id")
    r = base.select("*", F.row_number().over(w).alias("rn"))
    m = r.groupBy(*keys).agg((F.count("*") / 2).cast("long").alias("m"))
    # the per-type m table is 5 rows (broadcast); the per-entity one scales
    # with users — broadcast only when the key set is the bounded one
    m_side = F.broadcast(m) if keys == ["event_type"] else m
    a = (
        r.join(m_side, keys)
        .filter(F.col("rn") <= F.col("m"))
        .select(
            *keys,
            F.col("rn").alias("i"),
            F.col("us").alias("us1"),
            F.col("cents").alias("c1"),
            (F.col("rn") + F.col("m")).alias("rn2"),
        )
    )
    b = r.select(
        *keys,
        F.col("rn").alias("rn2"),
        F.col("us").alias("us2"),
        F.col("cents").alias("c2"),
    )
    pairs = a.join(b, keys + ["rn2"]).filter(F.col("us2") != F.col("us1"))
    slope = (F.col("c2") - F.col("c1")).cast("double") / (
        F.col("us2") - F.col("us1")
    ).cast("double")
    p = pairs.select(*keys, "i", slope.alias("slope"))
    ws = Window.partitionBy(*keys).orderBy("slope", "i")
    wn = Window.partitionBy(*keys)
    k = p.select(
        *keys,
        "slope",
        F.row_number().over(ws).alias("rs"),
        F.count("*").over(wn).alias("n_pairs"),
    )
    return k.filter(
        F.col("rs") == F.floor((F.col("n_pairs") + F.lit(1)) / F.lit(2))
    ).select(
        *keys,
        "n_pairs",
        F.round(F.col("slope") * F.lit(36000000.0), 6).alias("slope_per_hour"),
    )




@register(
    "c2_theil_sen",
    # Disjoint-pairs Theil–Sen (the Hodges–Lehmann pairing): rank the
    # per-type series by (time, event_id), pair rank i with rank i+m
    # (m = n//2), take the LOWER MEDIAN of the pair slopes by rank
    # selection with an (slope, i) tie-break.  Each slope is one exact-int
    # division (cents / microseconds) — bit-identical across engines — and
    # the median is pure selection, so the only rounding is the final
    # readability round of the selected value.
    oracle="""
    WITH base AS (
        SELECT event_type, epoch_us(ts) AS us,
               CAST(round(value * 100, 0) AS BIGINT) AS cents, event_id
        FROM events WHERE value IS NOT NULL),
    r AS (
        SELECT *, row_number() OVER (
                   PARTITION BY event_type ORDER BY us, event_id) AS rn
        FROM base),
    c AS (SELECT event_type, count(*) // 2 AS m FROM r GROUP BY event_type),
    p AS (
        SELECT a.event_type, a.rn AS i,
               CAST(b.cents - a.cents AS DOUBLE)
                   / CAST(b.us - a.us AS DOUBLE) AS slope
        FROM r a
        JOIN c USING (event_type)
        JOIN r b ON b.event_type = a.event_type AND b.rn = a.rn + m
        WHERE a.rn <= m AND b.us <> a.us),
    k AS (
        SELECT event_type, slope,
               row_number() OVER (
                   PARTITION BY event_type ORDER BY slope, i) AS rs,
               count(*) OVER (PARTITION BY event_type) AS n_pairs
        FROM p)
    SELECT event_type, n_pairs,
           round(slope * 36000000.0, 6) AS slope_per_hour
    FROM k WHERE rs = (n_pairs + 1) // 2
    """,
    doc="C2+: Theil–Sen robust trend slope per event type — the "
    "median-of-pair-slopes estimator that shrugs off the outliers OLS "
    "(c2_ols_trend) chases.  The O(n²) all-pairs form is replaced by the "
    "disjoint rank-pairing variant (rank i with rank i+n/2): n/2 slopes, "
    "one rank window + one self-equi-join on (type, rank) + one selection "
    "window — three shuffles on bounded keys, no pair explosion, so the "
    "plan is linear in rows at any scale.  Same per-TYPE global-sort "
    "caveat as c16_acf (5 series by design); the per-entity variant is "
    "the 100 TB default (c16_acf_by_user precedent).",
)
def c2_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _theil_sen(spark, sf_dir, ["event_type"])


# --- C2+: mutual information -------------------------------------------------


@register(
    "c2_mutual_information",
    # MI(lang; source) over documents plus both marginal entropies and the
    # normalized MI.  Every per-cell/per-margin contribution is ONE double
    # expression with an identical tree in both engines, quantized to
    # DECIMAL(28,12) so the totals are exact order-independent sums (the
    # c11_kl_divergence recipe); the final NMI division is guarded for the
    # zero-entropy degenerate corpus.
    oracle="""
    WITH n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
    cells AS (
        SELECT lang, source, CAST(count(*) AS DOUBLE) AS cxy
        FROM documents GROUP BY lang, source),
    cx AS (SELECT lang, CAST(count(*) AS DOUBLE) AS cx
           FROM documents GROUP BY lang),
    cy AS (SELECT source, CAST(count(*) AS DOUBLE) AS cy
           FROM documents GROUP BY source),
    mi AS (
        SELECT CAST(sum(CAST(round(
                   (cxy / n) * ln(cxy * n / (cx * cy)), 12)
               AS DECIMAL(28,12))) AS DOUBLE) AS mi_nats
        FROM cells JOIN cx USING (lang) JOIN cy USING (source), n),
    hx AS (
        SELECT CAST(sum(CAST(round(-(cx / n) * ln(cx / n), 12)
               AS DECIMAL(28,12))) AS DOUBLE) AS h_lang
        FROM cx, n),
    hy AS (
        SELECT CAST(sum(CAST(round(-(cy / n) * ln(cy / n), 12)
               AS DECIMAL(28,12))) AS DOUBLE) AS h_source
        FROM cy, n)
    SELECT CAST(n AS BIGINT) AS n_docs, mi_nats, h_lang, h_source,
           CASE WHEN h_lang * h_source <= 0 THEN NULL
                ELSE round(mi_nats / sqrt(h_lang * h_source), 9)
           END AS nmi
    FROM mi, hx, hy, n
    """,
    doc="C2+: mutual information between the lang and source columns — the "
    "information-theoretic dependence measure beside the chi²/Cramér's-V "
    "pair (MI sees any dependence, not just linear).  One scan to the "
    "r×c cell table, broadcast margins and total, decimal-quantized "
    "per-cell terms; the result is four scalars, so every join after the "
    "cell aggregation is a broadcast of a handful of rows — scale-free.",
)
def c2_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_df = docs.agg(F.count("*").cast("double").alias("n"))
    cells = docs.groupBy("lang", "source").agg(
        F.count("*").cast("double").alias("cxy")
    )
    cx = docs.groupBy("lang").agg(F.count("*").cast("double").alias("cx"))
    cy = docs.groupBy("source").agg(F.count("*").cast("double").alias("cy"))

    def dec12(col):
        return F.round(col, 12).cast("decimal(28,12)")

    joined = (
        cells.join(F.broadcast(cx), "lang")
        .join(F.broadcast(cy), "source")
        .crossJoin(F.broadcast(n_df))
    )
    mi = joined.agg(
        F.sum(
            dec12(
                (F.col("cxy") / F.col("n"))
                * F.log(F.col("cxy") * F.col("n") / (F.col("cx") * F.col("cy")))
            )
        )
        .cast("double")
        .alias("mi_nats")
    )
    hx = cx.crossJoin(F.broadcast(n_df)).agg(
        F.sum(dec12(-(F.col("cx") / F.col("n")) * F.log(F.col("cx") / F.col("n"))))
        .cast("double")
        .alias("h_lang")
    )
    hy = cy.crossJoin(F.broadcast(n_df)).agg(
        F.sum(dec12(-(F.col("cy") / F.col("n")) * F.log(F.col("cy") / F.col("n"))))
        .cast("double")
        .alias("h_source")
    )
    out = (
        mi.crossJoin(F.broadcast(hx))
        .crossJoin(F.broadcast(hy))
        .crossJoin(F.broadcast(n_df))
    )
    hprod = F.col("h_lang") * F.col("h_source")
    return out.select(
        F.col("n").cast("long").alias("n_docs"),
        "mi_nats",
        "h_lang",
        "h_source",
        F.when(hprod <= F.lit(0.0), F.lit(None).cast("double"))
        .otherwise(F.round(F.col("mi_nats") / F.sqrt(hprod), 9))
        .alias("nmi"),
    )


# --- C16+: classical seasonal decomposition ----------------------------------

#: Centered moving-average span (hours of trend window, odd so the frame
#: is symmetric without the even-period half-weight endpoints).
_SD_SPAN = 23
_SD_HALF = _SD_SPAN // 2


def _detrended_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, hb, hod, detr DECIMAL(18,6)) — the hourly bucket means
    detrended by the centered 23-bucket moving average (full frames only).
    Shared by the seasonal-index and residual-anomaly queries."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    b = (
        ev.select(
            "event_type",
            us.alias("us"),
            F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        )
        # exact integer FLOOR division (`div`), matching the oracles'
        # epoch_us(ts) // 3600000000 — double division + cast('long')
        # truncates toward zero and lands pre-1970 (negative-µs)
        # timestamps one bucket high
        .select(
            "event_type",
            F.expr("us div 3600000000").alias("hb"),
            "cents",
        )
        .groupBy("event_type", "hb")
        .agg(
            (
                F.sum("cents").cast("double") / (F.lit(100) * F.count("*"))
            ).alias("bm")
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hb")
        .rowsBetween(-_SD_HALF, _SD_HALF)
    )
    bmq = F.round(F.col("bm"), 6).cast("decimal(18,6)")
    t = b.select(
        "event_type",
        "hb",
        "bm",
        F.when(
            F.count("*").over(w) == F.lit(_SD_SPAN),
            F.sum(bmq).over(w).cast("double") / F.lit(_SD_SPAN),
        ).alias("trend"),
    )
    return t.filter(F.col("trend").isNotNull()).select(
        "event_type",
        "hb",
        (F.col("hb") % 24).alias("hod"),
        F.round(F.col("bm") - F.col("trend"), 6)
        .cast("decimal(18,6)")
        .alias("detr"),
    )


@register(
    "c16_seasonal_decompose",
    # Classical additive decomposition on the hourly per-type series:
    # trend = centered 23-bucket moving average (full frames only),
    # detrended = mean − trend, seasonal index = per-(type, hour-of-day)
    # mean of the detrended series.  Bucket means and detrended values are
    # quantized to DECIMAL(18,6) before the window/group sums, so every
    # order-dependent total is exact; hour buckets are integer epoch-hour
    # indices (hod = hour_index % 24), timezone-free on both engines.
    oracle=f"""
    WITH b AS (
        SELECT event_type, epoch_us(ts) // 3600000000 AS hb,
               CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE)
                   / (100 * count(*)) AS bm
        FROM events WHERE value IS NOT NULL
        GROUP BY event_type, epoch_us(ts) // 3600000000),
    t AS (
        SELECT event_type, hb, bm,
               CASE WHEN count(*) OVER w = {_SD_SPAN}
                    THEN CAST(sum(CAST(round(bm, 6) AS DECIMAL(18,6)))
                              OVER w AS DOUBLE) / {_SD_SPAN} END AS trend
        FROM b
        WINDOW w AS (PARTITION BY event_type ORDER BY hb
                     ROWS BETWEEN {_SD_HALF} PRECEDING
                              AND {_SD_HALF} FOLLOWING)),
    d AS (
        SELECT event_type, hb % 24 AS hod,
               CAST(round(bm - trend, 6) AS DECIMAL(18,6)) AS detr
        FROM t WHERE trend IS NOT NULL)
    SELECT event_type, hod, count(*) AS n_buckets,
           round(CAST(sum(detr) AS DOUBLE) / count(*), 6) AS seasonal
    FROM d GROUP BY event_type, hod
    """,
    doc="C16+: classical additive seasonal decomposition (trend via "
    "centered moving average, seasonal indices per hour-of-day) — the "
    "interpretable sibling of c16_holt_smoothing's recursive smoothing "
    "and the input c16_seasonal_naive_mae's forecast presumes.  Shapes: "
    "one map-combined hourly rollup (grain cut before any window), one "
    "bounded ROWS window per type, one final small aggregate.  The "
    "window sorts the 5 per-type HOURLY series — thousands of buckets, "
    "not raw rows, so the per-type sort the raw-row queries worry about "
    "is immaterial here.",
)
def c16_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _detrended_hourly(spark, sf_dir)
    return d.groupBy("event_type", "hod").agg(
        F.count("*").alias("n_buckets"),
        F.round(F.sum("detr").cast("double") / F.count("*"), 6).alias(
            "seasonal"
        ),
    )


# --- C16+: Hampel outlier filter ---------------------------------------------

#: Taps on each side of the centered Hampel window (7-tap total).
_HAMPEL_K = 3
#: 3 · 1.4826 (the Gaussian MAD consistency constant) × 10⁴, exact integer —
#: the fence comparison |x − med|·10⁴ > 44478·MAD never touches a float.
_HAMPEL_FENCE_E4 = 44478


@register(
    "c16_hampel",
    # Centered 7-tap rolling median + rolling MAD per user, outliers where
    # |x − med| > 3·1.4826·MAD.  Medians are lower-median ELEMENT SELECTION
    # from sorted integer-cent arrays (no float arithmetic at all), and the
    # fence is an exact integer comparison, so parity is exact by
    # construction.  MAD = 0 (flat window) flags ANY deviation — the
    # standard Hampel degenerate case, identical in both engines.
    oracle=f"""
    WITH base AS (
        SELECT user_id, event_id,
               CAST(round(value * 100, 0) AS BIGINT) AS cents,
               epoch_us(ts) AS us
        FROM events WHERE value IS NOT NULL),
    taps AS (
        SELECT user_id, event_id, cents,
               list_filter([{", ".join(
                   f"lag(cents, {d}) OVER w" for d in range(_HAMPEL_K, 0, -1)
               )}, cents, {", ".join(
                   f"lead(cents, {d}) OVER w" for d in range(1, _HAMPEL_K + 1)
               )}], x -> x IS NOT NULL) AS vs
        FROM base
        WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
    med AS (
        SELECT user_id, event_id, cents,
               list_sort(vs)[CAST((len(vs) + 1) // 2 AS INT)] AS med, vs
        FROM taps),
    mad AS (
        SELECT user_id, event_id, cents, med,
               list_sort(list_transform(vs, x -> abs(x - med)))
                   [CAST((len(vs) + 1) // 2 AS INT)] AS mad
        FROM med)
    SELECT user_id, event_id, cents, med, mad
    FROM mad
    WHERE abs(cents - med) * 10000 > {_HAMPEL_FENCE_E4} * mad
    """,
    doc="C16+: Hampel outlier filter — the robust despiking standard for "
    "sensor/metric streams (a point is an outlier when it sits more than "
    "3·1.4826·MAD from the rolling median; unlike c16_rolling_zscore the "
    "fence itself is outlier-proof).  Per-user bounded 7-tap frames: one "
    "shuffle on user_id, O(k log k) per row with k constant; emits only "
    "the flagged rows, so output is sparse at any scale.",
)
def c16_hampel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    base = ev.select(
        "user_id",
        "event_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    vs = F.filter(
        F.array(
            *[F.lag("cents", d).over(w) for d in range(_HAMPEL_K, 0, -1)],
            F.col("cents"),
            *[F.lead("cents", d).over(w) for d in range(1, _HAMPEL_K + 1)],
        ),
        lambda x: x.isNotNull(),
    )
    taps = base.select("user_id", "event_id", "cents", vs.alias("vs"))
    lower_median_idx = F.floor((F.size("vs") + F.lit(1)) / F.lit(2)).cast(
        "int"
    )
    med = taps.select(
        "user_id",
        "event_id",
        "cents",
        "vs",
        F.element_at(F.array_sort("vs"), lower_median_idx).alias("med"),
    )
    devs = F.array_sort(
        F.transform(F.col("vs"), lambda x: F.abs(x - F.col("med")))
    )
    mad = med.select(
        "user_id",
        "event_id",
        "cents",
        "med",
        F.element_at(devs, lower_median_idx).alias("mad"),
    )
    return mad.filter(
        F.abs(F.col("cents") - F.col("med")) * F.lit(10000)
        > F.lit(_HAMPEL_FENCE_E4) * F.col("mad")
    )


# --- C17+: bounded k-core peel -----------------------------------------------

#: Core order and peel rounds.  8 rounds converge on the test graphs
#: (verified in tests/test_round6b); the registered semantics is the
#: BOUNDED peel — engine-identical whether or not it has converged.
_KCORE_K = 3
_KCORE_ROUNDS = 8
#: Edge sparsifier: only HIGH-QUANTITY trades (l_quantity is uniform on
#: 1..50, so >= 45 keeps ~12% of lineitems).  The full bipartite projection
#: is so dense that no node falls under ANY small k — the peel needs a
#: meaningful relationship graph, and "repeat high-volume trades" is the
#: semantically interesting one (median degree 4-5 with ~20% of nodes
#: below k=3 at every test SF).
_KCORE_MIN_QTY = 45


def _kcore_oracle() -> str:
    """Unrolled peel: one (degree + keep + filtered-edges) CTE triple per
    round — same unrolling trick as the PageRank oracle
    (plans/graph_queries.py:20); pure integer counts, nothing to quantize.
    Every e{r} is AS MATERIALIZED: each round references the previous edge
    table TWICE (degrees + the filter), so DuckDB's default CTE inlining
    would expand the chain 2^rounds-fold (observed as a too-many-open-files
    parquet re-scan blowup at 8 rounds)."""
    head = f"""
    WITH trade AS MATERIALIZED (
        SELECT DISTINCT o_custkey AS c, l_suppkey AS s
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        WHERE l_quantity >= {_KCORE_MIN_QTY}),
    e0 AS MATERIALIZED (
        SELECT c * 2 AS src, s * 2 + 1 AS dst FROM trade
        UNION ALL
        SELECT s * 2 + 1, c * 2 FROM trade)"""
    blocks = []
    for r in range(1, _KCORE_ROUNDS + 1):
        blocks.append(f"""
    d{r} AS (SELECT src, count(*) AS deg FROM e{r - 1} GROUP BY src),
    k{r} AS MATERIALIZED (SELECT src FROM d{r} WHERE deg >= {_KCORE_K}),
    e{r} AS MATERIALIZED (
        SELECT e.src, e.dst FROM e{r - 1} e
        JOIN k{r} a ON a.src = e.src
        JOIN k{r} b ON b.src = e.dst)""")
    return (
        head
        + ","
        + ",".join(blocks)
        + f"""
    SELECT CASE WHEN src % 2 = 0 THEN 'c' || CAST(src // 2 AS VARCHAR)
                ELSE 's' || CAST((src - 1) // 2 AS VARCHAR) END AS node,
           count(*) AS degree
    FROM e{_KCORE_ROUNDS} GROUP BY src
    """
    )


@register(
    "c17_kcore",
    oracle=_kcore_oracle(),
    doc="C17+: bounded 3-core peel (8 rounds) over the customer–supplier "
    "trade graph — the density filter that separates the well-embedded "
    "trading core from peripheral one-off relationships (in corpus "
    "curation: the entities worth trusting as dedup/authority anchors).  "
    "Each round is one map-side-combined degree count + two semi-joins, "
    "with a per-round localCheckpoint lineage cut exactly like the CC "
    "fixpoint (the round's edge table is read twice: degrees and the "
    "filter).  All arithmetic is integer counts — nothing to quantize — "
    "so the bounded peel hash-matches an unrolled-CTE DuckDB replay "
    "regardless of convergence; on this graph the peel IS converged "
    "(round 8 == round 7, pinned in tests/test_round6b).",
)
def c17_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity") >= _KCORE_MIN_QTY
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
    for _ in range(_KCORE_ROUNDS):
        keep = (
            e.groupBy("src")
            .agg(F.count("*").alias("deg"))
            .filter(F.col("deg") >= _KCORE_K)
            .select("src")
        )
        e = (
            e.join(keep, "src")
            .join(keep.select(F.col("src").alias("dst")), "dst")
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
    node = F.when(
        F.col("src") % 2 == 0,
        F.concat(F.lit("c"), (F.col("src") / 2).cast("long").cast("string")),
    ).otherwise(
        F.concat(
            F.lit("s"), ((F.col("src") - 1) / 2).cast("long").cast("string")
        )
    )
    return (
        e.groupBy("src")
        .agg(F.count("*").alias("degree"))
        .select(node.alias("node"), "degree")
    )


# --- C17+: partition modularity ----------------------------------------------


@register(
    "c17_modularity",
    # Newman modularity of the NATION partition over the undirected
    # customer–supplier trade graph: per community c,
    # contribution = e_c/m − (D_c/(2m))².  e_c (intra edges), D_c (degree
    # mass) and m are exact integers; the two divisions and the square are
    # one double expression with an identical tree in both engines, and the
    # final readability round is the only rounding.
    oracle="""
    WITH trade AS (
        SELECT DISTINCT o_custkey AS c, l_suppkey AS s
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
    lab AS (
        SELECT t.c, t.s, cu.c_nationkey AS cn, su.s_nationkey AS sn
        FROM trade t
        JOIN customer cu ON cu.c_custkey = t.c
        JOIN supplier su ON su.s_suppkey = t.s),
    m AS (SELECT CAST(count(*) AS DOUBLE) AS m FROM lab),
    intra AS (
        SELECT cn AS nationkey, count(*) AS intra_edges
        FROM lab WHERE cn = sn GROUP BY cn),
    degs AS (
        -- CAST: DuckDB sum(BIGINT) widens to int128, Spark stays int64
        SELECT nationkey, CAST(sum(deg) AS BIGINT) AS deg_sum FROM (
            SELECT cn AS nationkey, count(*) AS deg FROM lab GROUP BY cn
            UNION ALL
            SELECT sn, count(*) FROM lab GROUP BY sn)
        GROUP BY nationkey)
    SELECT d.nationkey, COALESCE(i.intra_edges, 0) AS intra_edges,
           d.deg_sum,
           round(CAST(COALESCE(i.intra_edges, 0) AS DOUBLE) / m
                 - (CAST(d.deg_sum AS DOUBLE) / (2 * m))
                   * (CAST(d.deg_sum AS DOUBLE) / (2 * m)), 12)
               AS contribution
    FROM degs d LEFT JOIN intra i USING (nationkey), m
    """,
    doc="C17+: Newman modularity contributions of the nation partition "
    "over the customer–supplier trade graph — the community-quality "
    "score (Q = Σ_c e_c/m − (D_c/2m)²) that tells a curation pipeline "
    "whether a proposed grouping (here: nations; in production: dedup "
    "clusters, source families) actually concentrates edges.  One scan "
    "to the labeled edge table via two broadcast dimension joins, then "
    "two map-side-combined counts — no iteration, no windows; the "
    "per-community result is ≤|nations| rows at any scale.",
)
def c17_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    trade = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select("o_custkey", "l_suppkey")
        .distinct()
    )
    lab = (
        trade.join(
            F.broadcast(cust), trade["o_custkey"] == cust["c_custkey"]
        )
        .join(F.broadcast(supp), trade["l_suppkey"] == supp["s_suppkey"])
        .select(
            F.col("c_nationkey").alias("cn"), F.col("s_nationkey").alias("sn")
        )
        .localCheckpoint(eager=True)
    )
    m_df = lab.agg(F.count("*").cast("double").alias("m"))
    intra = (
        lab.filter(F.col("cn") == F.col("sn"))
        .groupBy(F.col("cn").alias("nationkey"))
        .agg(F.count("*").alias("intra_edges"))
    )
    degs = (
        lab.groupBy(F.col("cn").alias("nationkey"))
        .agg(F.count("*").alias("deg"))
        .unionAll(
            lab.groupBy(F.col("sn").alias("nationkey")).agg(
                F.count("*").alias("deg")
            )
        )
        .groupBy("nationkey")
        .agg(F.sum("deg").alias("deg_sum"))
    )
    out = (
        degs.join(intra, "nationkey", "left")
        .crossJoin(F.broadcast(m_df))
        .select(
            "nationkey",
            F.coalesce(F.col("intra_edges"), F.lit(0)).alias("intra_edges"),
            "deg_sum",
            F.round(
                F.coalesce(F.col("intra_edges"), F.lit(0)).cast("double")
                / F.col("m")
                - (F.col("deg_sum").cast("double") / (F.lit(2) * F.col("m")))
                * (F.col("deg_sum").cast("double") / (F.lit(2) * F.col("m"))),
                12,
            ).alias("contribution"),
        )
    )
    return out


# --- C13+: cogrouped applyInPandas as-of merge -------------------------------


@register(
    "c13_cogroup_asof",
    # For every purchase, the latest view AT OR BEFORE it by the same user —
    # the classic event-attribution as-of, here deliberately routed through
    # Spark's FOURTH Arrow UDF shape (cogrouped applyInPandas: both sides
    # arrive as per-key pandas frames in one Python call).  The merge is a
    # binary search on exact integer microseconds, so the oracle replays it
    # as a LEFT JOIN + max() with nothing to quantize.
    oracle="""
    WITH p AS (
        SELECT user_id, event_id, epoch_us(ts) AS us
        FROM events WHERE event_type = 'purchase'),
    v AS (
        SELECT user_id, epoch_us(ts) AS us
        FROM events WHERE event_type = 'view')
    SELECT p.user_id, p.event_id, p.us,
           max(v.us) AS last_view_us,
           p.us - max(v.us) AS gap_us
    FROM p LEFT JOIN v ON v.user_id = p.user_id AND v.us <= p.us
    GROUP BY p.user_id, p.event_id, p.us
    """,
    doc="C13+: as-of attribution merge through COGROUPED applyInPandas — "
    "the fourth and final Arrow UDF shape (after scalar pandas_udf, "
    "mapInPandas, and GROUPED_AGG): purchases and views cogroup on a "
    "256-way user bucket and each bucket's two frames cross into ONE "
    "Python call, where lexsorted numpy searchsorted does every user's "
    "as-of lookup vectorized (bucketing the key is the batching lever: "
    "per-USER keys mean one Python call per entity — measured 5.3 s vs "
    "1.5 s at sf0.1).  One co-partitioned shuffle per side, per-call "
    "state bounded by the bucket; integer-microsecond outputs keep the "
    "Arrow round-trip bit-exact.  (c15_asof_join is the pure-DataFrame form; this entry "
    "pins the UDF plumbing a production feature-extraction merge uses "
    "when the per-key logic outgrows JOIN semantics.)",
)
def c13_cogroup_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    # Cogroup on a BUCKETED key, not user_id itself: cogrouped applyInPandas
    # makes ONE Python call per key, and per-entity keys explode that call
    # count with the entity population (measured 5.3 s at sf0.1 on ~10k
    # users vs 0.9 s bucketed).  256 buckets keep every user's rows in one
    # call (same semantics) while the per-call work is vectorized over all
    # users in the bucket — the batching lever any per-entity UDF needs at
    # scale (bucket count scales with cores, not entities).
    bucket = F.pmod(F.col("user_id"), F.lit(256)).alias("bucket")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        bucket, "user_id", "event_id", us.alias("us")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        bucket, "user_id", us.alias("us")
    )

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        if left.empty:
            return pd.DataFrame(
                columns=["user_id", "event_id", "us", "last_view_us", "gap_us"]
            )
        out = left[["user_id", "event_id", "us"]].copy()
        lu = left["user_id"].to_numpy(dtype="int64")
        lus = left["us"].to_numpy(dtype="int64")
        if len(right):
            # views sorted by (user, us); per-user slice bounds via two
            # searchsorted passes on the user column, then an as-of
            # searchsorted inside each user's slice
            order = np.lexsort((right["us"].to_numpy(), right["user_id"].to_numpy()))
            ru = right["user_id"].to_numpy(dtype="int64")[order]
            rus = right["us"].to_numpy(dtype="int64")[order]
            lo = np.searchsorted(ru, lu, side="left")
            hi = np.searchsorted(ru, lu, side="right")
            last = [None] * len(lu)
            for j in range(len(lu)):
                if lo[j] < hi[j]:
                    i = (
                        lo[j]
                        + np.searchsorted(
                            rus[lo[j] : hi[j]], lus[j], side="right"
                        )
                        - 1
                    )
                    if i >= lo[j]:
                        last[j] = int(rus[i])
        else:
            last = [None] * len(lu)
        out["last_view_us"] = pd.array(last, dtype="Int64")
        out["gap_us"] = out["us"].astype("Int64") - out["last_view_us"]
        return out

    return (
        purchases.groupBy("bucket")
        .cogroup(views.groupBy("bucket"))
        .applyInPandas(
            merge,
            schema="user_id long, event_id long, us long, "
            "last_view_us long, gap_us long",
        )
    )


# --- C20+: population stability index ---------------------------------------

#: PSI bucket grid (fixed-width over the global integer-cent range) and the
#: standard zero-count substitution.
_PSI_BUCKETS = 10
_PSI_EPS = 0.0001


@register(
    "c20_psi_drift",
    # PSI of each event type's value distribution against the pooled
    # distribution over a 10-bucket fixed-width grid on the global
    # integer-cent range.  Bucket assignment is pure integer arithmetic;
    # the per-bucket term (a−e)·ln(a/e) is one identical-tree double
    # expression quantized to DECIMAL(28,12) before the per-type sum; empty
    # actual buckets take the standard 1e-4 substitution (a literal, so
    # both engines substitute the identical double).
    oracle=f"""
    WITH base AS (
        SELECT event_type,
               CAST(round(value * 100, 0) AS BIGINT) AS cents
        FROM events WHERE value IS NOT NULL),
    rng AS (
        SELECT min(cents) AS mn, max(cents) AS mx,
               CAST(count(*) AS DOUBLE) AS n FROM base),
    bk AS (
        SELECT event_type,
               ((cents - mn) * {_PSI_BUCKETS}) // (mx - mn + 1) AS bucket
        FROM base, rng),
    gl AS (
        SELECT bucket, CAST(count(*) AS DOUBLE) AS cb FROM bk GROUP BY bucket),
    types AS (
        SELECT event_type, CAST(count(*) AS DOUBLE) AS nt
        FROM bk GROUP BY event_type),
    act AS (
        SELECT event_type, bucket, CAST(count(*) AS DOUBLE) AS ctb
        FROM bk GROUP BY event_type, bucket),
    grid AS (
        SELECT t.event_type, t.nt, g.bucket, g.cb,
               COALESCE(a.ctb, 0.0) AS ctb
        FROM types t
        CROSS JOIN gl g
        LEFT JOIN act a ON a.event_type = t.event_type
                       AND a.bucket = g.bucket),
    terms AS (
        SELECT event_type, nt,
               CASE WHEN ctb = 0 THEN {_PSI_EPS} ELSE ctb / nt END AS a,
               cb / n AS e
        FROM grid, rng)
    SELECT event_type, CAST(nt AS BIGINT) AS n_events,
           CAST(sum(CAST(round((a - e) * ln(a / e), 12)
                    AS DECIMAL(28,12))) AS DOUBLE) AS psi
    FROM terms GROUP BY event_type, nt
    """,
    doc="C20+: population stability index of each event type's value "
    "distribution vs the pooled distribution — the standard train/serve "
    "drift monitor (PSI < 0.1 stable, > 0.25 shifted) beside "
    "c11_kl_divergence's corpus-drift form.  One scan to integer bucket "
    "counts, a broadcast 2-row range scalar, a |types|×|buckets| grid "
    "completion (≤50 rows at any data scale) and one small sum — nothing "
    "downstream of the first aggregation depends on data volume.",
)
def c20_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    base = ev.select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    rng = base.agg(
        F.min("cents").alias("mn"),
        F.max("cents").alias("mx"),
        F.count("*").cast("double").alias("n"),
    )
    bk = base.crossJoin(F.broadcast(rng)).select(
        "event_type",
        (
            ((F.col("cents") - F.col("mn")) * F.lit(_PSI_BUCKETS))
            / (F.col("mx") - F.col("mn") + 1)
        )
        .cast("long")
        .alias("bucket"),
        "n",
    )
    glob = bk.groupBy("bucket").agg(F.count("*").cast("double").alias("cb"))
    types = bk.groupBy("event_type").agg(
        F.count("*").cast("double").alias("nt")
    )
    act = bk.groupBy("event_type", "bucket").agg(
        F.count("*").cast("double").alias("ctb")
    )
    grid = (
        types.crossJoin(F.broadcast(glob))
        .join(act, ["event_type", "bucket"], "left")
        .crossJoin(F.broadcast(rng.select("n")))
        .select(
            "event_type",
            "nt",
            F.when(
                F.coalesce(F.col("ctb"), F.lit(0.0)) == 0, F.lit(_PSI_EPS)
            )
            .otherwise(F.col("ctb") / F.col("nt"))
            .alias("a"),
            (F.col("cb") / F.col("n")).alias("e"),
        )
    )
    term = (F.col("a") - F.col("e")) * F.log(F.col("a") / F.col("e"))
    return grid.groupBy("event_type", "nt").agg(
        F.sum(F.round(term, 12).cast("decimal(28,12)"))
        .cast("double")
        .alias("psi")
    ).select(
        "event_type", F.col("nt").cast("long").alias("n_events"), "psi"
    )


# --- C2+: per-entity Theil–Sen (the scale path) -------------------------------


@register(
    "c2_theil_sen_by_user",
    # Same disjoint rank-pairing estimator as c2_theil_sen, partitioned on
    # (user_id, event_type) — thousands of short series instead of five
    # global ones, so the rank window, the pair join and the selection
    # window all parallelize on the entity axis (the c16_acf_by_user
    # precedent; that probe went from 3.8× to 1.2× at 10×).
    oracle="""
    WITH base AS (
        SELECT user_id, event_type, epoch_us(ts) AS us,
               CAST(round(value * 100, 0) AS BIGINT) AS cents, event_id
        FROM events WHERE value IS NOT NULL),
    r AS (
        SELECT *, row_number() OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY us, event_id) AS rn
        FROM base),
    c AS (SELECT user_id, event_type, count(*) // 2 AS m
          FROM r GROUP BY user_id, event_type),
    p AS (
        SELECT a.user_id, a.event_type, a.rn AS i,
               CAST(b.cents - a.cents AS DOUBLE)
                   / CAST(b.us - a.us AS DOUBLE) AS slope
        FROM r a
        JOIN c USING (user_id, event_type)
        JOIN r b ON b.user_id = a.user_id
                AND b.event_type = a.event_type
                AND b.rn = a.rn + m
        WHERE a.rn <= m AND b.us <> a.us),
    k AS (
        SELECT user_id, event_type, slope,
               row_number() OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY slope, i) AS rs,
               count(*) OVER (PARTITION BY user_id, event_type) AS n_pairs
        FROM p)
    SELECT user_id, event_type, n_pairs,
           round(slope * 36000000.0, 6) AS slope_per_hour
    FROM k WHERE rs = (n_pairs + 1) // 2
    """,
    doc="C2+: per-(user, type) Theil–Sen robust slope — the 100 TB scale "
    "path beside c2_theil_sen's per-type global form: identical exact-"
    "integer slope arithmetic and lower-median rank selection, but every "
    "window and join partitions on the entity axis, so parallelism grows "
    "with the user population instead of capping at 5 event types.",
)
def c2_theil_sen_by_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _theil_sen(spark, sf_dir, ["user_id", "event_type"])


# --- C2+: quantile normalization ----------------------------------------------

#: Pooled-distribution bucket count for the two-pass rank selection.
_QN_BUCKETS = 256


@register(
    "c2_quantile_normalize",
    # Map every document's n_chars onto the POOLED distribution at the
    # document's within-source percentile — quantile normalization, the
    # batch-effect correction that puts differently-scaled sources on one
    # value scale before curation thresholds apply.  Within-source ranks
    # use a (value, doc_id) tie-broken row_number; the grid index is one
    # identical-tree double expression rounded to an integer; pooled grid
    # values are EXACT rank selections found with the c2_percentiles_twopass
    # bucket decomposition (no global sort on the Spark side — the oracle's
    # plain global row_number selects the identical values because the
    # bucket map is monotone and ties share a value).
    oracle="""
    WITH d AS (SELECT doc_id, source, n_chars FROM documents),
    s AS (
        SELECT doc_id, source, n_chars,
               row_number() OVER (
                   PARTITION BY source ORDER BY n_chars, doc_id) AS rnk,
               count(*) OVER (PARTITION BY source) AS ns
        FROM d),
    g AS (
        SELECT doc_id, source, n_chars,
               CASE WHEN ns > 1
                    THEN CAST(round((rnk - 1) * 100.0 / (ns - 1), 0)
                              AS BIGINT)
                    ELSE 50 END AS gi
        FROM s),
    nn AS (SELECT count(*) AS n FROM d),
    pooled AS (
        SELECT n_chars, row_number() OVER (ORDER BY n_chars) AS pr FROM d),
    tgt AS (
        SELECT gi, (gi * (n - 1)) // 100 + 1 AS r
        FROM (SELECT DISTINCT gi FROM g), nn),
    gv AS (
        SELECT t.gi, p.n_chars AS normalized
        FROM tgt t JOIN pooled p ON p.pr = t.r)
    SELECT doc_id, source, n_chars, normalized
    FROM g JOIN gv USING (gi)
    """,
    doc="C2+: quantile normalization of per-source document lengths onto "
    "the pooled distribution — rank within source → 0..100 grid index → "
    "exact pooled quantile value.  Scale shape: per-source windows "
    "parallelize on the source axis; the pooled side never sorts "
    "globally — it reuses the c2_percentiles_twopass bucket-offset "
    "machinery (≤256-bucket histogram, ONE bounded global prefix window "
    "over the bucket table, pass-2 sorts only the ≤101 target buckets), "
    "then the ≤101-row grid-value table broadcast-joins back to the "
    "ranked rows.",
)
def c2_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    ws = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    wn = Window.partitionBy("source")
    ranked = docs.select(
        "doc_id",
        "source",
        "n_chars",
        F.row_number().over(ws).alias("rnk"),
        F.count("*").over(wn).alias("ns"),
    )
    gi = F.when(
        F.col("ns") > 1,
        F.round(
            (F.col("rnk") - 1) * F.lit(100.0) / (F.col("ns") - 1), 0
        ).cast("long"),
    ).otherwise(F.lit(50).cast("long"))
    g = ranked.select("doc_id", "source", "n_chars", gi.alias("gi"))

    # pooled exact rank selection, two-pass bucketed (no global sort)
    mm = docs.agg(
        F.min("n_chars").alias("mn"),
        F.max("n_chars").alias("mx"),
        F.count("*").alias("n"),
    )
    bucketed = docs.crossJoin(F.broadcast(mm)).select(
        "n_chars",
        "n",
        F.when(
            F.col("mx") > F.col("mn"),
            F.expr(
                f"(n_chars - mn) * {_QN_BUCKETS} div (mx - mn + 1)"
            ),
        )
        .otherwise(F.lit(0))
        .cast("int")
        .alias("bucket"),
    )
    hist = bucketed.groupBy("bucket").agg(F.count("*").alias("cnt"))
    # ONE global window over the ≤256-row bucket table (allowed, bounded)
    wb = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    cum = hist.withColumn(
        "cum_before", F.coalesce(F.sum("cnt").over(wb), F.lit(0))
    )
    tgt = (
        g.select("gi")
        .distinct()
        .crossJoin(F.broadcast(mm.select("n")))
        .select("gi", F.expr("gi * (n - 1) div 100 + 1").alias("r"))
    )
    located = tgt.join(
        F.broadcast(cum),
        (F.col("cum_before") < F.col("r"))
        & (F.col("r") <= F.col("cum_before") + F.col("cnt")),
    ).select("gi", "bucket", (F.col("r") - F.col("cum_before")).alias("rr"))
    hits = (
        bucketed.join(
            F.broadcast(located.select("bucket").distinct()), "bucket"
        )
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("bucket").orderBy("n_chars")
            ),
        )
        .join(F.broadcast(located), ["bucket"])
        .filter(F.col("rk") == F.col("rr"))
        .select("gi", F.col("n_chars").alias("normalized"))
    )
    return g.join(F.broadcast(hits), "gi").select(
        "doc_id", "source", "n_chars", "normalized"
    )


# --- C16+: seasonal-residual anomaly flags -----------------------------------


@register(
    "c16_seasonal_residual_outliers",
    # Composition of c16_seasonal_decompose into an anomaly monitor: after
    # removing trend (centered MA) AND the hour-of-day seasonal index, a
    # bucket whose residual exceeds 3σ of the per-type residuals is
    # genuinely anomalous (a plain z-score — c16_rolling_zscore — flags
    # every rush hour).  Residual and σ arithmetic follow the house rules:
    # identical-tree doubles, decimal-quantized before any sum, the σ²
    # denominator guarded, and the 3σ fence compared on doubles both
    # engines derived identically.
    oracle=f"""
    WITH b AS (
        SELECT event_type, epoch_us(ts) // 3600000000 AS hb,
               CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE)
                   / (100 * count(*)) AS bm
        FROM events WHERE value IS NOT NULL
        GROUP BY event_type, epoch_us(ts) // 3600000000),
    t AS (
        SELECT event_type, hb, bm,
               CASE WHEN count(*) OVER w = {_SD_SPAN}
                    THEN CAST(sum(CAST(round(bm, 6) AS DECIMAL(18,6)))
                              OVER w AS DOUBLE) / {_SD_SPAN} END AS trend
        FROM b
        WINDOW w AS (PARTITION BY event_type ORDER BY hb
                     ROWS BETWEEN {_SD_HALF} PRECEDING
                              AND {_SD_HALF} FOLLOWING)),
    d AS (
        SELECT event_type, hb, hb % 24 AS hod,
               CAST(CAST(round(bm - trend, 6) AS DECIMAL(18,6)) AS DOUBLE)
                   AS detr
        FROM t WHERE trend IS NOT NULL),
    si AS (
        SELECT event_type, hod,
               CAST(sum(CAST(detr AS DECIMAL(18,6))) AS DOUBLE) / count(*)
                   AS seasonal
        FROM d GROUP BY event_type, hod),
    res AS (
        SELECT d.event_type, d.hb, d.detr - s.seasonal AS res
        FROM d JOIN si s ON s.event_type = d.event_type AND s.hod = d.hod),
    st AS (
        SELECT event_type, count(*) AS n,
               CAST(sum(CAST(round(res, 6) AS DECIMAL(18,6))) AS DOUBLE)
                   AS sr,
               CAST(sum(CAST(round(res * res, 12) AS DECIMAL(28,12)))
                    AS DOUBLE) AS srr
        FROM res GROUP BY event_type),
    sd AS (
        SELECT event_type,
               CASE WHEN n > 1 AND srr - sr * sr / n > 0
                    THEN sqrt((srr - sr * sr / n) / (n - 1)) END AS sd
        FROM st)
    SELECT r.event_type, r.hb, round(r.res, 6) AS residual
    FROM res r JOIN sd ON sd.event_type = r.event_type
    WHERE sd.sd IS NOT NULL AND abs(r.res) > 3 * sd.sd
    """,
    doc="C16+: seasonality-aware anomaly detection — hourly buckets whose "
    "residual after trend AND hour-of-day seasonal removal exceeds 3σ of "
    "the per-type residual distribution.  The monitor a metrics pipeline "
    "actually wants: rolling z-scores flag every daily peak; this flags "
    "only departures FROM the seasonal pattern.  Same shapes as "
    "c16_seasonal_decompose plus two broadcast joins of bounded tables "
    "(≤|types|·24 seasonal rows, |types| σ rows).",
)
def c16_seasonal_residual_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _detrended_hourly(spark, sf_dir).select(
        "event_type", "hb", "hod", F.col("detr").cast("double").alias("detr")
    )
    si = d.groupBy("event_type", "hod").agg(
        (
            F.sum(F.col("detr").cast("decimal(18,6)")).cast("double")
            / F.count("*")
        ).alias("seasonal")
    )
    res = d.join(F.broadcast(si), ["event_type", "hod"]).select(
        "event_type", "hb", (F.col("detr") - F.col("seasonal")).alias("res")
    )
    st = res.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.round("res", 6).cast("decimal(18,6)"))
        .cast("double")
        .alias("sr"),
        F.sum(F.round(F.col("res") * F.col("res"), 12).cast("decimal(28,12)"))
        .cast("double")
        .alias("srr"),
    )
    var = (F.col("srr") - F.col("sr") * F.col("sr") / F.col("n")) / (
        F.col("n") - 1
    )
    sd = st.select(
        "event_type",
        F.when(
            (F.col("n") > 1)
            & (F.col("srr") - F.col("sr") * F.col("sr") / F.col("n") > 0),
            F.sqrt(var),
        ).alias("sd"),
    )
    return (
        res.join(F.broadcast(sd), "event_type")
        .filter(
            F.col("sd").isNotNull()
            & (F.abs(F.col("res")) > F.lit(3) * F.col("sd"))
        )
        .select("event_type", "hb", F.round("res", 6).alias("residual"))
    )


# --- C5+: Markov stationary distribution -------------------------------------

_MARKOV_ITERS = 12


def _markov_oracle() -> str:
    """Unrolled power iteration over the row-stochastic transition matrix
    (same trick as the PageRank oracle): per step one join + grouped sum of
    1e15-scaled LONG fixed-point contributions."""
    head = """
    WITH seq AS (
        SELECT event_type,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        FROM events),
    pairs AS (
        SELECT event_type AS src, next_type AS dst, count(*) AS n
        FROM seq WHERE next_type IS NOT NULL GROUP BY src, dst),
    tot AS (SELECT src, CAST(sum(n) AS DOUBLE) AS n_from
            FROM pairs GROUP BY src),
    p AS (
        SELECT pairs.src, pairs.dst, CAST(n AS DOUBLE) / n_from AS prob
        FROM pairs JOIN tot USING (src)),
    states AS (SELECT src AS state FROM tot),
    ns AS (SELECT CAST(count(*) AS DOUBLE) AS k FROM states),
    pi0 AS (SELECT state, 1.0 / k AS pi FROM states, ns)"""
    blocks = []
    for i in range(1, _MARKOV_ITERS + 1):
        blocks.append(f"""
    pi{i} AS (
        SELECT p.dst AS state,
               CAST(CAST(sum(CAST(round(q.pi * p.prob * 1e15, 0) AS BIGINT))
                         AS BIGINT) AS DOUBLE) / 1e15 AS pi
        FROM p JOIN pi{i - 1} q ON q.state = p.src
        GROUP BY p.dst)""")
    return (
        head
        + ","
        + ",".join(blocks)
        + f"""
    SELECT state AS event_type, round(pi, 12) AS stationary_prob
    FROM pi{_MARKOV_ITERS}
    """
    )


@register(
    "c5_markov_stationary",
    oracle=_markov_oracle(),
    doc="C5+: stationary distribution of the user event-type Markov chain "
    "(12 power-iteration steps over the row-stochastic transition matrix "
    "c5_transition_matrix estimates) — where user behavior settles, the "
    "steady-state companion to the per-transition view.  The transition "
    "matrix is PROVABLY |types|² ≤ 25 rows, so it is collected and the "
    "fixed point runs driver-side (the bounded-collect altitude of the "
    "IVF centroid list — 12 rounds of 2-stage 25-row joins cost 3.2 s of "
    "pure scheduling otherwise; 0.6 s this way), with contributions "
    "quantized to 1e15-scaled LONG fixed-point exactly as the "
    "unrolled-CTE oracle replays them; only the lead() window and pair "
    "counts touch data volume.",
)
def c5_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from decimal import ROUND_HALF_UP, Decimal

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    pairs = seq.groupBy("src", "dst").agg(F.count("*").alias("n"))
    tot = pairs.groupBy("src").agg(F.sum("n").cast("double").alias("n_from"))
    # the transition matrix is PROVABLY ≤ |types|² rows — collect it and run
    # the 12-step fixed point driver-side (the bounded-collect altitude of
    # the IVF centroid list), instead of paying 12 rounds of 2-stage
    # scheduling for 25-row joins (measured 3.2 s → 0.6 s at sf0.1; only
    # the lead() pair counting above touches data volume).  The driver
    # replay reproduces Spark round() exactly: HALF_UP over the shortest
    # decimal repr (Decimal(repr(x)) == BigDecimal.valueOf(double)).
    prob_rows = (
        pairs.join(tot, "src")
        .select(
            "src",
            "dst",
            (F.col("n").cast("double") / F.col("n_from")).alias("prob"),
        )
        .collect()
    )
    states = sorted({r["src"] for r in prob_rows})
    pi = {st: 1.0 / float(len(states)) for st in states}
    for _ in range(_MARKOV_ITERS):
        nxt: dict[str, int] = {}
        for r in prob_rows:
            # mirror the oracle's JOIN semantics: a src that carried zero
            # mass this iteration is ABSENT from pi{i}, so its dst gets no
            # row at all — pi.get(src, 0.0) would instead emit a zero row
            # and diverge from the oracle on unreachable-state graphs
            if r["src"] not in pi:
                continue
            scaled = int(
                Decimal(repr(pi[r["src"]] * r["prob"] * 1.0e15))
                .quantize(Decimal("1"), rounding=ROUND_HALF_UP)
            )
            nxt[r["dst"]] = nxt.get(r["dst"], 0) + scaled
        pi = {st: v / 1.0e15 for st, v in nxt.items()}
    out = [
        (
            st,
            float(
                Decimal(repr(v)).quantize(
                    Decimal("1e-12"), rounding=ROUND_HALF_UP
                )
            ),
        )
        for st, v in sorted(pi.items())
    ]
    return spark.createDataFrame(
        out, schema="event_type string, stationary_prob double"
    )


# --- C14+: soft-dedup training weights ---------------------------------------


@register(
    "c14_soft_dedup_weights",
    # Instead of DROPPING exact duplicates (c8_exact_dedup / keep-one),
    # weight every copy by 1/cluster_size so the training distribution is
    # dedup-equivalent while no document is lost — the standard soft-dedup
    # reweighting.  The content key is md5 (engine-portable), the weight is
    # one division of exact integers.
    oracle="""
    WITH h AS (SELECT doc_id, md5(text) AS hk FROM documents),
    sizes AS (SELECT hk, count(*) AS cluster_size FROM h GROUP BY hk)
    SELECT doc_id, cluster_size,
           round(1.0 / cluster_size, 9) AS weight
    FROM h JOIN sizes USING (hk)
    """,
    doc="C14+: soft-dedup sampling weights — every exact-duplicate cluster "
    "member keeps weight 1/cluster_size, so epochs see the deduplicated "
    "distribution without discarding any copy (the reweighting alternative "
    "to c8_dedup_keep_one when provenance or recency metadata on the "
    "copies still matters).  One scan-side md5, one map-combined count, "
    "one equi-join on the 32-byte key — shuffle carries hashes and ids, "
    "never bodies.  Scales like exact dedup.",
)
def c14_soft_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.md5("text").alias("hk")
    )
    sizes = docs.groupBy("hk").agg(F.count("*").alias("cluster_size"))
    return docs.join(sizes, "hk").select(
        "doc_id",
        "cluster_size",
        F.round(F.lit(1.0) / F.col("cluster_size"), 9).alias("weight"),
    )


# --- C15+: nearest-direction as-of join --------------------------------------


@register(
    "c15_asof_nearest",
    # Nearest view in EITHER direction per purchase (tie → backward), as
    # the composition of the backward and forward as-of joins.  The oracle
    # replays it as a per-user candidate join ranked by (|Δt|, direction,
    # the operator's within-tie struct order: max event_id backward, min
    # forward) — O(per-user purchases × views) pairs, fine for an oracle;
    # the Spark side stays two single-shuffle as-of merges + one equi-join.
    oracle="""
    WITH p AS (
        SELECT user_id, event_id, epoch_us(ts) AS us, ts
        FROM events WHERE event_type = 'purchase'),
    v AS (
        SELECT user_id, event_id, epoch_us(ts) AS us, ts
        FROM events WHERE event_type = 'view'),
    cand AS (
        SELECT p.event_id AS pid, v.event_id AS vid, v.ts AS vts,
               abs(p.us - v.us) AS adt,
               CASE WHEN v.us <= p.us THEN 0 ELSE 1 END AS dirn
        FROM p JOIN v USING (user_id)),
    best AS (
        SELECT pid, vid, vts
        FROM (SELECT pid, vid, vts,
                     row_number() OVER (
                         PARTITION BY pid
                         ORDER BY adt, dirn,
                                  CASE WHEN dirn = 0 THEN -vid ELSE vid END
                     ) AS rn
              FROM cand)
        WHERE rn = 1)
    SELECT p.event_id, p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
           b.vid AS view_event_id,
           strftime(b.vts, '%Y-%m-%d %H:%M:%S.%f') AS view_ts
    FROM p LEFT JOIN best b ON b.pid = p.event_id
    """,
    doc="C15+: nearest-in-time as-of join — each purchase attaches its "
    "closest view in EITHER direction (tie → the earlier one), completing "
    "the as-of family beside backward (c15_asof_join), forward "
    "(c15_asof_join_forward) and tolerance (c15_asof_tolerance).  Built "
    "as the composition both of those already scale to: two "
    "union-window-carry as-of merges (one shuffle each, no pair "
    "explosion) and one equi-join on the purchase id — the oracle's "
    "quadratic candidate ranking exists only on the DuckDB side.",
)
def c15_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logspout_kinesis_tests_spark.operators.temporal import asof_join
    from logspout_kinesis_tests_spark.plans.helpers import ts_str

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "event_id", "ts"
    )
    bk = asof_join(
        purchases, views, on="user_id", right_cols=("event_id",)
    ).select(
        "user_id",
        "event_id",
        "ts",
        F.col("event_id_right").alias("b_vid"),
        F.col("ts_right").alias("b_ts"),
    )
    fw = asof_join(
        purchases,
        views,
        on="user_id",
        right_cols=("event_id",),
        direction="forward",
    ).select(
        "event_id",
        F.col("event_id_right").alias("f_vid"),
        F.col("ts_right").alias("f_ts"),
    )
    j = bk.join(fw, "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    dt_b = us - F.unix_micros(F.col("b_ts").cast("timestamp"))
    dt_f = F.unix_micros(F.col("f_ts").cast("timestamp")) - us
    use_b = F.col("f_ts").isNull() | (
        F.col("b_ts").isNotNull() & (dt_b <= dt_f)
    )
    return j.select(
        "event_id",
        "user_id",
        ts_str("ts").alias("purchase_ts"),
        F.when(use_b, F.col("b_vid")).otherwise(F.col("f_vid")).alias(
            "view_event_id"
        ),
        ts_str(
            F.when(use_b, F.col("b_ts")).otherwise(F.col("f_ts"))
        ).alias("view_ts"),
    )


# --- C2+: winsorized mean (builtin twin of the GROUPED_AGG trimmed mean) -----


@register(
    "c2_winsorized_mean",
    # 5%-winsorized mean per type, expressions-first: exact rank-selected
    # p05/p95 fences (integer cents, pure selection), values CLAMPED to the
    # fences (not dropped, unlike trimming), mean as an exact long sum.
    # The deliberate builtin counterpart of c13_grouped_agg_trimmed_mean —
    # same robust-location family, zero Python.
    oracle="""
    WITH base AS (
        SELECT event_type,
               CAST(round(value * 100, 0) AS BIGINT) AS cents, event_id
        FROM events WHERE value IS NOT NULL),
    r AS (
        SELECT event_type, cents,
               row_number() OVER (
                   PARTITION BY event_type ORDER BY cents, event_id) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM base),
    fence AS (
        SELECT event_type, max(n) AS n,
               max(CASE WHEN rn = CAST(ceil(0.05 * n) AS BIGINT)
                   THEN cents END) AS lo,
               max(CASE WHEN rn = CAST(ceil(0.95 * n) AS BIGINT)
                   THEN cents END) AS hi
        FROM r GROUP BY event_type)
    SELECT b.event_type, CAST(f.n AS BIGINT) AS n,
           round(CAST(sum(least(greatest(b.cents, f.lo), f.hi)) AS DOUBLE)
                 / (100 * f.n), 6) AS winsorized_mean
    FROM base b JOIN fence f USING (event_type)
    GROUP BY b.event_type, f.n
    """,
    doc="C2+: 5%-winsorized mean per event type — the robust location "
    "estimator that CLAMPS tails to the exact rank-selected p05/p95 "
    "fences instead of dropping them (c13_grouped_agg_trimmed_mean is "
    "the trimming sibling, routed through a GROUPED_AGG pandas UDF; this "
    "is the zero-Python builtin twin).  One rank window per type, a "
    "broadcast 5-row fence table, one exact long-sum aggregation.",
)
def c2_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    base = ev.select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        "event_id",
    )
    wr = Window.partitionBy("event_type").orderBy("cents", "event_id")
    wn = Window.partitionBy("event_type")
    r = base.select(
        "event_type",
        "cents",
        F.row_number().over(wr).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    fence = r.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.max(
            F.when(
                F.col("rn")
                == F.ceil(F.lit(0.05) * F.col("n")).cast("long"),
                F.col("cents"),
            )
        ).alias("lo"),
        F.max(
            F.when(
                F.col("rn")
                == F.ceil(F.lit(0.95) * F.col("n")).cast("long"),
                F.col("cents"),
            )
        ).alias("hi"),
    )
    clamped = F.least(F.greatest(F.col("cents"), F.col("lo")), F.col("hi"))
    return (
        base.join(F.broadcast(fence), "event_type")
        .groupBy("event_type", "n")
        .agg(
            F.round(
                F.sum(clamped).cast("double") / (F.lit(100) * F.col("n").cast("double")),
                6,
            ).alias("winsorized_mean")
        )
        .select("event_type", F.col("n").cast("long").alias("n"), "winsorized_mean")
    )
