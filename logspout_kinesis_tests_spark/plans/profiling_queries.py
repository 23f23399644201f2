"""Round-4 breadth queries: column profiling, interval-overlap join,
n-gram novelty scoring, and bounded-frame EWMA smoothing.

Registered LAST (see plans/__init__) so longer-waiting unverified queries
keep their place at the front of the driver's correctness window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from logspout_kinesis_tests_spark.plans.registry import register
from logspout_kinesis_tests_spark.sources.tables import load_table


@register(
    "c2_column_profile",
    # One UNION branch per profiled column; counts are BIGINT in both
    # engines, min/max stringified (decimal "123.45" and DATE "1995-01-02"
    # render identically in Spark and DuckDB).
    oracle="""
    SELECT 'o_orderkey' AS column_name, count(*) AS n_rows,
           count(*) - count(o_orderkey) AS n_nulls,
           count(DISTINCT o_orderkey) AS n_distinct,
           CAST(min(o_orderkey) AS VARCHAR) AS min_value,
           CAST(max(o_orderkey) AS VARCHAR) AS max_value
    FROM orders
    UNION ALL
    SELECT 'o_custkey', count(*), count(*) - count(o_custkey),
           count(DISTINCT o_custkey),
           CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
           count(DISTINCT o_orderstatus),
           CAST(min(o_orderstatus) AS VARCHAR), CAST(max(o_orderstatus) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', count(*), count(*) - count(o_totalprice),
           count(DISTINCT o_totalprice),
           CAST(min(o_totalprice) AS VARCHAR), CAST(max(o_totalprice) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderdate', count(*), count(*) - count(o_orderdate),
           count(DISTINCT o_orderdate),
           CAST(min(o_orderdate) AS VARCHAR), CAST(max(o_orderdate) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
           count(DISTINCT o_orderpriority),
           CAST(min(o_orderpriority) AS VARCHAR), CAST(max(o_orderpriority) AS VARCHAR)
    FROM orders
    """,
    doc="C2+: ANALYZE-style column profiling — per-column row/null/distinct "
    "counts and stringified min/max over orders.  Two deliberate scans: "
    "the multi-count-distinct aggregate alone (Spark's Expand ×(cols+1) "
    "carries only the distinct branches), then the cheap count/min/max "
    "aggregate, cross-joined and unpivoted.  MIXING the distinct and "
    "plain aggregates in one agg drags every min/max branch through the "
    "Expand — measured 12.5 s vs 2.7 s at 1.5M rows (SCALE.md); two "
    "cheap scans beat one catastrophic one.  The HLL Expand-free variant "
    "for when approximate distincts suffice is c2_approx_sketches.",
)
def c2_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    cols = (
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    )
    orders = load_table(spark, sf_dir, "orders")
    nd = orders.agg(
        *[F.countDistinct(F.col(c)).alias(f"nd_{c}") for c in cols]
    )
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"nn_{c}"),
            F.min(F.col(c)).cast("string").alias(f"mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"mx_{c}"),
        ]
    one = orders.agg(*aggs).crossJoin(F.broadcast(nd))
    stack_args = ", ".join(
        f"'{c}', nn_{c}, nd_{c}, mn_{c}, mx_{c}" for c in cols
    )
    return one.selectExpr(
        "n_rows",
        f"stack({len(cols)}, {stack_args}) AS "
        "(column_name, _nn, n_distinct, min_value, max_value)",
    ).select(
        "column_name",
        "n_rows",
        (F.col("n_rows") - F.col("_nn")).alias("n_nulls"),
        "n_distinct",
        "min_value",
        "max_value",
    )


@register(
    "c15_interval_overlap_join",
    # 12 derived 10-day promo windows starting each month of 1995; each
    # lineitem's service interval is [shipdate, shipdate + 1..30 days]
    # (deterministic duration from the line number — this dataset carries
    # no receiptdate).  Interval overlaps a window iff start <= w_end AND
    # end >= w_start; overlap length in whole days, inclusive bounds.
    oracle="""
    WITH windows AS (
        SELECT CAST(m AS INT) AS window_id,
               CAST(DATE '1995-01-01' + to_months(CAST(m AS INT)) AS DATE) AS w_start,
               CAST(DATE '1995-01-01' + to_months(CAST(m AS INT)) + to_days(9) AS DATE)
                   AS w_end
        FROM (SELECT unnest(range(12)) AS m)),
    iv AS (
        SELECT l_shipdate AS iv_start,
               CAST(l_shipdate + to_days(1 + (l_linenumber * 7) % 30) AS DATE) AS iv_end
        FROM lineitem),
    hits AS (
        SELECT w.window_id, w.w_start,
               date_diff('day',
                         greatest(i.iv_start, w.w_start),
                         least(i.iv_end, w.w_end)) + 1 AS overlap_days
        FROM iv i JOIN windows w
          ON i.iv_start <= w.w_end AND i.iv_end >= w.w_start)
    SELECT window_id, CAST(w_start AS VARCHAR) AS w_start,
           count(*) AS n_lineitems,
           CAST(sum(overlap_days) AS BIGINT) AS total_overlap_days
    FROM hits GROUP BY window_id, w_start ORDER BY window_id
    """,
    doc="C15+: interval-overlap join — lineitem service intervals "
    "[shipdate, shipdate + derived duration] against a broadcast 12-row "
    "promo-window calendar (non-equi range predicates); per-window hit "
    "counts and inclusive overlap-day totals.  The calendar side is always "
    "tiny, so the 100 TB plan is a broadcast nested-loop over the fact "
    "scan — no shuffle of the big side, and the two range predicates "
    "prune map-side.",
)
def c15_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_shipdate").alias("iv_start"),
        F.date_add(
            F.col("l_shipdate"), (F.lit(1) + (F.col("l_linenumber") * 7) % 30)
        ).alias("iv_end"),
    )
    windows = spark.range(12).select(
        F.col("id").cast("int").alias("window_id"),
        F.add_months(F.lit("1995-01-01").cast("date"), F.col("id").cast("int")).alias(
            "w_start"
        ),
    ).withColumn("w_end", F.date_add(F.col("w_start"), 9))
    hits = li.join(
        F.broadcast(windows),
        (F.col("iv_start") <= F.col("w_end")) & (F.col("iv_end") >= F.col("w_start")),
    ).select(
        "window_id",
        "w_start",
        (
            F.datediff(
                F.least("iv_end", "w_end"), F.greatest("iv_start", "w_start")
            )
            + 1
        ).alias("overlap_days"),
    )
    return (
        hits.groupBy("window_id", F.col("w_start").cast("string").alias("w_start"))
        .agg(
            F.count("*").alias("n_lineitems"),
            F.sum("overlap_days").cast("long").alias("total_overlap_days"),
        )
        .orderBy("window_id")
    )


@register(
    "c11_ngram_novelty",
    # A shingle is "novel" in the doc with the smallest doc_id containing
    # it — the ingestion-order data-valuation metric (how much genuinely
    # new text does each document contribute?).  Shingle construction
    # mirrors operators.dedup.exploded_shingles(n=8) exactly, including the
    # short-text whole-doc fallback.
    oracle="""
    WITH ws AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
    sh AS (
        SELECT doc_id, unnest(
            list_distinct(CASE WHEN len(w) >= 8
                THEN list_transform(range(1, len(w) - 6),
                       i -> array_to_string(list_slice(w, i, i + 7), ' '))
                ELSE [array_to_string(w, ' ')] END)) AS shingle
        FROM ws),
    firsts AS (SELECT shingle, min(doc_id) AS first_doc FROM sh GROUP BY shingle)
    SELECT s.doc_id,
           count(*) AS n_shingles,
           CAST(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END) AS BIGINT)
               AS n_novel,
           round(CAST(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
                           AS DOUBLE) / count(*), 6) AS novelty
    FROM sh s JOIN firsts f USING (shingle)
    GROUP BY s.doc_id
    """,
    doc="C11+/C9: per-document n-gram novelty — fraction of a doc's "
    "distinct word-8-grams whose first appearance (min doc_id) is this "
    "doc.  One inverted-index shuffle on the shingle (same shape as the "
    "near-dup joins; at 100 TB the shingle can be xxhash64-compressed to 8 "
    "bytes before the groupBy); exact rational rounded to 6dp.",
)
def c11_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logspout_kinesis_tests_spark.operators.dedup import exploded_shingles
    from logspout_kinesis_tests_spark.plans.helpers import spread

    sh = exploded_shingles(
        spread(load_table(spark, sf_dir, "documents"), "doc_id"), n=8
    )
    firsts = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    novel = F.sum(
        F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    ).cast("long")
    return (
        sh.join(firsts, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            novel.alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_novel",
            F.round(
                F.col("n_novel").cast("double") / F.col("n_shingles"), 6
            ).alias("novelty"),
        )
    )


#: EWMA trailing depth — weights 2^-d are EXACT doubles, and multiplying a
#: double by a power of two is exact, so the only inexactness is the final
#: additions — written in the identical association order in both engines.
_EWMA_DEPTH = 8


@register(
    "c16_ewma",
    oracle=f"""
    WITH ordered AS (
        SELECT event_id, user_id, value,
               {" ".join(
                   f"lag(value, {d}) OVER "
                   f"(PARTITION BY user_id ORDER BY ts, event_id) AS x{d},"
                   for d in range(1, _EWMA_DEPTH)
               )}
               value AS x0
        FROM events)
    SELECT event_id, user_id,
           CASE WHEN (
               {" + ".join(
                   f"CASE WHEN x{d} IS NULL THEN 0.0 ELSE {2.0 ** -d!r} END"
                   for d in range(_EWMA_DEPTH)
               )}
           ) = 0.0 THEN NULL ELSE round((
               {" + ".join(
                   f"CASE WHEN x{d} IS NULL THEN 0.0 ELSE x{d} * {2.0 ** -d!r} END"
                   for d in range(_EWMA_DEPTH)
               )}
           ) / (
               {" + ".join(
                   f"CASE WHEN x{d} IS NULL THEN 0.0 ELSE {2.0 ** -d!r} END"
                   for d in range(_EWMA_DEPTH)
               )}
           ), 9) END AS ewma
    FROM ordered
    """,
    doc="C16+: bounded-depth exponentially-weighted moving average "
    "(alpha=1/2, trailing 8 observations) per user — explicit lag() taps "
    "with exact power-of-two weights; missing taps (series head / null "
    "values) drop out of both numerator and weight mass.  O(1) window "
    "state per row, one shuffle on the partition key; 2^-d weights keep "
    "the arithmetic bit-stable across engines.",
)
def c16_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    taps = ev.select(
        "event_id",
        "user_id",
        F.col("value").alias("x0"),
        *[F.lag("value", d).over(w).alias(f"x{d}") for d in range(1, _EWMA_DEPTH)],
    )
    num = None
    den = None
    for d in range(_EWMA_DEPTH):
        tap = F.col(f"x{d}")
        term = F.when(tap.isNull(), F.lit(0.0)).otherwise(tap * F.lit(2.0 ** -d))
        wgt = F.when(tap.isNull(), F.lit(0.0)).otherwise(F.lit(2.0 ** -d))
        num = term if num is None else num + term
        den = wgt if den is None else den + wgt
    return taps.select(
        "event_id",
        "user_id",
        F.when(den == F.lit(0.0), F.lit(None).cast("double"))
        .otherwise(F.round(num / den, 9))
        .alias("ewma"),
    )


@register(
    "c9_minhash_lsh_md5_gate",
    # Full end-to-end replay of the banded-LSH ALGORITHM with the
    # engine-portable md5 hash family (same trick as c16_count_min_sketch):
    # shingle -> 16 seeded 32-bit hashes -> per-doc min signature -> 4
    # bands x 4 rows -> bucket equi-join -> distinct candidate pairs.
    # DuckDB computes the identical pipeline, so the driver hash-verifies
    # the LSH construction itself; the xxhash64 production path
    # (c9_minhash_lsh) keeps its recall gate and stays the benched shape.
    oracle="""
    WITH ws AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
    sh AS (
        SELECT doc_id, unnest(
            list_distinct(CASE WHEN len(w) >= 3
                THEN list_transform(range(1, len(w) - 1),
                       i -> array_to_string(list_slice(w, i, i + 2), ' '))
                ELSE [array_to_string(w, ' ')] END)) AS shingle
        FROM ws),
    sig AS (
        SELECT doc_id, s.s AS seed,
               min(('0x' || substring(md5(shingle || ':' || s.s::VARCHAR), 1, 8))::BIGINT)
                   AS mh
        FROM sh CROSS JOIN (SELECT unnest(range(16)) AS s) s
        GROUP BY doc_id, s.s),
    banded AS (
        SELECT doc_id, CAST(seed // 4 AS INT) AS band,
               array_to_string(list(mh ORDER BY seed), ',') AS bucket
        FROM sig GROUP BY doc_id, seed // 4)
    SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
    FROM banded l JOIN banded r
      ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id
    ORDER BY id_a, id_b
    """,
    doc="C9+: driver-visible MinHash-LSH algorithm gate — the complete "
    "banded-LSH candidate pipeline (seeded min-hash signatures, 4x4 "
    "banding, bucket equi-join) with the engine-portable md5 hash family, "
    "hash-verified against an independent DuckDB replay.  Same plan shape "
    "as the xxhash64 production operator; different (slower, portable) "
    "hash only.",
)
def c9_minhash_lsh_md5_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logspout_kinesis_tests_spark.operators.dedup import exploded_shingles

    num_hashes, rows_per_band = 16, 4
    sh = exploded_shingles(load_table(spark, sf_dir, "documents"), n=3)

    def md5_32(col):
        return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")

    sig = sh.groupBy("doc_id").agg(
        *[
            F.min(
                md5_32(F.concat(F.col("shingle"), F.lit(f":{i}")))
            ).alias(f"mh{i}")
            for i in range(num_hashes)
        ]
    )
    banded = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            ",",
                            *[
                                F.col(f"mh{b * rows_per_band + r}").cast("string")
                                for r in range(rows_per_band)
                            ],
                        ).alias("bucket"),
                    )
                    for b in range(num_hashes // rows_per_band)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    left, right = banded.alias("l"), banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("id_a"), F.col("r.doc_id").alias("id_b")
        )
        .distinct()
        .orderBy("id_a", "id_b")
    )


@register(
    "c9_winnowing_md5_gate",
    # Same engine-portable-hash treatment as the MinHash gate, for the
    # winnowing scheme: char-16-gram hashes (stride 2) -> min of each
    # 8-window (DuckDB: windowed MIN over the gram sequence; Spark: the
    # same least()-chain as the production operator) -> distinct
    # fingerprints -> df<=100 boilerplate cut -> pairs sharing >=5.
    oracle="""
    WITH t AS (SELECT doc_id, lower(text) AS s FROM documents),
    g AS (
        SELECT doc_id, i,
               ('0x' || substring(md5(substring(s, (i - 1) * 2 + 1, 16)), 1, 8))::BIGINT AS h
        FROM t CROSS JOIN LATERAL (
            SELECT unnest(range(1, greatest((length(s) - 16) // 2 + 1, 1) + 1)) AS i)),
    wm AS (
        SELECT doc_id, i,
               min(h) OVER (PARTITION BY doc_id ORDER BY i
                            ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS fp,
               count(*) OVER (PARTITION BY doc_id) AS n
        FROM g),
    fps AS (
        SELECT DISTINCT doc_id, fp AS fingerprint FROM wm
        WHERE n >= 8 AND i <= n - 7
        UNION
        SELECT doc_id, min(h) AS fingerprint FROM g
        WHERE doc_id IN (SELECT doc_id FROM wm WHERE n < 8) GROUP BY doc_id),
    keep AS (SELECT fingerprint FROM fps GROUP BY fingerprint HAVING count(*) <= 100),
    kept AS (SELECT f.* FROM fps f JOIN keep USING (fingerprint))
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS n_shared
    FROM kept a JOIN kept b ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id HAVING count(*) >= 5
    """,
    doc="C9+: driver-visible winnowing algorithm gate — the complete "
    "MOSS-style pipeline (stride-2 char-16-gram hashes, window-8 minima, "
    "distinct fingerprints, df-cut, >=5-shared pair join) with the "
    "engine-portable md5 hash, hash-verified against an independent "
    "DuckDB replay (windowed MIN formulation).  The xxhash64 production "
    "operator keeps its recall gate and the bench slot.",
)
def c9_winnowing_md5_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    kgram, window, stride, min_shared, max_df = 16, 8, 2, 5, 100
    docs = load_table(spark, sf_dir, "documents")
    n_grams = f"greatest((length(lower(text)) - {kgram}) DIV {stride} + 1, 1)"
    hashes = (
        f"transform(sequence(1, {n_grams}), "
        f"i -> CAST(conv(substring(md5(substring(lower(text), (i - 1) * {stride} + 1, "
        f"{kgram})), 1, 8), 16, 10) AS LONG))"
    )
    hashed = docs.select(F.col("doc_id"), F.expr(hashes).alias("_hashes"))
    win_min = "least(" + ", ".join(
        f"element_at(_hashes, i + {j})" for j in range(window)
    ) + ")"
    fps = F.expr(
        f"""
        array_distinct(
          CASE WHEN size(_hashes) >= {window}
               THEN transform(sequence(1, size(_hashes) - {window - 1}),
                              i -> {win_min})
               ELSE array(array_min(_hashes)) END)
        """
    )
    fp = hashed.select(F.col("doc_id"), F.explode(fps).alias("fingerprint"))
    keep = (
        fp.groupBy("fingerprint")
        .agg(F.count("*").alias("df_"))
        .filter(F.col("df_") <= max_df)
        .select("fingerprint")
    )
    fp = fp.join(keep, "fingerprint")
    a, b = fp.alias("a"), fp.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fingerprint") == F.col("b.fingerprint"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count("*").cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


@register(
    "c9_simhash_md5_gate",
    # 24-bit SimHash over the md5 word-hash on a 100-doc subset (the
    # synthetic corpus is simhash-degenerate — short template text makes
    # most docs near-collide, so the full-corpus pair set is huge and
    # uninformative; the subset keeps the gate output small while still
    # exercising every stage).  Pigeonhole banding: 4 bands x 6 bits
    # guarantees hamming<=3 pairs share a band.
    oracle="""
    WITH w AS (
        SELECT doc_id, unnest(list_distinct(string_split(lower(text), ' '))) AS word
        FROM documents WHERE doc_id % 5 = 0),
    hw AS (SELECT doc_id, ('0x' || substring(md5(word), 1, 8))::BIGINT AS h FROM w),
    sums AS (
        SELECT doc_id, k.k AS k,
               sum(CASE WHEN (h >> k.k) & 1 = 1 THEN 1 ELSE -1 END) AS s
        FROM hw CROSS JOIN (SELECT unnest(range(24)) AS k) k
        GROUP BY doc_id, k.k),
    sig AS (
        SELECT doc_id, CAST(sum(CASE WHEN s > 0 THEN 1 << k ELSE 0 END) AS BIGINT) AS code
        FROM sums GROUP BY doc_id),
    banded AS (
        SELECT doc_id, code, b.b AS band, (code >> (b.b * 6)) & 63 AS bucket
        FROM sig CROSS JOIN (SELECT unnest(range(4)) AS b) b)
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.code, b.code)) AS INT) AS hamming
    FROM banded a JOIN banded b
      ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.code, b.code)) <= 3
    """,
    doc="C9+: driver-visible SimHash algorithm gate — per-bit signed word "
    "vote, code assembly, pigeonhole banding, banded pair join and "
    "hamming cut, all with the engine-portable md5 word hash, "
    "hash-verified against an independent DuckDB replay.  The 64-bit "
    "xxhash64 production operator keeps its recall gate.",
)
def c9_simhash_md5_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    BITS, BAND_BITS, MAXH = 24, 6, 3
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    words = docs.select(
        "doc_id", F.explode(F.array_distinct(F.split(F.lower("text"), " "))).alias("w")
    )
    h = F.conv(F.substring(F.md5("w"), 1, 8), 16, 10).cast("long")
    hw = words.select("doc_id", h.alias("h"))
    sums = hw.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when((F.col("h").bitwiseAND(F.lit(1 << k))) != 0, 1).otherwise(-1)
            ).alias(f"s{k}")
            for k in range(BITS)
        ]
    )
    code = None
    for k in range(BITS):
        bit = F.when(F.col(f"s{k}") > 0, F.lit(1 << k)).otherwise(F.lit(0))
        code = bit if code is None else code + bit
    sig = sums.select("doc_id", code.cast("long").alias("code"))
    banded = sig.select(
        "doc_id",
        "code",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        (
                            (F.col("code") / F.lit(1 << (b * BAND_BITS))).cast("long")
                            % F.lit(1 << BAND_BITS)
                        ).alias("bucket"),
                    )
                    for b in range(BITS // BAND_BITS)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "code", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.expr("bit_count(a.code ^ b.code)").alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= MAXH)
    )


@register(
    "c10_lsh_md5_gate",
    # Completes the md5-gate family for the hash-based C10 path: the full
    # random-hyperplane LSH pipeline — deterministic plane components
    # md5('p:d') % 2000 / 1000 - 1, sign-bit bucket assembly, bucket
    # equi-join, exact cosine re-rank — hash-verified against a DuckDB
    # replay.  Both engines fold the plane dot product left-to-right over
    # d = 0..63, so the doubles are bit-identical.
    oracle="""
    WITH planes AS (SELECT unnest(range(8)) AS p),
    buck AS (
        SELECT vec_id, embedding,
               CAST(sum(CASE WHEN dotp > 0 THEN 1 << p ELSE 0 END) AS BIGINT) AS bucket
        FROM (
            SELECT e.vec_id, e.embedding, p.p AS p,
                   list_reduce(list_transform(range(64),
                       d_ -> CAST(e.embedding[d_ + 1] AS DOUBLE) *
                             (CAST(('0x' || substring(md5(p.p::VARCHAR || ':' || d_::VARCHAR), 1, 8))::BIGINT
                                   % 2000 AS DOUBLE) / 1000.0 - 1.0)),
                     (a, b) -> a + b) AS dotp
            FROM embeddings e CROSS JOIN planes p)
        GROUP BY vec_id, embedding),
    q AS (SELECT vec_id AS query_id, embedding AS q_vec, bucket FROM buck WHERE vec_id < 10),
    c AS (SELECT vec_id, embedding AS c_vec, bucket FROM buck),
    scored AS (
        SELECT q.query_id, c.vec_id,
               list_reduce(list_transform(list_zip(q.q_vec, c.c_vec),
                   x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (a, b) -> a + b)
               / (sqrt(list_reduce(list_transform(q.q_vec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b))
                  * sqrt(list_reduce(list_transform(c.c_vec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b)))
                   AS cosine
        FROM q JOIN c USING (bucket)),
    ranked AS (
        SELECT query_id, vec_id, cosine,
               CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS INT) AS rank
        FROM scored)
    SELECT query_id, vec_id, cosine, rank FROM ranked WHERE rank <= 5
    """,
    doc="C10+: driver-visible random-hyperplane LSH algorithm gate — "
    "deterministic md5-derived plane components, sign-bit bucketing, "
    "bucket equi-join candidates, exact cosine re-rank; hash-verified "
    "(values bit-identical) against an independent DuckDB replay.  The "
    "xxhash64 production operator (c10_cosine_topk_lsh) keeps its recall "
    "gate.",
)
def c10_lsh_md5_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logspout_kinesis_tests_spark.functions.vectors import dot_product, l2_norm

    n_planes, dim, k = 8, 64, 5

    def bucket_expr(vec: str):
        comp = (
            "(CAST(CAST(conv(substring(md5(concat(CAST(p AS STRING), ':', "
            "CAST(d AS STRING))), 1, 8), 16, 10) AS LONG) % 2000 AS DOUBLE) "
            "/ 1000.0 - 1.0)"
        )
        return F.expr(
            f"""
            aggregate(sequence(0, {n_planes - 1}), 0L,
              (acc, p) -> acc + CASE WHEN
                aggregate(sequence(0, {dim - 1}), CAST(0.0 AS DOUBLE),
                  (s, d) -> s + CAST(element_at({vec}, d + 1) AS DOUBLE) * {comp}) > 0
              THEN shiftleft(1L, p) ELSE 0L END)
            """
        )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.select("vec_id", "embedding")
    qb = queries.select(
        "query_id",
        F.col("embedding").alias("q_vec"),
        bucket_expr("embedding").alias("bucket"),
    )
    cb = corpus.select(
        "vec_id",
        F.col("embedding").alias("c_vec"),
        bucket_expr("embedding").alias("bucket"),
    )
    denom = l2_norm(F.col("q_vec")) * l2_norm(F.col("c_vec"))
    scored = F.broadcast(qb).join(cb, "bucket").select(
        "query_id",
        "vec_id",
        F.when(denom == 0, F.lit(None))
        .otherwise(dot_product(F.col("q_vec"), F.col("c_vec")) / denom)
        .alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )
