"""Round-3b analytics additions: rolling-window anomaly detection, A/B
significance testing, URL/domain auditing, URL-level dedup, and curriculum
ordering.

All are standard jobs a 100 TB telemetry / pretraining corpus runs daily,
and all are pure built-in-expression plans:

- ``c16_rolling_zscore`` — per-key rolling mean/std over the trailing 20
  events (ROWS frame, current row excluded) flags outlier readings.  One
  shuffle on the partition key; the frame is bounded so state per row is
  O(1) regardless of corpus size.
- ``c2_welch_ttest`` — Welch's unequal-variance t-test between two user
  cohorts per event type, from five decimal-exact conditional sums (one
  map-combined aggregate; the t statistic and Welch–Satterthwaite dof are
  closed-form double arithmetic on exact inputs, so cross-engine
  bit-stable).
- ``c11_url_domains`` — per-domain reference counts over documents (the
  domain-blocklist / provenance-audit prep step).  URLs are injected
  deterministically (the synthetic corpus has none), extracted scan-side
  with one regex, exploded, and counted with map-side combine; document
  bodies never shuffle — only (domain, doc_id) pairs do.
- ``c8_url_dedup`` — canonicalize-and-keep-min URL dedup, the crawl
  frontier's cheapest pass (runs before any content hashing).
- ``c14_curriculum_order`` — band-stratified deterministic training order
  with no global sort (per-(band, shard) windows only).
- ``c2_salted_hot_key_agg`` / ``c3_salted_join_parity`` — the skew-salting
  utilities hash-matched against their unsalted oracles, proving the
  hot-key levers are semantics-preserving.

Capability extension beyond the reference (which has no analytics surface —
its dataflow is restructure-and-forward, ``logspoutkinesis.go:231-271``);
part of the SURVEY.md §2 Part C [EXT] north-star block.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from logspout_kinesis_tests_spark.plans.registry import register
from logspout_kinesis_tests_spark.sources.tables import load_table

# --- rolling z-score anomaly detection -------------------------------------

_ZSCORE_FRAME = 20  # trailing rows per key
_ZSCORE_MIN_N = 10  # readings required before the detector arms
_ZSCORE_CUT = 2.0  # |z| threshold


@register(
    "c16_rolling_zscore",
    oracle=f"""
    WITH winned AS (
        SELECT event_id, user_id, value,
               COUNT(value) OVER w AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS s,
               CAST(SUM(CAST(value AS DECIMAL(18,2))
                        * CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS q
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN {_ZSCORE_FRAME} PRECEDING AND 1 PRECEDING))
    SELECT event_id, user_id, value, n,
           round((value - s / n) / sqrt((q - s * s / n) / (n - 1)), 6) AS zscore
    FROM winned
    WHERE n >= {_ZSCORE_MIN_N}
      AND (q - s * s / n) / (n - 1) > 0
      AND abs((value - s / n) / sqrt((q - s * s / n) / (n - 1))) > {_ZSCORE_CUT}
    """,
    doc="C16+: rolling z-score anomaly detection — each reading scored "
    "against the mean/std of its user's trailing 20 events (ROWS frame, "
    "current row excluded; detector arms at n>=10).  Rolling sums are "
    "decimal-exact, variance is the closed two-sum form, so the double "
    "z-score is bit-identical cross-engine.  Bounded frame = O(1) window "
    "state per row at any scale; one shuffle on the partition key.",
)
def c16_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value", "ts"
    )
    vd = F.col("value").cast("decimal(18,2)")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-_ZSCORE_FRAME, -1)
    )
    winned = ev.select(
        "event_id",
        "user_id",
        "value",
        F.count("value").over(w).alias("n"),
        F.sum(vd).over(w).cast("double").alias("s"),
        F.sum(vd * vd).over(w).cast("double").alias("q"),
    )
    n, s, q = F.col("n"), F.col("s"), F.col("q")
    var = (q - s * s / n) / (n - 1)
    z = (F.col("value") - s / n) / F.sqrt(var)
    return (
        winned.filter(
            (n >= _ZSCORE_MIN_N) & (var > 0) & (F.abs(z) > _ZSCORE_CUT)
        )
        .select(
            "event_id", "user_id", "value", "n", F.round(z, 6).alias("zscore")
        )
    )


# --- Welch's t-test (A/B cohort comparison) ---------------------------------


@register(
    "c2_welch_ttest",
    oracle="""
    WITH sums AS (
        SELECT event_type,
               COUNT(CASE WHEN user_id % 2 = 0 THEN value END) AS n0,
               COUNT(CASE WHEN user_id % 2 = 1 THEN value END) AS n1,
               CAST(SUM(CASE WHEN user_id % 2 = 0
                             THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS s0,
               CAST(SUM(CASE WHEN user_id % 2 = 1
                             THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS s1,
               CAST(SUM(CASE WHEN user_id % 2 = 0
                             THEN CAST(value AS DECIMAL(18,2))
                                  * CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS q0,
               CAST(SUM(CASE WHEN user_id % 2 = 1
                             THEN CAST(value AS DECIMAL(18,2))
                                  * CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS q1
        FROM events GROUP BY event_type),
    stats AS (
        SELECT event_type, n0, n1,
               (q0 - s0 * s0 / n0) / (n0 - 1) / n0 AS se0,
               (q1 - s1 * s1 / n1) / (n1 - 1) / n1 AS se1,
               s0 / n0 - s1 / n1 AS mean_diff
        FROM sums WHERE n0 > 1 AND n1 > 1)
    SELECT event_type, n0, n1,
           round(mean_diff, 6) AS mean_diff,
           CASE WHEN se0 + se1 <= 0 THEN NULL
                ELSE round(mean_diff / sqrt(se0 + se1), 6) END AS t_stat,
           CASE WHEN se0 + se1 <= 0 THEN NULL
                ELSE round((se0 + se1) * (se0 + se1)
                           / (se0 * se0 / (n0 - 1) + se1 * se1 / (n1 - 1)), 6)
                END AS welch_dof
    FROM stats
    """,
    doc="C2+: Welch's unequal-variance t-test per event type between the "
    "even/odd user_id cohorts — five decimal-exact conditional sums in ONE "
    "map-combined aggregate, then the t statistic and Welch-Satterthwaite "
    "dof as closed-form double arithmetic (identical op sequence both "
    "engines, 6dp-rounded).  The A/B significance primitive: at 100 TB the "
    "whole test is one shuffle of (event_type, five partials).",
)
def c2_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id", "value")
    vd = F.col("value").cast("decimal(18,2)")
    even = F.col("user_id") % 2 == 0
    sums = ev.groupBy("event_type").agg(
        F.count(F.when(even, F.col("value"))).alias("n0"),
        F.count(F.when(~even, F.col("value"))).alias("n1"),
        F.sum(F.when(even, vd)).cast("double").alias("s0"),
        F.sum(F.when(~even, vd)).cast("double").alias("s1"),
        F.sum(F.when(even, vd * vd)).cast("double").alias("q0"),
        F.sum(F.when(~even, vd * vd)).cast("double").alias("q1"),
    )
    n0, n1 = F.col("n0"), F.col("n1")
    s0, s1, q0, q1 = F.col("s0"), F.col("s1"), F.col("q0"), F.col("q1")
    stats = sums.filter((n0 > 1) & (n1 > 1)).select(
        "event_type",
        "n0",
        "n1",
        ((q0 - s0 * s0 / n0) / (n0 - 1) / n0).alias("se0"),
        ((q1 - s1 * s1 / n1) / (n1 - 1) / n1).alias("se1"),
        (s0 / n0 - s1 / n1).alias("mean_diff"),
    )
    se0, se1, md = F.col("se0"), F.col("se1"), F.col("mean_diff")
    # zero-variance cohorts (se0+se1 == 0, possible on degenerate/constant
    # groups) → NULL, not a 0/0: ANSI Spark raises on the division and
    # DuckDB's sqrt(0) denominator yields NaN — NULL is the shared answer
    degenerate = se0 + se1 <= 0
    return stats.select(
        "event_type",
        "n0",
        "n1",
        F.round(md, 6).alias("mean_diff"),
        F.when(degenerate, F.lit(None).cast("double"))
        .otherwise(F.round(md / F.sqrt(se0 + se1), 6))
        .alias("t_stat"),
        F.when(degenerate, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                (se0 + se1) * (se0 + se1)
                / (se0 * se0 / (n0 - 1) + se1 * se1 / (n1 - 1)),
                6,
            )
        )
        .alias("welch_dof"),
    )


# --- URL / domain audit ------------------------------------------------------

# Deterministic URL injection — the synthetic corpus has no URLs, so plant
# them the same way c11_pii_scrub plants contact strings: every 3rd doc
# references two domains drawn from small modular families (so domains repeat
# across docs and the per-domain counts are non-trivial).
_URL_RX = r"https?://([a-z0-9.-]+)"


def _with_urls(docs: DataFrame) -> DataFrame:
    tri = F.col("doc_id") % 3 == 0
    injected = F.concat(
        F.col("text"),
        F.lit(" see https://site"),
        (F.col("doc_id") % 20).cast("string"),
        F.lit(".example.com/p/"),
        F.col("doc_id").cast("string"),
        F.lit(" and http://cdn"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".example.net/img"),
    )
    return docs.select(
        "doc_id", F.when(tri, injected).otherwise(F.col("text")).alias("txt")
    )


@register(
    "c11_url_domains",
    oracle=f"""
    WITH docs AS (
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0
                    THEN text || ' see https://site' || CAST(doc_id % 20 AS VARCHAR)
                         || '.example.com/p/' || CAST(doc_id AS VARCHAR)
                         || ' and http://cdn' || CAST(doc_id % 7 AS VARCHAR)
                         || '.example.net/img'
                    ELSE text END AS txt
        FROM documents),
    refs AS (
        SELECT doc_id, unnest(regexp_extract_all(txt, '{_URL_RX}', 1)) AS domain
        FROM docs)
    SELECT domain, COUNT(*) AS n_refs, COUNT(DISTINCT doc_id) AS n_docs
    FROM refs GROUP BY domain
    """,
    doc="C11+: URL/domain audit — extract every referenced domain with one "
    "scan-side regex, explode, and count refs + distinct docs per domain "
    "(map-combined).  The domain-blocklist / provenance-dashboard prep "
    "step: document bodies never shuffle, only (domain, doc_id) pairs.  "
    "URLs are injected deterministically (every 3rd doc, two modular "
    "domain families) since the synthetic corpus has none.",
)
def c11_url_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _with_urls(load_table(spark, sf_dir, "documents"))
    refs = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.col("txt"), F.lit(_URL_RX), F.lit(1))
        ).alias("domain"),
    )
    return refs.groupBy("domain").agg(
        F.count("*").alias("n_refs"),
        F.count_distinct("doc_id").alias("n_docs"),
    )


# --- URL canonicalization dedup ---------------------------------------------


@register(
    "c8_url_dedup",
    oracle="""
    WITH urls AS (
        SELECT doc_id,
               'HTTPS://Site' || CAST(doc_id % 50 AS VARCHAR)
               || '.Example.COM/path/' || CAST(doc_id % 25 AS VARCHAR)
               || CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END
               || CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed#frag' ELSE '' END
                   AS url
        FROM documents),
    canon AS (
        SELECT doc_id,
               regexp_replace(
                   regexp_replace(
                       regexp_replace(lower(url), '^https?://', ''),
                       '[?#].*$', ''),
                   '/$', '') AS canonical_url
        FROM urls)
    SELECT canonical_url,
           MIN(doc_id) AS kept_doc_id,
           COUNT(*) - 1 AS n_dups
    FROM canon GROUP BY canonical_url
    """,
    doc="C8+: URL-level dedup — canonicalize (lowercase, strip scheme / "
    "query / fragment / trailing slash) and keep the lowest doc_id per "
    "canonical URL.  The crawl frontier's cheapest dedup pass: runs before "
    "any content hash, entirely scan-side regex + one (url_key, id) "
    "shuffle.  URLs are injected deterministically with case/query/slash "
    "variants so the canonicalizer has real work to do.",
)
def c8_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    url = F.concat(
        F.lit("HTTPS://Site"),
        (F.col("doc_id") % 50).cast("string"),
        F.lit(".Example.COM/path/"),
        (F.col("doc_id") % 25).cast("string"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 3 == 0, F.lit("?utm_source=feed#frag")).otherwise(
            F.lit("")
        ),
    )
    canon = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.lower(url), F.lit("^https?://"), F.lit("")),
            F.lit("[?#].*$"),
            F.lit(""),
        ),
        F.lit("/$"),
        F.lit(""),
    )
    return (
        docs.select("doc_id", canon.alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.min("doc_id").alias("kept_doc_id"),
            (F.count("*") - 1).alias("n_dups"),
        )
    )


# --- curriculum ordering -----------------------------------------------------


@register(
    "c14_curriculum_order",
    oracle="""
    WITH banded AS (
        SELECT doc_id,
               LEAST(9, CAST(floor(n_chars / 200.0) AS BIGINT)) AS band,
               md5('cur:' || CAST(doc_id AS VARCHAR)) AS k
        FROM documents)
    SELECT doc_id, band, substring(k, 1, 2) AS shard,
           ROW_NUMBER() OVER (
               PARTITION BY band, substring(k, 1, 2) ORDER BY k, doc_id) AS pos
    FROM banded
    """,
    doc="C14+: curriculum training order — documents stratified into "
    "difficulty bands (fixed-width n_chars buckets, easiest first) and "
    "deterministically shuffled WITHIN each band; readers consume bands in "
    "order and a band's 256 hash shards in parallel.  Same no-global-sort "
    "shape as c14_corpus_shuffle with a band prefix: every (band, shard) "
    "window is an independent partition at 100 TB.",
)
def c14_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    key = F.md5(F.concat(F.lit("cur:"), F.col("doc_id").cast("string")))
    band = F.least(F.lit(9).cast("long"), F.floor(F.col("n_chars") / 200.0))
    w = W.partitionBy("band", "shard").orderBy("_k", "doc_id")
    return (
        docs.select("doc_id", band.alias("band"), key.alias("_k"))
        .withColumn("shard", F.substring("_k", 1, 2))
        .withColumn("pos", F.row_number().over(w))
        .select("doc_id", "band", "shard", "pos")
    )


# --- skew-salting parity (driver-verified) ----------------------------------


@register(
    "c2_salted_hot_key_agg",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
           COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
    doc="C2+: salted two-phase aggregation parity — the hot-key spreading "
    "path (group by (key, salt) then fold partials by key) hash-matched "
    "against the plain GROUP BY oracle, proving salting only re-associates "
    "the decimal-exact sums.  The lever for a single dominant group key "
    "(one chatty host, one boilerplate fingerprint) at 100 TB.",
)
def c2_salted_hot_key_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logspout_kinesis_tests_spark.operators.skew import salted_aggregate

    ev = load_table(spark, sf_dir, "events").select("event_type", "value", "event_id")
    out = salted_aggregate(
        ev,
        keys=["event_type"],
        sum_cols={"total": F.col("value").cast("decimal(18,2)")},
        salt_buckets=16,
        salt_source="event_id",
    )
    return out.select("event_type", F.col("total").cast("double").alias("total"), "n")


@register(
    "c3_salted_join_parity",
    oracle="""
    WITH dim AS (SELECT DISTINCT event_type, length(event_type) AS w FROM events)
    SELECT e.event_type, COUNT(*) AS n, CAST(SUM(d.w) AS BIGINT) AS w_total
    FROM events e JOIN dim d USING (event_type)
    GROUP BY e.event_type
    """,
    doc="C3+: salted replicated join parity — the big side salts its join "
    "key, the small side explodes across every salt value, and the result "
    "hash-matches the plain equi-join oracle.  The lever when one join "
    "key's matches overwhelm a task and the small side is replicable but "
    "not broadcastable.",
)
def c3_salted_join_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logspout_kinesis_tests_spark.operators.skew import salted_join

    ev = load_table(spark, sf_dir, "events").select("event_type", "event_id")
    dim = ev.select("event_type").distinct().withColumn(
        "w", F.length("event_type").cast("long")
    )
    joined = salted_join(
        ev, dim, key="event_type", salt_buckets=8, big_salt_source="event_id"
    )
    return joined.groupBy("event_type").agg(
        F.count("*").alias("n"), F.sum("w").alias("w_total")
    )


# --- per-label embedding centroids ------------------------------------------


@register(
    "c10_label_centroids",
    oracle="""
    WITH dims AS (
        SELECT label,
               generate_subscripts(embedding, 1) - 1 AS pos,
               CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000 + 0.5)
                    AS BIGINT) AS xq
        FROM embeddings)
    SELECT label, pos,
           CAST(SUM(xq) AS DOUBLE) / COUNT(*) / 1000000 AS mu,
           COUNT(*) AS n
    FROM dims GROUP BY label, pos
    """,
    doc="C10+: per-label embedding centroids (class prototypes) — one "
    "posexplode scan, one map-combined (label, dim) aggregate; elements "
    "are quantized to integer micro-units scan-side (floor(x*1e6+0.5) — "
    "pure IEEE ops, no engine-specific decimal rounding) and summed "
    "exactly, so the distributed mean is order-independent and "
    "cross-engine bit-identical.  The prototype/cluster-center primitive "
    "behind SemDeDup cells, label quality audits, and k-means "
    "verification; shuffles (label, dim, partial) triples only.",
)
def c10_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "label", F.posexplode("embedding").alias("pos", "x")
    )
    xq = F.floor(F.col("x").cast("double") * 1000000 + 0.5).cast("long")
    return (
        emb.select("label", "pos", xq.alias("xq"))
        .groupBy("label", "pos")
        .agg(
            (F.sum("xq").cast("double") / F.count("*") / 1000000).alias("mu"),
            F.count("*").alias("n"),
        )
    )


# --- MIME sniffing (multimodal triage) ---------------------------------------


@register(
    "c12_mime_sniff",
    oracle="""
    WITH pay AS (
        SELECT doc_id, CASE doc_id % 6
            WHEN 0 THEN from_hex('89504E470D0A1A0A0000000D49484452')
            WHEN 1 THEN from_hex('FFD8FFE000104A464946')
            WHEN 2 THEN from_hex('524946460A00000057415645666D7420')
            WHEN 3 THEN from_hex('000000186674797069736F6D')
            WHEN 4 THEN from_hex('1F8B0800000000000003')
            ELSE encode('plain text payload, no magic')
        END AS payload
        FROM documents),
    hx AS (SELECT doc_id, hex(payload) AS h FROM pay)
    SELECT doc_id,
           CASE
               WHEN substring(h, 1, 16) = '89504E470D0A1A0A' THEN 'image/png'
               WHEN substring(h, 1, 6) = 'FFD8FF' THEN 'image/jpeg'
               WHEN substring(h, 1, 8) = '52494646'
                    AND substring(h, 17, 8) = '57415645' THEN 'audio/wav'
               WHEN substring(h, 9, 8) = '66747970' THEN 'video/mp4'
               WHEN substring(h, 1, 4) = '1F8B' THEN 'application/gzip'
               ELSE 'application/octet-stream'
           END AS mime
    FROM hx
    """,
    doc="C12+: magic-byte MIME sniffing over a mixed-modality corpus "
    "(PNG/JPEG/WAV/MP4/gzip/plain planted round-robin) — the zero-decode "
    "triage pass that routes payloads to decoder pools.  One hex() of the "
    "leading bytes, scan-side prefix tests, no UDF; at 100 TB this reads "
    "only the column stripe head bytes it needs.",
)
def c12_mime_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logspout_kinesis_tests_spark.operators.multimodal import sniff_mime

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    payload = (
        F.when(F.col("doc_id") % 6 == 0, F.unhex(F.lit("89504E470D0A1A0A0000000D49484452")))
        .when(F.col("doc_id") % 6 == 1, F.unhex(F.lit("FFD8FFE000104A464946")))
        .when(F.col("doc_id") % 6 == 2, F.unhex(F.lit("524946460A00000057415645666D7420")))
        .when(F.col("doc_id") % 6 == 3, F.unhex(F.lit("000000186674797069736F6D")))
        .when(F.col("doc_id") % 6 == 4, F.unhex(F.lit("1F8B0800000000000003")))
        .otherwise(F.encode(F.lit("plain text payload, no magic"), "UTF-8"))
    )
    return sniff_mime(docs.select("doc_id", payload.alias("payload"))).select(
        "doc_id", "mime"
    )


# --- TIFF/EXIF IFD decode ----------------------------------------------------


@register(
    "c12_tiff_ifd_decode",
    # Oracle knows each row's fields analytically (it synthesizes the same
    # payloads); the Spark side discovers them by actually following the
    # per-row-varying IFD offset and walking the entry list — comparing the
    # two validates the walk, same contract as c12_jpeg_header_decode.
    oracle="""
    WITH par AS (
        SELECT doc_id,
               16 + doc_id % 4001 AS w,
               16 + doc_id % 2999 AS h,
               1 + doc_id % 8 AS o
        FROM documents)
    SELECT doc_id,
           doc_id % 50 <> 0 AS tiff_valid,
           CASE WHEN doc_id % 50 <> 0 THEN w END AS tiff_width,
           CASE WHEN doc_id % 50 <> 0 THEN h END AS tiff_height,
           CASE WHEN doc_id % 50 <> 0 AND doc_id % 70 <> 0 THEN o END
               AS orientation
    FROM par
    """,
    doc="C12+: TIFF/EXIF IFD decode — follow the header's per-row-varying "
    "directory offset (0-3 pad bytes planted), read the entry count, walk "
    "the 12-byte entries for ImageWidth/ImageLength/Orientation.  A real "
    "bounded directory walk in scan-side expressions (transform+filter "
    "over the entry list, no UDF); corrupt magic every 50th doc takes the "
    "NULL path, every 70th doc omits Orientation (entry genuinely absent, "
    "not NULLed).  The orientation-normalization first pass of an image "
    "pipeline.",
)
def c12_tiff_ifd_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logspout_kinesis_tests_spark.operators.multimodal import (
        parse_tiff_header,
        synth_tiff_payload,
    )

    par = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        (F.lit(16) + F.col("doc_id") % 4001).alias("width"),
        (F.lit(16) + F.col("doc_id") % 2999).alias("height"),
        # every 70th doc: NULL → synth emits a 2-entry IFD (the tag is
        # genuinely absent, exercising the parser's missing-tag path)
        F.when(F.col("doc_id") % 70 == 0, F.lit(None))
        .otherwise(F.lit(1) + F.col("doc_id") % 8)
        .cast("long")
        .alias("orientation"),
        (F.col("doc_id") % 4).alias("pad"),
    )
    payloads = synth_tiff_payload(par).withColumn(
        "payload",
        F.when(F.col("doc_id") % 50 == 0, F.unhex(F.lit("DEADBEEF"))).otherwise(
            F.col("payload")
        ),
    )
    return parse_tiff_header(payloads).select(
        "doc_id",
        "tiff_valid",
        F.col("tiff_width").cast("long").alias("tiff_width"),
        F.col("tiff_height").cast("long").alias("tiff_height"),
        F.col("orientation").cast("long").alias("orientation"),
    )


# --- gap fill with linear interpolation --------------------------------------


@register(
    "c16_gap_fill_interp",
    oracle=f"""
    WITH obs AS (
        SELECT event_type, date_trunc('hour', ts) AS bucket_start,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM events GROUP BY 1, 2),
    bounds AS (
        SELECT event_type, min(bucket_start) AS mn, max(bucket_start) AS mx
        FROM obs GROUP BY 1),
    grid AS (
        SELECT event_type,
               unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS bucket_start
        FROM bounds),
    winned AS (
        SELECT g.event_type, g.bucket_start, o.n, o.total,
               epoch_us(g.bucket_start) AS us,
               last_value(o.total IGNORE NULLS) OVER back AS prev_v,
               first_value(o.total IGNORE NULLS) OVER fwd AS next_v,
               last_value(CASE WHEN o.n IS NOT NULL
                               THEN epoch_us(g.bucket_start) END IGNORE NULLS)
                   OVER back AS prev_us,
               first_value(CASE WHEN o.n IS NOT NULL
                                THEN epoch_us(g.bucket_start) END IGNORE NULLS)
                   OVER fwd AS next_us
        FROM grid g LEFT JOIN obs o
          ON g.event_type = o.event_type AND g.bucket_start = o.bucket_start
        WINDOW back AS (PARTITION BY g.event_type ORDER BY g.bucket_start
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               fwd AS (PARTITION BY g.event_type ORDER BY g.bucket_start
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
    SELECT event_type,
           strftime(bucket_start, '%Y-%m-%d %H:%M:%S.%f') AS bucket_start,
           coalesce(n, 0) AS n,
           CASE WHEN n IS NOT NULL THEN total
                WHEN prev_v IS NOT NULL AND next_v IS NOT NULL
                THEN round(prev_v + (next_v - prev_v)
                           * ((us - prev_us) / CAST(next_us - prev_us AS DOUBLE)), 6)
           END AS total_interp,
           n IS NULL AS is_gap
    FROM winned
    """,
    doc="C16+: gap-filled hourly rollup with LINEAR interpolation — the "
    "time_bucket_gapfill/interpolate hypertable pair: gap buckets get the "
    "straight-line value between the previous and next observed totals "
    "(exact integer-microsecond distances, 6dp-rounded blend); edges stay "
    "NULL.  Same bounds-exploded grid as the LOCF variant plus one "
    "backward and one forward per-key window.",
)
def c16_gap_fill_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logspout_kinesis_tests_spark.operators.timeseries import (
        gap_fill_interpolate,
    )
    from logspout_kinesis_tests_spark.plans.helpers import ts_str

    ev = load_table(spark, sf_dir, "events")
    out = gap_fill_interpolate(ev)
    return out.select(
        "event_type",
        ts_str("bucket_start").alias("bucket_start"),
        "n",
        "total_interp",
        "is_gap",
    )


# --- HTML boilerplate stripping ----------------------------------------------


@register(
    "c11_html_strip",
    # Injection wraps every 2nd doc's text in markup (tags, a script block,
    # an entity); the strip chain drops script blocks, then all tags, then
    # decodes the entity and collapses whitespace.  DuckDB needs the 'g'
    # flag for replace-all ('s' for dotall); Spark replaces all by default
    # with inline (?s).
    oracle="""
    WITH raw AS (
        SELECT doc_id,
               CASE WHEN doc_id % 2 = 0
                    THEN '<html><body><h1>T</h1><p class="x">' || text
                         || ' &amp; more</p><script>var x = 1;</script></body></html>'
                    ELSE text END AS html
        FROM documents),
    stripped AS (
        SELECT doc_id,
               trim(regexp_replace(
                   regexp_replace(
                       regexp_replace(
                           regexp_replace(html, '<script.*?</script>', ' ', 'gs'),
                           '<[^>]+>', ' ', 'g'),
                       '&amp;', '&', 'g'),
                   '\\s+', ' ', 'g')) AS clean
        FROM raw)
    SELECT doc_id, clean, length(clean) AS n_chars_clean
    FROM stripped
    """,
    doc="C11+: HTML boilerplate strip — drop script blocks, remove tags, "
    "decode entities, collapse whitespace; the markup-removal first pass "
    "of any web-crawl corpus (C4/CCNet pipelines).  One scan-side "
    "regexp_replace chain, codegen, bodies never shuffle.  Markup is "
    "injected deterministically (every 2nd doc) since the synthetic "
    "corpus is plain text.",
)
def c11_html_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    html = F.when(
        F.col("doc_id") % 2 == 0,
        F.concat(
            F.lit('<html><body><h1>T</h1><p class="x">'),
            F.col("text"),
            F.lit(" &amp; more</p><script>var x = 1;</script></body></html>"),
        ),
    ).otherwise(F.col("text"))
    clean = F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(html, F.lit(r"(?s)<script.*?</script>"), F.lit(" ")),
                    F.lit(r"<[^>]+>"),
                    F.lit(" "),
                ),
                F.lit("&amp;"),
                F.lit("&"),
            ),
            F.lit(r"\s+"),
            F.lit(" "),
        )
    )
    return docs.select(
        "doc_id", clean.alias("clean"), F.length(clean).cast("long").alias("n_chars_clean")
    )


# --- Pareto / cumulative-share analysis --------------------------------------


@register(
    "c2_pareto_share",
    oracle="""
    WITH agg AS (
        SELECT event_type,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM events GROUP BY event_type),
    tot AS (SELECT CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS grand
            FROM events),
    ranked AS (
        SELECT a.event_type, a.total,
               SUM(a.total) OVER (ORDER BY a.total DESC, a.event_type) AS cum,
               t.grand
        FROM agg a CROSS JOIN tot t)
    SELECT event_type, total,
           round(cum / grand, 6) AS cum_share,
           cum / grand <= 0.8 OR cum - total = 0 AS in_pareto_head
    FROM ranked
    """,
    doc="C2+: Pareto / cumulative-share analysis — event types ranked by "
    "decimal-exact total value with running share of the grand total; the "
    "80/20 head flag marks the smallest prefix covering 80% (the top "
    "contributor always qualifies).  The ordered window runs over the "
    "ALREADY-AGGREGATED per-type table — one map-combined shuffle plus a "
    "window over rows = distinct keys, never raw events.",
)
def c2_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W2

    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    vd = F.col("value").cast("decimal(18,2)")
    agg = ev.groupBy("event_type").agg(F.sum(vd).cast("double").alias("total"))
    grand = ev.agg(F.sum(vd).cast("double").alias("grand"))
    # unpartitioned window is deliberate: it runs over one row per
    # event_type (distinct keys), not raw events — bounded at any scale
    w = W2.orderBy(F.col("total").desc(), "event_type").rowsBetween(
        W2.unboundedPreceding, 0
    )
    ranked = agg.crossJoin(F.broadcast(grand)).withColumn(
        "cum", F.sum("total").over(w)
    )
    return ranked.select(
        "event_type",
        "total",
        F.round(F.col("cum") / F.col("grand"), 6).alias("cum_share"),
        (
            (F.col("cum") / F.col("grand") <= 0.8)
            | (F.col("cum") - F.col("total") == 0)
        ).alias("in_pareto_head"),
    )


# --- existence (mark) join ---------------------------------------------------


@register(
    "c3_exists_flag",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                   AND o.o_totalprice > 100000) AS has_big_order
    FROM customer c
    """,
    doc="C3+: existence (mark) join — every customer row kept, annotated "
    "with whether a qualifying order EXISTS (the audit/enrichment shape: "
    "semi join keeps only matches, anti only non-matches, mark keeps ALL "
    "rows with a boolean).  Implemented as a left join against the "
    "distinct qualifying keys, so the probe side carries one row per key "
    "and the flag is a NULL test — no row multiplication, one shuffle.",
)
def c3_exists_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 100000)
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
        .withColumn("_hit", F.lit(True))
    )
    return cust.join(big, "c_custkey", "left").select(
        "c_custkey",
        "c_name",
        F.coalesce("_hit", F.lit(False)).alias("has_big_order"),
    )


# --- week-over-week change ---------------------------------------------------


@register(
    "c5_week_over_week",
    oracle="""
    WITH weekly AS (
        SELECT event_type, date_trunc('week', ts) AS week,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM events GROUP BY 1, 2),
    laged AS (
        SELECT event_type, week, total,
               lag(total) OVER (PARTITION BY event_type ORDER BY week) AS prev
        FROM weekly)
    SELECT event_type, strftime(week, '%Y-%m-%d') AS week, total,
           CASE WHEN prev IS NOT NULL AND prev <> 0
                THEN round((total - prev) / prev, 6) END AS wow_change
    FROM laged
    """,
    doc="C5+: week-over-week change — weekly decimal-exact totals per "
    "event type with lag() percent change (the dashboard staple).  The "
    "window runs over the AGGREGATED weekly table (rows = keys × weeks), "
    "never raw events; one map-combined shuffle plus one bounded window.",
)
def c5_week_over_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W2

    from logspout_kinesis_tests_spark.plans.helpers import date_str

    ev = load_table(spark, sf_dir, "events").select("event_type", "ts", "value")
    weekly = ev.groupBy(
        "event_type", F.date_trunc("week", F.col("ts")).alias("week")
    ).agg(F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total"))
    w = W2.partitionBy("event_type").orderBy("week")
    laged = weekly.withColumn("prev", F.lag("total").over(w))
    return laged.select(
        "event_type",
        date_str("week").alias("week"),
        "total",
        F.when(
            F.col("prev").isNotNull() & (F.col("prev") != 0),
            F.round((F.col("total") - F.col("prev")) / F.col("prev"), 6),
        ).alias("wow_change"),
    )


# --- k-fold cross-validation assignment --------------------------------------


@register(
    "c14_kfold_assign",
    oracle="""
    SELECT doc_id,
           CAST(('0x' || substring(md5('fold:' || md5(text)), 1, 8))::BIGINT % 5
                AS BIGINT) AS fold
    FROM documents
    """,
    doc="C14+: k-fold cross-validation assignment — fold = md5 of the "
    "CONTENT hash mod k, so exact-duplicate documents always share a fold "
    "(no train/validate leakage through copies, same property as "
    "c14_dataset_split) and the assignment is stable under re-runs and "
    "re-partitioning.  Pure scan-side hash arithmetic, no shuffle at all.",
)
def c14_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    fold = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("fold:"), F.md5("text"))), 1, 8), 16, 10
        ).cast("long")
        % 5
    )
    return docs.select("doc_id", fold.alias("fold"))


# --- per-document keyword extraction -----------------------------------------


@register(
    "c11_keywords",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
        FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
    dfreq AS (SELECT term, count(*) AS df_ FROM tf GROUP BY term),
    n AS (SELECT count(*) AS n FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term,
               round(tf.tf * (ln((1 + n.n) / (1 + dfreq.df_)) + 1.0), 6) AS tfidf
        FROM tf JOIN dfreq USING (term) CROSS JOIN n),
    ranked AS (
        SELECT doc_id, term, tfidf,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY tfidf DESC, term) AS rank
        FROM scored)
    SELECT doc_id, term, tfidf, rank FROM ranked WHERE rank <= 3
    """,
    doc="C11+: per-document keyword extraction — top-3 terms by TF-IDF "
    "(ties broken lexically) per doc; the automatic tagging / routing "
    "primitive.  Reuses the tfidf_terms plan (one tokenize scan, "
    "map-combined counts, broadcast df/N joins) plus one per-doc window "
    "over the scored (doc, term) rows.",
)
def c11_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W2

    from logspout_kinesis_tests_spark.operators.text_analysis import tfidf_terms

    scored = tfidf_terms(load_table(spark, sf_dir, "documents"))
    w = W2.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "term")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "term", "tfidf", "rank")
    )


# --- chi-squared independence test -------------------------------------------


@register(
    "c2_chi_squared",
    oracle="""
    WITH cells AS (
        SELECT event_type, user_id % 2 AS cohort, COUNT(*) AS o
        FROM events GROUP BY 1, 2),
    margins AS (
        SELECT event_type, cohort, o,
               SUM(o) OVER (PARTITION BY event_type) AS row_t,
               SUM(o) OVER (PARTITION BY cohort) AS col_t,
               SUM(o) OVER () AS grand
        FROM cells),
    terms AS (
        SELECT round((o - CAST(row_t * col_t AS DOUBLE) / grand)
                     * (o - CAST(row_t * col_t AS DOUBLE) / grand)
                     / (CAST(row_t * col_t AS DOUBLE) / grand), 6) AS term
        FROM margins)
    SELECT CAST(SUM(CAST(term AS DECIMAL(18,6))) AS DOUBLE) AS chi2,
           COUNT(*) AS n_cells
    FROM terms
    """,
    doc="C2+: chi-squared independence test of event_type x cohort — exact "
    "integer contingency counts, expected values in closed-form double "
    "arithmetic, 6dp-rounded per-cell terms decimal-summed so the "
    "statistic is order-independent and cross-engine exact.  The "
    "categorical counterpart of c2_welch_ttest; the margins windows run "
    "over the aggregated cell table (rows = types x cohorts), never raw "
    "events.",
)
def c2_chi_squared(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W2

    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    cells = ev.groupBy(
        "event_type", (F.col("user_id") % 2).alias("cohort")
    ).agg(F.count("*").alias("o"))
    margins = (
        cells.withColumn("row_t", F.sum("o").over(W2.partitionBy("event_type")))
        .withColumn("col_t", F.sum("o").over(W2.partitionBy("cohort")))
        .withColumn("grand", F.sum("o").over(W2.partitionBy()))
    )
    e = (F.col("row_t") * F.col("col_t")).cast("double") / F.col("grand")
    term = F.round((F.col("o") - e) * (F.col("o") - e) / e, 6)
    return margins.select(term.alias("term")).agg(
        F.sum(F.col("term").cast("decimal(18,6)")).cast("double").alias("chi2"),
        F.count("*").alias("n_cells"),
    )
