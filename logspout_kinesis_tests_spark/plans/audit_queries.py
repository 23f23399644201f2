"""Round-4c breadth queries: corpus data card, seasonal-naive forecast
error, and Benford first-digit auditing.

Registered LAST (see plans/__init__) so longer-waiting unverified queries
keep their place at the front of the driver's correctness window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from logspout_kinesis_tests_spark.plans.registry import register
from logspout_kinesis_tests_spark.sources.tables import load_table


# --- C20+: corpus data card ------------------------------------------------

_SHORT_DOC_CHARS = 200


@register(
    "c20_data_card",
    # Window SUM(BIGINT) / SUM over len() widen to HUGEINT in DuckDB —
    # every integer aggregate is cast back to BIGINT (r3 lesson).
    oracle=f"""
    WITH base AS (
        SELECT source, doc_id, lang, n_chars,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               md5(text) AS h
        FROM documents),
    dup AS (SELECT h FROM base GROUP BY h HAVING count(*) > 1),
    flagged AS (
        SELECT b.*, CASE WHEN d.h IS NULL THEN 0 ELSE 1 END AS is_dup
        FROM base b LEFT JOIN dup d ON b.h = d.h),
    lang_rank AS (
        SELECT source, lang,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY count(*) DESC, lang) AS rk
        FROM base GROUP BY source, lang),
    per_src AS (
        SELECT source,
               count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
               CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
               CAST(sum(is_dup) AS BIGINT) AS n_dup,
               CAST(sum(CASE WHEN n_chars < {_SHORT_DOC_CHARS} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_short
        FROM flagged GROUP BY source)
    SELECT p.source, n_docs, total_tokens,
           round(CAST(total_tokens AS DOUBLE) / n_docs, 9) AS mean_tokens,
           n_langs, l.lang AS top_lang,
           round(CAST(n_dup AS DOUBLE) / n_docs, 9) AS dup_rate,
           round(CAST(n_short AS DOUBLE) / n_docs, 9) AS short_rate
    FROM per_src p JOIN lang_rank l ON l.source = p.source AND l.rk = 1
    """,
    doc="C20+: per-source corpus data card — the summary table a dataset "
    "release ships: doc/token counts, dominant language (deterministic "
    "count-then-name tie-break), cross-corpus exact-duplicate rate, and "
    "short-document share.  One scan computes per-doc features "
    "(token count and content hash are scan-side expressions), the dup "
    "set arrives back via an equi-join on the 16-byte hash, and every "
    "rate is one double division from exact BIGINT counts.  Two shuffles "
    "total (hash groupBy + source groupBy) regardless of corpus size.",
)
def c20_data_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "source",
        "doc_id",
        "lang",
        "n_chars",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        F.md5("text").alias("h"),
    )
    dup = base.groupBy("h").agg(F.count("*").alias("c")).filter("c > 1").select("h")
    flagged = base.join(dup.withColumn("is_dup", F.lit(1)), "h", "left").withColumn(
        "is_dup", F.coalesce("is_dup", F.lit(0))
    )
    # n_langs and the dominant language both come from the (source, lang)
    # count table — no countDistinct in the wide aggregate, so the per-doc
    # scan never pays Spark's distinct-rewrite Expand (see SCALE.md).
    lang_stats = base.groupBy("source", "lang").agg(F.count("*").alias("c"))
    lang_rank = (
        lang_stats.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("source").orderBy(F.desc("c"), F.asc("lang"))
            ),
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_langs"),
            F.max(F.when(F.col("rk") == 1, F.col("lang"))).alias("top_lang"),
        )
    )
    per_src = flagged.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("is_dup").alias("n_dup"),
        F.sum(F.when(F.col("n_chars") < _SHORT_DOC_CHARS, 1).otherwise(0)).alias(
            "n_short"
        ),
    )
    return per_src.join(F.broadcast(lang_rank), "source").select(
        "source",
        "n_docs",
        "total_tokens",
        F.round(F.col("total_tokens").cast("double") / F.col("n_docs"), 9).alias(
            "mean_tokens"
        ),
        "n_langs",
        "top_lang",
        F.round(F.col("n_dup").cast("double") / F.col("n_docs"), 9).alias("dup_rate"),
        F.round(F.col("n_short").cast("double") / F.col("n_docs"), 9).alias(
            "short_rate"
        ),
    )


# --- C16+: seasonal-naive forecast error -----------------------------------

#: Season length in observations: forecast_t = value_{t-S} per event_type
#: series ordered by (ts, event_id).
_SEASON = 24


@register(
    "c16_seasonal_naive_mae",
    # Event values carry exactly 2 decimal places, so |v − lag(v)| rounded
    # to 2dp and cast to DECIMAL(18,2) is the exact absolute error; the sum
    # is exact and order-independent; MAE is one double division.
    oracle=f"""
    WITH fc AS (
        SELECT event_type, value,
               lag(value, {_SEASON}) OVER (
                   PARTITION BY event_type ORDER BY ts, event_id) AS forecast
        FROM events),
    err AS (
        SELECT event_type,
               CAST(round(abs(value - forecast), 2) AS DECIMAL(18,2)) AS ae
        FROM fc WHERE forecast IS NOT NULL)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_forecasts,
           round(CAST(sum(ae) AS DOUBLE) / count(*), 9) AS mae
    FROM err GROUP BY event_type
    """,
    doc="C16+: seasonal-naive baseline forecast (ŷ_t = y_{t−24}) with "
    "per-series mean absolute error — the canonical sanity floor every "
    "fancier forecaster must beat, and the drift monitor for streaming "
    "metric series.  One lag() window per series (single shuffle on the "
    "series key, O(1) state), absolute errors rounded to the data's own "
    "2-decimal grid and summed in exact decimal, MAE one double division "
    "— bit-identical cross-engine with no tolerance.",
)
def c16_seasonal_naive_mae(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    fc = ev.select(
        "event_type",
        "value",
        F.lag("value", _SEASON).over(w).alias("forecast"),
    ).filter(F.col("forecast").isNotNull())
    err = fc.select(
        "event_type",
        F.round(F.abs(F.col("value") - F.col("forecast")), 2)
        .cast("decimal(18,2)")
        .alias("ae"),
    )
    return err.groupBy("event_type").agg(
        F.count("*").alias("n_forecasts"),
        F.round(F.sum("ae").cast("double") / F.count("*"), 9).alias("mae"),
    )


# --- C2+: Benford first-digit audit ----------------------------------------


@register(
    "c2_benford_audit",
    # First digit extracted through an exact integer path: price has 2dp, so
    # round(p·100) is an exact integer-valued double on both engines; CAST
    # of that to BIGINT agrees (DuckDB rounds, Spark truncates — identical
    # on exact integers).  Benford expectation ln(1+1/d)/ln(10) is the same
    # constant expression both sides, rounded to 9dp.
    oracle="""
    WITH digits AS (
        SELECT CAST(substring(CAST(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                                   AS VARCHAR), 1, 1) AS INT) AS d
        FROM lineitem WHERE l_extendedprice > 0),
    tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM digits)
    SELECT d,
           CAST(count(*) AS BIGINT) AS n_obs,
           round(CAST(count(*) AS DOUBLE) / n, 9) AS observed_share,
           round(ln(1.0 + 1.0 / d) / ln(10.0), 9) AS benford_share,
           round(abs(CAST(count(*) AS DOUBLE) / n
                     - ln(1.0 + 1.0 / d) / ln(10.0)), 9) AS deviation
    FROM digits, tot
    GROUP BY d, n
    """,
    doc="C2+: Benford first-significant-digit audit over lineitem prices — "
    "the classic fabricated-data / ingestion-corruption detector for "
    "financial-scale columns.  The digit is extracted through an exact "
    "integer path (2dp values ×100, so no float truncation ambiguity), "
    "counted in one map-combined groupBy of ≤9 groups, and compared to "
    "the log-law expectation; shares are single double divisions from "
    "exact counts.  A 9-row result from one scan at any corpus size.",
)
def c2_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_extendedprice") > 0)
    digits = li.select(
        F.substring(
            F.round(F.col("l_extendedprice") * 100, 0).cast("long").cast("string"),
            1,
            1,
        )
        .cast("int")
        .alias("d")
    )
    tot = digits.agg(F.count("*").cast("double").alias("n"))
    benford = F.log(F.lit(1.0) + F.lit(1.0) / F.col("d")) / F.log(F.lit(10.0))
    share = F.col("n_obs").cast("double") / F.col("n")
    return (
        digits.groupBy("d")
        .agg(F.count("*").alias("n_obs"))
        .crossJoin(F.broadcast(tot))
        .select(
            "d",
            "n_obs",
            F.round(share, 9).alias("observed_share"),
            F.round(benford, 9).alias("benford_share"),
            F.round(F.abs(share - benford), 9).alias("deviation"),
        )
    )
