"""Deterministic sampling / dataset-split operators (training-data surface).

A training-data pipeline needs *reproducible* sampling: the same document
must land in the same split on every run, cluster size, and partitioning.
Random samplers (``df.sample``) don't give that across engines or re-runs;
content-hash-based assignment does.  md5 exists in both Spark and DuckDB
with identical output, so all of these are fully oracle-matched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from logspout_kinesis_tests_spark.plans.registry import register
from logspout_kinesis_tests_spark.sources.tables import load_table


@register(
    "c14_stratified_sample",
    oracle="""
    SELECT doc_id, lang, rn FROM (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY md5(text), doc_id) AS rn
        FROM documents
    ) WHERE rn <= 20
    """,
    doc="C14: stratified sample — 20 docs per language, ordered by content "
    "hash (deterministic pseudo-random within stratum).",
)
def c14_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("lang").orderBy(F.md5("text"), "doc_id")
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("doc_id", "lang", "rn")
    )


@register(
    "c14_dataset_split",
    oracle="""
    SELECT doc_id,
           CASE WHEN substring(md5(text), 1, 2) < 'cc' THEN 'train'
                WHEN substring(md5(text), 1, 2) < 'e6' THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
    doc="C14: train/val/test assignment by content-hash range (~80/10/10) — "
    "stable under re-runs, re-partitioning, and incremental ingest; "
    "duplicate documents always land in the same split (no leakage).",
)
def c14_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.substring(F.md5("text"), 1, 2)
    return docs.select(
        "doc_id",
        F.when(bucket < "cc", "train").when(bucket < "e6", "val").otherwise("test").alias("split"),
    )


@register(
    "c14_hash_sample",
    oracle="""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '1a'
    """,
    doc="C14: ~10% deterministic hash sample (md5(id) prefix < 0x1a) — the "
    "reproducible alternative to df.sample(); composable (a 10% sample of "
    "a 10% sample is stable).",
)
def c14_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < "1a"
    ).select("doc_id", "lang", "n_chars")


@register(
    "c11_pii_scrub",
    oracle="""
    WITH tainted AS (
        SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com or +1-555-01' || CAST(doc_id % 100 AS VARCHAR) AS text
        FROM documents
    )
    SELECT doc_id,
           regexp_replace(
               regexp_replace(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+', '<EMAIL>', 'g'),
               '\\+?[0-9][0-9()\\- ]{6,}[0-9]', '<PHONE>', 'g') AS scrubbed
    FROM tainted
    """,
    doc="C11+: PII scrubbing — email/phone redaction over documents with "
    "injected contact strings (regexp_replace chain, scan-side codegen).",
)
def c11_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tainted = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-01"),
        (F.col("doc_id") % 100).cast("string"),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(tainted, "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+", "<EMAIL>"),
        r"\+?[0-9][0-9()\- ]{6,}[0-9]",
        "<PHONE>",
    )
    return docs.select("doc_id", scrubbed.alias("scrubbed"))


@register(
    "c8_fingerprint_dedup",
    oracle="""
    SELECT md5(array_to_string(list_sort(list_distinct(string_split(lower(text), ' '))), ' '))
               AS fingerprint,
           MIN(doc_id) AS keep_id,
           COUNT(*) AS n_copies
    FROM (
        SELECT doc_id, text FROM documents
        UNION ALL
        -- word-order shuffle: same word set, different text -> sha256 dedup
        -- misses it, fingerprint dedup catches it
        SELECT doc_id + 3000000,
               array_to_string(list_sort(string_split(text, ' ')), ' ')
        FROM documents WHERE doc_id % 9 = 0
    )
    GROUP BY 1
    """,
    doc="C8+: order-invariant dedup via the sorted-word-set fingerprint — "
    "catches reshuffled duplicates exact hashing misses (planted by "
    "re-appending word-sorted copies).",
)
def c8_fingerprint_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    shuffled = docs.filter(F.col("doc_id") % 9 == 0).select(
        (F.col("doc_id") + 3000000).alias("doc_id"),
        F.concat_ws(" ", F.array_sort(F.split(F.col("text"), " "))).alias("text"),
    )
    corpus = docs.union(shuffled)
    fp = F.md5(
        F.concat_ws(" ", F.array_sort(F.array_distinct(F.split(F.lower(F.col("text")), " "))))
    )
    return (
        corpus.select(fp.alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
    )


@register(
    "c11_normalize_text",
    oracle="""
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                               ' +', ' ', 'g')) AS normalized
    FROM documents
    """,
    doc="C11+: text normalization chain (lowercase → strip non-alphanumerics "
    "→ collapse whitespace → trim) — the canonicalization step before "
    "hashing/dedup.",
)
def c11_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    normalized = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""), " +", " "
        )
    )
    return docs.select("doc_id", normalized.alias("normalized"))


@register(
    "c14_corpus_shuffle",
    oracle="""
    SELECT doc_id,
           substring(md5('ep1:' || CAST(doc_id AS VARCHAR)), 1, 2) AS shard,
           ROW_NUMBER() OVER (
               PARTITION BY substring(md5('ep1:' || CAST(doc_id AS VARCHAR)), 1, 2)
               ORDER BY md5('ep1:' || CAST(doc_id AS VARCHAR)), doc_id) AS pos
    FROM documents
    """,
    doc="C14+: deterministic corpus shuffle for training order — an "
    "epoch-seeded hash assigns every document a (shard, pos); readers "
    "consume shards in order for a reproducible global permutation with "
    "NO global sort: 256 independent shard-local window sorts, each a "
    "separate partition at 100 TB.",
)
def c14_corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.lit("ep1:"), F.col("doc_id").cast("string")))
    w = W.partitionBy("shard").orderBy("_k", "doc_id")
    return (
        docs.select("doc_id", key.alias("_k"))
        .withColumn("shard", F.substring("_k", 1, 2))
        .withColumn("pos", F.row_number().over(w))
        .select("doc_id", "shard", "pos")
    )


@register(
    "c14_token_budget",
    oracle="""
    SELECT doc_id, tokens, cum_tokens FROM (
        SELECT doc_id, len(string_split(text, ' ')) AS tokens,
               CAST(SUM(len(string_split(text, ' '))) OVER (
                   ORDER BY md5('bud:' || CAST(doc_id AS VARCHAR)), doc_id
               ) AS BIGINT) AS cum_tokens
        FROM documents)
    WHERE cum_tokens <= 12000
    """,
    doc="C14+: token-budget truncation — take documents in deterministic "
    "hash order until the cumulative token count reaches the budget.  The "
    "global cumsum is computed WITHOUT a global sort: per-shard window "
    "cumsums plus broadcast exclusive shard-offset prefix sums (the offset "
    "table is one row per shard — 256 rows at any corpus size); shard "
    "prefix of the hash key makes shard order align with global key order.",
)
def c14_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    budget = 12000
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("tokens"),
        F.md5(F.concat(F.lit("bud:"), F.col("doc_id").cast("string"))).alias("_k"),
    ).withColumn("_shard", F.substring("_k", 1, 2))
    # exclusive prefix sum over the tiny per-shard totals table; the
    # unpartitioned window is deliberate — it never exceeds 256 rows
    offs = (
        docs.groupBy("_shard")
        .agg(F.sum("tokens").alias("_tot"))
        .withColumn(
            "_off",
            F.coalesce(
                F.sum("_tot").over(
                    W.orderBy("_shard").rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("_shard", "_off")
    )
    iw = W.partitionBy("_shard").orderBy("_k", "doc_id")
    return (
        docs.join(F.broadcast(offs), "_shard")
        .withColumn("cum_tokens", F.col("_off") + F.sum("tokens").over(iw))
        .filter(F.col("cum_tokens") <= budget)
        .select("doc_id", "tokens", "cum_tokens")
    )


@register(
    "c14_weighted_sample",
    oracle="""
    WITH keyed AS (
        SELECT doc_id, lang, n_chars,
               round(-ln((('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT + 1)
                         / 4503599627370498.0) / n_chars, 9) AS sample_key
        FROM documents)
    SELECT doc_id, lang, n_chars, sample_key
    FROM keyed ORDER BY sample_key, doc_id LIMIT 100
    """,
    doc="C14+: deterministic weighted sample (Efraimidis-Spirakis A-ES, "
    "p ∝ n_chars) — md5-derived uniforms, -ln(u)/w keys rounded 9dp, "
    "TakeOrdered top-100.  The quality-weighted corpus subset selection "
    "primitive, RNG-free and rerun-stable.",
)
def c14_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logspout_kinesis_tests_spark.operators.curation import weighted_sample

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return weighted_sample(docs, n=100, weight_col="n_chars")
