"""Curation queries (C20+) — repetition quality, decontamination, domain
mixture, sequence packing, semantic dedup — over the driver tables.

Oracle-exactness policy (same as the rest of the registry):
- ratios are int ÷ int in IEEE double → bit-exact, compared raw;
- sqrt is correctly-rounded in both engines → bit-exact;
- the one float sum (mixture normalizer) goes through 6dp decimal;
- span arithmetic is all-integer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logspout_kinesis_tests_spark.operators.curation import (
    contaminated_docs,
    domain_mixture_weights,
    greedy_packing,
    repetition_stats,
    sequence_packing,
)
from logspout_kinesis_tests_spark.operators.dedup import (
    dedup_keep_one,
    embedding_neardup_pairs,
)
from logspout_kinesis_tests_spark.plans.llm_queries import _sql_cos
from logspout_kinesis_tests_spark.plans.registry import register
from logspout_kinesis_tests_spark.sources.tables import load_table

_SQL_W = "string_split(lower(text), ' ')"

#: repetition-metrics SELECT (shared by c11_repetition and the pipeline)
_SQL_REPETITION = """WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
    base AS (
        SELECT doc_id, len(ws) AS n_words, len(list_distinct(ws)) AS n_distinct,
               CASE WHEN len(ws) >= 3
                    THEN list_transform(range(1, len(ws) - 1),
                           i -> array_to_string(list_slice(ws, i, i + 2), ' '))
                    ELSE []::VARCHAR[] END AS tri,
               CASE WHEN len(ws) >= 2
                    THEN list_transform(range(1, len(ws)),
                           i -> array_to_string(list_slice(ws, i, i + 1), ' '))
                    ELSE []::VARCHAR[] END AS bg
        FROM w),
    bgx AS (SELECT doc_id, bgram, count(*) AS c
            FROM (SELECT doc_id, unnest(bg) AS bgram FROM base)
            GROUP BY doc_id, bgram),
    bgs AS (SELECT doc_id, max(c) AS top_bg, sum(c) AS n_bg FROM bgx GROUP BY doc_id)
    SELECT b.doc_id, n_words,
           CAST(n_distinct AS DOUBLE) / CAST(n_words AS DOUBLE) AS distinct_word_ratio,
           CASE WHEN n_bg IS NULL OR n_bg = 0 THEN 0.0
                ELSE CAST(top_bg AS DOUBLE) / CAST(n_bg AS DOUBLE)
           END AS top_bigram_frac,
           CASE WHEN len(tri) = 0 THEN 0.0
                ELSE CAST(len(tri) - len(list_distinct(tri)) AS DOUBLE)
                     / CAST(len(tri) AS DOUBLE)
           END AS dup_trigram_frac
    FROM base b LEFT JOIN bgs USING (doc_id)"""

#: decontamination-hits SELECT (shared by c8_decontaminate and the pipeline)
_SQL_DECONTAM = """WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
    bench AS (
        SELECT DISTINCT g AS ngram FROM (
            SELECT unnest(CASE WHEN len(sw) >= 8
                  THEN list_distinct(list_transform(range(1, len(sw) - 6),
                         i -> array_to_string(list_slice(sw, i, i + 7), ' ')))
                  ELSE []::VARCHAR[] END) AS g
            FROM (SELECT list_slice(ws, 5, 20) AS sw FROM w WHERE doc_id % 101 = 0))),
    dg AS (
        SELECT doc_id, unnest(CASE WHEN len(ws) >= 8
               THEN list_distinct(list_transform(range(1, len(ws) - 6),
                      i -> array_to_string(list_slice(ws, i, i + 7), ' ')))
               ELSE []::VARCHAR[] END) AS ngram
        FROM w)
    SELECT doc_id, count(*) AS n_hits
    FROM dg JOIN bench USING (ngram) GROUP BY doc_id"""


@register(
    "c11_repetition",
    oracle=_SQL_REPETITION,
    doc="C11+/C20: Gopher-style repetition quality metrics — distinct-word "
    "ratio, top-bigram occupancy, duplicate-trigram fraction (exact "
    "rationals, bit-exact oracle).",
)
def c11_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    return repetition_stats(load_table(spark, sf_dir, "documents"))


@register(
    "c8_decontaminate",
    oracle=_SQL_DECONTAM,
    doc="C8+/C20: test-set decontamination — flag corpus docs sharing any "
    "word-8-gram with a benchmark snippet set (words 5-20 of every "
    "doc_id%101 doc); benchmark n-grams broadcast, corpus filtered "
    "map-side.",
)
def c8_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 101 == 0).select(
        F.concat_ws(" ", F.slice(F.split(F.lower("text"), " "), 5, 16)).alias("text")
    )
    return contaminated_docs(docs, bench)


@register(
    "c14_domain_mixture",
    oracle="""
    WITH pd AS (SELECT source, count(*) AS n_docs,
                       CAST(sum(n_chars) AS BIGINT) AS total_size
                FROM documents GROUP BY source),
    tot AS (SELECT sum(total_size) AS g FROM pd),
    raw AS (SELECT source, n_docs, total_size,
                   CAST(round(sqrt(CAST(total_size AS DOUBLE) / CAST(g AS DOUBLE)), 6)
                        AS DECIMAL(18,6)) AS rw
            FROM pd, tot),
    z AS (SELECT sum(rw) AS z FROM raw)
    SELECT source, n_docs, total_size,
           CAST(rw AS DOUBLE) / CAST(z AS DOUBLE) AS weight
    FROM raw, z
    """,
    doc="C14+/C20: temperature-smoothed (alpha=0.5) domain sampling weights "
    "— sqrt-of-share normalized over 6dp decimals; the anti-dominance "
    "mixture rule for multi-source corpora.",
)
def c14_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    return domain_mixture_weights(load_table(spark, sf_dir, "documents"))


@register(
    "c14_sequence_packing",
    oracle=f"""
    WITH t AS (SELECT doc_id, substring(md5(text), 1, 1) AS shard,
                      len({_SQL_W}) AS n_tokens, md5(text) AS h
               FROM documents),
    s AS (SELECT doc_id, shard, n_tokens,
                 CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY h, doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS BIGINT) AS end_tok
          FROM t)
    SELECT doc_id, shard, n_tokens,
           end_tok - n_tokens AS start_tok,
           (end_tok - n_tokens) // 256 AS first_chunk,
           (end_tok - 1) // 256 AS last_chunk
    FROM s
    """,
    doc="C14+/C20: concat-and-chunk sequence packing plan — content-stable "
    "shard (md5 nibble), deterministic intra-shard order, 256-token "
    "chunks; emits each doc's token span and chunk range (all-integer, "
    "bit-exact).",
)
def c14_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sequence_packing(load_table(spark, sf_dir, "documents"))


@register(
    "c14_greedy_packing",
    # The stateful next-fit walk is not WINDOW-expressible, but it IS a
    # linear recurrence — the oracle replays it as a recursive CTE stepping
    # one row-rank per iteration with all shards advancing in parallel
    # (depth = max shard size), flipping this from rows-only to fully
    # hash-verified (VERDICT r3 #8).  First-row condition: fill is always
    # >0 after a row (empty text still splits to one token), so the
    # "cur_fill > 0 and" guard in the Python walk reduces to fill+s > B.
    oracle="""
    WITH RECURSIVE staged AS (
        SELECT doc_id, substring(md5(text), 1, 1) AS shard,
               len(string_split(lower(text), ' ')) AS n_tokens,
               md5(text) AS h
        FROM documents),
    ord AS (
        SELECT *, row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS rn
        FROM staged),
    walk(shard, rn, doc_id, n_tokens, bin, fill) AS (
        SELECT shard, rn, doc_id, n_tokens, CAST(0 AS BIGINT), CAST(n_tokens AS BIGINT)
        FROM ord WHERE rn = 1
        UNION ALL
        SELECT o.shard, o.rn, o.doc_id, o.n_tokens,
               CASE WHEN w.fill + o.n_tokens > 256 THEN w.bin + 1 ELSE w.bin END,
               CASE WHEN w.fill + o.n_tokens > 256 THEN CAST(o.n_tokens AS BIGINT)
                    ELSE w.fill + o.n_tokens END
        FROM walk w JOIN ord o ON o.shard = w.shard AND o.rn = w.rn + 1),
    fills AS (SELECT shard, bin, max(fill) AS bin_fill FROM walk GROUP BY shard, bin)
    SELECT w.doc_id, w.shard, CAST(w.n_tokens AS INT) AS n_tokens,
           w.bin, f.bin_fill, w.n_tokens > 256 AS oversize
    FROM walk w JOIN fills f ON f.shard = w.shard AND f.bin = w.bin
    """,
    doc="C14+/C20: next-fit whole-document bin packing via applyInPandas — "
    "one Arrow batch per content-stable shard, stateful bin-boundary walk "
    "inside; bins never exceed the budget except single oversize docs.",
)
def c14_greedy_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    return greedy_packing(load_table(spark, sf_dir, "documents"))


def _semantic_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding", "label")
    dupes = [
        emb.filter(F.col("vec_id") % 10 == 0).select(
            (F.col("vec_id") + off).alias("vec_id"), "embedding", "label"
        )
        for off in (1000000, 2000000)
    ]
    return emb.union(dupes[0]).union(dupes[1])


@register(
    "c8_semantic_dedup",
    oracle=f"""
    WITH RECURSIVE av AS (
        SELECT vec_id, embedding, label FROM embeddings
        UNION ALL
        SELECT vec_id + 1000000, embedding, label FROM embeddings WHERE vec_id % 10 = 0
        UNION ALL
        SELECT vec_id + 2000000, embedding, label FROM embeddings WHERE vec_id % 10 = 0),
    pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM av a JOIN av b ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE {_sql_cos('a.embedding', 'b.embedding')} >= 0.9),
    edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    reach(id, lbl) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id),
    losers AS (SELECT id FROM reach GROUP BY id HAVING min(lbl) <> id)
    SELECT vec_id, label FROM av WHERE vec_id NOT IN (SELECT id FROM losers)
    """,
    doc="C8+/C20: SemDeDup-style semantic dedup — label-blocked cosine≥0.9 "
    "pairs → connected components → keep min-id per cluster; 3-member "
    "planted clusters exercise transitivity through the embedding path.",
)
def c8_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _semantic_corpus(spark, sf_dir)
    pairs = embedding_neardup_pairs(
        corpus, threshold=0.9, block_cols=("label",), salt_buckets=16
    ).select("id_a", "id_b")
    return dedup_keep_one(corpus, pairs, id_col="vec_id").select("vec_id", "label")


@register(
    "c20_curation_pipeline",
    oracle=f"""
    SELECT r.doc_id, r.n_words, r.distinct_word_ratio, r.top_bigram_frac
    FROM ({_SQL_REPETITION}) r
    LEFT JOIN ({_SQL_DECONTAM}) d ON r.doc_id = d.doc_id
    WHERE d.doc_id IS NULL
      AND r.n_words BETWEEN 10 AND 1000
      AND r.distinct_word_ratio >= 0.3
      AND r.top_bigram_frac <= 0.2
      AND r.dup_trigram_frac <= 0.5
    """,
    doc="C20: end-to-end curation pipeline — repetition gates + length gates "
    "+ benchmark decontamination composed into one kept-documents plan; "
    "the quality signals and the anti-join all reuse the individually "
    "verified operators (thresholds compare exact rationals, so the "
    "boundary carries no float risk).",
)
def c20_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 101 == 0).select(
        F.concat_ws(" ", F.slice(F.split(F.lower("text"), " "), 5, 16)).alias("text")
    )
    rep = repetition_stats(docs)
    hits = contaminated_docs(docs, bench)
    return (
        rep.join(hits, "doc_id", "left_anti")
        .filter(
            (F.col("n_words") >= 10)
            & (F.col("n_words") <= 1000)
            & (F.col("distinct_word_ratio") >= 0.3)
            & (F.col("top_bigram_frac") <= 0.2)
            & (F.col("dup_trigram_frac") <= 0.5)
        )
        .select("doc_id", "n_words", "distinct_word_ratio", "top_bigram_frac")
    )


@register(
    "c11_passage_chunks",
    oracle=f"""
    WITH w AS (SELECT doc_id, {_SQL_W} AS ws FROM documents),
    c AS (SELECT doc_id, ws,
                 greatest(0, (len(ws) - 32 + 23) // 24) AS extra FROM w)
    SELECT doc_id, i AS chunk_id,
           array_to_string(list_slice(ws, i * 24 + 1, i * 24 + 32), ' ') AS chunk_text,
           least(32, len(ws) - i * 24) AS n_words
    FROM c, unnest(range(0, extra + 1)) AS t(i)
    """,
    doc="C11+/C20: overlapping passage windows (32 words, stride 24) per "
    "document — the context-bounded splitter for embedding/RAG consumers; "
    "all-integer span arithmetic, explode-inlined window transform.",
)
def c11_passage_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logspout_kinesis_tests_spark.operators.text_analysis import passage_chunks

    return passage_chunks(load_table(spark, sf_dir, "documents"))


@register(
    "c14_packing_gate",
    # Violation-rows / empty-oracle shape (see c10_lsh_recall_gate): the
    # greedy next-fit invariants become driver-checkable without exposing
    # the applyInPandas walk itself to SQL.
    oracle="""
    SELECT CAST(NULL AS VARCHAR) AS gate, CAST(NULL AS BIGINT) AS observed
    WHERE 1 = 0
    """,
    doc="C14+: driver-visible bin-packing validity gate — every document "
    "packed exactly once, multi-doc bins never exceed the 256-token budget, "
    "and bin_fill equals the sum of member token counts; violation rows "
    "name the broken invariant.",
)
def c14_packing_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    packed = greedy_packing(docs)
    dup = (
        packed.groupBy("doc_id")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
        .select(
            F.concat(F.lit("packed_twice_d"), F.col("doc_id").cast("string")).alias("gate"),
            F.col("n").cast("long").alias("observed"),
        )
    )
    missing = (
        docs.select("doc_id")
        .join(packed.select("doc_id"), "doc_id", "left_anti")
        .select(
            F.concat(F.lit("missing_d"), F.col("doc_id").cast("string")).alias("gate"),
            F.lit(0).cast("long").alias("observed"),
        )
    )
    bins = packed.groupBy("shard", "bin").agg(
        F.count("*").alias("n_docs"),
        F.max("bin_fill").alias("fill"),
        F.sum("n_tokens").alias("tok_sum"),
    )
    over = bins.filter((F.col("n_docs") > 1) & (F.col("fill") > 256)).select(
        F.concat(F.lit("overfull_"), F.col("shard"), F.lit("_b"), F.col("bin").cast("string")).alias("gate"),
        F.col("fill").cast("long").alias("observed"),
    )
    inconsistent = bins.filter(F.col("fill") != F.col("tok_sum")).select(
        F.concat(F.lit("fill_mismatch_"), F.col("shard"), F.lit("_b"), F.col("bin").cast("string")).alias("gate"),
        F.col("tok_sum").cast("long").alias("observed"),
    )
    return dup.unionByName(missing).unionByName(over).unionByName(inconsistent)
