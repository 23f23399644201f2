"""LLM-data-pipeline queries — SURVEY.md §2 C8-C13 on the driver tables.

Oracle notes:

- Jaccard/ratio outputs are exact rational arithmetic (int ÷ int in double)
  — bit-identical across engines, so thresholds carry no boundary risk.
- Cosine similarities are computed as identical left-to-right folds in both
  engines (Spark ``F.aggregate`` ↔ DuckDB ``list_reduce``) — verified
  bit-exact, so values are compared raw, unrounded.
- The hash-family ops (MinHash, SimHash, LSH buckets) use Spark's xxhash64,
  which DuckDB does not implement → registered without oracle (driver
  records the rows-only check); their *semantics* are pinned by pytest
  planted-duplicate tests and by the exact-Jaccard verification stage they
  feed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from logspout_kinesis_tests_spark.operators.dedup import (
    build_content_index,
    connected_components,
    dedup_keep_best,
    dedup_keep_one,
    embedding_neardup_pairs,
    exact_dedup,
    incremental_dedup,
    line_dedup,
    substring_dedup,
    minhash_near_duplicates,
    ngram_jaccard_pairs,
    simhash_near_duplicates,
)
from logspout_kinesis_tests_spark.operators.multimodal import (
    attach_text_payload,
    extract_features,
    sample_segments,
)
from logspout_kinesis_tests_spark.operators.similarity import cosine_topk, cosine_topk_lsh
from logspout_kinesis_tests_spark.operators.text_analysis import (
    STOPWORDS,
    fingerprint,
    hashed_linear_classifier,
    language_id,
    quality_score,
    term_frequencies,
    text_stats,
    token_count,
)
from logspout_kinesis_tests_spark.plans.registry import register
from logspout_kinesis_tests_spark.sources.tables import load_table

# DuckDB fragments kept in lockstep with the Spark operators ----------------

SQL_WORDS = "string_split(lower(text), ' ')"
SQL_STOP = "['" + "','".join(STOPWORDS) + "']"
#: distinct word-3-gram shingles (matches operators.dedup.with_word_shingles n=3)
SQL_SHINGLES = f"""
    list_distinct(
      CASE WHEN len({SQL_WORDS}) >= 3
           THEN list_transform(range(1, len({SQL_WORDS}) - 1),
                  i -> array_to_string(list_slice({SQL_WORDS}, i, i + 2), ' '))
           ELSE [lower(text)] END)
"""
#: deterministic left-fold cosine (matches functions.vectors — bit-exact)
def _sql_cos(a: str, b: str) -> str:
    dot = (
        f"list_reduce(list_transform(list_zip({a}, {b}), "
        f"x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (p, q) -> p + q)"
    )
    def norm(v: str) -> str:
        return (
            f"sqrt(list_reduce(list_transform({v}, "
            f"x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (p, q) -> p + q))"
        )
    return f"{dot} / ({norm(a)} * {norm(b)})"


# --------------------------------------------------------------------------
# C8 — exact dedup (hash-groupBy) on a corpus with planted duplicates.
# --------------------------------------------------------------------------
@register(
    "c8_exact_dedup",
    oracle="""
    WITH all_docs AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 5 = 0
    )
    SELECT sha256(text) AS content_sha256,
           MIN(doc_id) AS keep_id,
           COUNT(*) AS n_copies
    FROM all_docs
    GROUP BY 1
    """,
    doc="C8: sha256 exact dedup; duplicates planted by re-appending every "
    "5th document under a shifted id.",
)
def c8_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    planted = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    return exact_dedup(docs.union(planted))


# --------------------------------------------------------------------------
# C9 — exact n-gram Jaccard near-dup (lang-blocked), fully oracle-matched.
# --------------------------------------------------------------------------
@register(
    "c9_ngram_jaccard",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id, lang, {SQL_SHINGLES} AS shingles FROM documents
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
             / CAST(len(a.shingles) + len(b.shingles)
                    - len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
             AS jaccard
    FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
             / CAST(len(a.shingles) + len(b.shingles)
                    - len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
          >= 0.3
    """,
    doc="C9: exact word-3-gram Jaccard with language blocking.",
)
def c9_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logspout_kinesis_tests_spark.plans.helpers import spread

    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    return ngram_jaccard_pairs(
        docs, threshold=0.3, block_cols=("lang",)
    )


@register(
    "c9_minhash_lsh",
    oracle=None,  # xxhash64 family — not DuckDB-expressible; rows-only.
    doc="C9: MinHash(64)+LSH(16 bands) candidates verified by exact Jaccard "
    "≥0.5 against a corpus with planted perturbed copies.",
)
def c9_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    perturbed = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz9")).alias("text"),
    )
    from logspout_kinesis_tests_spark.plans.helpers import spread

    return minhash_near_duplicates(
        spread(docs.union(perturbed), "doc_id"), threshold=0.5
    )


@register(
    "c9_simhash",
    oracle=None,  # xxhash64-based fingerprint; rows-only.
    doc="C9: 64-bit SimHash Hamming≤6 near-dups over a corpus with planted "
    "perturbed copies (16-bit chunk pigeonhole banding).",
)
def c9_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    perturbed = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz9")).alias("text"),
    )
    return simhash_near_duplicates(docs.union(perturbed), max_hamming=6)


# --------------------------------------------------------------------------
# C8 — embedding-cosine near-dup (planted identical vectors; label-blocked).
# --------------------------------------------------------------------------
@register(
    "c8_embedding_neardup",
    oracle=f"""
    WITH all_vecs AS (
        SELECT vec_id, embedding, label FROM embeddings
        UNION ALL
        SELECT vec_id + 1000000, embedding, label FROM embeddings WHERE vec_id % 10 = 0
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           {_sql_cos('a.embedding', 'b.embedding')} AS cosine
    FROM all_vecs a JOIN all_vecs b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE {_sql_cos('a.embedding', 'b.embedding')} >= 0.9
    """,
    doc="C8: cosine≥0.9 near-dup pairs, label-blocked; duplicates planted "
    "(natural max same-label cosine in this corpus is 0.47).",
)
def c8_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    planted = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"), "embedding", "label"
    )
    return embedding_neardup_pairs(
        emb.select("vec_id", "embedding", "label").union(planted),
        threshold=0.9,
        block_cols=("label",),
        salt_buckets=16,
    )


@register(
    "c11_quality_approx_gate",
    # The 100 TB path for the percentile filter: approx_percentile per-lang
    # thresholds + a broadcast join replace the exact per-stratum window
    # sort.  Self-checking gate shape (violations vs empty oracle): a lang
    # row appears only when the approx-threshold kept count strays >15%+2
    # from the exact percent_rank kept count.
    oracle="""
    SELECT CAST(NULL AS VARCHAR) AS gate, CAST(NULL AS BIGINT) AS observed
    WHERE 1 = 0
    """,
    doc="C11+: driver-visible agreement gate between the exact percent_rank"
    " quality filter and its scale path (approx_percentile thresholds +"
    " broadcast join, no per-stratum global sort).",
)
def c11_quality_approx_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    scored = quality_score(docs).join(docs.select("doc_id", "lang"), "doc_id")
    w = W.partitionBy("lang").orderBy("quality", "doc_id")
    exact_kept = (
        scored.withColumn("pr", F.percent_rank().over(w))
        .filter(F.col("pr") >= 0.5)
        .groupBy("lang")
        .agg(F.count("*").alias("n_exact"))
    )
    thr = scored.groupBy("lang").agg(
        F.percentile_approx("quality", 0.5, 1000).alias("thr")
    )
    approx_kept = (
        scored.join(F.broadcast(thr), "lang")
        .filter(F.col("quality") >= F.col("thr"))
        .groupBy("lang")
        .agg(F.count("*").alias("n_approx"))
    )
    return (
        exact_kept.join(approx_kept, "lang")
        .filter(
            F.abs(F.col("n_approx") - F.col("n_exact"))
            > F.lit(0.15) * F.col("n_exact") + F.lit(2)
        )
        .select(
            F.concat(F.lit("lang_"), F.col("lang")).alias("gate"),
            F.col("n_approx").cast("long").alias("observed"),
        )
    )


@register(
    "c8_semantic_decontaminate",
    # Embedding-space sibling of the n-gram decontamination: the benchmark
    # embedding set (every 50th vector) is eval-sized -> broadcast; a corpus
    # row is contaminated when cosine vs ANY benchmark vector >= 0.9.
    # Contamination planted by re-inserting every 100th benchmark vector
    # under a shifted id (cosine exactly 1.0); the natural cross-pair
    # ceiling in this corpus is 0.47, so only planted rows drop.
    oracle=f"""
    WITH bench AS (
        SELECT vec_id, embedding FROM embeddings WHERE vec_id % 50 = 0),
    corpus AS (
        SELECT vec_id, embedding, label FROM embeddings WHERE vec_id % 50 <> 0
        UNION ALL
        SELECT vec_id + 1000000, embedding, label FROM embeddings
        WHERE vec_id % 100 = 0
    ),
    contaminated AS (
        SELECT DISTINCT c.vec_id
        FROM corpus c JOIN bench b
          ON {_sql_cos('c.embedding', 'b.embedding')} >= 0.9)
    SELECT vec_id, label FROM corpus
    WHERE vec_id NOT IN (SELECT vec_id FROM contaminated)
    """,
    doc="C8+: semantic (embedding-space) test-set decontamination — drop"
    " corpus rows whose embedding is cosine->=0.9 to any benchmark vector;"
    " broadcast benchmark x one corpus scan (the n-gram decontamination"
    " shape with vectors), corpus never shuffles.",
)
def c8_semantic_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logspout_kinesis_tests_spark.functions.vectors import cosine_similarity

    emb = load_table(spark, sf_dir, "embeddings")
    bench = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("embedding").alias("b_embedding")
    )
    corpus = (
        emb.filter(F.col("vec_id") % 50 != 0)
        .select("vec_id", "embedding", "label")
        .union(
            emb.filter(F.col("vec_id") % 100 == 0).select(
                (F.col("vec_id") + 1000000).alias("vec_id"), "embedding", "label"
            )
        )
    )
    # one non-equi broadcast ANTI join: keep a corpus row iff NO benchmark
    # vector reaches the cosine bar.  One corpus pass, zero shuffles, and
    # the anti join short-circuits at the first contaminated match per row
    # — vs the materialize-contaminated-ids-then-anti-join shape, which
    # Catalyst pushes into each union branch, running the cosine cross
    # join twice and SMJ-shuffling the corpus.
    #
    # Both sides are L2-NORMALIZED once in their own projections, so the
    # per-pair predicate is a bare dot product (cosine recomputes BOTH
    # norms per pair — ~3× the flops).  Classification is unchanged: no
    # cosine value is emitted, and the pair-space margin (planted dups at
    # 1.0, natural ceiling 0.47) is nowhere near the 0.9 bar, so the
    # normalize-then-dot float path cannot flip any pair.
    from logspout_kinesis_tests_spark.functions.vectors import (
        dot_product,
        l2_norm,
    )

    def _unit(df, col, out, keep):
        # norm materialized in its OWN projection: a sub-expression
        # referenced inside a per-element lambda is re-evaluated per
        # element (the Catalyst HOF gotcha in SCALE.md)
        with_n = df.select(*keep, F.col(col).alias("_v"), l2_norm(F.col(col)).alias("_n"))
        return with_n.select(
            *keep,
            F.when(F.col("_n") == 0, None)
            .otherwise(F.transform(F.col("_v"), lambda x: x.cast("double") / F.col("_n")))
            .alias(out),
        )

    corpus_n = _unit(corpus, "embedding", "_u", ("vec_id", "label"))
    bench_n = _unit(bench, "b_embedding", "_bu", ())
    return corpus_n.join(
        F.broadcast(bench_n),
        dot_product(F.col("_u"), F.col("_bu")) >= 0.9,
        "left_anti",
    ).select("vec_id", "label")


# --------------------------------------------------------------------------
# C10 — similarity search: exact brute-force top-k (oracle-matched) and the
# LSH-bucketed scale path (rows-only).
# --------------------------------------------------------------------------
@register(
    "c10_cosine_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS q_vec
               FROM embeddings WHERE vec_id < 10),
         scored AS (
        SELECT q.query_id, c.vec_id,
               {_sql_cos('q.q_vec', 'c.embedding')} AS cosine
        FROM q, embeddings c
        WHERE q.query_id <> c.vec_id
    )
    SELECT query_id, vec_id, cosine, rank FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, vec_id) AS rank
        FROM scored
    ) WHERE rank <= 5
    """,
    doc="C10: exact brute-force cosine top-5 for 10 query vectors "
    "(broadcast queries × corpus scan).",
)
def c10_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.select("vec_id", "embedding")
    return cosine_topk(queries, corpus, k=5, exclude_self=True)


@register(
    "c10_cosine_topk_lsh",
    oracle=None,  # approximate by design (bucket recall < 1); rows-only.
    doc="C10: LSH-bucketed ANN top-5 (8 deterministic hyperplanes) — the "
    "scale path; recall vs exact asserted in pytest.",
)
def c10_cosine_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.select("vec_id", "embedding")
    return cosine_topk_lsh(queries, corpus, k=5, n_planes=8)


@register(
    "c10_lsh_recall_gate",
    # Self-checking recall gate: the query emits VIOLATION rows and the
    # oracle expects exactly the one healthy summary row — the driver row
    # goes red iff LSH recall regresses.  The summary (queries_with_matches
    # = 10) makes the healthy verdict a non-trivial computed equality
    # rather than empty-vs-empty (the r9 wart).  Thresholds carry margin
    # under the measured agreement (24/50 at sf0.001/0.01/0.1 with
    # multiprobe=2; per-query self-match is structural).
    oracle="""
    SELECT CAST('queries_with_matches' AS VARCHAR) AS gate,
           CAST(10 AS BIGINT) AS observed
    """,
    doc="C10: driver-visible LSH recall regression gate — compares "
    "multiprobe LSH top-5 against the (oracle-matched) exact top-5 and "
    "returns per-query and aggregate agreement violations.",
)
def c10_lsh_recall_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.select("vec_id", "embedding")
    exact = cosine_topk(queries, corpus, k=5)
    lsh = cosine_topk_lsh(queries, corpus, k=5, n_planes=8, multiprobe=2)
    agree = (
        exact.select("query_id", "vec_id")
        .join(lsh.select("query_id", "vec_id"), ["query_id", "vec_id"], "leftsemi")
        .groupBy("query_id")
        .agg(F.count("*").alias("n_agree"))
    )
    per_q = (
        queries.select("query_id")
        .join(agree, "query_id", "left")
        .select("query_id", F.coalesce("n_agree", F.lit(0)).alias("n_agree"))
        # ≤10 rows feeding three consumers (per-query violations, the total
        # threshold, the pinned summary): checkpoint once or each re-runs
        # the exact+LSH join tree
        .localCheckpoint(eager=True)
    )
    # violation 1: a query lost even its structural self-match (bucket logic
    # broken); violation 2: aggregate neighbor agreement dropped below 18/50
    per_q_viol = per_q.filter(F.col("n_agree") < 1).select(
        F.concat(F.lit("query_"), F.col("query_id").cast("string")).alias("gate"),
        F.col("n_agree").cast("long").alias("observed"),
    )
    total_viol = (
        per_q.agg(F.sum("n_agree").alias("total"))
        .filter(F.col("total") < 18)
        .select(F.lit("total_agreement").alias("gate"), F.col("total").cast("long").alias("observed"))
    )
    matched_total = (
        per_q.filter(F.col("n_agree") >= 1)
        .agg(F.count("*").cast("long").alias("observed"))
        .select(F.lit("queries_with_matches").alias("gate"), "observed")
    )
    return matched_total.unionByName(per_q_viol).unionByName(total_viol)


@register(
    "c10_ivf_recall_gate",
    # Same self-checking shape as c10_lsh_recall_gate — violation rows go
    # red against the oracle — but the healthy output is NOT empty: the
    # gate always emits one computed summary row (self_match_total over
    # the 10 fixed queries) whose expected value the oracle states, so a
    # green verdict is a non-trivial equality of a number the IVF path
    # actually computed, not an empty-vs-empty coincidence (VERDICT r9
    # flagged exactly that wart).  Margins under measurement: agreement
    # with exact top-5 is 47-50/50 across sf0.001/0.01/0.1 (gate: ≥35);
    # self-match is structural (a query's own cell is always probed).
    oracle="""
    SELECT CAST('self_match_total' AS VARCHAR) AS gate,
           CAST(10 AS BIGINT) AS observed
    """,
    doc="C10: driver-visible IVF recall regression gate — per-query "
    "self-match (structural) and aggregate top-5 agreement vs the "
    "oracle-matched exact ranking; healthy output is the computed "
    "10-query self-match count matched against the oracle's expected 10.",
)
def c10_ivf_recall_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logspout_kinesis_tests_spark.operators.ann import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.select("vec_id", "embedding")
    exact = cosine_topk(queries, corpus, k=5)
    # 50-row result feeding three consumers (agreement join, self-match
    # anti-join, the pinned summary): checkpoint once or each re-runs the
    # whole IVF build+probe
    ivf = ivf_topk(queries, corpus, k=5, nlist=16, nprobe=4).localCheckpoint(
        eager=True
    )
    agree = (
        exact.select("query_id", "vec_id")
        .join(ivf.select("query_id", "vec_id"), ["query_id", "vec_id"], "leftsemi")
        .groupBy("query_id")
        .agg(F.count("*").alias("n_agree"))
    )
    selfmatch = ivf.filter(F.col("query_id") == F.col("vec_id")).select("query_id")
    self_viol = (
        queries.select("query_id")
        .join(selfmatch, "query_id", "left_anti")
        .select(
            F.concat(F.lit("self_"), F.col("query_id").cast("string")).alias("gate"),
            F.lit(0).cast("long").alias("observed"),
        )
    )
    total_viol = (
        queries.select("query_id")
        .join(agree, "query_id", "left")
        .agg(F.sum(F.coalesce("n_agree", F.lit(0))).alias("total"))
        .filter(F.col("total") < 35)
        .select(
            F.lit("total_agreement").alias("gate"),
            F.col("total").cast("long").alias("observed"),
        )
    )
    # always-emitted summary: the oracle pins this computed count at 10, so
    # the gate's green is a real equality (and any violation row above still
    # breaks the hash)
    self_total = (
        queries.select("query_id")
        .join(selfmatch, "query_id", "left_semi")
        .agg(F.count("*").cast("long").alias("observed"))
        .select(F.lit("self_match_total").alias("gate"), "observed")
    )
    return self_total.unionByName(self_viol).unionByName(total_viol)


@register(
    "c9_minhash_recall_gate",
    # Banding-recall gate: candidates from 16×4 LSH bands must cover ≥90%
    # of the exact Jaccard≥0.5 pairs on the planted corpus (measured 100%
    # at sf0.001/0.01/0.1; 1-(1-0.85⁴)¹⁶ ≈ 0.9998 analytically for the
    # planted perturbation).  Emits the missed pairs when the gate trips.
    oracle="""
    SELECT CAST(NULL AS VARCHAR) AS gate, CAST(NULL AS BIGINT) AS observed
    WHERE 1 = 0
    """,
    doc="C9: driver-visible MinHash banding recall gate — LSH candidates "
    "vs the oracle-matched exact Jaccard pair set on a planted corpus.",
)
def c9_minhash_recall_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logspout_kinesis_tests_spark.operators.dedup import minhash_lsh_candidates

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pert = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat("text", F.lit(" zz9")).alias("text"),
    )
    corpus = docs.union(pert)
    exact = ngram_jaccard_pairs(corpus, threshold=0.5).select("id_a", "id_b")
    cands = minhash_lsh_candidates(corpus).select("id_a", "id_b")
    missed = exact.join(cands, ["id_a", "id_b"], "left_anti")
    counts = exact.agg(F.count("*").alias("n_exact")).crossJoin(
        missed.agg(F.count("*").alias("n_missed"))
    )
    return (
        counts.filter(F.col("n_missed") * 10 > F.col("n_exact"))  # recall < 0.9
        .select(
            F.lit("banding_recall_pct").alias("gate"),
            (
                (F.col("n_exact") - F.col("n_missed")) * 100 / F.col("n_exact")
            )
            .cast("long")
            .alias("observed"),
        )
    )


@register(
    "c8_embedding_neardup_ivf",
    oracle=None,  # blocking cells come from IVF (xxhash-seeded k-means); rows-only.
    doc="C8: embedding near-dup with IVF-cluster blocking instead of a "
    "label column — the 100 TB path when no natural block key exists; "
    "planted identical vectors land in the same cell by construction.",
)
def c8_embedding_neardup_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logspout_kinesis_tests_spark.operators.ann import ivf_index
    from logspout_kinesis_tests_spark.operators.dedup import embedding_neardup_pairs

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"), "embedding"
    )
    corpus = emb.union(planted)
    assignment, _centroids = ivf_index(corpus, nlist=16, iters=1)
    blocked = corpus.join(assignment, "vec_id")
    return embedding_neardup_pairs(blocked, threshold=0.9, block_cols=("cell",))


@register(
    "c10_ivf_topk",
    oracle=None,  # approximate by design (nprobe cells); rows-only.
    doc="C10: IVF approximate top-5 — deterministic 2-iteration k-means "
    "inverted file, nprobe=4 of nlist=16 cells; recall vs exact asserted "
    "in pytest.",
)
def c10_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logspout_kinesis_tests_spark.operators.ann import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.select("vec_id", "embedding")
    return ivf_topk(queries, corpus, k=5, nlist=16, nprobe=4)


@register(
    "c9_winnowing",
    oracle=None,  # xxhash64 rolling hashes; rows-only.
    doc="C9: winnowing (MOSS) fingerprint near-dups — k-gram rolling "
    "hashes, windowed minima; pairs sharing >=5 fingerprints over a corpus "
    "with planted perturbed copies.",
)
def c9_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logspout_kinesis_tests_spark.operators.dedup import winnowing_near_duplicates

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    perturbed = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat(F.lit("zz9 "), F.col("text")).alias("text"),
    )
    return winnowing_near_duplicates(docs.union(perturbed))


@register(
    "c2_approx_sketches",
    oracle=None,  # HLL estimates have no cross-engine-identical SQL.
    doc="C2+: approximate aggregates — HyperLogLog distinct counts and "
    "percentile sketches per event type, flattened to scalar columns "
    "(p50/p95/p99); error bounds asserted vs exact in pytest.",
)
def c2_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pct = F.percentile_approx("value", [0.5, 0.95, 0.99], 10000)
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            pct.getItem(0).alias("p50"),
            pct.getItem(1).alias("p95"),
            pct.getItem(2).alias("p99"),
        )
        .orderBy("event_type")
    )


@register(
    "c2_percentile_sketch",
    oracle="""
    SELECT event_type,
           quantile_disc(value, 0.5) AS p50,
           quantile_disc(value, 0.95) AS p95,
           quantile_disc(value, 0.99) AS p99
    FROM events GROUP BY event_type
    """,
    doc="C2+: percentile sketch (GK/percentile_approx) per event type with "
    "accuracy >= group size, so the sketch degenerates to exact discrete "
    "quantiles — bit-identical to DuckDB quantile_disc (verified at sf0.01); "
    "the approximation-regime behavior is pinned separately in pytest.",
)
def c2_percentile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pct = F.percentile_approx("value", [0.5, 0.95, 0.99], 10000)
    return ev.groupBy("event_type").agg(
        pct.getItem(0).alias("p50"),
        pct.getItem(1).alias("p95"),
        pct.getItem(2).alias("p99"),
    )


# --------------------------------------------------------------------------
# C11 — text analysis.
# --------------------------------------------------------------------------
@register(
    "c11_text_stats",
    oracle=f"""
    SELECT doc_id,
           len({SQL_WORDS}) AS n_tokens,
           len(list_distinct({SQL_WORDS})) AS n_distinct_tokens,
           CAST(len(list_distinct({SQL_WORDS})) AS DOUBLE)
             / CAST(len({SQL_WORDS}) AS DOUBLE) AS distinct_ratio,
           len(list_intersect(list_distinct({SQL_WORDS}), {SQL_STOP})) AS n_stopword_types,
           CAST(list_reduce(list_transform({SQL_WORDS}, w -> length(w)),
                            (a, b) -> a + b) AS DOUBLE)
             / CAST(len({SQL_WORDS}) AS DOUBLE) AS mean_token_len
    FROM documents
    """,
    doc="C11: per-document token/diversity/stopword statistics.",
)
def c11_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_stats(load_table(spark, sf_dir, "documents"))


@register(
    "c11_quality_score",
    oracle=f"""
    SELECT doc_id,
           0.4 * least(1.0, CAST(len({SQL_WORDS}) AS DOUBLE) / 50.0)
         + 0.3 * (CAST(len(list_intersect(list_distinct({SQL_WORDS}), {SQL_STOP})) AS DOUBLE) / 8.0)
         + 0.3 * (CAST(len(list_distinct({SQL_WORDS})) AS DOUBLE)
                    / CAST(len({SQL_WORDS}) AS DOUBLE))
           AS quality
    FROM documents
    """,
    doc="C11: composite quality score (exact arithmetic, codegen path).",
)
def c11_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_score(load_table(spark, sf_dir, "documents"))


@register(
    "c11_quality_percentile_filter",
    # percent_rank is exact rational arithmetic ((rank-1)/(n-1)) over an
    # already-bit-exact score with a doc_id tiebreak, so the filter boundary
    # is deterministic and engine-independent.
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, lang,
               0.4 * least(1.0, CAST(len({SQL_WORDS}) AS DOUBLE) / 50.0)
             + 0.3 * (CAST(len(list_intersect(list_distinct({SQL_WORDS}), {SQL_STOP})) AS DOUBLE) / 8.0)
             + 0.3 * (CAST(len(list_distinct({SQL_WORDS})) AS DOUBLE)
                        / CAST(len({SQL_WORDS}) AS DOUBLE))
               AS quality
        FROM documents),
    ranked AS (
        SELECT doc_id, lang, quality,
               PERCENT_RANK() OVER (PARTITION BY lang
                                    ORDER BY quality, doc_id) AS pr
        FROM scored)
    SELECT doc_id, lang, quality FROM ranked WHERE pr >= 0.5
    """,
    doc="C11+: per-language relative quality filter — keep each language's"
    " top half by composite quality score via percent_rank, so thresholds"
    " adapt per stratum instead of one global cutoff.  At 100 TB the exact"
    " window sort over a dominant language is the cost ceiling; the approx"
    " path swaps in approx_percentile thresholds + a broadcast join with"
    " the same filter shape.",
)
def c11_quality_percentile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    scored = quality_score(docs).join(docs.select("doc_id", "lang"), "doc_id")
    w = W.partitionBy("lang").orderBy("quality", "doc_id")
    return (
        scored.withColumn("pr", F.percent_rank().over(w))
        .filter(F.col("pr") >= 0.5)
        .select("doc_id", "lang", "quality")
    )


@register(
    "c11_language_id",
    oracle=f"""
    WITH m AS (
        SELECT doc_id,
               len(list_intersect(list_distinct({SQL_WORDS}), ['the','and','of'])) AS c_en,
               len(list_intersect(list_distinct({SQL_WORDS}), ['el','la','de'])) AS c_es,
               len(list_intersect(list_distinct({SQL_WORDS}), ['der','die','das'])) AS c_de,
               len(list_intersect(list_distinct({SQL_WORDS}), ['le','les','et'])) AS c_fr
        FROM documents
    )
    SELECT doc_id,
           CASE WHEN greatest(c_en, c_es, c_de, c_fr) <= 0 THEN 'und'
                WHEN c_en = greatest(c_en, c_es, c_de, c_fr) THEN 'en'
                WHEN c_es = greatest(c_en, c_es, c_de, c_fr) THEN 'es'
                WHEN c_de = greatest(c_en, c_es, c_de, c_fr) THEN 'de'
                ELSE 'fr' END AS predicted_lang
    FROM m
    """,
    doc="C11: heuristic marker-word language ID (argmax, fixed priority).",
)
def c11_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return language_id(load_table(spark, sf_dir, "documents"))


@register(
    "c11_token_count",
    oracle=f"""
    SELECT doc_id,
           len({SQL_WORDS}) AS n_ws_tokens,
           len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_re_tokens
    FROM documents
    """,
    doc="C11: whitespace + BPE-ish regex token counting.",
)
def c11_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_count(load_table(spark, sf_dir, "documents"))


@register(
    "c11_fingerprint",
    oracle=f"""
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct({SQL_WORDS})), ' ')) AS fingerprint
    FROM documents
    """,
    doc="C11: order/repetition-invariant content fingerprint (sorted "
    "distinct word set → md5).",
)
def c11_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fingerprint(load_table(spark, sf_dir, "documents"))


@register(
    "c11_term_frequencies",
    oracle=f"""
    SELECT term, COUNT(*) AS n
    FROM (SELECT unnest({SQL_WORDS}) AS term FROM documents)
    GROUP BY term
    ORDER BY n DESC, term
    LIMIT 20
    """,
    doc="C11: corpus top-20 term frequencies.",
)
def c11_term_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    return term_frequencies(load_table(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# C11+ — TF-IDF / BM25 relevance scoring.
# --------------------------------------------------------------------------
@register(
    "c11_tfidf",
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest({SQL_WORDS}) AS term FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
    dfreq AS (SELECT term, count(*) AS df_ FROM tf GROUP BY term),
    n AS (SELECT count(*) AS n FROM documents)
    SELECT tf.doc_id, tf.term, tf.tf, dfreq.df_,
           round(tf.tf * (ln((1 + n.n) / (1 + dfreq.df_)) + 1.0), 6) AS tfidf
    FROM tf JOIN dfreq USING (term) CROSS JOIN n
    """,
    doc="C11+: per-(doc, term) TF-IDF with smooth idf — one tokenize scan, "
    "map-combined counts, broadcast df/N joins; scores rounded to 6dp "
    "(ln differs across runtimes in the last ulp).",
)
def c11_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logspout_kinesis_tests_spark.operators.text_analysis import tfidf_terms

    return tfidf_terms(load_table(spark, sf_dir, "documents"))


_BM25_TERMS = ("join", "filter", "scan")


@register(
    "c11_bm25",
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest({SQL_WORDS}) AS term FROM documents),
    dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
           WHERE term IN ('join', 'filter', 'scan') GROUP BY doc_id, term),
    dfreq AS (SELECT term, count(*) AS df_ FROM tf GROUP BY term),
    stats AS (SELECT count(*) AS n,
                     CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
              FROM dl),
    scored AS (
        SELECT tf.doc_id,
               CAST(sum(CAST(round(
                   ln((stats.n - dfreq.df_ + 0.5) / (dfreq.df_ + 0.5) + 1.0)
                   * (tf.tf * 2.2)
                   / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)),
               6) AS DECIMAL(18,6))) AS DOUBLE) AS bm25
        FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
        GROUP BY tf.doc_id)
    SELECT d.doc_id, coalesce(s.bm25, 0.0) AS bm25
    FROM documents d LEFT JOIN scored s USING (doc_id)
    """,
    doc="C11+: Okapi BM25 of every document vs a query bag — per-term "
    "contributions rounded to 6dp and summed in decimal(18,6) so the "
    "distributed sum is order-independent and cross-engine exact.",
)
def c11_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logspout_kinesis_tests_spark.operators.text_analysis import bm25_scores

    return bm25_scores(load_table(spark, sf_dir, "documents"), _BM25_TERMS)


@register(
    "c11_lm_score",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, {SQL_WORDS} AS ws FROM documents
        WHERE len({SQL_WORDS}) >= 2
    ),
    bigrams AS (
        SELECT doc_id, bg.w1 AS w1, bg.w2 AS w2
        FROM w, unnest(list_transform(range(1, len(ws)),
                 i -> struct_pack(w1 := ws[i], w2 := ws[i + 1]))) AS t(bg)
    ),
    bc AS (SELECT w1, w2, count(*) AS c12 FROM bigrams GROUP BY w1, w2),
    pc AS (SELECT w1, sum(c12) AS c1 FROM bc GROUP BY w1),
    vocab AS (SELECT count(DISTINCT w) AS v FROM
              (SELECT w1 AS w FROM bigrams UNION ALL SELECT w2 FROM bigrams)),
    scored AS (
        SELECT b.doc_id,
               round(ln((bc.c12 + 0.5) / (pc.c1 + 0.5 * vocab.v)), 6) AS lp
        FROM bigrams b JOIN bc USING (w1, w2) JOIN pc USING (w1) CROSS JOIN vocab)
    SELECT doc_id,
           CAST(sum(CAST(lp AS DECIMAL(18,6))) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS avg_logprob,
           count(*) AS n_bigrams
    FROM scored GROUP BY doc_id
    """,
    doc="C11+/C18: bigram language-model quality score — per-doc average "
    "log-probability under an add-k-smoothed corpus bigram model (the "
    "CCNet-style LM filter); 6dp-rounded decimal-summed log-probs.",
)
def c11_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logspout_kinesis_tests_spark.operators.text_analysis import lm_doc_logprob

    return lm_doc_logprob(load_table(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# C8+ — duplicate clusters (pairs → connected components → keep-one).
# --------------------------------------------------------------------------

#: corpus with two planted perturbations per source doc (suffix + prefix):
#: originals pair with both copies, copies pair with each other → 3-member
#: clusters, so cluster resolution exercises transitivity, not just pairs.
_SQL_CLUSTER_CORPUS = """
    SELECT doc_id, lang, text FROM documents WHERE doc_id % 7 = 0
    UNION ALL
    SELECT doc_id + 1000000, lang, text || ' zz9' FROM documents WHERE doc_id % 7 = 0
    UNION ALL
    SELECT doc_id + 2000000, lang, 'zz9 ' || text FROM documents WHERE doc_id % 7 = 0
"""

_SQL_CLUSTER_WORDS = "string_split(lower(text), ' ')"
_SQL_CLUSTER_SHINGLES = f"""
    list_distinct(
      CASE WHEN len({_SQL_CLUSTER_WORDS}) >= 3
           THEN list_transform(range(1, len({_SQL_CLUSTER_WORDS}) - 1),
                  i -> array_to_string(list_slice({_SQL_CLUSTER_WORDS}, i, i + 2), ' '))
           ELSE [lower(text)] END)
"""

_SQL_CLUSTER_REACH = f"""
    corpus AS ({_SQL_CLUSTER_CORPUS}),
    sh AS (SELECT doc_id, lang, {_SQL_CLUSTER_SHINGLES} AS shingles FROM corpus),
    pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
                 / CAST(len(a.shingles) + len(b.shingles)
                        - len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
              >= 0.3
    ),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION SELECT id_b, id_a FROM pairs
    ),
    reach(id, label) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.id
    )
"""


def _cluster_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    src = docs.filter(F.col("doc_id") % 7 == 0)
    suffix = src.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        "lang",
        F.concat(F.col("text"), F.lit(" zz9")).alias("text"),
    )
    prefix = src.select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        "lang",
        F.concat(F.lit("zz9 "), F.col("text")).alias("text"),
    )
    return src.union(suffix).union(prefix)


@register(
    "c8_dedup_clusters",
    oracle=f"""
    WITH RECURSIVE {_SQL_CLUSTER_REACH}
    SELECT id AS doc_id, min(label) AS cluster_id FROM reach GROUP BY id
    """,
    doc="C8+: near-dup pairs resolved to clusters — min-label propagation "
    "connected components (operators/dedup.py::connected_components) vs a "
    "DuckDB recursive-CTE reachability oracle; transitivity exercised by "
    "3-member planted clusters.",
)
def c8_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _cluster_corpus(spark, sf_dir)
    pairs = ngram_jaccard_pairs(corpus, threshold=0.3, block_cols=("lang",))
    cc = connected_components(pairs)
    return cc.select(F.col("id").alias("doc_id"), F.col("component").alias("cluster_id"))


@register(
    "c8_dedup_keep_one",
    oracle=f"""
    WITH RECURSIVE {_SQL_CLUSTER_REACH},
    losers AS (
        SELECT id FROM reach GROUP BY id HAVING min(label) <> id
    )
    SELECT doc_id, lang FROM corpus WHERE doc_id NOT IN (SELECT id FROM losers)
    """,
    doc="C8+: cluster-aware keep-one dedup — every cluster keeps its min-id "
    "representative, singletons survive untouched.",
)
def c8_dedup_keep_one(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _cluster_corpus(spark, sf_dir)
    pairs = ngram_jaccard_pairs(corpus, threshold=0.3, block_cols=("lang",))
    return dedup_keep_one(corpus, pairs).select("doc_id", "lang")


@register(
    "c8_dedup_keep_best",
    # The planted suffix/prefix copies are 4 chars LONGER than their source,
    # so the quality policy (longest text wins, ties -> lowest id) picks the
    # +1000000 suffix copy over the original — observable difference from
    # keep_one's min-id policy, verified against the windowed oracle.
    oracle=f"""
    WITH RECURSIVE {_SQL_CLUSTER_REACH},
    comp AS (SELECT id, min(label) AS component FROM reach GROUP BY id),
    best AS (
        SELECT doc_id FROM (
            SELECT c.doc_id,
                   ROW_NUMBER() OVER (PARTITION BY comp.component
                                      ORDER BY length(c.text) DESC, c.doc_id) AS rn
            FROM corpus c JOIN comp ON c.doc_id = comp.id)
        WHERE rn = 1)
    SELECT doc_id, lang FROM corpus
    WHERE doc_id IN (SELECT doc_id FROM best)
       OR doc_id NOT IN (SELECT id FROM comp)
    """,
    doc="C8+: quality-ranked keep-best dedup — every cluster keeps its "
    "highest-score (longest-text) member instead of the min id; the window "
    "runs only over clustered rows, singletons bypass via anti-join.",
)
def c8_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _cluster_corpus(spark, sf_dir).withColumn("score", F.length("text"))
    pairs = ngram_jaccard_pairs(corpus, threshold=0.3, block_cols=("lang",))
    return dedup_keep_best(corpus, pairs, "score").select("doc_id", "lang")


@register(
    "c8_incremental_dedup",
    # Crawl-refresh shape: docs with doc_id % 3 = 0 are the already-ingested
    # corpus (only their hash index participates); the incoming batch is the
    # rest PLUS planted cross-batch copies (of existing docs, +1000000) that
    # the index anti-join must drop, PLUS planted within-batch copies
    # (+2000000) that the min-id groupBy must drop.
    oracle="""
    WITH existing AS (SELECT text FROM documents WHERE doc_id % 3 = 0),
    incoming AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0
        UNION ALL
        SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 6 = 0
        UNION ALL
        SELECT doc_id + 2000000, text FROM documents
        WHERE doc_id % 3 <> 0 AND doc_id % 5 = 1
    ),
    idx AS (SELECT DISTINCT sha256(text) AS h FROM existing),
    fresh AS (
        SELECT doc_id, sha256(text) AS h FROM incoming
        WHERE sha256(text) NOT IN (SELECT h FROM idx)
    ),
    keep AS (SELECT MIN(doc_id) AS doc_id FROM fresh GROUP BY h)
    SELECT doc_id FROM incoming WHERE doc_id IN (SELECT doc_id FROM keep)
    """,
    doc="C8+: incremental ingestion dedup — an incoming batch is"
    " deduplicated against the persisted content-hash index of the existing"
    " corpus (left-anti join), then within itself (min-id per hash); only"
    " genuinely new documents survive.",
)
def c8_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    existing = docs.filter(F.col("doc_id") % 3 == 0)
    incoming = (
        docs.filter(F.col("doc_id") % 3 != 0)
        .union(
            existing.filter(F.col("doc_id") % 6 == 0).select(
                (F.col("doc_id") + 1000000).alias("doc_id"), "text"
            )
        )
        .union(
            docs.filter((F.col("doc_id") % 3 != 0) & (F.col("doc_id") % 5 == 1)).select(
                (F.col("doc_id") + 2000000).alias("doc_id"), "text"
            )
        )
    )
    index = build_content_index(existing)
    return incremental_dedup(incoming, index).select("doc_id")


@register(
    "c8_line_dedup",
    # "Lines" are 8-word chunks of the planted-duplicate cluster corpus: a
    # document and its suffix/prefix copies share every interior chunk, so
    # those lines exceed max_df=1 and are dropped from ALL copies (CCNet
    # semantics); only the chunks shifted or extended by the planted edit
    # survive.  string_agg(ORDER BY pos) mirrors the order-preserving
    # rebuild.
    oracle=f"""
    WITH corpus AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 7 = 0
        UNION ALL
        SELECT doc_id + 1000000, text || ' zz9' FROM documents WHERE doc_id % 7 = 0
        UNION ALL
        SELECT doc_id + 2000000, 'zz9 ' || text FROM documents WHERE doc_id % 7 = 0
    ),
    words AS (SELECT doc_id, string_split(text, ' ') AS w FROM corpus),
    line_rows AS (
        SELECT doc_id, unnest(generate_series(0, (len(w) + 7) // 8 - 1)) AS pos, w
        FROM words
    ),
    lines AS (
        SELECT doc_id, pos,
               array_to_string(w[pos * 8 + 1 : pos * 8 + 8], ' ') AS line
        FROM line_rows
    ),
    dupk AS (SELECT md5(line) AS k FROM lines GROUP BY 1 HAVING COUNT(*) > 1),
    kept AS (SELECT * FROM lines WHERE md5(line) NOT IN (SELECT k FROM dupk)),
    agg AS (
        SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text,
               COUNT(*) AS n_kept
        FROM kept GROUP BY doc_id
    ),
    tot AS (SELECT doc_id, COUNT(*) AS n_lines FROM lines GROUP BY doc_id)
    SELECT t.doc_id, COALESCE(a.text, '') AS text,
           COALESCE(a.n_kept, 0) AS n_kept,
           t.n_lines - COALESCE(a.n_kept, 0) AS n_dropped
    FROM tot t LEFT JOIN agg a USING (doc_id)
    """,
    doc="C8+: CCNet-style duplicated-line removal — lines occurring in more"
    " than max_df documents are dropped from every document and the text is"
    " rebuilt from surviving lines in original order; fully-boilerplate"
    " documents come back empty rather than disappearing.",
)
def c8_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _cluster_corpus(spark, sf_dir)
    words = corpus.select("doc_id", F.split(F.col("text"), " ").alias("_w"))
    lined = words.select(
        "doc_id",
        F.expr(
            "concat_ws('\\n', transform(sequence(0, (size(_w) + 7) DIV 8 - 1),"
            " c -> concat_ws(' ', slice(_w, c * 8 + 1, 8))))"
        ).alias("text"),
    )
    return line_dedup(lined).select("doc_id", "text", "n_kept", "n_dropped")


@register(
    "c8_substring_dedup",
    # Corpus = all documents + a suffix copy (text + ' zz9') of every 7th:
    # the copied span is excised from BOTH the original (full coverage ->
    # empty text) and the copy (everything but the boundary-crossing grams'
    # word 'zz9'), while untouched documents pass through verbatim.  The
    # oracle mirrors the seed-gram construction: duplicated 16-gram marks ->
    # running-max interval merge -> positional NOT EXISTS excision.
    oracle="""
    WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000, text || ' zz9' FROM documents WHERE doc_id % 7 = 0
    ),
    words AS (SELECT doc_id, string_split(text, ' ') AS w FROM corpus),
    grams AS (
        SELECT doc_id, unnest(generate_series(0, len(w) - 16)) AS pos, w
        FROM words WHERE len(w) >= 16
    ),
    keyed AS (
        SELECT doc_id, pos,
               md5(array_to_string(w[pos + 1 : pos + 16], ' ')) AS k
        FROM grams
    ),
    dupk AS (SELECT k FROM keyed GROUP BY k HAVING COUNT(*) > 1),
    marks AS (
        SELECT doc_id, pos AS s, pos + 16 AS e FROM keyed
        WHERE k IN (SELECT k FROM dupk)
    ),
    m AS (
        SELECT doc_id, s, e,
               MAX(e) OVER (PARTITION BY doc_id ORDER BY s
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
        FROM marks
    ),
    g AS (
        SELECT doc_id, s, e,
               SUM(CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id ORDER BY s) AS grp
        FROM m
    ),
    merged AS (SELECT doc_id, MIN(s) AS s, MAX(e) AS e FROM g GROUP BY doc_id, grp),
    wordrows AS (
        SELECT doc_id, unnest(w) AS word, generate_subscripts(w, 1) - 1 AS i
        FROM words
    ),
    kept AS (
        SELECT wr.doc_id, wr.word, wr.i FROM wordrows wr
        WHERE NOT EXISTS (
            SELECT 1 FROM merged m2
            WHERE m2.doc_id = wr.doc_id AND wr.i >= m2.s AND wr.i < m2.e)
    ),
    reb AS (
        SELECT doc_id, string_agg(word, ' ' ORDER BY i) AS text,
               COUNT(*) AS n_kept
        FROM kept GROUP BY doc_id
    ),
    tot AS (SELECT doc_id, len(w) AS n_words FROM words)
    SELECT t.doc_id, COALESCE(r.text, '') AS text,
           t.n_words - COALESCE(r.n_kept, 0) AS n_words_removed
    FROM tot t LEFT JOIN reb r USING (doc_id)
    """,
    doc="C8+: exact-substring dedup (Lee et al. 2022) — every word span of"
    " >= 16 words occurring more than once corpus-wide is excised from all"
    " occurrences via duplicated-16-gram seeds, per-doc running-max interval"
    " merging, and positional excision; no suffix array needed.",
)
def c8_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.union(
        docs.filter(F.col("doc_id") % 7 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zz9")).alias("text"),
        )
    )
    from logspout_kinesis_tests_spark.plans.helpers import spread

    return substring_dedup(spread(corpus, "doc_id"), min_words=16)


# --------------------------------------------------------------------------
# C12 — multimodal columns (text modality; binary payload + typed metadata).
# --------------------------------------------------------------------------
@register(
    "c12_multimodal_meta",
    oracle="""
    SELECT doc_id,
           'text/plain' AS mime,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
    FROM documents
    """,
    doc="C12: payload+metadata convention — metadata projection/filter "
    "without touching payload bytes (column pruning).",
)
def c12_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    mm = attach_text_payload(docs)
    return mm.select(
        "doc_id",
        F.col("meta.mime").alias("mime"),
        F.col("meta.n_bytes").alias("n_bytes"),
    )


@register(
    "c12_multimodal_features",
    # The stub features are deterministic byte statistics and the driver text
    # is pure ASCII (byte == code point), so the mapInPandas output is fully
    # SQL-expressible: f0=n_bytes, f1=first byte, f2=last byte, f3=sum of the
    # first 16 bytes mod 997.
    oracle="""
    SELECT doc_id,
           'text/plain' AS mime,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(length(text) AS DOUBLE) AS f0,
           CAST(ord(substr(text, 1, 1)) AS DOUBLE) AS f1,
           CAST(ord(substr(text, length(text), 1)) AS DOUBLE) AS f2,
           CAST(list_reduce(
                  list_transform(range(1, least(length(text), 16) + 1),
                                 i -> ord(substr(text, CAST(i AS INTEGER), 1))),
                  (a, b) -> a + b) % 997 AS DOUBLE) AS f3
    FROM documents
    """,
    doc="C12: Arrow-batched mapInPandas feature extraction over payloads "
    "(decode stubbed with deterministic fake — see operators/multimodal.py); "
    "feature vector flattened to scalar f0..f3 for the driver canonicalizer.",
)
def c12_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    feats = extract_features(attach_text_payload(docs))
    return feats.select(
        "doc_id",
        "mime",
        "n_bytes",
        F.col("features").getItem(0).alias("f0"),
        F.col("features").getItem(1).alias("f1"),
        F.col("features").getItem(2).alias("f2"),
        F.col("features").getItem(3).alias("f3"),
    )



@register(
    "c12_frame_sample",
    # Stride-sampled fixed-size segments; ASCII corpus makes the byte slicer
    # equal to a substring slicer, so the mapInPandas output is exactly
    # SQL-expressible.
    oracle="""
    WITH f AS (
        SELECT doc_id, text,
               unnest(range(0, CAST(ceil(length(text) / 64.0) AS BIGINT)))
                   AS seg_idx
        FROM documents)
    SELECT doc_id, seg_idx,
           substring(text, CAST(seg_idx * 64 + 1 AS INTEGER), 64) AS seg_payload,
           CAST(length(substring(text, CAST(seg_idx * 64 + 1 AS INTEGER), 64))
                AS BIGINT) AS seg_len
    FROM f
    WHERE seg_idx % 4 = 0
    """,
    doc="C12: video-frame-sampling / audio-chunking plumbing — Arrow-batched "
    "mapInPandas splits each payload into 64-byte segments and keeps every "
    "4th (a keyframe sampler's plan shape; decord/ffmpeg replaces the "
    "slicer body in production).  Scan-side row multiplier, zero shuffles.",
)
def c12_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return sample_segments(
        attach_text_payload(docs), segment_bytes=64, stride_segments=4
    )


# --------------------------------------------------------------------------
# C13 — Pandas-UDF surface (Arrow transport parity with the codegen path).
# --------------------------------------------------------------------------
@register(
    "c13_pandas_udf_quality",
    oracle=f"""
    SELECT doc_id,
           0.4 * least(1.0, CAST(len({SQL_WORDS}) AS DOUBLE) / 50.0)
         + 0.3 * (CAST(len(list_intersect(list_distinct({SQL_WORDS}), {SQL_STOP})) AS DOUBLE) / 8.0)
         + 0.3 * (CAST(len(list_distinct({SQL_WORDS})) AS DOUBLE)
                    / CAST(len({SQL_WORDS}) AS DOUBLE))
           AS quality
    FROM documents
    """,
    doc="C13: the same quality formula through a vectorized pandas_udf — "
    "proves the Arrow batch path yields bit-identical doubles.",
)
def c13_pandas_udf_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logspout_kinesis_tests_spark.functions.pandas_udfs import quality_score_udf

    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", quality_score_udf(F.col("text")).alias("quality"))


#: hex-nibble value via instr arithmetic — DuckDB has no hex->int cast, so
#: the oracle reconstructs the first 4 md5 nibbles positionally (Spark uses
#: builtin conv(,16,10); identical integers).
_SQL_NIBBLE = "(instr('0123456789abcdef', substring(md5(w), {i}, 1)) - 1)"
_SQL_BUCKET = (
    f"({_SQL_NIBBLE.format(i=1)} * 4096 + {_SQL_NIBBLE.format(i=2)} * 256 + "
    f"{_SQL_NIBBLE.format(i=3)} * 16 + {_SQL_NIBBLE.format(i=4)})"
)
_SQL_PROB = (
    "round(1.0 / (1.0 + exp(-8.0 * ("
    "CAST(raw AS DOUBLE) / (CAST(n_tokens AS DOUBLE) * 1048576.0) - 0.5))), 6)"
)


@register(
    "c11_linear_classifier",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
        FROM documents),
    ht AS (
        SELECT doc_id, ({_SQL_BUCKET} * 2654435761) % 1048576 AS m FROM tok),
    agg AS (
        SELECT doc_id, SUM(m) AS raw, COUNT(*) AS n_tokens
        FROM ht GROUP BY doc_id)
    SELECT doc_id, n_tokens,
           {_SQL_PROB} AS quality_prob,
           {_SQL_PROB} > 0.5 AS keep
    FROM agg
    """,
    doc="C11+: fastText-shaped hashed bag-of-words linear classifier — "
    "tokens hash into a 64k bucket space scan-side, per-doc score stays in "
    "the integer domain through the one map-combined groupBy, final "
    "sigmoid is a single double op (6dp-rounded for libm parity).  The "
    "standard learned quality filter applied to pretraining corpora, with "
    "a deterministic weight table standing in for trained weights.",
)
def c11_linear_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return hashed_linear_classifier(docs)


# --------------------------------------------------------------------------
# Driver-visible gates for the remaining hash-family (no-oracle) operators.
# Shape shared with c10_lsh_recall_gate: the query emits VIOLATION rows
# (empty when healthy) and the oracle is the empty relation — the driver
# row goes red iff the property regresses, making the rows-only operators'
# semantics driver-checkable instead of pytest-only.
# --------------------------------------------------------------------------
_EMPTY_GATE_ORACLE = """
    SELECT CAST(NULL AS VARCHAR) AS gate, CAST(NULL AS BIGINT) AS observed
    WHERE 1 = 0
"""


def _planted_pair_gate(
    docs: DataFrame, pairs: DataFrame, min_recall_pct: int
) -> DataFrame:
    """Violation rows when planted (d, d+2000000) pair coverage drops below
    ``min_recall_pct`` — the shared scaffold for the SimHash / winnowing
    recall gates (thresholds carry margin under the per-SF measurements)."""
    expected = docs.filter(F.col("doc_id") % 7 == 0).select(
        F.col("doc_id").alias("id_a"),
        (F.col("doc_id") + 2000000).alias("id_b"),
    )
    found = expected.join(pairs.select("id_a", "id_b"), ["id_a", "id_b"], "leftsemi")
    counts = expected.agg(F.count("*").alias("n_expected")).crossJoin(
        found.agg(F.count("*").alias("n_found"))
    )
    return counts.filter(
        F.col("n_found") * 100 < F.col("n_expected") * min_recall_pct
    ).select(
        F.lit("planted_pair_recall_pct").alias("gate"),
        F.floor(F.col("n_found") * 100 / F.col("n_expected"))
        .cast("long")
        .alias("observed"),
    )


@register(
    "c9_simhash_recall_gate",
    oracle=_EMPTY_GATE_ORACLE,
    doc="C9: driver-visible SimHash completeness gate — pigeonhole banding "
    "GUARANTEES every pair with Hamming≤6 < bands(8) agrees on ≥1 chunk, so "
    "any planted pair whose directly-computed signature distance is ≤6 but "
    "absent from the operator output is a violation (theorem, not a "
    "probabilistic recall); plus a 50% aggregate coverage floor (measured "
    "65-73% across sf0.001/0.01/0.1 — a 4-char suffix flips >6 bits on "
    "roughly a third of short docs, which is correct SimHash behavior).",
)
def c9_simhash_recall_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logspout_kinesis_tests_spark.operators.dedup import with_simhash64

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pert = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat("text", F.lit(" zz9")).alias("text"),
    )
    corpus = docs.union(pert)
    pairs = simhash_near_duplicates(corpus, max_hamming=6)
    sigs = with_simhash64(corpus).select("doc_id", "simhash")
    expected = (
        docs.filter(F.col("doc_id") % 7 == 0)
        .select(
            F.col("doc_id").alias("id_a"),
            (F.col("doc_id") + 2000000).alias("id_b"),
        )
        .join(sigs.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("_sa")), "id_a")
        .join(sigs.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("_sb")), "id_b")
        .withColumn("hamming", F.bit_count(F.col("_sa").bitwiseXOR(F.col("_sb"))))
    )
    must_find = expected.filter(F.col("hamming") <= 6)
    completeness_viol = must_find.join(
        pairs.select("id_a", "id_b"), ["id_a", "id_b"], "left_anti"
    ).select(
        F.concat(F.lit("banding_missed_d"), F.col("id_a").cast("string")).alias("gate"),
        F.col("hamming").cast("long").alias("observed"),
    )
    found = expected.join(pairs.select("id_a", "id_b"), ["id_a", "id_b"], "leftsemi")
    floor_viol = (
        expected.agg(F.count("*").alias("n_expected"))
        .crossJoin(found.agg(F.count("*").alias("n_found")))
        .filter(F.col("n_found") * 100 < F.col("n_expected") * 50)
        .select(
            F.lit("planted_pair_recall_pct").alias("gate"),
            F.floor(F.col("n_found") * 100 / F.col("n_expected"))
            .cast("long")
            .alias("observed"),
        )
    )
    return completeness_viol.unionByName(floor_viol)


@register(
    "c9_winnowing_recall_gate",
    oracle=_EMPTY_GATE_ORACLE,
    doc="C9: driver-visible winnowing recall gate — planted 'zz9 '-prefixed "
    "copies must share ≥5 fingerprints with their originals; violation rows "
    "when planted-pair coverage < 85%.",
)
def c9_winnowing_recall_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logspout_kinesis_tests_spark.operators.dedup import (
        winnowing_near_duplicates,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pert = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat(F.lit("zz9 "), F.col("text")).alias("text"),
    )
    pairs = winnowing_near_duplicates(docs.union(pert))
    return _planted_pair_gate(docs, pairs, min_recall_pct=85)


@register(
    "c2_hll_error_gate",
    oracle=_EMPTY_GATE_ORACLE,
    doc="C2+: driver-visible HyperLogLog error gate — approx_count_distinct"
    "(user_id, rsd=0.02) per event_type vs the exact distinct count; "
    "violation rows when relative error exceeds 10% (5×rsd margin).",
)
def c2_hll_error_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    both = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
        F.count_distinct("user_id").alias("exact"),
    )
    return both.filter(
        F.abs(F.col("approx") - F.col("exact")) * 10 > F.col("exact")
    ).select(
        F.concat(F.lit("hll_"), F.col("event_type")).alias("gate"),
        F.col("approx").cast("long").alias("observed"),
    )


# --------------------------------------------------------------------------
# C12 — header-level binary decode (real format parsing, zero UDFs).
# --------------------------------------------------------------------------
@register(
    "c12_png_header_decode",
    oracle="""
    WITH dims AS (
        SELECT doc_id, 16 + doc_id % 1904 AS w, 16 + doc_id % 1064 AS h
        FROM documents),
    pay AS (
        SELECT doc_id, CASE WHEN doc_id % 50 = 0 THEN from_hex('DEADBEEF')
            ELSE from_hex('89504E470D0A1A0A' || '0000000D' || '49484452'
                          || lpad(hex(w), 8, '0') || lpad(hex(h), 8, '0')
                          || '08' || '06' || '000000' || '00000000') END AS payload
        FROM dims),
    hx AS (SELECT doc_id, hex(payload) AS hh FROM pay),
    chk AS (
        SELECT doc_id, hh,
               substring(hh, 1, 16) = '89504E470D0A1A0A'
               AND substring(hh, 25, 8) = '49484452' AS png_valid
        FROM hx)
    SELECT doc_id, png_valid,
           CASE WHEN png_valid THEN ('0x' || substring(hh, 33, 8))::BIGINT END AS png_width,
           CASE WHEN png_valid THEN ('0x' || substring(hh, 41, 8))::BIGINT END AS png_height,
           CASE WHEN png_valid THEN ('0x' || substring(hh, 49, 2))::BIGINT END AS bit_depth,
           CASE WHEN png_valid THEN ('0x' || substring(hh, 51, 2))::BIGINT END AS color_type
    FROM chk
    """,
    doc="C12: real PNG IHDR decode — synthesize structurally-valid PNG "
    "headers (planted corrupt payloads every 50th doc), then parse "
    "signature/dims/depth/color entirely in scan-side JVM expressions "
    "(hex slicing + conv; no UDF, binary never crosses to Python).  The "
    "dimension-filter first pass of a 100 TB image-corpus job.",
)
def c12_png_header_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logspout_kinesis_tests_spark.operators.multimodal import (
        parse_png_header,
        synth_png_payload,
    )

    dims = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        (F.lit(16) + F.col("doc_id") % 1904).alias("width"),
        (F.lit(16) + F.col("doc_id") % 1064).alias("height"),
    )
    payloads = synth_png_payload(dims).withColumn(
        "payload",
        F.when(F.col("doc_id") % 50 == 0, F.unhex(F.lit("DEADBEEF"))).otherwise(
            F.col("payload")
        ),
    )
    return parse_png_header(payloads).select(
        "doc_id", "png_valid", "png_width", "png_height", "bit_depth", "color_type"
    )


@register(
    "c12_wav_header_decode",
    oracle="""
    WITH src AS (
        SELECT doc_id,
               CASE CAST(doc_id % 5 AS INT) WHEN 0 THEN 8000 WHEN 1 THEN 16000
                    WHEN 2 THEN 22050 WHEN 3 THEN 44100 ELSE 48000 END AS sr,
               1 + doc_id % 2 AS ch
        FROM documents),
    pay AS (
        SELECT doc_id, CASE WHEN doc_id % 37 = 0 THEN from_hex('00') ELSE from_hex(
            '52494646' || '24000000' || '57415645' || '666D7420' || '10000000'
            || '0100'
            || substring(lpad(hex(ch), 4, '0'), 3, 2) || substring(lpad(hex(ch), 4, '0'), 1, 2)
            || substring(lpad(hex(sr), 8, '0'), 7, 2) || substring(lpad(hex(sr), 8, '0'), 5, 2)
            || substring(lpad(hex(sr), 8, '0'), 3, 2) || substring(lpad(hex(sr), 8, '0'), 1, 2)
            || substring(lpad(hex(sr * ch * 2), 8, '0'), 7, 2) || substring(lpad(hex(sr * ch * 2), 8, '0'), 5, 2)
            || substring(lpad(hex(sr * ch * 2), 8, '0'), 3, 2) || substring(lpad(hex(sr * ch * 2), 8, '0'), 1, 2)
            || substring(lpad(hex(ch * 2), 4, '0'), 3, 2) || substring(lpad(hex(ch * 2), 4, '0'), 1, 2)
            || '1000' || '64617461' || '00000000') END AS payload
        FROM src),
    hx AS (SELECT doc_id, hex(payload) AS hh FROM pay),
    chk AS (
        SELECT doc_id, hh,
               substring(hh, 1, 8) = '52494646'
               AND substring(hh, 17, 8) = '57415645'
               AND substring(hh, 25, 8) = '666D7420' AS wav_valid
        FROM hx)
    SELECT doc_id, wav_valid,
           CASE WHEN wav_valid THEN ('0x' || substring(hh, 41, 2))::BIGINT
                + 256 * ('0x' || substring(hh, 43, 2))::BIGINT END AS audio_format,
           CASE WHEN wav_valid THEN ('0x' || substring(hh, 45, 2))::BIGINT
                + 256 * ('0x' || substring(hh, 47, 2))::BIGINT END AS channels,
           CASE WHEN wav_valid THEN ('0x' || substring(hh, 49, 2))::BIGINT
                + 256 * ('0x' || substring(hh, 51, 2))::BIGINT
                + 65536 * ('0x' || substring(hh, 53, 2))::BIGINT
                + 16777216 * ('0x' || substring(hh, 55, 2))::BIGINT END AS sample_rate,
           CASE WHEN wav_valid THEN ('0x' || substring(hh, 69, 2))::BIGINT
                + 256 * ('0x' || substring(hh, 71, 2))::BIGINT END AS bits_per_sample
    FROM chk
    """,
    doc="C12: real RIFF/WAVE fmt decode — synthesize canonical 44-byte PCM "
    "headers (planted truncated payloads every 37th doc), then parse the "
    "little-endian fmt fields scan-side (per-byte hex slices + positional "
    "arithmetic; no UDF).  The audio-metadata first pass before any "
    "sample-level decode.",
)
def c12_wav_header_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logspout_kinesis_tests_spark.operators.multimodal import (
        parse_wav_header,
        synth_wav_payload,
    )

    src = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(
            "CASE CAST(doc_id % 5 AS INT) WHEN 0 THEN 8000 WHEN 1 THEN 16000 "
            "WHEN 2 THEN 22050 WHEN 3 THEN 44100 ELSE 48000 END"
        ).alias("sample_rate"),
        (F.lit(1) + F.col("doc_id") % 2).alias("channels"),
    )
    payloads = synth_wav_payload(src).withColumn(
        "payload",
        F.when(F.col("doc_id") % 37 == 0, F.unhex(F.lit("00"))).otherwise(
            F.col("payload")
        ),
    )
    return parse_wav_header(payloads.drop("sample_rate", "channels")).select(
        "doc_id", "wav_valid", "audio_format", "channels", "sample_rate", "bits_per_sample"
    )


# --------------------------------------------------------------------------
# C10 — int8 scalar quantization (hash-verified quantizer + recall gate).
# --------------------------------------------------------------------------
#: DuckDB mirror of operators.similarity.with_quantized_embedding + integer
#: cosine — identical arithmetic, so values hash-match bit-exactly.
_SQL_QUANT = (
    "list_transform({v}, x -> CAST(round(127.0 * CAST(x AS DOUBLE) / "
    "greatest(list_reduce(list_transform({v}, y -> abs(CAST(y AS DOUBLE))), "
    "(a, b) -> greatest(a, b)), CAST(1e-30 AS DOUBLE))) AS INT))"
)


def _sql_int_cos(a: str, b: str) -> str:
    dot = (
        f"list_reduce(list_transform(list_zip({a}, {b}), "
        f"x -> CAST(x[1] AS BIGINT) * x[2]), (p, q) -> p + q)"
    )

    def norm(v: str) -> str:
        return (
            f"sqrt(CAST(list_reduce(list_transform({v}, "
            f"x -> CAST(x AS BIGINT) * x), (p, q) -> p + q) AS DOUBLE))"
        )

    return f"CAST({dot} AS DOUBLE) / ({norm(a)} * {norm(b)})"


@register(
    "c10_quantized_topk",
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS query_id, {_SQL_QUANT.format(v="embedding")} AS qv
        FROM embeddings WHERE vec_id < 10),
    c AS (
        SELECT vec_id, {_SQL_QUANT.format(v="embedding")} AS qv
        FROM embeddings),
    scored AS (
        SELECT q.query_id, c.vec_id,
               {_sql_int_cos('q.qv', 'c.qv')} AS qcosine
        FROM q CROSS JOIN c),
    ranked AS (
        SELECT query_id, vec_id, qcosine,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY qcosine DESC, vec_id) AS rank
        FROM scored)
    SELECT query_id, vec_id, qcosine, rank FROM ranked WHERE rank <= 5
    """,
    doc="C10: int8-quantized cosine top-5 — the quantizer (symmetric "
    "per-vector round(127·x/max|x|)) and the integer-dot cosine are both "
    "mirrored in DuckDB arithmetic, so the whole quantized ranking is "
    "hash-verified bit-exactly, not just recall-gated.  4× smaller "
    "corpus-side payload at scale.",
)
def c10_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logspout_kinesis_tests_spark.operators.similarity import (
        cosine_topk_quantized,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return cosine_topk_quantized(queries, emb.select("vec_id", "embedding"), k=5)


@register(
    "c10_quantization_gate",
    oracle=_EMPTY_GATE_ORACLE,
    doc="C10: driver-visible quantization-quality gate — int8 top-5 must "
    "keep every query's structural self-match and agree with the "
    "full-precision exact top-5 on ≥40/50 neighbors (measured 49-50/50 "
    "across sf0.001/0.01/0.1).",
)
def c10_quantization_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logspout_kinesis_tests_spark.operators.similarity import (
        cosine_topk_quantized,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.select("vec_id", "embedding")
    exact = cosine_topk(queries, corpus, k=5)
    quant = cosine_topk_quantized(queries, corpus, k=5)
    self_viol = (
        queries.select("query_id")
        .join(
            quant.filter(F.col("query_id") == F.col("vec_id")).select("query_id"),
            "query_id",
            "left_anti",
        )
        .select(
            F.concat(F.lit("self_"), F.col("query_id").cast("string")).alias("gate"),
            F.lit(0).cast("long").alias("observed"),
        )
    )
    agree = (
        exact.select("query_id", "vec_id")
        .join(quant.select("query_id", "vec_id"), ["query_id", "vec_id"], "leftsemi")
        .agg(F.count("*").alias("total"))
    )
    total_viol = agree.filter(F.col("total") < 40).select(
        F.lit("total_agreement").alias("gate"),
        F.col("total").cast("long").alias("observed"),
    )
    return self_viol.unionByName(total_viol)


@register(
    "c11_char_entropy",
    oracle="""
    SELECT doc_id,
           length(text) AS n_chars_text,
           CASE WHEN length(text) = 0 THEN 0.0
                ELSE round(log2(length(text)) -
                     list_reduce(
                         list_transform(
                             list_sort(list_distinct(string_split(text, ''))),
                             c -> round(len(list_filter(string_split(text, ''),
                                                        x -> x = c))
                                        * log2(len(list_filter(string_split(text, ''),
                                                               x -> x = c))), 6)),
                         (a, b) -> a + b) / length(text), 6)
           END AS entropy_bits
    FROM documents
    """,
    doc="C11+: Shannon character entropy per doc — scan-side array "
    "expressions (no per-character explode/shuffle); 6dp-rounded "
    "c·log2(c) terms folded in sorted-char order for cross-engine "
    "bit-exactness.  The gibberish/boilerplate cheap filter.",
)
def c11_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logspout_kinesis_tests_spark.operators.text_analysis import char_entropy

    return char_entropy(load_table(spark, sf_dir, "documents").select("doc_id", "text"))


@register(
    "c14_corpus_diff",
    oracle="""
    WITH old AS (SELECT doc_id, sha256(text) AS h FROM documents),
    new AS (
        SELECT doc_id, sha256(CASE WHEN doc_id % 7 = 0 THEN text || ' [rev2]'
                                   ELSE text END) AS h
        FROM documents WHERE doc_id % 13 != 0
        UNION ALL
        SELECT doc_id + 3000000, sha256('added doc ' || CAST(doc_id AS VARCHAR))
        FROM documents WHERE doc_id % 11 = 0),
    j AS (
        SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
               o.h AS ho, n.h AS hn
        FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id)
    SELECT doc_id,
           CASE WHEN ho IS NULL THEN 'added'
                WHEN hn IS NULL THEN 'removed'
                WHEN ho != hn THEN 'changed'
                ELSE 'unchanged' END AS status
    FROM j
    WHERE (CASE WHEN ho IS NULL THEN 'added' WHEN hn IS NULL THEN 'removed'
                WHEN ho != hn THEN 'changed' ELSE 'unchanged' END) != 'unchanged'
    """,
    doc="C14+: corpus snapshot diff — crawl N vs N+1 by content hash "
    "(planted: every 13th doc removed, every 7th modified, every 11th "
    "spawns an addition); the shuffle carries (id, hash) only, never "
    "bodies.  Feeds incremental re-processing instead of full recompute.",
)
def c14_corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logspout_kinesis_tests_spark.operators.dedup import corpus_diff

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    new = (
        docs.filter(F.col("doc_id") % 13 != 0)
        .select(
            "doc_id",
            F.when(F.col("doc_id") % 7 == 0, F.concat("text", F.lit(" [rev2]")))
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 11 == 0).select(
                (F.col("doc_id") + 3000000).alias("doc_id"),
                F.concat(F.lit("added doc "), F.col("doc_id").cast("string")).alias("text"),
            )
        )
    )
    return corpus_diff(docs, new)


@register(
    "c2_mad_outliers",
    oracle="""
    WITH med AS (
        SELECT event_type, quantile_disc(value, 0.5) AS med
        FROM events GROUP BY event_type),
    dev AS (
        SELECT e.event_id, e.event_type, e.value, m.med,
               abs(e.value - m.med) AS d
        FROM events e JOIN med m USING (event_type)),
    mad AS (
        SELECT event_type, quantile_disc(d, 0.5) AS mad
        FROM dev GROUP BY event_type)
    SELECT d.event_id, d.event_type, d.value, d.med, ma.mad
    FROM dev d JOIN mad ma USING (event_type)
    WHERE d.d > 3 * 1.4826 * ma.mad
    """,
    doc="C2+: robust outlier detection — per-type median and MAD via "
    "exact-regime discrete quantiles (accuracy >= group size, same parity "
    "argument as c2_percentile_sketch), flag |x-med| > 3·1.4826·MAD.  "
    "Medians broadcast back; two grouped aggs, no window over raw rows.",
)
def c2_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.percentile_approx("value", 0.5, 1000000).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "d", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile_approx("d", 0.5, 1000000).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter(F.col("d") > 3 * 1.4826 * F.col("mad"))
        .select("event_id", "event_type", "value", "med", "mad")
    )
