"""Hybrid retrieval + containment decontamination queries (round 3).

Registered AFTER every pre-existing module (see plans/__init__) so the
rotation keeps longer-waiting queries ahead of these in the driver's
correctness window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from logspout_kinesis_tests_spark.plans.llm_queries import (
    SQL_SHINGLES,
    _BM25_TERMS,
    _sql_cos,
)
from logspout_kinesis_tests_spark.plans.registry import register
from logspout_kinesis_tests_spark.sources.tables import load_table

#: DuckDB mirror of c11_bm25's scoring CTE (same terms, same decimal sum)
_SQL_BM25_SCORED = """
    tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
            FROM documents),
    dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
           WHERE term IN ('join', 'filter', 'scan') GROUP BY doc_id, term),
    dfreq AS (SELECT term, count(*) AS df_ FROM tf GROUP BY term),
    stats AS (SELECT count(*) AS n,
                     CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
              FROM dl),
    bm AS (
        SELECT tf.doc_id,
               CAST(sum(CAST(round(
                   ln((stats.n - dfreq.df_ + 0.5) / (dfreq.df_ + 0.5) + 1.0)
                   * (tf.tf * 2.2)
                   / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)),
               6) AS DECIMAL(18,6))) AS DOUBLE) AS bm25
        FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
        GROUP BY tf.doc_id),
    lex_scored AS (
        SELECT d.doc_id, coalesce(bm.bm25, 0.0) AS bm25
        FROM documents d LEFT JOIN bm USING (doc_id))
"""


@register(
    "c10_hybrid_rrf",
    oracle=f"""
    WITH {_SQL_BM25_SCORED},
    lex AS (
        SELECT doc_id, r FROM (
            SELECT doc_id,
                   ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS r
            FROM lex_scored) WHERE r <= 200),
    qv AS (SELECT embedding AS q_vec FROM embeddings WHERE vec_id = 0),
    den_scored AS (
        SELECT e.vec_id AS doc_id,
               {_sql_cos('e.embedding', 'qv.q_vec')} AS cosine
        FROM embeddings e CROSS JOIN qv),
    den AS (
        SELECT doc_id, r FROM (
            SELECT doc_id,
                   ROW_NUMBER() OVER (ORDER BY cosine DESC, doc_id) AS r
            FROM den_scored) WHERE r <= 200),
    u AS (SELECT doc_id, round(1.0 / (60 + r), 9) AS rr FROM lex
          UNION ALL
          SELECT doc_id, round(1.0 / (60 + r), 9) AS rr FROM den)
    SELECT doc_id,
           CAST(sum(CAST(rr AS DECIMAL(18,9))) AS DOUBLE) AS rrf,
           count(*) AS n_systems
    FROM u GROUP BY doc_id ORDER BY rrf DESC, doc_id LIMIT 50
    """,
    doc="C10+: hybrid retrieval — BM25 top-200 (lexical) and cosine top-200"
    " vs a query vector (dense) fused by reciprocal-rank fusion"
    " (1/(60+rank), decimal-summed).  Each system cuts to top-N via"
    " TakeOrdered before fusion, so no full-corpus unpartitioned window"
    " exists anywhere in the plan.",
)
def c10_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logspout_kinesis_tests_spark.functions.vectors import cosine_similarity
    from logspout_kinesis_tests_spark.operators.similarity import rrf_fuse
    from logspout_kinesis_tests_spark.operators.text_analysis import bm25_scores

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    def _ranked(scored: DataFrame, score_col: str) -> DataFrame:
        # TakeOrdered top-200, then rank the 200-row candidate list (the
        # window is over the cut list, never the corpus)
        top = scored.orderBy(F.col(score_col).desc(), "doc_id").limit(200)
        w = Window.orderBy(F.col(score_col).desc(), "doc_id")
        return top.select("doc_id", F.row_number().over(w).alias("rank"))

    lex = _ranked(bm25_scores(docs, _BM25_TERMS), "bm25")
    q_vec = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_vec")
    )
    den = _ranked(
        emb.crossJoin(F.broadcast(q_vec)).select(
            F.col("vec_id").alias("doc_id"),
            cosine_similarity(F.col("embedding"), F.col("q_vec")).alias("cosine"),
        ),
        "cosine",
    )
    return rrf_fuse([lex, den], id_col="doc_id", top=50)


@register(
    "c8_containment_decontaminate",
    oracle=f"""
    WITH bench AS (
        SELECT doc_id AS bench_id,
               array_to_string(list_slice(string_split(lower(text), ' '), 5, 20),
                               ' ') AS text
        FROM documents WHERE doc_id % 101 = 0),
    bsh AS (SELECT bench_id, {SQL_SHINGLES} AS shingles FROM bench),
    csh AS (SELECT doc_id, {SQL_SHINGLES} AS shingles FROM documents),
    pairs AS (
        SELECT c.doc_id, b.bench_id,
               round(CAST(len(list_intersect(c.shingles, b.shingles)) AS DOUBLE)
                     / CAST(len(b.shingles) AS DOUBLE), 6) AS containment
        FROM csh c CROSS JOIN bsh b)
    SELECT doc_id, max(containment) AS max_containment
    FROM pairs WHERE containment >= 0.8 GROUP BY doc_id
    """,
    doc="C8+: containment decontamination (Lee et al. 2022) — flag corpus"
    " docs containing >=80% of any benchmark example's 3-gram shingles;"
    " asymmetric |S(bench) ∩ S(doc)| / |S(bench)|, so a short eval example"
    " embedded in a long document is caught where Jaccard would miss it."
    " Benchmark shingles broadcast; corpus scans once, bodies never shuffle.",
)
def c8_containment_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logspout_kinesis_tests_spark.operators.dedup import ngram_containment

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 101 == 0).select(
        F.col("doc_id").alias("bench_id"),
        F.concat_ws(" ", F.slice(F.split(F.lower("text"), " "), 5, 16)).alias(
            "text"
        ),
    )
    pairs = ngram_containment(docs, bench, threshold=0.8)
    return pairs.groupBy("doc_id").agg(
        F.max("containment").alias("max_containment")
    )


@register(
    "c14_leakage_safe_split",
    oracle=f"""
    WITH RECURSIVE sh AS (
        SELECT doc_id, lang, {SQL_SHINGLES} AS shingles FROM documents),
    p AS (
        SELECT a.doc_id AS src, b.doc_id AS dst
        FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
                / CAST(len(a.shingles) + len(b.shingles)
                       - len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
              >= 0.3),
    edges AS (SELECT src, dst FROM p UNION SELECT dst, src FROM p),
    reach(id, lbl) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id),
    comp AS (SELECT id, min(lbl) AS cluster FROM reach GROUP BY id),
    clustered AS (
        SELECT d.doc_id, coalesce(c.cluster, d.doc_id) AS cluster
        FROM documents d LEFT JOIN comp c ON d.doc_id = c.id)
    SELECT doc_id, cluster,
           CASE WHEN substring(md5('split:' || CAST(cluster AS VARCHAR)), 1, 2)
                     < 'cc' THEN 'train'
                WHEN substring(md5('split:' || CAST(cluster AS VARCHAR)), 1, 2)
                     < 'e6' THEN 'val'
                ELSE 'test' END AS split
    FROM clustered
    """,
    doc="C14+: leakage-safe train/val/test split — near-dup CLUSTERS (exact"
    " Jaccard>=0.3 pairs -> connected components) are the split unit, keyed"
    " by md5 of the cluster representative, so near-duplicate documents can"
    " never straddle train and test (row-hash splits leak through"
    " near-dups).  Singletons key by their own id; same ~80/10/10 bands as"
    " c14_dataset_split.",
)
def c14_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logspout_kinesis_tests_spark.operators.dedup import (
        connected_components,
        ngram_jaccard_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.3, block_cols=("lang",))
    cc = connected_components(pairs)
    clustered = docs.join(
        cc, docs["doc_id"] == cc["id"], "left"
    ).select(
        "doc_id", F.coalesce("component", "doc_id").alias("cluster")
    )
    bucket = F.substring(
        F.md5(F.concat(F.lit("split:"), F.col("cluster").cast("string"))), 1, 2
    )
    return clustered.select(
        "doc_id",
        "cluster",
        F.when(bucket < "cc", "train")
        .when(bucket < "e6", "val")
        .otherwise("test")
        .alias("split"),
    )


@register(
    "c9_cross_corpus_neardup",
    oracle=f"""
    WITH old_c AS (
        SELECT doc_id AS old_id, text FROM documents WHERE doc_id % 2 = 0),
    new_c AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
        UNION ALL
        SELECT doc_id + 1000000, text FROM documents
        WHERE doc_id % 50 = 0),
    osh AS (SELECT old_id, {SQL_SHINGLES} AS shingles FROM old_c),
    nsh AS (SELECT doc_id, {SQL_SHINGLES} AS shingles
            FROM (SELECT doc_id, text FROM new_c) AS t),
    pairs AS (
        SELECT n.doc_id, o.old_id,
               CAST(len(list_intersect(n.shingles, o.shingles)) AS DOUBLE)
                 / CAST(len(n.shingles) + len(o.shingles)
                        - len(list_intersect(n.shingles, o.shingles)) AS DOUBLE)
               AS jaccard
        FROM nsh n CROSS JOIN osh o)
    SELECT doc_id, round(max(jaccard), 6) AS max_jaccard
    FROM pairs WHERE jaccard >= 0.5 GROUP BY doc_id
    """,
    doc="C9+: cross-corpus near-dup detection — flag NEW-snapshot documents"
    " whose exact word-3-gram Jaccard vs ANY already-ingested document"
    " reaches 0.5 (the near-dup analogue of incremental exact dedup)."
    " Planted: every 50th even doc re-enters under a shifted id (jaccard"
    " 1.0 vs its old self).  Inverted-index equi-join on xxhash64(shingle)"
    " — the new x old cross product never materializes.",
)
def c9_cross_corpus_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logspout_kinesis_tests_spark.operators.dedup import (
        cross_corpus_jaccard_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").alias("old_id"), "text"
    )
    new = (
        docs.filter(F.col("doc_id") % 2 == 1)
        .select("doc_id", "text")
        .union(
            docs.filter(F.col("doc_id") % 50 == 0).select(
                (F.col("doc_id") + 1000000).alias("doc_id"), "text"
            )
        )
    )
    pairs = cross_corpus_jaccard_pairs(new, old, threshold=0.5)
    return pairs.groupBy("doc_id").agg(
        F.round(F.max("jaccard"), 6).alias("max_jaccard")
    )


@register(
    "c16_gap_fill",
    oracle="""
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
        FROM bounds)
    SELECT g.event_type,
           strftime(g.bucket_start, '%Y-%m-%d %H:%M:%S.%f') AS bucket_start,
           coalesce(o.n, 0) AS n,
           last_value(o.total IGNORE NULLS) OVER (
               PARTITION BY g.event_type ORDER BY g.bucket_start
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS total_locf,
           o.n IS NULL AS is_gap
    FROM grid g LEFT JOIN obs o
      ON g.event_type = o.event_type AND g.bucket_start = o.bucket_start
    """,
    doc="C16+: gap-filled hourly rollup with last-observation-carried-"
    "forward — the time_bucket_gapfill/locf hypertable pair: every hour"
    " between a key's first and last event materializes; silent holes"
    " (sensor down, partition lost) become visible n=0 rows instead of"
    " absent ones.  Grid explodes from a one-row-per-key bounds table.",
)
def c16_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logspout_kinesis_tests_spark.operators.timeseries import gap_fill
    from logspout_kinesis_tests_spark.plans.helpers import ts_str

    ev = load_table(spark, sf_dir, "events")
    out = gap_fill(ev)
    return out.select(
        "event_type",
        ts_str("bucket_start").alias("bucket_start"),
        "n",
        "total_locf",
        "is_gap",
    )


@register(
    "c2_ols_trend",
    oracle="""
    WITH pts AS (
        SELECT event_type,
               CAST(floor(epoch_us(ts) / 3600000000) AS DECIMAL(20,0)) AS x,
               CAST(value AS DECIMAL(18,2)) AS y
        FROM events),
    s AS (
        SELECT event_type,
               CAST(count(*) AS DOUBLE) AS n,
               CAST(sum(x) AS DOUBLE) AS sx,
               CAST(sum(y) AS DOUBLE) AS sy,
               CAST(sum(x * y) AS DOUBLE) AS sxy,
               CAST(sum(x * x) AS DOUBLE) AS sxx
        FROM pts GROUP BY event_type)
    SELECT event_type,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 9) AS slope,
           round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n,
                 9) AS intercept,
           CAST(n AS BIGINT) AS n
    FROM s
    """,
    doc="C2+: per-group OLS trend — closed-form regression of value on"
    " event-hour via five decimal-exact sums (n, Σx, Σy, Σxy, Σx²): one"
    " map-combined groupBy, no iteration, no solver.  Sums are exact"
    " decimals cast to double (all < 2^53, so the cast is exact) and the"
    " slope/intercept expressions are written identically in both engines"
    " — bit-identical across partitionings.",
)
def c2_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        "event_type",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(3_600_000_000)
        )
        .cast("decimal(20,0)")
        .alias("x"),
        F.col("value").cast("decimal(18,2)").alias("y"),
    )
    s = pts.groupBy("event_type").agg(
        F.count("*").cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return s.select(
        "event_type",
        F.round(slope, 9).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 9).alias(
            "intercept"
        ),
        F.col("n").cast("long").alias("n"),
    )


@register(
    "c20_training_prep",
    oracle="""
    WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 5000000, text FROM documents WHERE doc_id % 40 = 0),
    dd AS (SELECT min(doc_id) AS doc_id FROM corpus GROUP BY md5(text)),
    survivors AS (SELECT c.doc_id, c.text FROM corpus c JOIN dd USING (doc_id)),
    w AS (SELECT doc_id, text, string_split(lower(text), ' ') AS ws FROM survivors),
    base AS (
        SELECT doc_id, text, len(ws) AS n_words,
               len(list_distinct(ws)) AS n_distinct,
               CASE WHEN len(ws) >= 2
                    THEN list_transform(range(1, len(ws)),
                           i -> array_to_string(list_slice(ws, i, i + 1), ' '))
                    ELSE []::VARCHAR[] END AS bg
        FROM w),
    bgx AS (SELECT doc_id, bgram, count(*) AS c
            FROM (SELECT doc_id, unnest(bg) AS bgram FROM base)
            GROUP BY doc_id, bgram),
    bgs AS (SELECT doc_id, max(c) AS top_bg, sum(c) AS n_bg FROM bgx GROUP BY doc_id),
    rep AS (
        SELECT b.doc_id, b.text, n_words,
               CAST(n_distinct AS DOUBLE) / CAST(n_words AS DOUBLE) AS dwr,
               CASE WHEN n_bg IS NULL OR n_bg = 0 THEN 0.0
                    ELSE CAST(top_bg AS DOUBLE) / CAST(n_bg AS DOUBLE) END AS tbf
        FROM base b LEFT JOIN bgs USING (doc_id)),
    bw AS (SELECT list_slice(string_split(lower(text), ' '), 5, 20) AS sw
           FROM documents WHERE doc_id % 101 = 0),
    bench AS (
        SELECT DISTINCT g AS ngram FROM (
            SELECT unnest(CASE WHEN len(sw) >= 8
                  THEN list_distinct(list_transform(range(1, len(sw) - 6),
                         i -> array_to_string(list_slice(sw, i, i + 7), ' ')))
                  ELSE []::VARCHAR[] END) AS g FROM bw)),
    dg AS (
        SELECT doc_id, unnest(CASE WHEN len(ws) >= 8
               THEN list_distinct(list_transform(range(1, len(ws) - 6),
                      i -> array_to_string(list_slice(ws, i, i + 7), ' ')))
               ELSE []::VARCHAR[] END) AS ngram
        FROM w),
    hits AS (SELECT DISTINCT doc_id FROM dg JOIN bench USING (ngram))
    SELECT r.doc_id,
           CASE WHEN substring(md5(r.text), 1, 2) < 'cc' THEN 'train'
                WHEN substring(md5(r.text), 1, 2) < 'e6' THEN 'val'
                ELSE 'test' END AS split,
           r.n_words,
           round(r.dwr, 9) AS distinct_word_ratio
    FROM rep r LEFT JOIN hits h USING (doc_id)
    WHERE h.doc_id IS NULL
      AND r.n_words BETWEEN 10 AND 1000
      AND r.dwr >= 0.3
      AND r.tbf <= 0.2
    """,
    doc="C20+: end-to-end training-corpus prep as ONE plan — exact dedup"
    " (planted 1-in-40 duplicates, keep min id) → repetition/length gates"
    " → benchmark 8-gram decontamination anti-join → content-hash"
    " train/val/test assignment.  Every stage reuses an individually"
    " oracle-verified operator; the composite pins their interaction.",
)
def c20_training_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logspout_kinesis_tests_spark.operators.curation import (
        contaminated_docs,
        repetition_stats,
    )
    from logspout_kinesis_tests_spark.operators.dedup import exact_dedup

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.select("doc_id", "text").union(
        docs.filter(F.col("doc_id") % 40 == 0).select(
            (F.col("doc_id") + 5000000).alias("doc_id"), "text"
        )
    )
    keep = exact_dedup(corpus).select(F.col("keep_id").alias("doc_id"))
    # r15: THREE consumers read the survivor set (repetition_stats, the
    # decontamination n-gram explode, and the final doc_id/text join) and
    # each re-derived the union + sha256 dedup + semi-join subtree — Spark
    # shares no subplans across one action.  One materialization removes
    # two recomputations of the dedup shuffle (guide §2.4/§5; interleaved
    # same-session A/B, 5 alternating repeats at sf0.1: 2.69 s → 2.04 s
    # median, 0.76×, rows identical; plan diff in
    # plans/r15/c20_training_prep_{before,after}.txt).  localCheckpoint
    # pins the survivor corpus in executor-local non-recomputable blocks —
    # the established repo pattern, right for the bench's local mode; a
    # 100 TB deployment would swap this one call for
    # persist(MEMORY_AND_DISK) + an action to keep the blocks rebuildable
    # after executor loss (ADVICE r15).
    survivors = corpus.join(keep, "doc_id", "left_semi").localCheckpoint(
        eager=True
    )
    bench = docs.filter(F.col("doc_id") % 101 == 0).select(
        F.concat_ws(" ", F.slice(F.split(F.lower("text"), " "), 5, 16)).alias(
            "text"
        )
    )
    rep = repetition_stats(survivors)
    hits = contaminated_docs(survivors, bench)
    bucket = F.substring(F.md5("text"), 1, 2)
    return (
        rep.join(survivors.select("doc_id", "text"), "doc_id")
        .join(hits, "doc_id", "left_anti")
        .filter(
            (F.col("n_words") >= 10)
            & (F.col("n_words") <= 1000)
            & (F.col("distinct_word_ratio") >= 0.3)
            & (F.col("top_bigram_frac") <= 0.2)
        )
        .select(
            "doc_id",
            F.when(bucket < "cc", "train")
            .when(bucket < "e6", "val")
            .otherwise("test")
            .alias("split"),
            "n_words",
            F.round("distinct_word_ratio", 9).alias("distinct_word_ratio"),
        )
    )


@register(
    "c11_source_audit",
    oracle="""
    WITH w AS (
        SELECT doc_id, source, lang,
               len(string_split(lower(text), ' ')) AS n_words,
               len(list_distinct(string_split(lower(text), ' '))) AS n_distinct,
               md5(text) AS h
        FROM documents),
    freq AS (SELECT h, count(*) AS copies FROM w GROUP BY h)
    SELECT w.source,
           count(*) AS n_docs,
           count(DISTINCT w.lang) AS n_langs,
           CAST(sum(CAST(w.n_words AS DECIMAL(18,0))) AS BIGINT) AS total_words,
           round(CAST(sum(CAST(round(CAST(w.n_distinct AS DOUBLE)
                                     / CAST(w.n_words AS DOUBLE), 6)
                               AS DECIMAL(18,6))) AS DOUBLE)
                 / count(*), 9) AS mean_distinct_word_ratio,
           CAST(sum(CASE WHEN f.copies > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS duplicated_docs
    FROM w JOIN freq f USING (h)
    GROUP BY w.source
    """,
    doc="C11+: per-source corpus audit — doc/language counts, decimal-exact"
    " token totals, 6dp-rounded mean lexical diversity, and the number of"
    " docs whose exact content appears more than once corpus-wide.  The"
    " per-ingest-feed quality dashboard: one map-combined groupBy plus one"
    " hash-frequency join; bodies never shuffle.",
)
def c11_source_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.lower("text"), " ")
    w = docs.select(
        "doc_id",
        "source",
        "lang",
        F.size(words).alias("n_words"),
        F.size(F.array_distinct(words)).alias("n_distinct"),
        F.md5("text").alias("h"),
    )
    freq = w.groupBy("h").agg(F.count("*").alias("copies"))
    dwr6 = F.round(
        F.col("n_distinct").cast("double") / F.col("n_words").cast("double"), 6
    ).cast("decimal(18,6)")
    return (
        w.join(freq, "h")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("lang").alias("n_langs"),
            F.sum(F.col("n_words").cast("decimal(18,0)"))
            .cast("long")
            .alias("total_words"),
            F.round(
                F.sum(dwr6).cast("double") / F.count("*"), 9
            ).alias("mean_distinct_word_ratio"),
            F.sum(F.when(F.col("copies") > 1, 1).otherwise(0))
            .cast("long")
            .alias("duplicated_docs"),
        )
    )


@register(
    "c5_user_paths",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type, 1) OVER w AS e2,
               lead(event_type, 2) OVER w AS e3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    paths AS (
        SELECT event_type || '>' || e2 || '>' || e3 AS path
        FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL)
    SELECT path, count(*) AS n_users_paths FROM paths
    GROUP BY path ORDER BY n_users_paths DESC, path LIMIT 20
    """,
    doc="C5+: top 3-step event paths — per-user lead() sequences (ordered"
    " by ts with event_id tie-break), path strings counted map-side, global"
    " top-20 via TakeOrdered.  The clickstream path-analysis primitive:"
    " one per-user window shuffle + one (path, partial-count) shuffle.",
)
def c5_user_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e2").isNotNull() & F.col("e3").isNotNull())
    paths = seq.select(
        F.concat_ws(">", "event_type", "e2", "e3").alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_users_paths"))
        .orderBy(F.col("n_users_paths").desc(), "path")
        .limit(20)
    )


@register(
    "c12_jpeg_header_decode",
    # The oracle SYNTHESIZES the same payloads and therefore knows each
    # row's SOF offset analytically (24 + com_len bytes); the Spark side
    # discovers it by actually walking the segment chain.  Comparing the
    # two validates the walk on per-row-varying offsets.
    oracle="""
    WITH par AS (
        SELECT doc_id,
               16 + doc_id % 2023 AS w,
               16 + doc_id % 1151 AS h,
               doc_id % 13 AS k
        FROM documents),
    hx AS (
        SELECT doc_id, w, h, k,
               CASE WHEN doc_id % 50 = 0 THEN 'DEADBEEF'
                    WHEN doc_id % 70 = 0 THEN
                      'FFD8' || 'FFE00010' || '4A46494600' || '010100'
                      || '00480048' || '0000'
                    ELSE
                      'FFD8' || 'FFE00010' || '4A46494600' || '010100'
                      || '00480048' || '0000'
                      || 'FFFE' || lpad(hex(k + 2), 4, '0') || repeat('41', k)
                      || 'FFC0' || '0011' || '08'
                      || lpad(hex(h), 4, '0') || lpad(hex(w), 4, '0')
                      || '03' || '011100' || '021101' || '031101'
               END AS hh
        FROM par),
    chk AS (
        SELECT doc_id, w, h,
               doc_id % 50 <> 0 AND doc_id % 70 <> 0 AS jpeg_valid
        FROM hx)
    SELECT doc_id, jpeg_valid,
           CASE WHEN jpeg_valid THEN 8 END AS precision,
           CASE WHEN jpeg_valid THEN h END AS jpeg_height,
           CASE WHEN jpeg_valid THEN w END AS jpeg_width,
           CASE WHEN jpeg_valid THEN 3 END AS n_components
    FROM chk
    """,
    doc="C12+: JPEG SOF decode via a real bounded segment walk — SOI, APP0,"
    " a COM segment of per-row-varying length (so the SOF offset differs"
    " per document), then SOF0; the parser folds over the marker chain in"
    " one scan-side aggregate, no UDF.  Planted corrupt payloads (bad SOI"
    " every 50th doc, SOF-less chain every 70th) take the PERMISSIVE NULL"
    " path.",
)
def c12_jpeg_header_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logspout_kinesis_tests_spark.operators.multimodal import (
        parse_jpeg_header,
        synth_jpeg_payload,
    )

    par = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        (F.lit(16) + F.col("doc_id") % 2023).alias("width"),
        (F.lit(16) + F.col("doc_id") % 1151).alias("height"),
        (F.col("doc_id") % 13).alias("com_len"),
    )
    payloads = synth_jpeg_payload(par).withColumn(
        "payload",
        F.when(F.col("doc_id") % 50 == 0, F.unhex(F.lit("DEADBEEF")))
        .when(
            F.col("doc_id") % 70 == 0,
            F.unhex(
                F.lit("FFD8" + "FFE00010" + "4A46494600" + "010100" + "00480048" + "0000")
            ),
        )
        .otherwise(F.col("payload")),
    )
    return parse_jpeg_header(payloads).select(
        "doc_id",
        "jpeg_valid",
        F.col("precision").cast("int").alias("precision"),
        F.col("jpeg_height").cast("int").alias("jpeg_height"),
        F.col("jpeg_width").cast("int").alias("jpeg_width"),
        F.col("n_components").cast("int").alias("n_components"),
    )


@register(
    "c12_mp4_box_scan",
    # Same validation idea as the JPEG walk: the oracle synthesizes the
    # box chain and knows every offset analytically; Spark walks it.
    oracle="""
    WITH par AS (
        SELECT doc_id,
               1000 + doc_id % 90001 AS msize,
               doc_id % 4 AS nfree
        FROM documents),
    chk AS (
        SELECT doc_id, msize, doc_id % 50 <> 0 AS mp4_valid FROM par)
    SELECT doc_id, mp4_valid,
           CASE WHEN mp4_valid THEN 'isom' END AS major_brand,
           CASE WHEN mp4_valid THEN true END AS has_moov,
           CASE WHEN mp4_valid THEN msize END AS mdat_bytes
    FROM chk
    """,
    doc="C12+: ISO-BMFF (MP4) top-level box scan — ftyp brand, moov"
    " presence, mdat payload size via a bounded box-chain walk (offsets"
    " vary per row through 0-3 planted free boxes); the container-"
    " inspection first pass of a video corpus, no frame decode, no UDF."
    " Every 50th doc carries a non-MP4 payload and takes the NULL path.",
)
def c12_mp4_box_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logspout_kinesis_tests_spark.operators.multimodal import (
        parse_mp4_boxes,
        synth_mp4_payload,
    )

    par = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        (F.lit(1000) + F.col("doc_id") % 90001).alias("mdat_size"),
        (F.col("doc_id") % 4).alias("n_free"),
    )
    payloads = synth_mp4_payload(par).withColumn(
        "payload",
        F.when(F.col("doc_id") % 50 == 0, F.unhex(F.lit("DEADBEEF"))).otherwise(
            F.col("payload")
        ),
    )
    return parse_mp4_boxes(payloads).select(
        "doc_id",
        "mp4_valid",
        "major_brand",
        "has_moov",
        F.col("mdat_bytes").cast("long").alias("mdat_bytes"),
    )


@register(
    "c13_batched_inference",
    # md5 bytes i scaled by 1/256 (exact binary fractions — bit-identical
    # across Python hashlib, Spark, and DuckDB md5 implementations)
    oracle="""
    SELECT doc_id,
           ('0x' || substring(md5(text), 1, 2))::BIGINT / 256.0 AS e0,
           ('0x' || substring(md5(text), 3, 2))::BIGINT / 256.0 AS e1,
           ('0x' || substring(md5(text), 5, 2))::BIGINT / 256.0 AS e2,
           ('0x' || substring(md5(text), 7, 2))::BIGINT / 256.0 AS e3
    FROM documents
    """,
    doc="C13+: Arrow-batched model inference via mapInPandas — iterator of"
    " pandas batches in/out, one 'model' per task, the real embedding-"
    " generation plumbing with md5-derived fake weights so the whole path"
    " (schema, batch iteration, Arrow transfer) is oracle-verified"
    " bit-exactly.  Swap the fake for a real encoder and nothing else"
    " changes.",
)
def c13_batched_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logspout_kinesis_tests_spark.functions.pandas_udfs import (
        EMBED_SCHEMA_4,
        fake_embed_batches,
    )
    from logspout_kinesis_tests_spark.sources.tables import spread_for_compute

    docs = spread_for_compute(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    return docs.mapInPandas(fake_embed_batches(4), schema=EMBED_SCHEMA_4)


@register(
    "c10_pq_topk",
    oracle=None,  # approximate by design (PQ ADC); rows-only + recall gate.
    doc="C10+: product-quantization approximate top-5 — m=4 subspaces × 16 "
    "centroids (deterministic per-subspace k-means), asymmetric-distance "
    "scan over 4-byte codes (64× smaller than float32 vectors), exact "
    "cosine re-rank of the top-100 candidates.  The memory-bound ANN scale "
    "path: the full-precision corpus is touched only for Q×100 re-rank "
    "rows; recall vs exact asserted by c10_pq_recall_gate and pytest.",
)
def c10_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logspout_kinesis_tests_spark.operators.ann import pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.select("vec_id", "embedding")
    return pq_topk(queries, corpus, k=5, m=4, ksub=16, rerank=100)


@register(
    "c10_pq_recall_gate",
    # Same violation-rows/empty-oracle shape as the LSH/IVF gates.  Margins
    # under measurement: agreement with exact top-5 is 44-47/50 across
    # sf0.001/0.01/0.1 at iters=1 (gate: ≥30).  Self-match is NOT a
    # structural guarantee — the ADC score is cos(q, x-hat), so another
    # vector's reconstruction can out-score cos(q, q-hat), or >rerank
    # vectors sharing q's codes with lower ids can tie it out of the
    # candidate cut; it is empirically stable on this corpus at the
    # registered settings (m=4, ksub=16, rerank=100), which is what the
    # gate pins.
    # The healthy output is one computed summary row matched against the
    # oracle's expected value (the r9 empty-vs-empty wart fix, same as the
    # IVF/LSH gates); self-match is empirically stable at the registered
    # settings — the existing self_ violation rows already red-flag any
    # loss, the summary just makes the green non-trivial.
    oracle="""
    SELECT CAST('self_match_total' AS VARCHAR) AS gate,
           CAST(10 AS BIGINT) AS observed
    """,
    doc="C10+: driver-visible PQ recall regression gate — per-query "
    "self-match (empirically stable at the registered settings) and "
    "aggregate top-5 agreement vs the oracle-matched exact ranking "
    "(floor 30/50; measured 44-47/50); healthy output is the computed "
    "10-query self-match count matched against the oracle's expected 10.",
)
def c10_pq_recall_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logspout_kinesis_tests_spark.operators.ann import pq_topk
    from logspout_kinesis_tests_spark.operators.similarity import cosine_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.select("vec_id", "embedding")
    exact = cosine_topk(queries, corpus, k=5)
    # 50-row result feeding three consumers (agreement join, self-match
    # anti-join, the pinned summary): checkpoint once or each re-runs the
    # whole PQ train+encode+scan
    pq = pq_topk(queries, corpus, k=5, m=4, ksub=16, rerank=100).localCheckpoint(
        eager=True
    )
    agree = (
        exact.select("query_id", "vec_id")
        .join(pq.select("query_id", "vec_id"), ["query_id", "vec_id"], "leftsemi")
        .groupBy("query_id")
        .agg(F.count("*").alias("n_agree"))
    )
    selfmatch = pq.filter(F.col("query_id") == F.col("vec_id")).select("query_id")
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
        .filter(F.col("total") < 30)
        .select(
            F.lit("total_agreement").alias("gate"),
            F.col("total").cast("long").alias("observed"),
        )
    )
    self_total = (
        queries.select("query_id")
        .join(selfmatch, "query_id", "left_semi")
        .agg(F.count("*").cast("long").alias("observed"))
        .select(F.lit("self_match_total").alias("gate"), "observed")
    )
    return self_total.unionByName(self_viol).unionByName(total_viol)


# ---------------------------------------------------------------------------
# Search-only ANN paths (VERDICT r3 #5): the number a 100 TB operator cares
# about is search latency against a PERSISTED index — the index is built once
# per corpus snapshot and amortized over every query batch, so benching the
# build loop every run (as c10_pq_topk/c10_ivf_topk deliberately do, to keep
# the k-means cost visible) understates the steady-state path.  The memo
# below builds each index once per (Spark application, sf_dir) and eagerly
# localCheckpoints every component, so repeat invocations — bench repeats,
# successive query batches in a session — pay only ADC-scan + re-rank (PQ)
# or probe-join + re-rank (IVF).

#: (kind, applicationId, sf_dir) -> checkpointed index tuple.  Keyed by the
#: application id so a new session (new JVM — prior checkpoint blocks are
#: gone) rebuilds instead of dereferencing orphaned plans.
_ANN_INDEX_CACHE: dict[tuple[str, str, str], tuple[DataFrame, DataFrame]] = {}


def _corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")


def pq_index_for(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Build-once PQ index (codes, codebooks) for the sf_dir corpus."""
    from logspout_kinesis_tests_spark.operators.ann import pq_index

    key = ("pq", spark.sparkContext.applicationId, sf_dir)
    if key not in _ANN_INDEX_CACHE:
        codes, codebooks = pq_index(_corpus(spark, sf_dir), m=4, ksub=16, iters=1)
        _ANN_INDEX_CACHE[key] = (
            codes.localCheckpoint(eager=True),
            codebooks.localCheckpoint(eager=True),
        )
    return _ANN_INDEX_CACHE[key]


def ivf_index_for(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Build-once IVF index (assignment, centroids) for the sf_dir corpus."""
    from logspout_kinesis_tests_spark.operators.ann import ivf_index

    key = ("ivf", spark.sparkContext.applicationId, sf_dir)
    if key not in _ANN_INDEX_CACHE:
        assignment, centroids = ivf_index(_corpus(spark, sf_dir), nlist=16, iters=2)
        _ANN_INDEX_CACHE[key] = (
            assignment.localCheckpoint(eager=True),
            centroids.localCheckpoint(eager=True),
        )
    return _ANN_INDEX_CACHE[key]


def _query_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


@register(
    "c10_pq_topk_search_only",
    oracle=None,  # approximate by design; identical output to c10_pq_topk
    # (deterministic index build) — parity is hash-gated by
    # c10_search_only_parity and pytest.
    doc="C10+: PQ top-5 against a prebuilt persisted index (codes + "
    "codebooks checkpointed once per corpus snapshot) — the amortized "
    "production path: per-batch cost is the broadcast-ADC codes scan plus "
    "the top-100 exact re-rank; the k-means build loop is off the clock.",
)
def c10_pq_topk_search_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logspout_kinesis_tests_spark.operators.ann import pq_topk

    return pq_topk(
        _query_batch(spark, sf_dir),
        _corpus(spark, sf_dir),
        k=5,
        m=4,
        ksub=16,
        rerank=100,
        index=pq_index_for(spark, sf_dir),
    )


@register(
    "c10_ivf_topk_search_only",
    oracle=None,  # approximate by design; parity vs the self-built path is
    # hash-gated by c10_search_only_parity and pytest.
    doc="C10: IVF top-5 against a prebuilt persisted inverted file "
    "(assignment + centroids checkpointed once) — per-batch cost is the "
    "nprobe cell-probe join + exact re-rank only.",
)
def c10_ivf_topk_search_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logspout_kinesis_tests_spark.operators.ann import ivf_topk

    return ivf_topk(
        _query_batch(spark, sf_dir),
        _corpus(spark, sf_dir),
        k=5,
        nlist=16,
        nprobe=4,
        index=ivf_index_for(spark, sf_dir),
    )


@register(
    "c10_search_only_parity",
    # Violation-rows shape (same as the recall gates): both index builds
    # are fully deterministic, so search against the persisted index must
    # return EXACTLY the self-built path's rows.  Any divergence (a stale
    # cache, a checkpoint that altered row contents, geometry drift)
    # surfaces as a violation row and the driver hash-fails.  The healthy
    # output is two computed summary rows — each path's result-row count,
    # pinned at 10 queries × k=5 by the oracle — so the green verdict is a
    # non-trivial equality, not empty-vs-empty (the r9 wart).
    oracle="""
    SELECT CAST(gate AS VARCHAR) AS gate,
           CAST(q AS BIGINT) AS query_id,
           CAST(v AS BIGINT) AS vec_id
    FROM (VALUES ('pq_rows_compared', 50, 50),
                 ('ivf_rows_compared', 50, 50)) t(gate, q, v)
    """,
    doc="C10+: driver-visible parity gate — (query_id, vec_id, rank) "
    "symmetric difference between the persisted-index search path and the "
    "self-built path, for both PQ and IVF; healthy output is the two "
    "50-row count summaries, violations break the hash.",
)
def c10_search_only_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logspout_kinesis_tests_spark.operators.ann import ivf_topk, pq_topk

    queries = _query_batch(spark, sf_dir)
    corpus = _corpus(spark, sf_dir)

    def _viol(kind: str, fresh: DataFrame, cached: DataFrame) -> DataFrame:
        cols = ["query_id", "vec_id", "rank"]
        a, b = fresh.select(*cols), cached.select(*cols)
        diff = a.exceptAll(b).unionByName(b.exceptAll(a))
        return diff.select(
            F.lit(kind).alias("gate"),
            F.col("query_id").cast("long").alias("query_id"),
            F.col("vec_id").cast("long").alias("vec_id"),
        )

    def _summary(kind: str, fresh: DataFrame, cached: DataFrame) -> DataFrame:
        return (
            fresh.agg(F.count("*").cast("long").alias("query_id"))
            .crossJoin(cached.agg(F.count("*").cast("long").alias("vec_id")))
            .select(
                F.lit(f"{kind}_rows_compared").alias("gate"),
                "query_id",
                "vec_id",
            )
        )

    # each 50-row result feeds three consumers (two exceptAll branches +
    # the count summary): checkpoint once per path or every consumer
    # re-runs the full build/search
    pq_fresh = pq_topk(
        queries, corpus, k=5, m=4, ksub=16, rerank=100
    ).localCheckpoint(eager=True)
    pq_cached = pq_topk(
        queries, corpus, k=5, m=4, ksub=16, rerank=100,
        index=pq_index_for(spark, sf_dir),
    ).localCheckpoint(eager=True)
    ivf_fresh = ivf_topk(queries, corpus, k=5, nlist=16, nprobe=4).localCheckpoint(
        eager=True
    )
    ivf_cached = ivf_topk(
        queries, corpus, k=5, nlist=16, nprobe=4,
        index=ivf_index_for(spark, sf_dir),
    ).localCheckpoint(eager=True)
    return (
        _summary("pq", pq_fresh, pq_cached)
        .unionByName(_summary("ivf", ivf_fresh, ivf_cached))
        .unionByName(_viol("pq", pq_fresh, pq_cached))
        .unionByName(_viol("ivf", ivf_fresh, ivf_cached))
    )
