"""Round-6 queries: engine-portable assignment gates for the IVF and PQ
indexes (C10) and the per-entity autocorrelation scale path (C16).

The IVF/PQ production operators (``operators/ann.py``) are deterministic
k-means pipelines whose iterated float MEANS are not bit-replayable in SQL
(double ``avg`` is order-dependent), so ``c10_ivf_topk``/``c10_pq_topk``
carry rows-only verdicts pinned by parity/recall gates.  These gates close
the remaining gap the same way the r5 LSH md5 gates did for C9: freeze the
centroids at the operators' deterministic SEEDS (exact corpus vectors — no
averaging anywhere) and replay the full ASSIGNMENT step — the broadcast
centroid scan, the per-term similarity fold, the deterministic tie-broken
argmin/argmax — with exact per-term DECIMAL quantization, so DuckDB
reproduces every score bit-for-bit and the driver hash-verifies the
bucketing logic itself.

Registered LAST (see plans/__init__) so the staleness-ordered rotation
keeps this round's window focused on re-verifying the oldest greens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from logspout_kinesis_tests_spark.plans.registry import register
from logspout_kinesis_tests_spark.sources.tables import load_table

# --- C10+: IVF cell-assignment gate -----------------------------------------

#: Same defaults as operators/ann.ivf_index.
_IVF_NLIST = 16
#: Per-term quantization scale: embedding components are O(0.1) floats, so
#: products round losslessly-enough at 15 dp and DECIMAL(28,15) sums of 64
#: terms are exact and order-independent in both engines.
_Q = 15


def _qdec(col) -> F.Column:
    """round(x, 15)::DECIMAL(28,15) — the engine-portable exact term."""
    return F.round(col, _Q).cast(f"decimal(28,{_Q})")


@register(
    "c10_ivf_md5_gate",
    # Centroids = the nlist lowest-vec_id corpus vectors (ivf_index's seed
    # rule, iters=0 — exact float vectors, nothing averaged).  Assignment =
    # argmax over cells of dot(x, c)/|c| (the corpus-vector norm is common
    # across cells, so the argmax equals the production cosine argmax),
    # with dot and |c|² as exact decimal sums of per-term double products
    # and a cell-ascending tie-break.  Every double the comparison touches
    # is bit-identical across engines by construction.
    oracle=f"""
    WITH cents AS (
        SELECT vec_id AS cell, embedding AS centroid
        FROM embeddings ORDER BY vec_id LIMIT {_IVF_NLIST}),
    cx AS (
        SELECT cell, generate_subscripts(centroid, 1) AS pos,
               unnest(centroid) AS cv
        FROM cents),
    ex AS (
        SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
               unnest(embedding) AS v
        FROM embeddings),
    dots AS (
        SELECT e.vec_id, c.cell,
               CAST(sum(CAST(round(CAST(e.v AS DOUBLE) * CAST(c.cv AS DOUBLE),
                                   {_Q}) AS DECIMAL(28,{_Q}))) AS DOUBLE)
                   AS dotq,
               CAST(sum(CAST(round(CAST(c.cv AS DOUBLE) * CAST(c.cv AS DOUBLE),
                                   {_Q}) AS DECIMAL(28,{_Q}))) AS DOUBLE)
                   AS csq
        FROM ex e JOIN cx c USING (pos)
        GROUP BY e.vec_id, c.cell),
    scored AS (
        SELECT vec_id, cell, dotq / sqrt(csq) AS sim
        FROM dots WHERE csq > 0)
    SELECT vec_id, cell
    FROM (SELECT vec_id, cell,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY sim DESC, cell) AS rn
          FROM scored)
    WHERE rn = 1
    """,
    doc="C10+: driver-visible IVF cell-assignment gate — the inverted-file "
    "bucketing step (broadcast centroid scan, per-vector cosine argmax, "
    "deterministic tie-break) replayed bit-for-bit by DuckDB.  Centroids "
    "are ivf_index's deterministic seeds (exact corpus vectors, "
    "operators/ann.py:94-102), dot products and centroid norms are exact "
    "per-term DECIMAL sums, so the score every comparison sees is "
    "bit-identical across engines.  Hash-pins the cell-assignment logic "
    "whose iterated-mean production form (c10_ivf_topk) is rows-only.",
)
def c10_ivf_md5_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    cents = (
        emb.orderBy("vec_id")
        .limit(_IVF_NLIST)
        .select(F.col("vec_id").alias("cell"), F.col("embedding").alias("centroid"))
    )
    cx = cents.select("cell", F.posexplode("centroid").alias("pos", "cv"))
    ex = emb.select("vec_id", F.posexplode("embedding").alias("pos", "v"))
    v, cv = F.col("v").cast("double"), F.col("cv").cast("double")
    dots = (
        ex.join(F.broadcast(cx), "pos")
        .groupBy("vec_id", "cell")
        .agg(
            F.sum(_qdec(v * cv)).cast("double").alias("dotq"),
            F.sum(_qdec(cv * cv)).cast("double").alias("csq"),
        )
    )
    scored = dots.filter(F.col("csq") > 0).select(
        "vec_id", "cell", (F.col("dotq") / F.sqrt(F.col("csq"))).alias("sim")
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), "cell")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cell")
    )


# --- C10+: PQ code-assignment gate ------------------------------------------

#: Same defaults as operators/ann.pq_index (m subspaces × ksub codewords).
_PQ_M = 4
_PQ_KSUB = 16
_PQ_DSUB = 16  # 64-dim embeddings / m


@register(
    "c10_pq_md5_gate",
    # Codebooks = subvectors of the ksub lowest-vec_id corpus rows
    # (pq_index's seed rule, iters=0); codes = per-(vector, subspace) argmin
    # of ||x_sub − c||² with a code-ascending tie-break.  The squared
    # distance stays an exact DECIMAL sum end-to-end (no sqrt, no division
    # — comparisons happen on exact decimals), so the argmin is
    # deterministic and engine-identical.
    oracle=f"""
    WITH seeds AS (
        SELECT vec_id AS cell, embedding
        FROM embeddings ORDER BY vec_id LIMIT {_PQ_KSUB}),
    cb AS (
        SELECT cell,
               CAST((generate_subscripts(embedding, 1) - 1) // {_PQ_DSUB}
                    AS INT) AS sub,
               (generate_subscripts(embedding, 1) - 1) % {_PQ_DSUB} AS p,
               unnest(embedding) AS cv
        FROM seeds),
    ex AS (
        SELECT vec_id,
               CAST((generate_subscripts(embedding, 1) - 1) // {_PQ_DSUB}
                    AS INT) AS sub,
               (generate_subscripts(embedding, 1) - 1) % {_PQ_DSUB} AS p,
               unnest(embedding) AS v
        FROM embeddings),
    d2 AS (
        SELECT e.vec_id, e.sub, c.cell,
               sum(CAST(round((CAST(e.v AS DOUBLE) - CAST(c.cv AS DOUBLE))
                              * (CAST(e.v AS DOUBLE) - CAST(c.cv AS DOUBLE)),
                              {_Q}) AS DECIMAL(28,{_Q}))) AS d2q
        FROM ex e JOIN cb c ON e.sub = c.sub AND e.p = c.p
        GROUP BY e.vec_id, e.sub, c.cell)
    SELECT vec_id, sub, cell AS code
    FROM (SELECT vec_id, sub, cell,
                 row_number() OVER (PARTITION BY vec_id, sub
                                    ORDER BY d2q, cell) AS rn
          FROM d2)
    WHERE rn = 1
    """,
    doc="C10+: driver-visible PQ code-assignment gate — the product-"
    "quantization coding step (subvector split, broadcast codebook scan, "
    "per-subspace squared-L2 argmin with deterministic tie-break) replayed "
    "bit-for-bit by DuckDB.  Codebooks are pq_index's deterministic seeds "
    "(operators/ann.py:204-218), distances are exact per-term DECIMAL "
    "sums compared as decimals (no float op after the per-term product), "
    "so code assignment is engine-identical.  Hash-pins the coding logic "
    "whose iterated-mean production form (c10_pq_topk) is rows-only.",
)
def c10_pq_md5_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    seeds = (
        emb.orderBy("vec_id")
        .limit(_PQ_KSUB)
        .select(F.col("vec_id").alias("cell"), "embedding")
    )

    def _sub_exploded(df: DataFrame, id_col: str, val_alias: str) -> DataFrame:
        return df.select(
            id_col, F.posexplode("embedding").alias("i", val_alias)
        ).select(
            id_col,
            F.expr(f"CAST(i DIV {_PQ_DSUB} AS INT)").alias("sub"),
            (F.col("i") % _PQ_DSUB).alias("p"),
            val_alias,
        )

    cb = _sub_exploded(seeds, "cell", "cv")
    ex = _sub_exploded(emb, "vec_id", "v")
    diff = F.col("v").cast("double") - F.col("cv").cast("double")
    d2 = (
        ex.join(F.broadcast(cb), ["sub", "p"])
        .groupBy("vec_id", "sub", "cell")
        .agg(F.sum(_qdec(diff * diff)).alias("d2q"))
    )
    w = Window.partitionBy("vec_id", "sub").orderBy("d2q", "cell")
    return (
        d2.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "sub", F.col("cell").alias("code"))
    )


# --- C16+: per-entity autocorrelation (the 100-TB scale path) ---------------

_ACF_U_LAGS = (1, 2, 3)


@register(
    "c16_acf_by_user",
    # Identical math to c16_acf (exact decimal sufficient statistics, one
    # shared window for all lag taps, zero-variance → NULL), but the series
    # key is (user_id, event_type): c16_acf's per-TYPE global series sorts
    # each type's whole history in one partition by design (5 partitions —
    # its 10× probe is 3.8× for that reason, SCALE.md round-5), while this
    # variant keys the window on the natural entity axis, so partition
    # count grows with the user population and the sort stays local.
    oracle=f"""
    WITH s AS (
        SELECT user_id, event_type, value,
               {", ".join(
                   f"lag(value, {k}) OVER "
                   f"(PARTITION BY user_id, event_type ORDER BY ts, event_id)"
                   f" AS y{k}"
                   for k in _ACF_U_LAGS
               )}
        FROM events WHERE value IS NOT NULL),
    pairs AS (
        {" UNION ALL ".join(
            f"SELECT user_id, event_type, {k} AS lag, value AS x, y{k} AS y "
            f"FROM s WHERE y{k} IS NOT NULL"
            for k in _ACF_U_LAGS
        )}),
    g AS (
        SELECT user_id, event_type, lag, CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(sum(CAST(x AS DECIMAL(18,2))) AS DOUBLE) AS sx,
               CAST(sum(CAST(y AS DECIMAL(18,2))) AS DOUBLE) AS sy,
               CAST(sum(CAST(x AS DECIMAL(18,2))
                        * CAST(y AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
               CAST(sum(CAST(x AS DECIMAL(18,2))
                        * CAST(x AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
               CAST(sum(CAST(y AS DECIMAL(18,2))
                        * CAST(y AS DECIMAL(18,2))) AS DOUBLE) AS syy
        FROM pairs GROUP BY user_id, event_type, lag)
    SELECT user_id, event_type, lag, n_pairs,
           CASE WHEN (n_pairs * sxx - sx * sx) * (n_pairs * syy - sy * sy) <= 0
                THEN NULL
                ELSE round((n_pairs * sxy - sx * sy)
                           / sqrt((n_pairs * sxx - sx * sx)
                                  * (n_pairs * syy - sy * sy)), 9) END AS acf
    FROM g
    """,
    doc="C16+: lag-1..3 autocorrelation per (user_id, event_type) series — "
    "the per-entity scale path named by SCALE.md round-5 for c16_acf: the "
    "same exact-decimal Pearson machinery, but the window partitions on "
    "the entity axis so parallelism grows with the user population "
    "instead of being capped at the 5 event types.  One window pass for "
    "all taps, one shuffle on the series key, O(1) window state per row.",
)
def c16_acf_by_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    s = ev.select(
        "user_id",
        "event_type",
        F.col("value").alias("x"),
        *[F.lag("value", k).over(w).alias(f"y{k}") for k in _ACF_U_LAGS],
    )
    taps = None
    for k in _ACF_U_LAGS:
        t = s.filter(F.col(f"y{k}").isNotNull()).select(
            "user_id",
            "event_type",
            F.lit(k).alias("lag"),
            "x",
            F.col(f"y{k}").alias("y"),
        )
        taps = t if taps is None else taps.unionAll(t)
    dx = F.col("x").cast("decimal(18,2)")
    dy = F.col("y").cast("decimal(18,2)")
    g = taps.groupBy("user_id", "event_type", "lag").agg(
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
    return g.select("user_id", "event_type", "lag", "n_pairs", acf.alias("acf"))
