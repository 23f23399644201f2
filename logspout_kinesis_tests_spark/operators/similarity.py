"""Similarity search over embedding columns (SURVEY.md §2 C10).

Two paths:

- ``cosine_topk``       — exact brute-force: broadcast the (small) query set
                          against the corpus scan, rank per query.  The
                          baseline and the oracle-matched variant.
- ``cosine_topk_lsh``   — random-hyperplane LSH: corpus and queries get a
                          sign-bit bucket; candidate generation is a bucket
                          equi-join, exact cosine re-ranks candidates.  The
                          100 TB path: the corpus is scanned once to build
                          buckets; per-query work is proportional to one
                          bucket, not the corpus.

Determinism: hyperplanes are pseudo-random from xxhash64 of (plane, dim) —
no RNG state, so plans are reproducible across runs/executors by
construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cosine_scored(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Every (query, corpus) pair scored by exact cosine, BEFORE ranking:
    (query_id, corpus_id, cosine[, *carry_cols]) — the scan half shared by
    :func:`cosine_topk` (which ranks it to top-k) and consumers that rank
    the SAME scored frame several ways (e.g. the streaming-ANN recall
    monitor carries each corpus row's arrival epoch through ``carry_cols``
    and ranks per epoch — the exact twin of ``ann.ivf_probe_scored``).

    The query set is broadcast (it is small by definition of the
    operation); the corpus streams past it — one scan, no corpus shuffle.
    Each side's norm is computed ONCE in its own projection instead of per
    pair (a query row's norm is otherwise re-derived |corpus| times); the
    per-pair expression keeps cosine_similarity's exact operation shape —
    dot/(nq*nc) with the same zero guard — so emitted values stay
    bit-identical to the unhoisted form (oracle-verified)."""
    from logspout_kinesis_tests_spark.functions.vectors import dot_product, l2_norm

    q = queries.select(
        F.col(query_id),
        F.col(vec_col).alias("q_vec"),
        l2_norm(F.col(vec_col)).alias("_nq"),
    )
    c = corpus.select(
        F.col(corpus_id),
        F.col(vec_col).alias("c_vec"),
        l2_norm(F.col(vec_col)).alias("_nc"),
        *[F.col(col) for col in carry_cols],
    )
    denom = F.col("_nq") * F.col("_nc")
    return F.broadcast(q).crossJoin(c).select(
        F.col(query_id),
        F.col(corpus_id),
        F.when(denom == 0, F.lit(None))
        .otherwise(dot_product(F.col("q_vec"), F.col("c_vec")) / denom)
        .alias("cosine"),
        *[F.col(col) for col in carry_cols],
    )


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = False,
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    One broadcast-query corpus scan (:func:`cosine_scored`); ranking uses
    a per-query window; ties break on corpus id for determinism.
    """
    scored = cosine_scored(queries, corpus, query_id, corpus_id, vec_col)
    if exclude_self:
        # exclude BEFORE ranking so each query still yields k neighbors
        scored = scored.filter(F.col(query_id) != F.col(corpus_id))
    w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(), F.col(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "cosine", "rank")
    )


def hyperplane_bucket(vec_col: str, n_planes: int = 8, dim: int = 64, out: str = "bucket"):
    """Random-hyperplane signature as an integer bucket id.

    Plane p's component d is a deterministic pseudo-random value in [-1, 1)
    derived from xxhash64('p:d') — reproducible everywhere, no RNG.  Bit p
    of the bucket = sign(v · h_p).
    """
    return F.expr(
        f"""
        aggregate(
          sequence(0, {n_planes - 1}),
          0L,
          (acc, p) -> acc + CASE WHEN
            aggregate(
              sequence(0, {dim - 1}),
              CAST(0.0 AS DOUBLE),
              (s, d) -> s + CAST(element_at({vec_col}, d + 1) AS DOUBLE)
                          * (CAST(pmod(xxhash64(concat(CAST(p AS STRING), ':', CAST(d AS STRING))), 2000) AS DOUBLE) / 1000.0 - 1.0)
            ) > 0 THEN shiftleft(1L, p) ELSE 0L END)
        """
    ).alias(out)


def cosine_topk_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe: int = 1,
) -> DataFrame:
    """Approximate top-k: candidates share the query's hyperplane bucket,
    exact cosine re-ranks.

    ``multiprobe`` probes every bucket within Hamming distance ≤ r of the
    query's signature (standard multiprobe LSH): a near neighbor differing on
    one marginal hyperplane sign still becomes a candidate.  Cost: the
    (broadcast) query side fans out ×Σ C(n_planes, i); the corpus side —
    the 100 TB side — is still hashed exactly once and joined once, and each
    (query, candidate) pair matches at most once because a corpus vector
    lives in exactly one bucket.
    """
    if multiprobe < 0 or multiprobe > 2:
        raise ValueError("multiprobe supports Hamming radius 0..2")
    probes = [F.col("_bucket0")]
    for i in range(n_planes):
        if multiprobe >= 1:
            probes.append(F.col("_bucket0").bitwiseXOR(F.lit(1 << i)))
        if multiprobe >= 2:
            probes.extend(
                F.col("_bucket0").bitwiseXOR(F.lit((1 << i) | (1 << j)))
                for j in range(i + 1, n_planes)
            )
    from logspout_kinesis_tests_spark.functions.vectors import dot_product, l2_norm

    qb = (
        queries.select(
            F.col(query_id),
            F.col(vec_col).alias("q_vec"),
            l2_norm(F.col(vec_col)).alias("_nq"),
            hyperplane_bucket(vec_col, n_planes, dim, out="_bucket0"),
        )
        .select(
            F.col(query_id), "q_vec", "_nq",
            F.explode(F.array(*probes)).alias("bucket"),
        )
    )
    cb = corpus.select(
        F.col(corpus_id),
        F.col(vec_col).alias("c_vec"),
        l2_norm(F.col(vec_col)).alias("_nc"),
        hyperplane_bucket(vec_col, n_planes, dim),
    )
    # norms hoisted to one fold per row (same operation shape as
    # cosine_similarity → values bit-identical; see cosine_topk)
    denom = F.col("_nq") * F.col("_nc")
    scored = (
        F.broadcast(qb)
        .join(cb, "bucket")
        .select(
            F.col(query_id),
            F.col(corpus_id),
            F.when(denom == 0, F.lit(None))
            .otherwise(dot_product(F.col("q_vec"), F.col("c_vec")) / denom)
            .alias("cosine"),
        )
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(), F.col(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "cosine", "rank")
    )


# --------------------------------------------------------------------------
# Scalar quantization — the ANN memory lever (float32 → int8 is 4× less
# shuffle/cache footprint; at 100 TB the corpus-side vectors dominate both).
# --------------------------------------------------------------------------
def with_quantized_embedding(
    df: DataFrame, vec_col: str = "embedding", out: str = "qvec"
) -> DataFrame:
    """Symmetric per-vector int8 quantization: q_i = round(127·x_i/max|x|).

    The scale factor cancels inside cosine, so ranking needs no dequantize
    step and no side table of scales.  Pure array expressions (transform +
    aggregate) — runs scan-side, codegen, deterministic: identical
    arithmetic is expressible in the DuckDB oracle, so the quantizer itself
    is hash-verified, not just recall-gated.
    """
    maxabs = (
        f"greatest(aggregate({vec_col}, CAST(0.0 AS DOUBLE), "
        f"(a, x) -> greatest(a, abs(CAST(x AS DOUBLE)))), CAST(1e-30 AS DOUBLE))"
    )
    return df.withColumn(
        out,
        F.expr(
            f"transform({vec_col}, x -> CAST(round(127.0 * CAST(x AS DOUBLE) "
            f"/ {maxabs}) AS INT))"
        ),
    )


def cosine_topk_quantized(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact-shape top-k over int8-quantized vectors — same broadcast-
    queries / one-corpus-scan plan as ``cosine_topk``, but the corpus-side
    payload carried through the scan and ranking is 64 bytes/vector instead
    of 256 (plus the text of the float array in memory).  Ranking quality
    vs full-precision is pinned by ``c10_quantization_gate``."""
    def _int_norm(col: str):
        return F.expr(
            f"sqrt(CAST(aggregate({col}, 0L, (p, x) -> p + CAST(x AS LONG) * x)"
            " AS DOUBLE))"
        )

    # integer norms folded once per row (see cosine_topk: per-pair refolds
    # of interpreted higher-order aggregates dominate); the pair expression
    # is the same dot/(na*nb) shape, so qcosine stays bit-identical
    q = with_quantized_embedding(
        queries.select(F.col(query_id), F.col(vec_col)), vec_col, "q_q"
    ).drop(vec_col).withColumn("_nq", _int_norm("q_q"))
    c = with_quantized_embedding(
        corpus.select(F.col(corpus_id), F.col(vec_col)), vec_col, "q_c"
    ).drop(vec_col).withColumn("_nc", _int_norm("q_c"))
    int_dot = F.expr(
        "CAST(aggregate(zip_with(q_q, q_c, (x, y) -> CAST(x AS LONG) * y),"
        " 0L, (p, q) -> p + q) AS DOUBLE)"
    )
    scored = F.broadcast(q).crossJoin(c).select(
        F.col(query_id),
        F.col(corpus_id),
        (int_dot / (F.col("_nq") * F.col("_nc"))).alias("qcosine"),
    )
    w = Window.partitionBy(query_id).orderBy(F.col("qcosine").desc(), F.col(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "qcosine", "rank")
    )


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 60,
    top: int | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of N ranked candidate
    lists: ``rrf = Σ_systems 1/(k + rank)``, items missing from a system
    contribute 0.  The standard hybrid-retrieval combiner — it needs only
    ranks, so BM25 scores and cosine similarities never have to be
    calibrated against each other.

    Each input must carry (id_col, rank_col) with dense 1-based ranks over
    its own TOP-N candidates (callers cut to top-N via orderBy().limit(),
    which Spark plans as TakeOrdered — never rank the full corpus through
    one unpartitioned window).  The fuse itself therefore runs on
    N_systems × top rows: outer-join-by-id via a union + groupBy (one
    small shuffle), sum the reciprocal ranks in fixed system order.

    Determinism: per-term reciprocals are rounded to 9dp and summed as
    decimal(18,9) — order-independent exact addition, so the fused score is
    bit-identical across partitionings and engines; final ties break on id.
    """
    tagged = []
    for i, r in enumerate(rankings):
        tagged.append(
            r.select(
                F.col(id_col),
                F.lit(i).alias("_sys"),
                F.round(F.lit(1.0) / (F.lit(k) + F.col(rank_col)), 9).alias("_rr"),
            )
        )
    allr = tagged[0]
    for t in tagged[1:]:
        allr = allr.unionByName(t)
    fused = (
        allr.groupBy(id_col)
        .agg(
            F.sum(F.col("_rr").cast("decimal(18,9)")).cast("double").alias("rrf"),
            F.count("*").alias("n_systems"),
        )
        .orderBy(F.col("rrf").desc(), F.col(id_col))
    )
    return fused.limit(top) if top else fused
