"""IVF (inverted-file) approximate nearest neighbor — the clustered scale
path for similarity search (SURVEY.md §2 C10, north-star "IVF or LSH").

Classic IVF: partition the corpus into ``nlist`` Voronoi cells around
centroids; a query probes only the ``nprobe`` nearest cells.  Here the
k-means runs as a short, fully deterministic DataFrame loop:

- seeds: the ``nlist`` lowest-id corpus vectors (no RNG);
- assign: broadcast centroids × corpus scan, ``min_by`` over cells;
- update: per-cell elementwise mean via posexplode → (cell, dim) average.

At 100 TB the corpus is scanned once per iteration (2-3 iterations suffice
for bucketing purposes — IVF needs balanced cells, not converged k-means),
and the search-time join touches only nprobe cells per query.  The
assignment table is the "index": persist it once, reuse across queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from logspout_kinesis_tests_spark.functions.vectors import cosine_similarity


def _nearest_cell(
    df: DataFrame, centroids: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """(id, cell) for each vector: nearest centroid by cosine (max_by with a
    deterministic tie-break on cell id).  Groups by the id only — grouping
    on the embedding array would hash 64 floats per row for nothing."""
    from logspout_kinesis_tests_spark.functions.vectors import dot_product, l2_norm

    # row norm folded once, not once per centroid (nlist× the folds
    # otherwise); same operation shape as cosine_similarity → identical sims
    denom = F.col("_nv") * F.col("_ncent")
    scored = (
        df.select(
            F.col(id_col), F.col(vec_col), l2_norm(F.col(vec_col)).alias("_nv")
        )
        .crossJoin(
            F.broadcast(
                centroids.select(
                    "cell", "centroid", l2_norm(F.col("centroid")).alias("_ncent")
                )
            )
        )
        .select(
            F.col(id_col),
            F.col("cell"),
            F.when(denom == 0, F.lit(None))
            .otherwise(dot_product(F.col(vec_col), F.col("centroid")) / denom)
            .alias("sim"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.max_by("cell", F.struct(F.col("sim"), -F.col("cell"))).alias("cell")
    )


def ivf_index(
    corpus: DataFrame,
    nlist: int = 16,
    iters: int = 2,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    driver_materialize_cells: int = 1_000_000,
) -> tuple[DataFrame, DataFrame]:
    """Build (assignment, centroids): the inverted file.

    Returns ``assignment`` (corpus_id, cell) and ``centroids``
    (cell, centroid: array<double>).
    """
    spark = corpus.sparkSession
    c = corpus.select(F.col(corpus_id), F.col(vec_col))
    head = c.select(F.size(F.col(vec_col)).alias("d")).head()
    dim = head["d"] if head else 0
    # Each k-means round must materialize its centroids — without cutting
    # the lineage, round N re-executes ALL previous rounds (lazy-plan
    # chaining: measured 5 min → 30 s at 500 vectors; fatal at scale).
    # Small centroid tables (nlist × dim cells) come back to the driver and
    # re-enter as a literal broadcast table; above ``driver_materialize_cells``
    # (default 1M cells ≈ 8 MB; nlist=65k × dim=1k would be a multi-GB
    # driver object) they stay on the executors via an eager
    # ``localCheckpoint`` instead — same lineage cut, no driver transfer.
    driver_side = dim * nlist <= driver_materialize_cells

    def _materialize(cents: DataFrame) -> DataFrame:
        if driver_side:
            rows = [(r["cell"], list(r["centroid"])) for r in cents.collect()]
            return spark.createDataFrame(rows, "cell int, centroid array<double>")
        return cents.localCheckpoint(eager=True)

    seeds = (
        c.orderBy(corpus_id)
        .limit(nlist)
        .select(
            (F.row_number().over(Window.orderBy(corpus_id)) - 1).alias("cell"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("centroid"),
        )
    )
    centroids = _materialize(seeds)
    for _ in range(iters):
        assigned = c.join(_nearest_cell(c, centroids, corpus_id, vec_col), corpus_id)
        # elementwise mean per cell: explode dims, average, re-assemble
        centroids = _materialize(
            assigned.select(
                "cell", F.posexplode(F.col(vec_col)).alias("pos", "val")
            )
            .groupBy("cell", "pos")
            .agg(F.avg(F.col("val").cast("double")).alias("m"))
            .groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s.getField("m"),
                ).alias("centroid")
            )
        )
    assignment = _nearest_cell(c, centroids, corpus_id, vec_col)
    return assignment, centroids


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    iters: int = 2,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: probe the ``nprobe`` nearest cells per query,
    exact cosine re-ranks the candidates."""
    assignment, centroids = ivf_index(corpus, nlist, iters, corpus_id, vec_col)
    q = queries.select(F.col(query_id), F.col(vec_col).alias("q_vec"))
    # nprobe nearest cells per query
    q_cells = (
        q.crossJoin(F.broadcast(centroids))
        .withColumn("sim", cosine_similarity(F.col("q_vec"), F.col("centroid")))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy(query_id).orderBy(F.col("sim").desc(), F.col("cell"))
            ),
        )
        .filter(F.col("rn") <= nprobe)
        .select(query_id, "q_vec", "cell")
    )
    from logspout_kinesis_tests_spark.functions.vectors import dot_product, l2_norm

    cand = corpus.select(
        F.col(corpus_id),
        F.col(vec_col).alias("c_vec"),
        l2_norm(F.col(vec_col)).alias("_nc"),
    ).join(assignment, corpus_id)
    qn = q_cells.withColumn("_nq", l2_norm(F.col("q_vec")))
    denom = F.col("_nq") * F.col("_nc")
    scored = (
        F.broadcast(qn)
        .join(cand, "cell")
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
