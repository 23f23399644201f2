"""Semantics tests for IVF ANN, winnowing fingerprints, approx sketches."""

from __future__ import annotations

import pytest as _pytest_mark_mod

#: registry-wide sweep / heavy e2e — excluded from the fast dev loop
pytestmark = _pytest_mark_mod.mark.slow

from pyspark.sql import functions as F

from logspout_kinesis_tests_spark.operators.ann import ivf_index, ivf_topk
from logspout_kinesis_tests_spark.operators.dedup import winnowing_near_duplicates
from logspout_kinesis_tests_spark.operators.similarity import cosine_topk
from logspout_kinesis_tests_spark.sources.tables import load_table


def test_ivf_index_partitions_corpus(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    assignment, centroids = ivf_index(emb, nlist=8, iters=1)
    n = emb.count()
    assert assignment.count() == n  # every vector assigned exactly once
    cells = {r["cell"] for r in assignment.select("cell").distinct().collect()}
    assert cells <= set(range(8)) and len(cells) >= 2
    c = centroids.collect()
    assert all(len(r["centroid"]) == 64 for r in c)


def test_ivf_index_executor_side_path_matches_driver_side(spark, sf_dir):
    """Above ``driver_materialize_cells`` the per-round lineage cut switches
    from driver collect to an executor-side localCheckpoint (VERDICT r2 #6:
    nlist=65k × dim=1k centroids must never become a driver object).  Both
    paths must produce identical assignments and centroids."""
    emb = load_table(spark, sf_dir, "embeddings")
    # one_job=False keeps this test on the DISTRIBUTED driver-materialize
    # loop (its original subject); the one-job path has its own test below
    a_small, c_small = ivf_index(emb, nlist=8, iters=2, one_job=False)
    a_large, c_large = ivf_index(emb, nlist=8, iters=2, driver_materialize_cells=0)
    assert sorted(map(tuple, a_small.collect())) == sorted(map(tuple, a_large.collect()))
    cs = {r["cell"]: r["centroid"] for r in c_small.collect()}
    cl = {r["cell"]: r["centroid"] for r in c_large.collect()}
    assert cs.keys() == cl.keys()
    for cell in cs:
        assert cs[cell] == cl[cell], f"centroid drift in cell {cell}"


def test_ivf_one_job_training_equivalence(spark, sf_dir):
    """VERDICT r13 #2: a single-partition training frame takes the one-job
    driver-Python Lloyd path.  Contract vs the distributed loop: assignments
    EXACTLY equal (argmax margins on real data dwarf ulp), centroids equal
    to allclose(rtol=1e-9) — the distributed F.avg merges partial sums in
    shuffle order, so ulp-level coordinate drift is permitted (measured 0.0
    on this data).  Swept over both bench shapes (iters=1 and 2)."""
    emb = load_table(spark, sf_dir, "embeddings").coalesce(1)
    for iters in (1, 2):
        a_one, c_one = ivf_index(emb, nlist=8, iters=iters)  # auto → one-job
        a_dist, c_dist = ivf_index(emb, nlist=8, iters=iters, one_job=False)
        assert sorted(map(tuple, a_one.collect())) == sorted(
            map(tuple, a_dist.collect())
        ), f"assignment drift at iters={iters}"
        co = {r["cell"]: r["centroid"] for r in c_one.collect()}
        cd = {r["cell"]: r["centroid"] for r in c_dist.collect()}
        assert co.keys() == cd.keys()
        for cell in co:
            for x, y in zip(co[cell], cd[cell]):
                assert abs(x - y) <= 1e-9 * max(abs(x), abs(y), 1e-12), (
                    f"centroid drift beyond ulp band in cell {cell} iters={iters}"
                )


def test_pq_one_job_training_equivalence(spark, sf_dir):
    """PQ analogue of the ivf one-job contract: a single-partition training
    frame runs all per-subspace Lloyd rounds driver-side; codes EXACTLY
    equal the distributed loop's (argmin margins dwarf ulp), codebook
    centroids allclose(rtol=1e-9), cent_sq consistent.  Swept at iters=0
    (pure seeds — bit-identical by construction) and iters=1 (the bench
    shape)."""
    from logspout_kinesis_tests_spark.operators.ann import pq_index

    emb = load_table(spark, sf_dir, "embeddings").coalesce(1)
    for iters in (0, 1):
        codes_o, books_o = pq_index(emb, m=4, ksub=8, iters=iters)  # one-job
        codes_d, books_d = pq_index(emb, m=4, ksub=8, iters=iters, one_job=False)
        assert sorted(map(tuple, codes_o.collect())) == sorted(
            map(tuple, codes_d.collect())
        ), f"code drift at iters={iters}"
        bo = {(r["sub"], r["cell"]): (r["centroid"], r["cent_sq"]) for r in books_o.collect()}
        bd = {(r["sub"], r["cell"]): (r["centroid"], r["cent_sq"]) for r in books_d.collect()}
        assert bo.keys() == bd.keys()
        for key in bo:
            for x, y in zip([*bo[key][0], bo[key][1]], [*bd[key][0], bd[key][1]]):
                assert abs(x - y) <= 1e-9 * max(abs(x), abs(y), 1e-12), (
                    f"codebook drift beyond ulp band at {key} iters={iters}"
                )


def test_ivf_one_job_empty_and_degenerate(spark):
    """One-job path edge cases: an empty training frame yields empty
    (assignment, centroids) without raising; fewer rows than nlist seeds
    only the available cells; a zero vector (all sims NULL) still lands in
    a cell via the NULL-smallest struct order, matching max_by."""
    from pyspark.sql.types import ArrayType, FloatType, LongType, StructField, StructType

    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )
    empty = spark.createDataFrame([], schema).coalesce(1)
    a, c = ivf_index(empty, nlist=4, iters=2)
    assert a.count() == 0 and c.count() == 0
    tiny = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.0, 0.0])], schema
    ).coalesce(1)
    a, c = ivf_index(tiny, nlist=8, iters=2)
    got = {r["vec_id"]: r["cell"] for r in a.collect()}
    a_d, c_d = ivf_index(tiny, nlist=8, iters=2, one_job=False)
    got_d = {r["vec_id"]: r["cell"] for r in a_d.collect()}
    assert got == got_d, "degenerate-input assignment drift vs distributed"
    assert sorted(map(tuple, c.collect())) == sorted(map(tuple, c_d.collect()))


def test_one_job_null_vectors_fall_back(spark):
    """r14 review: NULL embeddings (whole-vector or single-element) have
    SQL semantics the Python loops don't reproduce — a NULL-bearing
    single-partition frame must take the distributed loop on BOTH
    trainers, not crash with TypeError, and produce the distributed
    result."""
    from pyspark.sql.types import ArrayType, FloatType, LongType, StructField, StructType

    from logspout_kinesis_tests_spark.operators.ann import pq_index

    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType(), True), True),
        ]
    )
    rows = [(i, [float(i + j) for j in range(4)]) for i in range(8)]
    rows[3] = (3, None)                      # whole-vector NULL
    rows[5] = (5, [1.0, None, 2.0, 3.0])     # element NULL
    df = spark.createDataFrame(rows, schema).coalesce(1)
    a_auto, c_auto = ivf_index(df, nlist=4, iters=1)      # auto → fallback
    a_dist, c_dist = ivf_index(df, nlist=4, iters=1, one_job=False)
    assert sorted(map(tuple, a_auto.collect())) == sorted(
        map(tuple, a_dist.collect())
    )
    assert sorted(map(tuple, c_auto.collect())) == sorted(
        map(tuple, c_dist.collect())
    )
    p_auto, b_auto = pq_index(df, m=2, ksub=4, iters=1)
    p_dist, b_dist = pq_index(df, m=2, ksub=4, iters=1, one_job=False)
    assert sorted(map(tuple, p_auto.collect())) == sorted(
        map(tuple, p_dist.collect())
    )
    assert sorted(map(tuple, b_auto.collect())) == sorted(
        map(tuple, b_dist.collect())
    )


def test_one_job_collect_is_bounded(spark, monkeypatch):
    """ADVICE r14 (medium): the one-job auto path must NOT collect a
    single-partition frame larger than the row bound — the sizes probe
    (ints only) decides first, and an over-bound frame takes the
    distributed loop without the driver ever materializing the vectors.
    Proven by shrinking the row bound below the frame size and pinning
    both Python trainers to raise if entered."""
    from pyspark.sql.types import ArrayType, FloatType, LongType, StructField, StructType

    import logspout_kinesis_tests_spark.operators.ann as ann

    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )
    rows = [(i, [float(i + j) for j in range(4)]) for i in range(8)]
    df = spark.createDataFrame(rows, schema).coalesce(1)
    monkeypatch.setattr(ann, "_ONE_JOB_MAX_ROWS", 4)

    def _boom(*a, **k):
        raise AssertionError("one-job trainer entered past the row bound")

    monkeypatch.setattr(ann, "_lloyd_one_job", _boom)
    monkeypatch.setattr(ann, "_pq_lloyd_one_job", _boom)
    a_auto, c_auto = ann.ivf_index(df, nlist=4, iters=1)  # auto → fallback
    p_auto, b_auto = ann.pq_index(df, m=2, ksub=4, iters=1)
    monkeypatch.undo()
    # explicit one_job=True opts OUT of the size budgets (the caller
    # vouches for the collect) — it must still train and match
    a_frc, _ = ann.ivf_index(df, nlist=4, iters=1, one_job=True)
    a_dist, c_dist = ann.ivf_index(df, nlist=4, iters=1, one_job=False)
    p_dist, b_dist = ann.pq_index(df, m=2, ksub=4, iters=1, one_job=False)
    assert sorted(map(tuple, a_auto.collect())) == sorted(map(tuple, a_dist.collect()))
    assert sorted(map(tuple, c_auto.collect())) == sorted(map(tuple, c_dist.collect()))
    assert sorted(map(tuple, p_auto.collect())) == sorted(map(tuple, p_dist.collect()))
    assert sorted(map(tuple, b_auto.collect())) == sorted(map(tuple, b_dist.collect()))
    assert sorted(map(tuple, a_frc.collect())) == sorted(map(tuple, a_dist.collect()))


def test_one_job_ragged_vectors_fall_back(spark):
    """ADVICE r14 (low): a ragged frame (vector lengths differ) would
    IndexError / zip-truncate inside the Python folds, silently diverging
    from Spark's NULL-padding ``zip_with`` — the sizes probe must send it
    to the distributed loop, and both trainers must match that loop's
    result exactly."""
    from pyspark.sql.types import ArrayType, FloatType, LongType, StructField, StructType

    from logspout_kinesis_tests_spark.operators.ann import ivf_index, pq_index

    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )
    rows = [(i, [float(i + j + 1) for j in range(4)]) for i in range(8)]
    rows[5] = (5, [1.0, 2.0, 3.0, 4.0, 5.0, 6.0])  # longer later vector
    df = spark.createDataFrame(rows, schema).coalesce(1)
    a_auto, c_auto = ivf_index(df, nlist=4, iters=2)      # auto → fallback
    a_dist, c_dist = ivf_index(df, nlist=4, iters=2, one_job=False)
    assert sorted(map(tuple, a_auto.collect())) == sorted(map(tuple, a_dist.collect()))
    assert sorted(map(tuple, c_auto.collect())) == sorted(map(tuple, c_dist.collect()))
    p_auto, b_auto = pq_index(df, m=2, ksub=4, iters=1)
    p_dist, b_dist = pq_index(df, m=2, ksub=4, iters=1, one_job=False)
    assert sorted(map(tuple, p_auto.collect())) == sorted(map(tuple, p_dist.collect()))
    assert sorted(map(tuple, b_auto.collect())) == sorted(map(tuple, b_dist.collect()))
    # the forced path detects raggedness post-collect and falls back too
    a_frc, _ = ivf_index(df, nlist=4, iters=2, one_job=True)
    assert sorted(map(tuple, a_frc.collect())) == sorted(map(tuple, a_dist.collect()))
    p_frc, _ = pq_index(df, m=2, ksub=4, iters=1, one_job=True)
    assert sorted(map(tuple, p_frc.collect())) == sorted(map(tuple, p_dist.collect()))


def test_one_job_nan_ordering_matches_spark(spark):
    """r14 review: an Inf coordinate propagates NaN similarities/distances
    in later rounds; Spark orders NaN ABOVE every finite double, which the
    Python loops must reproduce (a raw tuple compare rejects/freezes on
    NaN).  Both trainers must match the distributed result exactly."""
    from pyspark.sql.types import ArrayType, FloatType, LongType, StructField, StructType

    from logspout_kinesis_tests_spark.operators.ann import pq_index

    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )
    rows = [(i, [float(i + j + 1) for j in range(4)]) for i in range(8)]
    rows[2] = (2, [float("inf"), 1.0, 2.0, 3.0])
    df = spark.createDataFrame(rows, schema).coalesce(1)
    a_one, _ = ivf_index(df, nlist=4, iters=2)            # auto → one-job
    a_dist, _ = ivf_index(df, nlist=4, iters=2, one_job=False)
    assert sorted(map(tuple, a_one.collect())) == sorted(
        map(tuple, a_dist.collect())
    ), "NaN sim ordering diverged from max_by"
    p_one, _ = pq_index(df, m=2, ksub=4, iters=2)
    p_dist, _ = pq_index(df, m=2, ksub=4, iters=2, one_job=False)
    assert sorted(map(tuple, p_one.collect())) == sorted(
        map(tuple, p_dist.collect())
    ), "NaN d2 ordering diverged from min_by"


def test_ivf_recall_vs_exact(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.select("vec_id", "embedding")
    exact = {
        (r["query_id"], r["vec_id"]) for r in cosine_topk(queries, corpus, k=5).collect()
    }
    approx = {
        (r["query_id"], r["vec_id"])
        for r in ivf_topk(queries, corpus, k=5, nlist=16, nprobe=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    # calibrated r6: measured 0.89 / 0.91 / 0.95 at sf0.001/0.01/0.1 with
    # nprobe=4/nlist=16 — pinned ~0.1 below the worst measurement so a
    # centroid-geometry regression (wrong norm, broken tie-break) fails
    # while probe-miss noise doesn't (the old 0.3 floor couldn't catch a
    # 0.9 -> 0.35 quality collapse, VERDICT r5 item #4)
    assert recall >= 0.75, f"IVF recall {recall}"
    assert len(approx) == 20 * 5


def test_ivf_finds_planted_exact_duplicates(spark, sf_dir):
    """Geometry pin that needs no recall band at all: an exact duplicate of
    the query vector shares the query's nearest centroid by construction,
    so IVF must always place it in a probed cell and the exact re-rank must
    put it at rank <= 2 (itself + the copy tie at cosine 1.0).  A wrong
    norm, a broken argmax tie-break, or a cell/probe mismatch all break
    this deterministically."""
    emb = load_table(spark, sf_dir, "embeddings")
    shift = 5_000_000
    planted = emb.filter(F.col("vec_id") < 20).select(
        (F.col("vec_id") + shift).alias("vec_id"), "embedding"
    )
    corpus = emb.select("vec_id", "embedding").union(planted)
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    hits = {
        r["query_id"]
        for r in ivf_topk(queries, corpus, k=5, nlist=16, nprobe=4).collect()
        if r["vec_id"] == r["query_id"] + shift and r["rank"] <= 2
    }
    assert hits == set(range(20)), f"missing planted duplicates: {set(range(20)) - hits}"


def test_winnowing_finds_planted_prefix_dups(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    shift = 2_000_000
    # prefix perturbation: whole-document hash changes, winnowing survives
    perturbed = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + shift).alias("doc_id"),
        F.concat(F.lit("zz9 "), F.col("text")).alias("text"),
    )
    pairs = winnowing_near_duplicates(docs.union(perturbed)).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    planted = {
        (r["doc_id"], r["doc_id"] + shift)
        for r in docs.filter(F.col("doc_id") % 7 == 0).select("doc_id").collect()
    }
    recall = len(found & planted) / len(planted)
    assert recall >= 0.95, f"winnowing recall {recall}"


def test_ivf_blocked_neardup_finds_planted(spark, sf_dir):
    from logspout_kinesis_tests_spark.plans import REGISTRY

    rows = REGISTRY["c8_embedding_neardup_ivf"].build(spark, sf_dir).collect()
    planted = {
        r["vec_id"]
        for r in load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") % 10 == 0)
        .select("vec_id")
        .collect()
    }
    found = {r["id_a"] for r in rows if r["id_b"] == r["id_a"] + 1_000_000}
    # identical vectors share the nearest centroid by construction → the
    # IVF block key has perfect recall on exact duplicates
    assert found == planted
    assert all(r["cosine"] >= 0.9 for r in rows)


def test_approx_sketches_within_bounds(spark, sf_dir):
    from logspout_kinesis_tests_spark.plans import REGISTRY

    approx = {
        r["event_type"]: r
        for r in REGISTRY["c2_approx_sketches"].build(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    exact = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.expr("percentile(value, 0.5)").alias("p50"),
        )
        .collect()
    }
    for et, row in approx.items():
        assert abs(row["approx_users"] - exact[et]["users"]) <= max(
            2, 0.1 * exact[et]["users"]
        )
        p50 = row["p50"]
        assert abs(p50 - exact[et]["p50"]) <= 0.1 * max(1.0, exact[et]["p50"])


def test_pq_index_shapes_and_codes(spark, sf_dir):
    from logspout_kinesis_tests_spark.operators.ann import pq_index

    emb = load_table(spark, sf_dir, "embeddings")
    codes, codebooks = pq_index(emb, m=4, ksub=16, iters=1)
    n = emb.count()
    assert codes.count() == n * 4  # one code per (vector, subspace)
    cb = codebooks.collect()
    assert {r["sub"] for r in cb} == set(range(4))
    assert all(0 <= r["cell"] < 16 for r in cb)
    assert all(len(r["centroid"]) == 16 for r in cb)  # 64 dims / 4 subspaces
    # every code refers to an existing codebook row
    rng = codes.agg(F.min("code"), F.max("code")).head()
    assert rng[0] >= 0 and rng[1] < 16


def test_pq_recall_vs_exact(spark, sf_dir):
    from logspout_kinesis_tests_spark.operators.ann import pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.select("vec_id", "embedding")
    exact = {
        (r["query_id"], r["vec_id"]) for r in cosine_topk(queries, corpus, k=5).collect()
    }
    approx = {
        (r["query_id"], r["vec_id"])
        for r in pq_topk(queries, corpus, k=5, m=4, ksub=16, rerank=100).collect()
    }
    recall = len(exact & approx) / len(exact)
    # ADC over 4×16 codes + exact re-rank of top-100; measured r7 at the
    # registered settings: 0.90 (sf0.001, this test's data) / 0.93
    # (sf0.01).  Floor pinned measured−0.1 (VERDICT r6 #4) so a codebook-
    # geometry regression (wrong subspace split, wrong norm) that degrades
    # recall to ~0.55 FAILS instead of slipping under the old 0.5 floor.
    assert recall >= 0.8, f"PQ recall {recall}"
    assert len(approx) == 20 * 5
    # the exact re-rank guarantees every query finds itself at rank 1
    self_rows = [
        r
        for r in pq_topk(queries, corpus, k=5, m=4, ksub=16, rerank=100).collect()
        if r["query_id"] == r["vec_id"]
    ]
    assert len(self_rows) == 20
    assert all(r["rank"] == 1 for r in self_rows)


def test_pq_finds_planted_near_neighbors(spark, sf_dir):
    """PQ geometry pin (VERDICT r6 #4): plant NEAR (not exact) copies of the
    query vectors — first component scaled by 1.02, cosine ≈ 0.9998 — and
    require every one to rank in the top-k.  The ADC scan must rank a true
    near neighbor into the re-rank candidate cut for this to hold.

    Calibration notes (measured r7): an ADC ordering corruption (seeded:
    ranking candidates by approx_cos ASC) fails this test AND drops
    test_pq_recall_vs_exact to ~0.1 — the class the gate exists for.  Two
    seeds survive THIS gate benignly: a split shift applied CONSISTENTLY
    to index and search (the shared ``_pq_subvectors`` makes inconsistency
    structurally impossible), and a monotone norm distortion (ordering
    survives) — the latter is caught since r8 by
    ``test_pq_rerank_cosines_are_exact``'s bit-level cosine pin.
    Index/search m-disagreement raises via the explicit dsub guard, and
    code-assignment drift is driver-hash-pinned by ``c10_pq_md5_gate``."""
    from logspout_kinesis_tests_spark.operators.ann import pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    shift = 5_000_000
    planted = emb.filter(F.col("vec_id") < 20).select(
        (F.col("vec_id") + shift).alias("vec_id"),
        F.expr(
            "transform(embedding, (x, i) -> IF(i = 0, x * 1.02D, x))"
        ).alias("embedding"),
    )
    corpus = emb.select("vec_id", "embedding").union(planted)
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    hits = {
        r["query_id"]
        for r in pq_topk(
            queries, corpus, k=5, m=4, ksub=16, rerank=100
        ).collect()
        if r["vec_id"] == r["query_id"] + shift
    }
    assert hits == set(range(20)), (
        f"planted near neighbors missing from PQ top-k: "
        f"{set(range(20)) - hits}"
    )


def test_pq_and_ivf_prebuilt_index_paths_match_oneshot(spark, sf_dir):
    """index= reuse (the amortized production path) must produce exactly the
    one-shot result — same codes/cells, same candidates, same re-rank."""
    from logspout_kinesis_tests_spark.operators.ann import (
        ivf_index,
        ivf_topk,
        pq_index,
        pq_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.select("vec_id", "embedding")
    one_shot = sorted(map(tuple, pq_topk(queries, corpus, k=5).collect()))
    reused = sorted(
        map(tuple, pq_topk(queries, corpus, k=5, index=pq_index(corpus)).collect())
    )
    assert one_shot == reused
    ivf_one = sorted(map(tuple, ivf_topk(queries, corpus, k=5, nlist=16, nprobe=4).collect()))
    ivf_re = sorted(
        map(
            tuple,
            ivf_topk(
                queries, corpus, k=5, nlist=16, nprobe=4,
                index=ivf_index(corpus, nlist=16),
            ).collect(),
        )
    )
    assert ivf_one == ivf_re


def test_pq_topk_rejects_mismatched_prebuilt_index(spark, sf_dir):
    """A prebuilt index whose m/dsub disagree with the query-side split must
    raise, not silently rank by the id tiebreak (NULL ADC partials)."""
    import pytest as _pytest

    from logspout_kinesis_tests_spark.operators.ann import pq_index, pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.select("vec_id", "embedding")
    idx8 = pq_index(corpus, m=8)
    with _pytest.raises(ValueError, match="PQ index"):
        pq_topk(queries, corpus, k=5, m=4, index=idx8)


def test_pq_topk_rejects_query_corpus_dim_mismatch(spark, sf_dir):
    """Self-built path: queries whose dim differs from the corpus dim (both
    divisible by m) must raise a geometry error — without the check the
    short query subvectors zip_with-pad to NULL ADC partials and the result
    silently degrades to the id tiebreak.  Since r15 the self-built path
    derives its geometry from the index it just built (no eager probe
    jobs), so the mismatch surfaces through the in-plan guard at EXECUTION
    time — same loudness, zero probe jobs."""
    import pytest as _pytest

    from logspout_kinesis_tests_spark.operators.ann import pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    # 32-dim queries vs the full-width corpus: both divide m=4
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.slice("embedding", 1, 32).alias("embedding"),
    )
    corpus = emb.select("vec_id", "embedding")
    bad = pq_topk(queries, corpus, k=5, m=4)
    with _pytest.raises(Exception, match="pq_topk"):
        bad.write.format("noop").mode("overwrite").save()


def test_pq_topk_trusted_dim_matches_and_stays_loud(spark, sf_dir):
    """VERDICT r14 #2 trusted geometry: passing ``dim`` must (a) return
    EXACTLY the default path's results — the probes it skips are
    pure-validation — and (b) keep geometry mismatches loud via the
    in-plan guards instead of the skipped eager heads."""
    import pytest as _pytest

    from logspout_kinesis_tests_spark.operators.ann import (
        pq_encode,
        pq_index,
        pq_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.select("vec_id", "embedding")
    dim = len(corpus.filter(F.col("embedding").isNotNull()).head()["embedding"])
    idx = pq_index(corpus, m=4, ksub=8, one_job=False, dim=dim)
    got = pq_topk(queries, corpus, k=5, m=4, index=idx, dim=dim)
    want = pq_topk(queries, corpus, k=5, m=4, index=idx)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # trusted pq_encode path: identical codes, no probe head
    enc_t = pq_encode(corpus, idx[1], geometry=(4, dim // 4))
    enc_d = pq_encode(corpus, idx[1])
    assert sorted(map(tuple, enc_t.collect())) == sorted(map(tuple, enc_d.collect()))
    # a WRONG trusted dim must fail loudly at execution (in-plan guard),
    # never silently degrade to the id tiebreak
    bad = pq_topk(queries, corpus, k=5, m=4, index=idx, dim=dim // 2)
    with _pytest.raises(Exception, match="pq_topk"):
        bad.write.format("noop").mode("overwrite").save()
    # a NULL query vector keeps the default path's SQL semantics under the
    # trusted guard (ranked out via NULL sims, not a crash)
    nq = queries.withColumn(
        "embedding",
        F.when(F.col("query_id") == 3, F.lit(None)).otherwise(F.col("embedding")),
    )
    got_n = pq_topk(nq, corpus, k=5, m=4, index=idx, dim=dim)
    want_n = pq_topk(nq, corpus, k=5, m=4, index=idx)
    assert sorted(map(tuple, got_n.collect())) == sorted(map(tuple, want_n.collect()))


def test_pq_topk_self_built_null_seed_centroid(spark):
    """ADVICE r15: on the self-built path at iters=0, a NULL embedding
    among the ksub lowest-id seed rows yields NULL seed centroids; the
    codebook-derived dim must skip those (size(NULL) is NULL → the old
    code computed ``None * m``) and still search correctly, with the NULL
    corpus vector ranked out by SQL semantics."""
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    from logspout_kinesis_tests_spark.operators.ann import pq_topk

    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(DoubleType(), True), True),
        ]
    )
    rows = [(i, [float(i + j) for j in range(4)]) for i in range(8)]
    rows[0] = (0, None)  # lowest id → a seed row at iters=0 → NULL centroid
    corpus = spark.createDataFrame(rows, schema)
    queries = spark.createDataFrame(
        [(100, [2.0, 3.0, 4.0, 5.0])],
        "query_id long, embedding array<double>",
    )
    got = pq_topk(queries, corpus, k=3, m=2, ksub=2, iters=0).collect()
    assert len(got) == 3
    assert all(r["vec_id"] != 0 for r in got)  # NULL vector ranked out


def test_pq_finds_planted_exact_duplicates(spark, sf_dir):
    """PQ geometry pin with no recall band (the IVF twin above): an exact
    duplicate has identical subvectors, hence identical codes, hence ADC
    distance equal to the query's own — it must survive the candidate cut
    and the exact re-rank must place it at rank <= 2.  A wrong subspace
    split, codebook seed, or distance sign breaks this deterministically."""
    from logspout_kinesis_tests_spark.operators.ann import pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    shift = 5_000_000
    planted = emb.filter(F.col("vec_id") < 20).select(
        (F.col("vec_id") + shift).alias("vec_id"), "embedding"
    )
    corpus = emb.select("vec_id", "embedding").union(planted)
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    hits = {
        r["query_id"]
        for r in pq_topk(
            queries, corpus, k=5, m=4, ksub=16, rerank=100
        ).collect()
        if r["vec_id"] == r["query_id"] + shift and r["rank"] <= 2
    }
    assert hits == set(range(20)), (
        f"missing planted duplicates: {set(range(20)) - hits}"
    )


def test_pq_rerank_cosines_are_exact(spark, sf_dir):
    """Norm-distortion pin (VERDICT r7 #7): the planted-neighbor gate's one
    benign-surviving seed was a MONOTONE norm distortion — ordering (and so
    top-k membership) survives, but the emitted cosine VALUES cannot.  Pin
    the re-rank's cosines bit-level against a plain-Python replay of the
    identical left-to-right fold (dot / sqrt(Σx²)·sqrt(Σy²), float64):
    any distortion of the shared vector helpers (l2_norm, dot_product) or
    of the re-rank's denominator — sqrt dropped, denominator squared, a
    changed fold order — moves the values by far more than the 1e-12 gate.

    Calibration (r8): seeding ``l2_norm`` without the sqrt keeps all 20
    planted pairs in the top-k (test_pq_finds_planted_near_neighbors still
    passes) but shifts every cosine by ~0.87 — this test fails loudly."""
    import math

    from logspout_kinesis_tests_spark.operators.ann import pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    shift = 5_000_000
    planted = emb.filter(F.col("vec_id") < 20).select(
        (F.col("vec_id") + shift).alias("vec_id"),
        F.expr(
            "transform(embedding, (x, i) -> IF(i = 0, x * 1.02D, x))"
        ).alias("embedding"),
    )
    corpus = emb.select(
        "vec_id", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("embedding")
    ).union(planted)
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    vecs = {r["vec_id"]: r["embedding"] for r in corpus.filter(
        (F.col("vec_id") < 20) | (F.col("vec_id") >= shift)
    ).collect()}

    def py_cos(a, b):
        dot = 0.0
        for x, y in zip(a, b):
            dot += x * y
        na = 0.0
        for x in a:
            na += x * x
        nb = 0.0
        for y in b:
            nb += y * y
        return dot / (math.sqrt(na) * math.sqrt(nb))

    rows = pq_topk(queries, corpus, k=5, m=4, ksub=16, rerank=100).collect()
    checked = 0
    for r in rows:
        qid, cid = r["query_id"], r["vec_id"]
        if cid == qid or cid == qid + shift:
            want = py_cos(vecs[qid], vecs[cid])
            assert abs(r["cosine"] - want) < 1e-12, (
                f"re-rank cosine for ({qid}, {cid}) = {r['cosine']}, "
                f"exact replay = {want}"
            )
            checked += 1
    # every query sees itself and its planted near-copy in the top-k
    assert checked == 40


def test_pq_encode_rejects_wrong_dimension(spark):
    """Encode-side geometry guard: a vector whose length != m*dsub fails
    the job loudly — F.slice would otherwise yield short subvectors whose
    d2 folds to NULL and min_by would append an arbitrary code silently."""
    import pytest

    from logspout_kinesis_tests_spark.operators.ann import pq_encode, pq_index

    train = spark.createDataFrame(
        [(i, [float((i * 7 + d) % 5) for d in range(8)]) for i in range(16)],
        "vec_id long, embedding array<double>",
    )
    _, codebooks = pq_index(train, m=4, ksub=4, iters=1)
    good = spark.createDataFrame(
        [(100, [1.0] * 8)], "vec_id long, embedding array<double>"
    )
    assert pq_encode(good, codebooks).count() == 4
    short = spark.createDataFrame(
        [(101, [1.0] * 6)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(Exception, match="pq_encode"):
        pq_encode(short, codebooks).count()


def test_pq_geometry_guard_null_and_qerr_consistency(spark):
    """The encode and drift-scoring paths share ONE malformed-input
    contract: pq_quantization_error raises the same loud geometry error
    as pq_encode (it must not silently shrink the health sample), and a
    NULL embedding produces a READABLE message (length -1), not a
    raise_error(NULL) that kills the batch with no diagnostics."""
    import pytest

    from logspout_kinesis_tests_spark.operators.ann import (
        pq_encode,
        pq_index,
        pq_quantization_error,
    )

    train = spark.createDataFrame(
        [(i, [float((i * 7 + d) % 5) for d in range(8)]) for i in range(16)],
        "vec_id long, embedding array<double>",
    )
    _, codebooks = pq_index(train, m=4, ksub=4, iters=1)
    short = spark.createDataFrame(
        [(101, [1.0] * 6)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(Exception, match="pq_quantization_error"):
        pq_quantization_error(short, codebooks).count()
    null_vec = spark.createDataFrame(
        [(102, None)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(Exception, match="-1"):
        pq_encode(null_vec, codebooks).count()
