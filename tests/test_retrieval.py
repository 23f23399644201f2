"""Semantics of the round-3 retrieval/decontamination operators:
reciprocal-rank fusion and n-gram containment."""

from __future__ import annotations

from pyspark.sql import functions as F

from logspout_kinesis_tests_spark.operators.dedup import ngram_containment
from logspout_kinesis_tests_spark.operators.similarity import rrf_fuse


def test_rrf_fuse_combines_and_orders(spark):
    lex = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], "doc_id long, rank int"
    )
    den = spark.createDataFrame(
        [(3, 1), (1, 2), (4, 3)], "doc_id long, rank int"
    )
    rows = {r["doc_id"]: r for r in rrf_fuse([lex, den]).collect()}
    # doc 1: 1/61 + 1/62; doc 3: 1/63 + 1/61; doc 2: 1/62; doc 4: 1/63
    assert rows[1]["n_systems"] == 2 and rows[3]["n_systems"] == 2
    assert rows[2]["n_systems"] == 1 and rows[4]["n_systems"] == 1
    assert abs(rows[1]["rrf"] - (round(1 / 61, 9) + round(1 / 62, 9))) < 1e-12
    # both-systems docs beat single-system docs here
    assert rows[1]["rrf"] > rows[2]["rrf"]
    assert rows[3]["rrf"] > rows[4]["rrf"]
    # missing-from-one-system contributes zero, not NULL
    assert rows[4]["rrf"] == round(1 / 63, 9)


def test_rrf_fuse_top_limits(spark):
    lex = spark.createDataFrame([(i, i) for i in range(1, 20)], "doc_id long, rank int")
    out = rrf_fuse([lex], top=5).collect()
    assert [r["doc_id"] for r in out] == [1, 2, 3, 4, 5]


def test_ngram_containment_is_asymmetric(spark):
    """A short benchmark example fully embedded in a long document:
    containment 1.0 even though Jaccard is tiny."""
    filler = " ".join(f"w{i}" for i in range(200))
    secret = "the quick brown fox jumps over the lazy dog tonight"
    corpus = spark.createDataFrame(
        [(1, filler + " " + secret + " " + filler), (2, filler)],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(100, secret)], "bench_id long, text string")
    rows = ngram_containment(corpus, bench, threshold=0.8).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["doc_id"], r["bench_id"], r["containment"]) == (1, 100, 1.0)


def test_ngram_containment_threshold_filters(spark):
    # doc shares 4 of the bench's 8 shingles -> containment 0.5 < 0.8
    bench_text = "a b c d e f g h i j"  # 8 3-gram shingles
    partial = "a b c d e f " + " ".join(f"z{i}" for i in range(20))
    corpus = spark.createDataFrame([(1, partial)], "doc_id long, text string")
    bench = spark.createDataFrame([(9, bench_text)], "bench_id long, text string")
    assert ngram_containment(corpus, bench, threshold=0.8).count() == 0
    got = ngram_containment(corpus, bench, threshold=0.4).collect()
    assert len(got) == 1 and got[0]["containment"] == 0.5


def test_ngram_containment_short_text_falls_back_to_whole_text(spark):
    # under-n-word texts shingle to [lower(text)] — exact-match containment
    corpus = spark.createDataFrame(
        [(1, "tiny doc"), (2, "other thing")], "doc_id long, text string"
    )
    bench = spark.createDataFrame([(5, "tiny doc")], "bench_id long, text string")
    rows = ngram_containment(corpus, bench, threshold=0.8).collect()
    assert [(r["doc_id"], r["containment"]) for r in rows] == [(1, 1.0)]


def test_leakage_safe_split_never_straddles_neardup_pairs(spark, sf_correct):
    """The split's whole point: every near-dup pair lands in ONE split."""
    from logspout_kinesis_tests_spark.operators.dedup import ngram_jaccard_pairs
    from logspout_kinesis_tests_spark.plans import REGISTRY
    from logspout_kinesis_tests_spark.sources.tables import load_table

    split = REGISTRY["c14_leakage_safe_split"].build(spark, sf_correct)
    docs = load_table(spark, sf_correct, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.3, block_cols=("lang",))
    a = split.select(F.col("doc_id").alias("id_a"), F.col("split").alias("split_a"))
    b = split.select(F.col("doc_id").alias("id_b"), F.col("split").alias("split_b"))
    straddling = (
        pairs.join(a, "id_a").join(b, "id_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .count()
    )
    assert straddling == 0
    # and the split is non-degenerate: all three bands populated
    bands = {r["split"] for r in split.select("split").distinct().collect()}
    assert bands == {"train", "val", "test"}


def test_cross_corpus_jaccard_catches_rewrites_only(spark):
    from logspout_kinesis_tests_spark.operators.dedup import (
        cross_corpus_jaccard_pairs,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rewrite = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    fresh = " ".join(f"n{i}" for i in range(10))
    old = spark.createDataFrame([(10, base)], "old_id long, text string")
    new = spark.createDataFrame(
        [(1, rewrite), (2, fresh)], "doc_id long, text string"
    )
    rows = cross_corpus_jaccard_pairs(new, old, threshold=0.5).collect()
    assert [(r["doc_id"], r["old_id"]) for r in rows] == [(1, 10)]
    # 8 shingles each, 7 shared -> 7/9
    assert abs(rows[0]["jaccard"] - 7 / 9) < 1e-12


def test_cross_corpus_jaccard_df_cut_drops_stop_shingles(spark):
    from logspout_kinesis_tests_spark.operators.dedup import (
        cross_corpus_jaccard_pairs,
    )

    # a boilerplate shingle shared by everything; real overlap only in pair
    boiler = "terms of service apply here"
    old = spark.createDataFrame(
        [(i, boiler + f" old{i} x{i} y{i}") for i in range(10)],
        "old_id long, text string",
    )
    new = spark.createDataFrame(
        [(100, boiler + " old3 x3 y3")], "doc_id long, text string"
    )
    # without the cut the boilerplate shingles connect new to every old doc
    allp = cross_corpus_jaccard_pairs(new, old, threshold=0.01)
    assert allp.count() == 10
    # df-cut removes shingles shared by >3 docs; the true near-dup survives
    cut = cross_corpus_jaccard_pairs(new, old, threshold=0.01, max_shingle_df=3)
    rows = cut.collect()
    assert [(r["doc_id"], r["old_id"]) for r in rows] == [(100, 3)]


def test_cross_corpus_plan_has_no_cross_product(spark, sf_dir):
    from logspout_kinesis_tests_spark.plans import REGISTRY

    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        REGISTRY["c9_cross_corpus_neardup"].build(spark, sf_dir).explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_jpeg_walker_handles_multi_segment_and_sof1(spark):
    """The segment walk must hop arbitrary APPn/COM chains and stop on any
    of SOF0/1/2; a chain longer than max_segments is invalid, not wrong."""
    from logspout_kinesis_tests_spark.operators.multimodal import (
        parse_jpeg_header,
    )

    def jpeg(segments: list[str]) -> bytes:
        return bytes.fromhex("FFD8" + "".join(segments))

    com = "FFFE0004" + "4142"          # COM, len 4 (2 data bytes)
    app1 = "FFE10006" + "45786966"     # APP1, len 6
    sof1 = "FFC1" + "0011" + "08" + "0100" + "0200" + "03" + "011100" + "021101" + "031101"
    rows = [
        (1, jpeg([com, app1, sof1])),                # SOF1 after 2 segments
        (2, jpeg([com] * 10 + [sof1])),              # beyond max_segments=8
        (3, jpeg([app1, com, com, com, com, com, com, sof1])),  # exactly 8th
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in parse_jpeg_header(df).collect()}
    assert out[1]["jpeg_valid"] and out[1]["jpeg_height"] == 256
    assert out[1]["jpeg_width"] == 512 and out[1]["n_components"] == 3
    assert not out[2]["jpeg_valid"] and out[2]["jpeg_height"] is None
    assert out[3]["jpeg_valid"] and out[3]["jpeg_height"] == 256


def test_mp4_walker_semantics(spark):
    from logspout_kinesis_tests_spark.operators.multimodal import parse_mp4_boxes

    ftyp = "0000001466747970" + "69736F6D" + "00000200" + "69736F6D"
    free = "0000000C6672656500000000"
    moov = "000000106D6F6F76" + "0000000000000000"
    mdat = "000000A86D646174"  # claims 160 payload bytes, none present
    rows = [
        (1, bytes.fromhex(ftyp + free + moov + mdat)),   # full chain
        (2, bytes.fromhex(ftyp + free + mdat)),          # no moov
        (3, bytes.fromhex("DEADBEEFDEADBEEFDEADBEEF")),  # not MP4
        (4, bytes.fromhex(ftyp)),                        # ftyp only
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in parse_mp4_boxes(df).collect()}
    assert out[1]["mp4_valid"] and out[1]["major_brand"] == "isom"
    assert out[1]["has_moov"] and out[1]["mdat_bytes"] == 160
    assert out[2]["mp4_valid"] and out[2]["has_moov"] is False
    assert out[2]["mdat_bytes"] == 160
    assert not out[3]["mp4_valid"] and out[3]["major_brand"] is None
    assert out[4]["mp4_valid"] and out[4]["has_moov"] is False
    assert out[4]["mdat_bytes"] is None


def test_ols_trend_recovers_exact_linear_data(spark):
    """Perfectly linear per-group data must yield the exact slope and
    intercept (closed-form sums are decimal-exact; no regularization)."""
    from logspout_kinesis_tests_spark.plans.retrieval_queries import c2_ols_trend

    rows = []
    for g, (slope, icept) in {"a": (2.5, 10.0), "b": (-0.75, 3.0)}.items():
        for hour in range(20):
            ts = f"2026-03-01 {hour:02d}:00:00"
            # x in the query is epoch-hours; value = slope*x + intercept
            import datetime as dt

            epoch_h = int(
                dt.datetime(2026, 3, 1, hour, tzinfo=dt.timezone.utc).timestamp()
                // 3600
            )
            rows.append((g, ts, slope * epoch_h + icept))
    df = spark.createDataFrame(
        rows, "event_type string, ts string, value double"
    ).select(
        F.monotonically_increasing_id().alias("event_id"),
        F.col("ts").cast("timestamp").alias("ts"),
        F.lit(0).cast("long").alias("user_id"),
        "event_type",
        "value",
        F.lit("{}").alias("props"),
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(f"{d}/events.parquet")
        out = {r["event_type"]: r for r in c2_ols_trend(spark, d).collect()}
    assert abs(out["a"]["slope"] - 2.5) < 1e-9
    assert abs(out["a"]["intercept"] - 10.0) < 1e-6
    assert abs(out["b"]["slope"] - -0.75) < 1e-9
    assert abs(out["b"]["intercept"] - 3.0) < 1e-6


def test_tiff_ifd_walker_edge_cases(spark):
    """Hand-built TIFF payloads: big-endian (unsupported → NULL path),
    entry count beyond max_entries bound, zero-entry IFD, truncated IFD."""
    import struct

    from logspout_kinesis_tests_spark.operators.multimodal import parse_tiff_header

    def tiff(entries, pad=0, order=b"II", magic=42, count=None):
        ifd_off = 8 + pad
        head = order + struct.pack("<H", magic) + struct.pack("<I", ifd_off)
        body = struct.pack("<H", count if count is not None else len(entries))
        for tag, val in entries:
            body += struct.pack("<HHI", tag, 3, 1) + struct.pack("<HH", val, 0)
        return head + b"\x00" * pad + body + b"\x00\x00\x00\x00"

    rows = [
        (1, tiff([(0x0100, 640), (0x0101, 480), (0x0112, 6)], pad=3)),
        (2, tiff([(0x0100, 10), (0x0101, 20)])),            # no orientation
        (3, tiff([(0x0100, 1), (0x0101, 1)], order=b"MM")),  # big-endian
        (4, tiff([])),                                       # zero entries
        (5, tiff([(0x0100, 9), (0x0101, 9)], count=40)),     # count > bound
        (6, b"II*\x00\x20\x00\x00\x00"),                     # IFD off the end
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in parse_tiff_header(df).collect()}
    assert got[1]["tiff_valid"] and got[1]["tiff_width"] == 640
    assert got[1]["tiff_height"] == 480 and got[1]["orientation"] == 6
    assert got[2]["tiff_valid"] and got[2]["orientation"] is None
    assert not got[3]["tiff_valid"]  # big-endian: NULL path, not garbage
    assert not got[4]["tiff_valid"]  # no width/height entries
    # count=40 exceeds max_entries=8 but the first 2 real entries are in
    # bounds; entries beyond the payload end are excluded, so w/h resolve
    assert got[5]["tiff_valid"] and got[5]["tiff_width"] == 9
    assert not got[6]["tiff_valid"]  # IFD offset past payload end


def test_search_only_paths_match_self_built_and_memoize(spark, sf_dir):
    """The persisted-index search path (VERDICT r3 #5) must return exactly
    the self-built path's rows (both index builds are deterministic), and
    the memo must hand back the same checkpointed objects on repeat calls —
    that reuse is what makes the bench's timed repeats search-only."""
    from logspout_kinesis_tests_spark.plans import REGISTRY
    from logspout_kinesis_tests_spark.plans.retrieval_queries import (
        _ANN_INDEX_CACHE,
        ivf_index_for,
        pq_index_for,
    )

    # healthy contract since r10: exactly the two computed summary rows
    # (each path returned 10 queries × k=5 rows), zero violation rows
    parity = {
        r["gate"]: (r["query_id"], r["vec_id"])
        for r in REGISTRY["c10_search_only_parity"].build(spark, sf_dir).collect()
    }
    assert parity == {
        "pq_rows_compared": (50, 50),
        "ivf_rows_compared": (50, 50),
    }

    pq_a = pq_index_for(spark, sf_dir)
    pq_b = pq_index_for(spark, sf_dir)
    assert pq_a[0] is pq_b[0] and pq_a[1] is pq_b[1]
    ivf_a = ivf_index_for(spark, sf_dir)
    assert ivf_a[0] is ivf_index_for(spark, sf_dir)[0]
    app = spark.sparkContext.applicationId
    assert ("pq", app, sf_dir) in _ANN_INDEX_CACHE
    assert ("ivf", app, sf_dir) in _ANN_INDEX_CACHE


def test_mmr_rerank_diversifies(spark, sf_dir):
    """MMR picks must be distinct, start from the plain top-1, and each
    later pick's marginal score can't exceed the pure-relevance bound."""
    from logspout_kinesis_tests_spark.plans import REGISTRY
    from logspout_kinesis_tests_spark.functions.vectors import cosine_similarity

    rows = sorted(
        REGISTRY["c10_mmr_rerank"].build(spark, sf_dir).collect(),
        key=lambda r: r["rank"],
    )
    assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]
    assert len({r["doc_id"] for r in rows}) == 5

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    scored = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            cosine_similarity(F.col("embedding"), F.col("q")).alias("rel"),
        )
    )
    top = scored.orderBy(F.desc("rel"), "doc_id").limit(1).collect()[0]
    # pick 1 IS the most relevant candidate, at score rel/2
    assert rows[0]["doc_id"] == top["doc_id"]
    assert abs(rows[0]["mmr_score"] - top["rel"] / 2) < 1e-8

    # independent numpy replay of the greedy walk over the same cut list
    import numpy as np

    cand = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            cosine_similarity(F.col("embedding"), F.col("q")).alias("rel"),
            "embedding",
        )
        .orderBy(F.desc("rel"), "doc_id")
        .limit(20)
        .collect()
    )
    rel = {r["doc_id"]: r["rel"] for r in cand}
    vecs = {r["doc_id"]: np.asarray(r["embedding"], dtype=np.float64) for r in cand}

    def cos(u, v):
        return float(np.dot(u, v) / (np.linalg.norm(u) * np.linalg.norm(v)))

    selected = []
    for r in rows:
        best = None
        for c in sorted(rel):
            if c in selected:
                continue
            red = max((cos(vecs[c], vecs[s]) for s in selected), default=0.0)
            score = 0.5 * rel[c] - 0.5 * red
            if best is None or score > best[1] + 1e-12:
                best = (c, score)
        assert r["doc_id"] == best[0]
        assert abs(r["mmr_score"] - best[1]) < 1e-8
        selected.append(best[0])
