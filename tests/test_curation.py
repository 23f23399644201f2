"""Semantics tests for the curation operators (repetition quality,
decontamination, domain mixture, sequence packing) on constructed corpora —
the oracle parity suite covers cross-engine exactness; these pin behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from logspout_kinesis_tests_spark.operators.curation import (
    contaminated_docs,
    domain_mixture_weights,
    repetition_stats,
    sequence_packing,
)


def test_repetition_flags_degenerate_doc(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and then the dog sat down"),
            (2, "spam spam spam spam spam spam spam spam"),
            (3, "one"),
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    # degenerate doc: one distinct word, every bigram identical, all
    # trigrams duplicates of each other
    assert rows[2]["distinct_word_ratio"] == pytest.approx(1 / 8)
    assert rows[2]["top_bigram_frac"] == 1.0
    assert rows[2]["dup_trigram_frac"] == pytest.approx(5 / 6)
    # natural doc scores low on repetition
    assert rows[1]["top_bigram_frac"] < 0.3
    assert rows[1]["dup_trigram_frac"] == 0.0
    # single-word doc: no bigrams/trigrams -> defined zeros, not null
    assert rows[3]["top_bigram_frac"] == 0.0
    assert rows[3]["dup_trigram_frac"] == 0.0


def test_decontamination_finds_planted_overlap(spark):
    eight = "q1 q2 q3 q4 q5 q6 q7 q8"
    df = spark.createDataFrame(
        [
            (1, f"clean words only here nothing shared at all {('x ' * 8).strip()}"),
            (2, f"prefix words then {eight} then suffix words"),
            (3, eight + " " + eight),  # two hits of the same gram count once? no:
            # distinct grams per doc; overlapping repeats collapse
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame([(eight,)], ["text"])
    hits = {r["doc_id"]: r["n_hits"] for r in contaminated_docs(df, bench).collect()}
    assert 1 not in hits
    assert hits[2] == 1
    # doc 3 contains the benchmark gram (dedup'd per doc) exactly once
    assert hits[3] == 1


def test_domain_mixture_downweights_dominant_source(spark):
    df = spark.createDataFrame(
        [("big", 900)] * 9 + [("small", 100)],
        ["source", "n_chars"],
    )
    rows = {r["source"]: r for r in domain_mixture_weights(df).collect()}
    assert rows["big"]["weight"] + rows["small"]["weight"] == pytest.approx(1.0)
    # proportional share would be 0.9879/0.0121; sqrt smoothing pulls the
    # tail up by ~3x
    assert rows["small"]["weight"] > 100 / 8200 * 2
    assert rows["big"]["weight"] < 0.95


def test_sequence_packing_spans_are_contiguous_per_shard(spark, sf_dir):
    from logspout_kinesis_tests_spark.sources.tables import load_table

    packed = sequence_packing(load_table(spark, sf_dir, "documents")).collect()
    by_shard: dict[str, list] = {}
    for r in packed:
        by_shard.setdefault(r["shard"], []).append(r)
    assert len(by_shard) == 16
    for rows in by_shard.values():
        rows.sort(key=lambda r: r["start_tok"])
        pos = 0
        for r in rows:
            # spans tile the shard's token stream with no gaps or overlaps
            assert r["start_tok"] == pos
            pos += r["n_tokens"]
            assert r["first_chunk"] == r["start_tok"] // 256
            assert r["last_chunk"] == (pos - 1) // 256
            assert r["first_chunk"] <= r["last_chunk"]


def test_sequence_packing_is_content_stable(spark, sf_dir):
    from logspout_kinesis_tests_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    a = {r["doc_id"]: (r["shard"], r["start_tok"]) for r in sequence_packing(docs).collect()}
    b = {
        r["doc_id"]: (r["shard"], r["start_tok"])
        for r in sequence_packing(docs.repartition(13)).collect()
    }
    assert a == b


def test_greedy_packing_invariants(spark, sf_dir):
    from logspout_kinesis_tests_spark.operators.curation import greedy_packing
    from logspout_kinesis_tests_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    rows = greedy_packing(docs, bin_tokens=64).collect()
    assert len(rows) == docs.count()
    by_bin: dict[tuple, list] = {}
    for r in rows:
        by_bin.setdefault((r["shard"], r["bin"]), []).append(r)
    for (_shard, _bin), members in by_bin.items():
        fill = sum(r["n_tokens"] for r in members)
        assert all(r["bin_fill"] == fill for r in members)
        # a bin only exceeds the budget when it is a single oversize doc
        if fill > 64:
            assert len(members) == 1 and members[0]["oversize"]
    # bins are contiguous 0..max within each shard
    for shard in {r["shard"] for r in rows}:
        bins = sorted({r["bin"] for r in rows if r["shard"] == shard})
        assert bins == list(range(len(bins)))
    # content-stable: identical layout under a different input partitioning
    again = {
        r["doc_id"]: (r["shard"], r["bin"])
        for r in greedy_packing(docs.repartition(7), bin_tokens=64).collect()
    }
    assert again == {r["doc_id"]: (r["shard"], r["bin"]) for r in rows}


def test_passage_chunks_overlap_and_tail(spark):
    from logspout_kinesis_tests_spark.operators.text_analysis import passage_chunks

    words = [f"w{i}" for i in range(50)]
    df = spark.createDataFrame([(1, " ".join(words)), (2, "short doc only")], ["doc_id", "text"])
    rows = {(r["doc_id"], r["chunk_id"]): r for r in passage_chunks(df).collect()}
    # 50 words, window 32 stride 24 -> chunks at 0 and 24
    assert {c for (d, c) in rows if d == 1} == {0, 1}
    assert rows[(1, 0)]["chunk_text"].split(" ") == words[:32]
    assert rows[(1, 1)]["chunk_text"].split(" ") == words[24:50]
    assert rows[(1, 1)]["n_words"] == 26  # short tail
    # overlap: last 8 words of chunk 0 == first 8 of chunk 1
    assert rows[(1, 0)]["chunk_text"].split(" ")[-8:] == rows[(1, 1)]["chunk_text"].split(" ")[:8]
    # sub-window doc -> single short chunk
    assert rows[(2, 0)]["n_words"] == 3 and (2, 1) not in rows


def test_weighted_sample_bias_and_determinism(spark, sf_correct):
    """A-ES sampling: p ∝ n_chars, so the sample's mean length must exceed
    the corpus mean; two runs are identical (RNG-free)."""
    from pyspark.sql import functions as F

    from logspout_kinesis_tests_spark.operators.curation import weighted_sample
    from logspout_kinesis_tests_spark.sources.tables import load_table

    docs = load_table(spark, sf_correct, "documents").select("doc_id", "n_chars")
    s1 = weighted_sample(docs, n=100, weight_col="n_chars")
    corpus_mean = docs.agg(F.avg("n_chars")).first()[0]
    sample_mean = s1.agg(F.avg("n_chars")).first()[0]
    assert sample_mean > corpus_mean * 1.1, (sample_mean, corpus_mean)
    ids1 = [r["doc_id"] for r in s1.orderBy("doc_id").collect()]
    ids2 = [
        r["doc_id"]
        for r in weighted_sample(docs, n=100, weight_col="n_chars")
        .orderBy("doc_id")
        .collect()
    ]
    assert ids1 == ids2


def test_weighted_sample_rejects_nonpositive_weights(spark):
    """A-ES precondition w>0 is enforced loudly at execution time
    (ADVICE r2): zero, negative, and NULL weights all raise instead of
    silently sorting first/last."""
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from logspout_kinesis_tests_spark.operators.curation import weighted_sample

    for bad in (0.0, -2.5, None):
        df = spark.createDataFrame(
            [(1, 3.0), (2, bad), (3, 1.0)], "doc_id long, w double"
        )
        with pytest.raises(SparkRuntimeException, match="strictly positive"):
            weighted_sample(df, n=2, weight_col="w").collect()
    # valid weights still sample fine
    ok = spark.createDataFrame([(1, 3.0), (2, 1.0)], "doc_id long, w double")
    assert weighted_sample(ok, n=1, weight_col="w").count() == 1
