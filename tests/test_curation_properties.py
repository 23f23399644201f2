"""Property-based tests for the curation operators (Hypothesis): hostile
word streams — repeated tokens, single words, long runs — through the
repetition metrics, packing, and passage chunking, asserting the algebraic
invariants the oracle comparison can't express (bounds, tiling,
reconstruction)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from logspout_kinesis_tests_spark.operators.curation import (
    repetition_stats,
    sequence_packing,
)
from logspout_kinesis_tests_spark.operators.text_analysis import passage_chunks

word = st.text(alphabet="abcdefgh", min_size=1, max_size=4)
doc = st.lists(word, min_size=1, max_size=80).map(lambda ws: " ".join(ws))
corpus = st.lists(doc, min_size=1, max_size=6).map(
    lambda docs: [(i, d) for i, d in enumerate(docs)]
)

_settings = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@_settings
@given(rows=corpus)
def test_repetition_ratios_are_bounded(spark, rows):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    for r in repetition_stats(df).collect():
        words = dict(rows)[r["doc_id"]].split(" ")
        assert r["n_words"] == len(words)
        assert 0.0 < r["distinct_word_ratio"] <= 1.0
        assert 0.0 <= r["top_bigram_frac"] <= 1.0
        assert 0.0 <= r["dup_trigram_frac"] <= 1.0
        if len(set(words)) == len(words):  # all-unique doc never repeats
            assert r["dup_trigram_frac"] == 0.0


@_settings
@given(rows=corpus)
def test_sequence_packing_tiles_each_shard(spark, rows):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    packed = sequence_packing(df, chunk_tokens=16).collect()
    assert {r["doc_id"] for r in packed} == {i for i, _ in rows}
    by_shard: dict[str, list] = {}
    for r in packed:
        by_shard.setdefault(r["shard"], []).append(r)
    for members in by_shard.values():
        members.sort(key=lambda r: r["start_tok"])
        pos = 0
        for r in members:
            assert r["start_tok"] == pos
            pos += r["n_tokens"]
            assert r["first_chunk"] == r["start_tok"] // 16
            assert r["last_chunk"] == (pos - 1) // 16


@_settings
@given(rows=corpus)
def test_passage_chunks_reconstruct_document(spark, rows):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    chunks: dict[int, dict[int, str]] = {}
    for r in passage_chunks(df, chunk_words=8, stride=5).collect():
        chunks.setdefault(r["doc_id"], {})[r["chunk_id"]] = r["chunk_text"]
    for doc_id, text in rows:
        got = chunks[doc_id]
        assert set(got) == set(range(len(got)))  # contiguous ids
        # stride-prefix of every chunk plus the full final chunk == document
        words: list[str] = []
        for c in range(len(got) - 1):
            words.extend(got[c].split(" ")[:5])
        words.extend(got[len(got) - 1].split(" "))
        assert words == text.lower().split(" ")


@_settings
@given(rows=corpus)
def test_line_dedup_identity_under_relaxed_threshold(spark, rows):
    from logspout_kinesis_tests_spark.operators.dedup import line_dedup

    df = spark.createDataFrame(rows, ["doc_id", "text"])
    # with max_df >= corpus size nothing is over-frequent: exact identity
    out = {r["doc_id"]: r for r in line_dedup(df, sep=" ", max_df=10**6).collect()}
    originals = dict(rows)
    assert set(out) == set(originals)
    for doc_id, text in originals.items():
        assert out[doc_id]["text"] == text
        assert out[doc_id]["n_dropped"] == 0


@_settings
@given(rows=corpus)
def test_substring_dedup_word_count_conservation(spark, rows):
    from logspout_kinesis_tests_spark.operators.dedup import substring_dedup

    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in substring_dedup(df, min_words=4).collect()}
    originals = dict(rows)
    assert set(out) == set(originals)
    for doc_id, text in originals.items():
        n = len(text.split(" "))
        kept = out[doc_id]["text"]
        n_kept = len(kept.split(" ")) if kept else 0
        # kept + removed always reconstructs the original word count
        assert n_kept + out[doc_id]["n_words_removed"] == n
        # removal only happens when a duplicated 4-gram exists somewhere
        if out[doc_id]["n_words_removed"] > 0:
            assert n >= 4
