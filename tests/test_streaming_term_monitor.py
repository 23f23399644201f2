"""Streaming fixed-vocabulary term monitor: batch-twin parity (the
transitive pin — driver verifies c20_term_monitor vs DuckDB, this file
verifies streaming vs batch), cross-batch accumulation, and the vocab
fingerprint contract on restart."""

from __future__ import annotations

import json
import os
import time

import pytest

DOCS = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def _write_docs(path: str, rows: list[dict]) -> None:
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_streaming_term_monitor_matches_batch_twin(spark, tmp_path):
    """Stream the sf0.001 documents corpus in TWO micro-batches; the
    latest emit per language must equal the c20_term_monitor batch row
    set exactly (same tokenization, same int64 counts, same HALF-UP
    rounding)."""
    import pyspark.sql.functions as F

    from logspout_kinesis_tests_spark.plans.round10_queries import (
        c20_term_monitor,
        _top_df_vocab,
    )
    from logspout_kinesis_tests_spark.sources.tables import load_table
    from logspout_kinesis_tests_spark.streaming.stateful import (
        streaming_term_monitor,
    )

    sf_dir = "/root/testdata/sf0.001"
    batch = {
        (r["lang"], r["term"]): (r["cnt"], r["n_tokens"], r["share"])
        for r in c20_term_monitor(spark, sf_dir).collect()
    }
    assert batch
    vocab = [
        r["term"] for r in _top_df_vocab(load_table(spark, sf_dir, "documents")).collect()
    ]

    src = str(tmp_path / "src")
    os.makedirs(src)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    for half, cond in (("b1", F.col("doc_id") % 2 == 0), ("b2", F.col("doc_id") % 2 == 1)):
        _write_docs(
            os.path.join(src, f"{half}.json"),
            [r.asDict() for r in docs.filter(cond).collect()],
        )

    stream = (
        spark.readStream.schema(DOCS).option("maxFilesPerTrigger", "1").json(src)
    )
    emitted: list[tuple[int, dict]] = []
    q = (
        streaming_term_monitor(stream, vocab)
        .writeStream.foreachBatch(
            lambda df, bid: emitted.append((bid, [r.asDict() for r in df.collect()]))
        )
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    assert len(emitted) >= 2  # genuinely cross-batch

    latest: dict = {}
    for _bid, rows in emitted:
        for r in rows:
            latest.setdefault(r["lang"], {})
        for r in rows:
            latest[r["lang"]][r["term"]] = (r["cnt"], r["n_tokens"], r["share"])
    live = {
        (lang, term): v
        for lang, terms in latest.items()
        for term, v in terms.items()
    }
    assert live == batch


def test_streaming_term_monitor_vocab_change_fails_loud(spark, tmp_path):
    """Restarting against a checkpoint written by a DIFFERENT vocabulary
    (same length, different terms) must fail on the stored fingerprint,
    not silently re-key history."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from logspout_kinesis_tests_spark.streaming.stateful import (
        streaming_term_monitor,
    )

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    mk = lambda i, text: {
        "doc_id": i, "text": text, "lang": "en", "source": "s", "n_chars": len(text),
    }
    _write_docs(os.path.join(src, "b1.json"), [mk(1, "alpha beta beta"), mk(2, "beta gamma")])
    seen: list = []

    def start(vocab):
        stream = (
            spark.readStream.schema(DOCS).option("maxFilesPerTrigger", "1").json(src)
        )
        return (
            streaming_term_monitor(stream, vocab)
            .writeStream.foreachBatch(
                lambda df, _bid: seen.extend(
                    (r["term"], r["cnt"], r["n_tokens"]) for r in df.collect()
                )
            )
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    q = start(["beta", "alpha"])
    assert q.awaitTermination(180)
    while any(a.id == q.id for a in spark.streams.active):
        time.sleep(0.1)
    assert sorted(seen) == [("alpha", 1, 5), ("beta", 3, 5)]

    _write_docs(os.path.join(src, "b2.json"), [mk(3, "gamma gamma")])
    q2 = start(["beta", "gamma"])
    with pytest.raises(StreamingQueryException, match="different vocabulary"):
        q2.awaitTermination(180)
        raise AssertionError("restart with a changed vocab must not succeed")


def test_streaming_term_monitor_recovers_across_restart(spark, tmp_path):
    """Kill-and-restart recovery (the stateful-family contract): a second
    run against the same checkpoint with the SAME vocab must resume from
    the persisted counts — the batch-2 emit reports b1+b2 cumulative
    totals, not a fresh count."""
    from logspout_kinesis_tests_spark.streaming.stateful import (
        streaming_term_monitor,
    )

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    mk = lambda i, text: {
        "doc_id": i, "text": text, "lang": "en", "source": "s", "n_chars": len(text),
    }
    _write_docs(os.path.join(src, "b1.json"), [mk(1, "alpha beta beta")])
    vocab = ["alpha", "beta"]
    emitted: list[dict] = []

    def run():
        stream = (
            spark.readStream.schema(DOCS).option("maxFilesPerTrigger", "1").json(src)
        )
        q = (
            streaming_term_monitor(stream, vocab)
            .writeStream.foreachBatch(
                lambda df, _bid: emitted.extend(r.asDict() for r in df.collect())
            )
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180)
        while any(a.id == q.id for a in spark.streams.active):
            time.sleep(0.1)

    run()
    assert {(r["term"], r["cnt"], r["n_tokens"]) for r in emitted} == {
        ("alpha", 1, 3), ("beta", 2, 3),
    }
    emitted.clear()
    _write_docs(os.path.join(src, "b2.json"), [mk(2, "beta gamma")])
    run()  # fresh query object, same checkpoint: state must carry over
    assert {(r["term"], r["cnt"], r["n_tokens"]) for r in emitted} == {
        ("alpha", 1, 5), ("beta", 3, 5),
    }
