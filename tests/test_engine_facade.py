"""Engine facade (A22): registry-selected sinks, config binding."""

from __future__ import annotations

import glob
import json
import os

import pytest

from logspout_kinesis_tests_spark.config import EngineConfig
from logspout_kinesis_tests_spark.engine import Engine
from logspout_kinesis_tests_spark.streaming.sink import FileRecordingClient


@pytest.fixture()
def src_dir(tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    rows = [
        {"data": "m1", "source": "stdout", "time": "2026-08-13T10:00:00",
         "container_id": "ab" * 32, "container_name": "/w", "image": "nginx",
         "hostname": "h", "labels": {}},
    ]
    with open(os.path.join(src, "f.json"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return src


def test_kinesis_sink_via_registry(spark, tmp_path, src_dir):
    out = str(tmp_path / "puts")
    eng = Engine(EngineConfig(stream_name="s1", docker_host="dh"))
    q = eng.start(
        spark, src_dir, str(tmp_path / "ckpt"), sink="kinesis",
        client_factory=lambda: FileRecordingClient(out),
    )
    q.awaitTermination(120)
    calls = [json.load(open(p)) for p in glob.glob(out + "/put-*.json")]
    assert calls and calls[0]["stream"] == "s1"
    assert calls[0]["records"][0]["partition_key"] == "dh"


def test_console_sink_via_registry(spark, tmp_path, src_dir):
    eng = Engine(EngineConfig())
    q = eng.start(spark, src_dir, str(tmp_path / "ckpt2"), sink="console")
    q.awaitTermination(120)
    assert not q.isActive


def test_unknown_sink_raises(spark, tmp_path, src_dir):
    with pytest.raises(KeyError, match="unknown sink"):
        Engine(EngineConfig()).start(spark, src_dir, str(tmp_path / "x"), sink="nope")


def test_register_views_makes_sql_surface(spark, sf_dir):
    """After register_views, the oracle table names work in spark.sql —
    the whole relational surface is SQL-reachable."""
    from logspout_kinesis_tests_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    n = spark.sql(
        "SELECT COUNT(*) AS n FROM lineitem JOIN orders "
        "ON l_orderkey = o_orderkey"
    ).first()["n"]
    assert n > 0


def test_zorder_key_deinterleaves(spark):
    """Morton key round-trip: de-interleaving the key recovers both inputs
    for every (a, b) in a hostile grid including bit boundaries."""
    from pyspark.sql import functions as F

    from logspout_kinesis_tests_spark.sources.dataset import zorder_key

    vals = [0, 1, 2, 3, 255, 256, 1023, 1024, (1 << 21) - 1]
    df = spark.createDataFrame(
        [(a, b) for a in vals for b in vals], "a long, b long"
    ).withColumn("z", zorder_key("a", "b"))
    back = df.select(
        "a",
        "b",
        F.expr(
            "aggregate(sequence(0, 20), 0L, (acc, i) -> acc + shiftleft(shiftright(z, 2*i) & 1L, i))"
        ).alias("a2"),
        F.expr(
            "aggregate(sequence(0, 20), 0L, (acc, i) -> acc + shiftleft(shiftright(z, 2*i+1) & 1L, i))"
        ).alias("b2"),
    )
    assert back.filter("a != a2 OR b != b2").count() == 0
