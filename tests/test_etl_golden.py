"""Golden-output tests for the log-ETL transform (FIXTURES.md §B.3).

These pin the exact reference semantics of createLogstashMessage
(logspoutkinesis.go:231-271) + json.Marshal omitempty (go:32,34,35):
first-colon image split, 12-char cid, name strip, key omission, v0 vs v1
layout, RFC3339 timestamp (µs deviation documented in SURVEY.md §7).
"""

from __future__ import annotations

import datetime as dt
import json

import pytest

from logspout_kinesis_tests_spark.operators.etl import logstash_message, serialize_json
from logspout_kinesis_tests_spark.schemas import LOG_INPUT

TS = dt.datetime(2026, 8, 13, 10, 0, 0, 123456)
CID64 = "a1b2c3d4e5f60718" * 4  # 64 hex chars

BASE = {
    "data": "hello world",
    "source": "stdout",
    "time": TS,
    "container_id": CID64,
    "container_name": "/web-1",
    "image": "nginx:1.25",
    "hostname": "host-a",
    "labels": {"env": "dev"},
}


def _run(spark, row: dict, use_v0: bool = False, docker_host: str = "dh-1") -> dict:
    df = spark.createDataFrame([tuple(row[f.name] for f in LOG_INPUT.fields)], LOG_INPUT)
    out = serialize_json(logstash_message(df, docker_host=docker_host, use_v0=use_v0))
    value = out.collect()[0]["value"]
    return json.loads(value)


def test_v1_plain(spark):
    got = _run(spark, BASE)
    assert got == {
        "@timestamp": "2026-08-13T10:00:00.123456Z",
        "host": "host-a",
        "message": "hello world",
        "docker": {
            "name": "web-1",
            "cid": "a1b2c3d4e5f6",
            "image": "nginx",
            "image_tag": "1.25",
            "source": "stdout",
            "docker_host": "dh-1",
            "labels": {"env": "dev"},
        },
    }


def test_v1_key_order_matches_reference_struct_order(spark):
    df = spark.createDataFrame([tuple(BASE[f.name] for f in LOG_INPUT.fields)], LOG_INPUT)
    value = serialize_json(logstash_message(df, docker_host="dh-1")).collect()[0]["value"]
    keys = list(json.loads(value).keys())
    assert keys == ["@timestamp", "host", "message", "docker"]
    dkeys = list(json.loads(value)["docker"].keys())
    assert dkeys == ["name", "cid", "image", "image_tag", "source", "docker_host", "labels"]


def test_no_tag_omitted(spark):
    got = _run(spark, {**BASE, "image": "nginx"})
    assert got["docker"]["image"] == "nginx"
    assert "image_tag" not in got["docker"]  # omitempty, go:32


def test_registry_port_splits_at_first_colon(spark):
    # Reference's actual (surprising) semantics, go:224-227.
    got = _run(spark, {**BASE, "image": "reg.io:5000/app:v2"})
    assert got["docker"]["image"] == "reg.io"
    assert got["docker"]["image_tag"] == "5000/app:v2"


def test_empty_labels_omitted(spark):
    got = _run(spark, {**BASE, "labels": {}})
    assert "labels" not in got["docker"]  # omitempty, go:35


def test_empty_docker_host_omitted(spark):
    got = _run(spark, BASE, docker_host="")
    assert "docker_host" not in got["docker"]  # omitempty, go:34


def test_v0_layout(spark):
    got = _run(spark, BASE, use_v0=True)
    assert got == {
        "@timestamp": "2026-08-13T10:00:00.123456Z",
        "@source_host": "host-a",
        "@message": "hello world",
        "@fields": {
            "docker": {
                "name": "web-1",
                "cid": "a1b2c3d4e5f6",
                "image": "nginx",
                "image_tag": "1.25",
                "source": "stdout",
                "docker_host": "dh-1",
                "labels": {"env": "dev"},
            }
        },
    }


def test_partition_key_is_docker_host(spark):
    # A16: every record keyed by docker_host (logspoutkinesis.go:209).
    df = spark.createDataFrame([tuple(BASE[f.name] for f in LOG_INPUT.fields)], LOG_INPUT)
    out = logstash_message(df, docker_host="dh-42")
    assert out.collect()[0]["partition_key"] == "dh-42"
