"""boto3 adapter bindings driven against local protocol fakes.

These are the two production-only code paths (`streaming/sink.py`
``boto3_client_factory`` and `streaming/pull_source.py`
``boto3_pull_client``) — everything else in the repo is exercised through
injected file clients.  The fakes here speak the REAL boto3 response
shapes the bindings depend on: ``put_records`` →
``FailedRecordCount``/``Records[].ErrorCode``, ``describe_stream`` →
``StreamDescription.Shards[].SequenceNumberRange``, ``get_records`` →
``Data: bytes`` + decimal-string ``SequenceNumber`` + iterator expiry via
``client.exceptions.ExpiredIteratorException``.

No AWS, no network, no real boto3 needed: a fake ``boto3`` module is
injected into ``sys.modules`` for the duration of each test, so the
bindings' own ``import boto3`` resolves to the fake.  When a real boto3 is
installed the injection still wins (monkeypatch precedence), keeping the
tests hermetic either way.
"""

from __future__ import annotations

import sys
import types

import pytest


class _FakeExpired(Exception):
    pass


class _Exceptions:
    ExpiredIteratorException = _FakeExpired


class _FakeKinesis:
    """Protocol fake for the subset of botocore's Kinesis client the
    adapters call, with scriptable failures."""

    exceptions = _Exceptions()

    def __init__(self):
        self.put_calls: list[dict] = []
        self.fail_indices: list[int] = []
        # shard -> list of str records; sequence numbers are decimal strings
        # offset by +100 to prove the binding maps them via int(), not enumerate
        self.shards: dict[str, list[str]] = {}
        self.expire_next_n_get_records = 0
        self.iterator_calls: list[dict] = []

    # ---- sink side (PutRecords) ----
    def put_records(self, StreamName, Records):  # noqa: N803 (AWS shape)
        self.put_calls.append({"stream": StreamName, "records": Records})
        out = []
        for i, _rec in enumerate(Records):
            if i in self.fail_indices:
                out.append(
                    {
                        "ErrorCode": "ProvisionedThroughputExceededException",
                        "ErrorMessage": "Rate exceeded",
                    }
                )
            else:
                out.append({"SequenceNumber": str(100 + i), "ShardId": "shardId-0"})
        return {"FailedRecordCount": len(self.fail_indices), "Records": out}

    # ---- pull side ----
    def describe_stream(self, StreamName):  # noqa: N803
        return {
            "StreamDescription": {
                "Shards": [
                    {
                        "ShardId": s,
                        "SequenceNumberRange": (
                            {"StartingSequenceNumber": "100"}
                            if not recs
                            else {
                                "StartingSequenceNumber": "100",
                                "EndingSequenceNumber": str(100 + len(recs)),
                            }
                        ),
                    }
                    for s, recs in sorted(self.shards.items())
                ]
            }
        }

    def get_shard_iterator(self, **kw):
        self.iterator_calls.append(kw)
        seq = int(kw.get("StartingSequenceNumber", 100)) - 100
        return {"ShardIterator": f'{kw["ShardId"]}:{seq}'}

    def get_records(self, ShardIterator, Limit):  # noqa: N803
        if self.expire_next_n_get_records > 0:
            self.expire_next_n_get_records -= 1
            raise _FakeExpired("Iterator expired")
        shard, seq = ShardIterator.rsplit(":", 1)
        seq = int(seq)
        recs = self.shards[shard][seq : seq + Limit]
        return {
            "Records": [
                {
                    "Data": r.encode("utf-8"),
                    "PartitionKey": shard,
                    "SequenceNumber": str(100 + seq + i),
                }
                for i, r in enumerate(recs)
            ],
            "NextShardIterator": f"{shard}:{seq + len(recs)}",
        }


@pytest.fixture()
def fake_kinesis(monkeypatch):
    """Install a fake ``boto3`` module whose ``client('kinesis', ...)``
    returns one scriptable _FakeKinesis instance."""
    fake = _FakeKinesis()
    mod = types.ModuleType("boto3")
    mod.client = lambda service, region_name=None, **kw: fake
    monkeypatch.setitem(sys.modules, "boto3", mod)
    return fake


def test_sink_binding_maps_records_and_failed_indices(fake_kinesis):
    from logspout_kinesis_tests_spark.streaming.sink import boto3_client_factory

    client = boto3_client_factory("eu-west-1")()
    fake_kinesis.fail_indices = [1, 3]
    failed = client.put_records("logbuffer-dev", [("a", "k1"), ("b", "k2"), ("c", "k3"), ("d", "k4")])
    assert failed == [1, 3]
    sent = fake_kinesis.put_calls[-1]
    assert sent["stream"] == "logbuffer-dev"
    # Data utf-8 encoded bytes, PartitionKey passed through
    assert sent["records"][0] == {"Data": b"a", "PartitionKey": "k1"}
    # FailedRecordCount == 0 → empty failure list without ErrorCode scan
    fake_kinesis.fail_indices = []
    assert client.put_records("logbuffer-dev", [("x", "k")]) == []


def test_sink_binding_retries_nonconforming_responses(fake_kinesis):
    """A response carrying neither FailedRecordCount == 0 nor a
    per-record Records list matching the batch gives UNKNOWN delivery —
    the binding must report the whole batch failed (at-least-once retry),
    never silently succeed (ADVICE r12 + r13 review)."""
    from logspout_kinesis_tests_spark.streaming.sink import boto3_client_factory

    client = boto3_client_factory("eu-west-1")()
    batch = [("a", "k1"), ("b", "k2"), ("c", "k3")]
    # empty dict: no count, no Records
    fake_kinesis.put_records = lambda **kw: {}
    assert client.put_records("s", batch) == [0, 1, 2]
    # missing count + Records SHORTER than the batch: outcomes unknowable
    fake_kinesis.put_records = lambda **kw: {
        "Records": [{"SequenceNumber": "100", "ShardId": "shardId-0"}]
    }
    assert client.put_records("s", batch) == [0, 1, 2]
    # missing count but a full per-record list: the ErrorCode scan applies
    fake_kinesis.put_records = lambda **kw: {
        "Records": [
            {"SequenceNumber": "100"},
            {"ErrorCode": "ProvisionedThroughputExceededException"},
            {"SequenceNumber": "102"},
        ]
    }
    assert client.put_records("s", batch) == [1]
    # contradictory shape (ADVICE r13): the count asserts failures but the
    # full-length Records list carries no ErrorCode — WHICH records failed
    # is unknowable, so the whole batch must be retried, not dropped
    fake_kinesis.put_records = lambda **kw: {
        "FailedRecordCount": 2,
        "Records": [{"SequenceNumber": str(100 + i)} for i in range(3)],
    }
    assert client.put_records("s", batch) == [0, 1, 2]
    # a conforming partial-failure response is unaffected by the guard
    fake_kinesis.put_records = lambda **kw: {
        "FailedRecordCount": 1,
        "Records": [
            {"SequenceNumber": "100"},
            {"ErrorCode": "InternalFailure"},
            {"SequenceNumber": "102"},
        ],
    }
    assert client.put_records("s", batch) == [1]
    # generalized contradiction (ADVICE r14): the count asserts MORE
    # failures than the records flag — the unflagged failures are
    # unidentifiable, so the whole batch must be retried
    fake_kinesis.put_records = lambda **kw: {
        "FailedRecordCount": 3,
        "Records": [
            {"SequenceNumber": "100"},
            {"ErrorCode": "InternalFailure"},
            {"SequenceNumber": "102"},
        ],
    }
    assert client.put_records("s", batch) == [0, 1, 2]
    # count UNDER the flagged total: the per-record flags identify the
    # failures precisely, so the flag scan's verdict stands
    fake_kinesis.put_records = lambda **kw: {
        "FailedRecordCount": 1,
        "Records": [
            {"ErrorCode": "InternalFailure"},
            {"ErrorCode": "InternalFailure"},
            {"SequenceNumber": "102"},
        ],
    }
    assert client.put_records("s", batch) == [0, 1]
    # a None (or string) count must not crash the contradiction guard
    # itself (r14 review): the ErrorCode scan's verdict stands
    fake_kinesis.put_records = lambda **kw: {
        "FailedRecordCount": None,
        "Records": [{"SequenceNumber": str(100 + i)} for i in range(3)],
    }
    assert client.put_records("s", batch) == []
    fake_kinesis.put_records = lambda **kw: {
        "FailedRecordCount": "2",
        "Records": [
            {"SequenceNumber": "100"},
            {"ErrorCode": "InternalFailure"},
            {"SequenceNumber": "102"},
        ],
    }
    assert client.put_records("s", batch) == [1]


def test_pull_binding_shapes_and_sequence_mapping(fake_kinesis):
    from logspout_kinesis_tests_spark.streaming.pull_source import boto3_pull_client

    fake_kinesis.shards = {"shardId-0": ["r0", "r1", "r2"], "shardId-1": []}
    client = boto3_pull_client("eu-west-1")
    assert client.list_shards("logbuffer-dev") == ["shardId-0", "shardId-1"]
    # latest_sequences: EndingSequenceNumber when present, Starting otherwise
    assert client.latest_sequences("logbuffer-dev") == {
        "shardId-0": 103,
        "shardId-1": 100,
    }
    it = client.get_shard_iterator(
        "logbuffer-dev", "shardId-0", "AT_SEQUENCE_NUMBER", sequence_number=100
    )
    # StartingSequenceNumber must be sent as a string (Kinesis wire shape)
    assert fake_kinesis.iterator_calls[-1]["StartingSequenceNumber"] == "100"
    out = client.get_records(it, limit=2)
    # bytes → str, decimal-string sequence numbers → int
    assert [(r["Data"], r["SequenceNumber"]) for r in out["Records"]] == [
        ("r0", 100),
        ("r1", 101),
    ]
    assert out["NextShardIterator"] == "shardId-0:2"


def test_pull_binding_translates_iterator_expiry(fake_kinesis):
    from logspout_kinesis_tests_spark.streaming.pull_source import (
        ExpiredIteratorError,
        boto3_pull_client,
    )

    fake_kinesis.shards = {"shardId-0": ["r0"]}
    client = boto3_pull_client("eu-west-1")
    it = client.get_shard_iterator("logbuffer-dev", "shardId-0", "LATEST")
    fake_kinesis.expire_next_n_get_records = 1
    with pytest.raises(ExpiredIteratorError):
        client.get_records(it, limit=1)


class _ExpiringContractClient:
    """Contract-level client whose get_records expires once mid-partition —
    drives the reader's re-acquire-at-seq recovery path."""

    def __init__(self, rows):
        self.rows = rows
        self.expired_once = False

    def get_shard_iterator(self, stream, shard_id, position, sequence_number=None):
        base = int(sequence_number or 0)
        if position == "AT_SEQUENCE_NUMBER" and base != 0:
            # Kinesis semantics: AT with a fabricated (last + 1) sequence
            # number names no record on a sparse stream — the recovery
            # path must use AFTER_SEQUENCE_NUMBER at the last REAL one
            raise AssertionError(
                f"fabricated AT_SEQUENCE_NUMBER resume at {base}"
            )
        return f"it:{base + 1 if position == 'AFTER_SEQUENCE_NUMBER' else base}"

    def get_records(self, iterator, limit):
        seq = int(iterator.split(":")[1])
        if seq >= 1 and not self.expired_once:
            self.expired_once = True
            from logspout_kinesis_tests_spark.streaming.pull_source import (
                ExpiredIteratorError,
            )

            raise ExpiredIteratorError("aged out")
        batch = self.rows[seq : seq + limit]
        return {
            "Records": [
                {"Data": d, "PartitionKey": "k", "SequenceNumber": seq + i}
                for i, d in enumerate(batch)
            ],
            "NextShardIterator": f"it:{seq + len(batch)}",
        }


def test_partition_reader_recovers_from_mid_read_expiry():
    from logspout_kinesis_tests_spark.streaming.pull_source import (
        ShardPartition,
        _PullStreamReader,
        encode_client,
    )

    rows = [f"rec{i}" for i in range(5)]
    b64 = encode_client(lambda: _ExpiringContractClient(rows), None)
    reader = _PullStreamReader.__new__(_PullStreamReader)
    part = ShardPartition(
        client_b64=b64,
        stream="s",
        shard_id="shardId-0",
        start=0,
        end=5,
        fetch_limit=1,
    )
    got = [r[3] for r in reader.read(part)]
    # expiry mid-read neither duplicates nor drops records (and the fake
    # asserts the resume used AFTER_SEQUENCE_NUMBER, not a fabricated AT)
    assert got == rows


def test_partition_reader_bounds_backtoback_expiries():
    from logspout_kinesis_tests_spark.streaming.pull_source import (
        ExpiredIteratorError,
        ShardPartition,
        _PullStreamReader,
        encode_client,
    )

    class _AlwaysExpired:
        def get_shard_iterator(self, *a, **kw):
            return "it:0"

        def get_records(self, iterator, limit):
            raise ExpiredIteratorError("always")

    b64 = encode_client(lambda: _AlwaysExpired(), None)
    reader = _PullStreamReader.__new__(_PullStreamReader)
    part = ShardPartition(
        client_b64=b64, stream="s", shard_id="shardId-0", start=0, end=3, fetch_limit=1
    )
    with pytest.raises(ExpiredIteratorError):
        list(reader.read(part))
