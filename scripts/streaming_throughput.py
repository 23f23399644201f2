"""Measure the producer-pipeline streaming throughput (VERDICT r7 #6).

The BASELINE.md comparison row — engine end-to-end records/s vs the
reference's derived consumer ceiling of 2 500 records/s/shard
(readstream.py:32,37-38) — predated the bench calibration protocol; this
script re-measures it under the round-7 recipe so the figure carries its
own host-state index:

- corpus: 20 JSON files x 10 000 LOG_INPUT records (one file per
  micro-batch via ``maxFilesPerTrigger=1`` — each file stands in for one
  shard fetch, so per-batch overhead is IN the end-to-end number);
- pipeline: the full producer path ``file_drip_source -> logstash_message
  -> serialize_json -> keyed batched sink`` (A1, A7-A13, A15-A17) with a
  null counting client (no disk I/O in the sink, mirroring the original
  measurement's in-memory fake);
- protocol: one untimed warmup drain of a 2-file corpus (codegen +
  Python-worker spin-up), then ``REPEATS`` timed full drains, median
  reported; bench.py's frozen calibration runs first in the same session
  so the output carries ``host_factor`` and a calibrated rate;
- output: ONE JSON line — record it as a dated row in BASELINE.md.

Run: ``python scripts/streaming_throughput.py`` (quiet box; honors
``$SPARK_GRAFT_SF_DIR`` for the seed rows and ``$SPARK_GRAFT_CPUS``).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

FILES = 20
ROWS_PER_FILE = 10_000
REPEATS = 5


class NullClient:
    """Counting sink double: accepts every record, no I/O."""

    def put_records(self, stream_name, records):
        return []


def _write_corpus(spark, sf_dir: str, root: str, files: int) -> int:
    """Replicate seed rows into ``files`` JSON files of ROWS_PER_FILE."""
    from logspout_kinesis_tests_spark.plans.etl_queries import synthetic_log_input

    seed = [
        r.asDict()
        for r in synthetic_log_input(spark, sf_dir).drop("event_id").limit(1000).collect()
    ]
    os.makedirs(root)
    n = 0
    for i in range(files):
        with open(os.path.join(root, f"shard-{i:03d}.json"), "w") as f:
            for j in range(ROWS_PER_FILE):
                d = dict(seed[j % len(seed)])
                d["time"] = d["time"].isoformat()
                d["data"] = f"log line {i}:{j}"
                f.write(json.dumps(d) + "\n")
                n += 1
    return n


def _drain_seconds(spark, src: str, ckpt: str) -> float:
    from logspout_kinesis_tests_spark.config import EngineConfig
    from logspout_kinesis_tests_spark.streaming.pipeline import produce_pipeline

    cfg = EngineConfig(stream_name="logbuffer-bench", docker_host="dh-bench")
    t0 = time.perf_counter()
    q = produce_pipeline(
        spark,
        src,
        ckpt,
        cfg,
        client_factory=NullClient,
        max_files_per_trigger=1,
    )
    assert q.awaitTermination(600), "drain did not terminate"
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from bench import _run_calibration

    from logspout_kinesis_tests_spark.session import get_spark

    spark = get_spark(app_name="streaming_throughput")
    calibration = _run_calibration(spark, sf_dir)

    work = "/tmp/streaming_throughput_work"
    shutil.rmtree(work, ignore_errors=True)
    warm_src = os.path.join(work, "warm_src")
    _write_corpus(spark, sf_dir, warm_src, files=2)
    _drain_seconds(spark, warm_src, os.path.join(work, "warm_ckpt"))

    src = os.path.join(work, "src")
    n_records = _write_corpus(spark, sf_dir, src, files=FILES)
    runs = []
    for i in range(REPEATS):
        runs.append(_drain_seconds(spark, src, os.path.join(work, f"ckpt{i}")))
    med = statistics.median(runs)
    rate = n_records / med
    print(
        json.dumps(
            {
                "metric": "producer pipeline end-to-end throughput",
                "unit": "records/sec",
                "value": round(rate),
                "value_calibrated": round(rate * calibration["host_factor"]),
                "host_factor": calibration["host_factor"],
                "records": n_records,
                "batches": FILES,
                "median_drain_sec": round(med, 3),
                "runs_sec": [round(r, 3) for r in runs],
                "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
            }
        )
    )
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
