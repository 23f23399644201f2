"""Lift any batch DataFrame operator into a Structured Streaming flow.

The engine's batch operators (dedup, text analysis, curation gates) are
plain ``DataFrame -> DataFrame`` functions; ``foreachBatch`` hands each
micro-batch to exactly that signature, so the SAME operator object runs in
both modes — no re-implementation, and batch/stream parity is testable
(``tests/test_streaming_curation.py``).

Scope note: per-batch application gives per-micro-batch semantics.  That is
correct for row-local operators (quality gates, scrubbing, scoring against a
broadcast model) and for intra-batch dedup; CROSS-batch state (global dedup,
corpus-wide models) belongs to the stateful path
(``streaming/stateful.py::streaming_first_seen``) or to a periodic batch
compaction — the standard lambda split at 100 TB stream scale.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from logspout_kinesis_tests_spark.session import ensure_runtime_confs


def apply_per_batch(
    spark: SparkSession,
    src_dir: str,
    checkpoint_dir: str,
    schema: StructType | str,
    batch_op: Callable[[DataFrame], DataFrame],
    out_dir: str,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Stream JSON files from ``src_dir`` through ``batch_op``; write each
    micro-batch's result under ``out_dir/epoch=N/`` as JSON.

    ``batch_op`` receives an ordinary batch DataFrame (so groupBy/join/
    window compositions — and ``spread_for_compute`` — work unchanged) and
    runs under the drip source's checkpointed offsets: restart resumes
    after the last committed epoch, giving at-least-once file output with
    per-epoch atomic visibility.
    """
    ensure_runtime_confs(spark)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.json(src_dir)

    def _sink(bdf: DataFrame, epoch_id: int) -> None:
        batch_op(bdf).coalesce(1).write.mode("overwrite").json(
            os.path.join(out_dir, f"epoch={epoch_id}")
        )

    return (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
