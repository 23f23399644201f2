"""Engine facade — named source/sink registries and pipeline binding (A22).

The reference registers its adapter under the name ``"kinesis"`` at module
load (``router.AdapterFactories.Register``, logspoutkinesis.go:56-59) and
binds it to a route address.  The Spark-first equivalent is a plain registry
dict mapping names to pipeline builders — DataSource-V2 registration would
be overkill for sinks that are one ``foreachBatch`` function.

    engine = Engine(EngineConfig.from_route("my-stream", {...}))
    query = engine.start(spark, source="files", sink="console",
                         source_dir=..., checkpoint_dir=...)
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from logspout_kinesis_tests_spark.config import EngineConfig
from logspout_kinesis_tests_spark.streaming.pipeline import (
    console_pipeline,
    file_drip_source,
    produce_pipeline,
    transform,
)
from logspout_kinesis_tests_spark.streaming.sink import boto3_client_factory

#: Stream source builders: name → (spark, **options) → streaming DataFrame.
SOURCES: dict[str, Callable[..., DataFrame]] = {
    "files": file_drip_source,
    # a real deployment registers "kinesis"/"kafka" connector sources here;
    # correctness never depends on them (SURVEY.md §4)
}


class Engine:
    """Bound pipeline facade: config + named source/sink selection."""

    def __init__(self, config: EngineConfig | None = None):
        self.config = config or EngineConfig()

    def transform(self, stream: DataFrame) -> DataFrame:
        """The A7-A13 producer transform under this engine's config."""
        return transform(stream, self.config)

    def start(
        self,
        spark: SparkSession,
        source_dir: str,
        checkpoint_dir: str,
        sink: str = "console",
        client_factory: Callable[[], object] | None = None,
        trigger: dict | None = None,
    ) -> StreamingQuery:
        """Start the producer pipeline with a registry-selected sink.

        Sinks: ``"console"`` (A25), ``"kinesis"`` (A15-A17; requires a
        client factory or boto3+AWS env), or any injected factory.
        """
        if sink == "console":
            return console_pipeline(
                spark, source_dir, checkpoint_dir, self.config, trigger=trigger
            )
        if sink == "kinesis":
            factory = client_factory or boto3_client_factory(
                region="eu-west-1"  # the reference's hardcoded region, readstream.py:13
            )
            return produce_pipeline(
                spark,
                source_dir,
                checkpoint_dir,
                self.config,
                client_factory=factory,
                trigger=trigger,
            )
        raise KeyError(f"unknown sink {sink!r}; registered: console, kinesis")
