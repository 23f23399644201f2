from logspout_kinesis_tests_spark.operators.etl import (
    docker_fields,
    logstash_message,
    parse_consumed,
    quarantine_split,
    serialize_json,
)

__all__ = [
    "docker_fields",
    "logstash_message",
    "parse_consumed",
    "quarantine_split",
    "serialize_json",
]
