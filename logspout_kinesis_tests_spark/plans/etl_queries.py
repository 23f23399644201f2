"""ETL operator queries — reference parity surface (SURVEY.md §2 A7-A14, A19).

The driver tables carry no container-log records, so these queries first
*derive* a deterministic LOG_INPUT stream from ``events`` (same arithmetic in
Spark and in the DuckDB oracle — md5 ids, modular image/name/source picks),
then run the real engine operators (operators/etl.py) on it.  That makes the
whole reference transform — first-colon image split (A8), 12-char cid (A9),
name strip (A10), RFC3339 (A11), v0/v1 nested layout (A7/A12), omitempty
JSON (A13) — differentially testable on 60k rows, not just on golden
fixtures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logspout_kinesis_tests_spark.operators.etl import logstash_message, serialize_json
from logspout_kinesis_tests_spark.plans.registry import register
from logspout_kinesis_tests_spark.schemas import EVENT_PROPS
from logspout_kinesis_tests_spark.sources.tables import load_table

DOCKER_HOST = "docker-host-a"

#: Deterministic synthetic LOG_INPUT derived from events — Spark side.
def synthetic_log_input(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    image = (
        F.when(F.col("event_id") % 4 == 0, F.lit("nginx"))
        .when(F.col("event_id") % 4 == 1, F.lit("nginx:1.25"))
        .when(F.col("event_id") % 4 == 2, F.lit("reg.io:5000/app:v2"))
        .otherwise(F.concat(F.lit("repo/app:v"), (F.col("event_id") % 7).cast("string")))
    )
    return ev.select(
        F.col("event_id"),
        F.concat(F.lit("log line "), F.col("event_id").cast("string")).alias("data"),
        F.when(F.col("event_id") % 2 == 0, F.lit("stdout")).otherwise(F.lit("stderr")).alias("source"),
        F.col("ts").alias("time"),
        F.concat(
            F.md5(F.col("event_id").cast("string")),
            F.md5(F.col("user_id").cast("string")),
        ).alias("container_id"),
        F.concat(
            F.lit("/"), F.col("event_type"), F.lit("-"), (F.col("user_id") % 10).cast("string")
        ).alias("container_name"),
        image.alias("image"),
        F.concat(F.lit("host-"), (F.col("user_id") % 5).cast("string")).alias("hostname"),
        F.when(
            F.col("event_id") % 3 == 0, F.create_map().cast("map<string,string>")
        ).otherwise(F.create_map(F.lit("env"), F.col("event_type"))).alias("labels"),
    )


#: The same derivation as a DuckDB CTE — keep in lockstep with the above.
SYNTH_SQL = """
    SELECT event_id,
           'log line ' || CAST(event_id AS VARCHAR) AS data,
           CASE WHEN event_id % 2 = 0 THEN 'stdout' ELSE 'stderr' END AS source,
           ts AS time,
           md5(CAST(event_id AS VARCHAR)) || md5(CAST(user_id AS VARCHAR)) AS container_id,
           '/' || event_type || '-' || CAST(user_id % 10 AS VARCHAR) AS container_name,
           CASE WHEN event_id % 4 = 0 THEN 'nginx'
                WHEN event_id % 4 = 1 THEN 'nginx:1.25'
                WHEN event_id % 4 = 2 THEN 'reg.io:5000/app:v2'
                ELSE 'repo/app:v' || CAST(event_id % 7 AS VARCHAR) END AS image,
           'host-' || CAST(user_id % 5 AS VARCHAR) AS hostname,
           CASE WHEN event_id % 3 = 0 THEN NULL ELSE event_type END AS label_env
    FROM events
"""

#: RFC3339 with 6 fractional digits, UTC 'Z' (A11; µs deviation per SURVEY §7).
RFC3339_SQL = "strftime(time, '%Y-%m-%dT%H:%M:%S.%f') || 'Z'"


@register(
    "a7_a12_logstash_fields",
    oracle=f"""
    WITH src AS ({SYNTH_SQL})
    SELECT event_id,
           {RFC3339_SQL} AS ts_rfc3339,
           hostname AS host,
           data AS message,
           substring(container_name, 2) AS docker_name,
           substring(container_id, 1, 12) AS cid,
           CASE WHEN strpos(image, ':') > 0
                THEN substring(image, 1, strpos(image, ':') - 1)
                ELSE image END AS image_name,
           CASE WHEN strpos(image, ':') > 0
                THEN substring(image, strpos(image, ':') + 1)
                ELSE NULL END AS image_tag,
           source,
           '{DOCKER_HOST}' AS docker_host,
           label_env
    FROM src
    """,
    doc="A7-A12: the full record restructuring, flattened for differential "
    "comparison (first-colon image split incl. registry:port case, cid "
    "prefix, name strip, RFC3339 µs).",
)
def a7_a12_logstash_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logspout_kinesis_tests_spark.functions.scalars import rfc3339
    from logspout_kinesis_tests_spark.operators.etl import docker_fields

    src = synthetic_log_input(spark, sf_dir)
    d = docker_fields(DOCKER_HOST)
    return src.select(
        "event_id",
        rfc3339(F.col("time")).alias("ts_rfc3339"),
        F.col("hostname").alias("host"),
        F.col("data").alias("message"),
        d.getField("name").alias("docker_name"),
        d.getField("cid").alias("cid"),
        d.getField("image").alias("image_name"),
        d.getField("image_tag").alias("image_tag"),
        d.getField("source").alias("source"),
        d.getField("docker_host").alias("docker_host"),
        d.getField("labels").getItem("env").alias("label_env"),
    )


def _docker_json_sql() -> str:
    """The ``DockerFields`` JSON object as DuckDB string concat — compact
    separators, struct field order, omitempty fields dropped; values contain
    no JSON-special characters by construction."""
    return (
        """'{"name":"' || substring(container_name, 2)
        || '","cid":"' || substring(container_id, 1, 12)
        || '","image":"' || CASE WHEN strpos(image, ':') > 0
                                 THEN substring(image, 1, strpos(image, ':') - 1)
                                 ELSE image END
        || '"' || CASE WHEN strpos(image, ':') > 0
                       THEN ',"image_tag":"' || substring(image, strpos(image, ':') + 1) || '"'
                       ELSE '' END
        || ',"source":"' || source
        || '","docker_host":"{dh}"'
        || CASE WHEN label_env IS NULL THEN ''
                ELSE ',"labels":{{"env":"' || label_env || '"}}' END
        || '}'"""
    ).replace("{dh}", DOCKER_HOST).replace("{{", chr(123)).replace("}}", chr(125))


def _v1_json_sql() -> str:
    """Byte-exact replica of Spark's ``to_json`` v1 output."""
    return (
        f"""'{{"@timestamp":"' || {RFC3339_SQL}
        || '","host":"' || hostname
        || '","message":"' || data
        || '","docker":' || {_docker_json_sql()}
        || '}}'"""
    )


def _v0_json_sql() -> str:
    """Byte-exact replica of the v0 layout (@fields wraps docker —
    logspoutkinesis.go:42-47)."""
    return (
        f"""'{{"@timestamp":"' || {RFC3339_SQL}
        || '","@source_host":"' || hostname
        || '","@message":"' || data
        || '","@fields":{{"docker":' || {_docker_json_sql()}
        || '}}}}'"""
    )


@register(
    "a13_serialize_json_v1",
    oracle=f"""
    WITH src AS ({SYNTH_SQL})
    SELECT event_id, {_v1_json_sql()} AS value FROM src
    """,
    doc="A13: struct→JSON with omitempty parity — byte-compared against a "
    "string-constructed oracle.",
)
def a13_serialize_json_v1(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = synthetic_log_input(spark, sf_dir)
    out = serialize_json(
        logstash_message(
            src, docker_host=DOCKER_HOST, use_v0=False, passthrough=("event_id",)
        )
    )
    return out.select("event_id", "value")


@register(
    "a12_serialize_json_v0",
    oracle=f"""
    WITH src AS ({SYNTH_SQL})
    SELECT event_id, {_v0_json_sql()} AS value FROM src
    """,
    doc="A12+A13: the v0 layout switch — @source_host/@message/@fields "
    "nesting, byte-compared like the v1 path.",
)
def a12_serialize_json_v0(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = synthetic_log_input(spark, sf_dir)
    out = serialize_json(
        logstash_message(
            src, docker_host=DOCKER_HOST, use_v0=True, passthrough=("event_id",)
        )
    )
    return out.select("event_id", "value")


@register(
    "a14_from_json",
    oracle="""
    SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k
    FROM events
    """,
    doc="A14: consumer-side JSON decode of the record payload.",
)
def a14_from_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.from_json(F.col("props"), EVENT_PROPS).getField("k").alias("k"),
    )


@register(
    "a19_quarantine",
    oracle="""
    SELECT event_id FROM events WHERE event_id % 97 = 0
    """,
    doc="A19: PERMISSIVE parse + quarantine split — corrupt records (injected "
    "deterministically) are isolated, not dropped silently.",
)
def a19_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logspout_kinesis_tests_spark.operators.etl import parse_consumed, quarantine_split

    ev = load_table(spark, sf_dir, "events").withColumn(
        "payload",
        F.when(F.col("event_id") % 97 == 0, F.lit("corrupt!!")).otherwise(F.col("props")),
    )
    parsed = parse_consumed(ev, EVENT_PROPS, value_col="payload")
    _good, bad = quarantine_split(parsed)
    return bad.select("event_id")
