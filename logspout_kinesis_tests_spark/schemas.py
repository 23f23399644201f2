"""Explicit StructType schemas — the single source of truth.

The reference's schema system is Go struct tags (logspoutkinesis.go:28-54):
fixed, statically declared, two mutually exclusive output layouts selected by
a boolean.  We declare the same shapes as explicit StructTypes (never
``inferSchema``) so v0 and v1 stay byte-stable.
"""

from __future__ import annotations

from pyspark.sql.types import (
    DoubleType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: Input record — the ``router.Message`` fields the adapter actually reads
#: (logspoutkinesis.go:231-242).
LOG_INPUT = StructType(
    [
        StructField("data", StringType()),  # m.Data (go:240,258)
        StructField("source", StringType()),  # m.Source: stdout|stderr (go:249,266)
        StructField("time", TimestampType()),  # m.Time (go:236)
        StructField("container_id", StringType()),  # m.Container.ID, 64-hex (go:233)
        StructField("container_name", StringType()),  # leading "/" (go:234)
        StructField("image", StringType()),  # "name[:tag]" (go:232)
        StructField("hostname", StringType()),  # Config.Hostname (go:242,260)
        StructField("labels", MapType(StringType(), StringType())),  # (go:235)
    ]
)

#: ``DockerFields`` (logspoutkinesis.go:28-36).  image_tag / docker_host /
#: labels carry ``omitempty`` — represented as NULL-when-empty here, dropped
#: by ``to_json(..., ignoreNullFields=true)``.
DOCKER_FIELDS = StructType(
    [
        StructField("name", StringType()),
        StructField("cid", StringType()),  # 12-char container-id prefix
        StructField("image", StringType()),
        StructField("image_tag", StringType()),  # omitempty (go:32)
        StructField("source", StringType()),
        StructField("docker_host", StringType()),  # omitempty (go:34)
        StructField("labels", MapType(StringType(), StringType())),  # omitempty (go:35)
    ]
)

#: ``LogstashMessageV1`` (logspoutkinesis.go:49-54) — one level of nesting.
LOGSTASH_V1 = StructType(
    [
        StructField("@timestamp", StringType()),
        StructField("host", StringType()),
        StructField("message", StringType()),
        StructField("docker", DOCKER_FIELDS),
    ]
)

#: ``LogstashMessageV0`` (logspoutkinesis.go:42-47) — @fields wraps
#: DockerFields under a "docker" key (LogstashFields, go:38-40).
LOGSTASH_V0 = StructType(
    [
        StructField("@timestamp", StringType()),
        StructField("@source_host", StringType()),
        StructField("@message", StringType()),
        StructField(
            "@fields", StructType([StructField("docker", DOCKER_FIELDS)])
        ),
    ]
)

#: Driver ``events`` table after loading (sources/tables.py converts the raw
#: int64-ns ``ts`` into a proper µs TimestampType).
EVENTS = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

#: JSON payload carried in ``events.props``.
EVENT_PROPS = StructType([StructField("k", LongType())])
