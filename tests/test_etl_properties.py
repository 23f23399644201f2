"""Property-based ETL roundtrip tests (Hypothesis).

The oracle-differential JSON comparison uses benign synthetic values; these
properties push the serializer through hostile content — quotes,
backslashes, unicode, control characters, empty strings — and assert the
produced JSON is valid and decodes back to the input under the reference's
omitempty semantics (logspoutkinesis.go:28-54).
"""

from __future__ import annotations

import datetime as dt
import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from logspout_kinesis_tests_spark.operators.etl import logstash_message, serialize_json
from logspout_kinesis_tests_spark.schemas import LOG_INPUT

# printable-ish text incl. JSON-hostile characters; excludes surrogates
text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), min_codepoint=1),
    max_size=60,
)
nonempty = text.filter(lambda s: s != "")

rows = st.fixed_dictionaries(
    {
        "data": text,
        "source": st.sampled_from(["stdout", "stderr"]),
        "time": st.just(dt.datetime(2026, 8, 13, 12, 0, 0, 123456)),
        "container_id": st.just("ab" * 32),
        "container_name": nonempty.map(lambda s: "/" + s),
        "image": nonempty.filter(lambda s: not s.startswith(":")),
        "hostname": nonempty,
        "labels": st.dictionaries(nonempty, text, max_size=3),
    }
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batch=st.lists(rows, min_size=1, max_size=8))
def test_serialize_roundtrip_v1(spark, batch):
    df = spark.createDataFrame(
        [tuple(r[f.name] for f in LOG_INPUT.fields) for r in batch], LOG_INPUT
    )
    values = [
        r["value"]
        for r in serialize_json(logstash_message(df, docker_host="dh")).collect()
    ]
    assert len(values) == len(batch)
    for raw, src in zip(values, batch):
        got = json.loads(raw)  # must be valid JSON whatever the content
        assert got["message"] == src["data"]
        assert got["host"] == src["hostname"]
        docker = got["docker"]
        assert docker["name"] == src["container_name"][1:]
        assert docker["cid"] == src["container_id"][:12]
        # first-colon split semantics (go:223-229)
        image = src["image"]
        if ":" in image:
            name, tag = image.split(":", 1)
            assert docker["image"] == name
            if tag == "":
                assert "image_tag" not in docker  # omitempty
            else:
                assert docker["image_tag"] == tag
        else:
            assert docker["image"] == image
            assert "image_tag" not in docker
        # omitempty on the labels map (go:35)
        if src["labels"]:
            assert docker["labels"] == src["labels"]
        else:
            assert "labels" not in docker
