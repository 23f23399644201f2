"""Property-based tests (Hypothesis) for quantization, entropy, and the
Bloom filter — algebraic invariants over hostile inputs that the oracle
comparison can't express (error bounds, value ranges, set-theoretic
guarantees)."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

_settings = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

vec = st.lists(
    st.floats(min_value=-10, max_value=10, allow_nan=False, allow_infinity=False),
    min_size=4,
    max_size=16,
).filter(lambda v: sum(abs(x) for x in v) > 1e-3)


@_settings
@given(a=vec)
def test_quantization_error_bound(spark, a):
    """int8 quantization keeps every reconstructed component within half a
    quantization step (max|x|/254 ≤ err ≤ max|x|/127) of the original."""
    from logspout_kinesis_tests_spark.operators.similarity import (
        with_quantized_embedding,
    )

    df = spark.createDataFrame([(a,)], "embedding array<double>")
    q = with_quantized_embedding(df).collect()[0]["qvec"]
    scale = max(abs(x) for x in a)
    assert all(-127 <= qi <= 127 for qi in q)
    for x, qi in zip(a, q):
        assert abs(qi * scale / 127.0 - x) <= scale / 127.0 + 1e-12


@_settings
@given(
    texts=st.lists(
        st.text(alphabet="abcdefgh ", min_size=0, max_size=60),
        min_size=1,
        max_size=5,
    )
)
def test_char_entropy_bounds(spark, texts):
    """0 ≤ H ≤ log2(distinct chars); single-char strings score exactly 0."""
    from logspout_kinesis_tests_spark.operators.text_analysis import char_entropy

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    for r in char_entropy(df).collect():
        t = texts[r["doc_id"]]
        h = r["entropy_bits"]
        assert h >= -1e-6, (t, h)
        distinct = len(set(t))
        if distinct:
            # 6dp per-term rounding admits a tiny overshoot of the bound
            assert h <= math.log2(distinct) + 1e-4, (t, h)
        if distinct == 1:
            assert abs(h) < 1e-9


@_settings
@given(
    keys=st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=50)
)
def test_bloom_never_false_negative(spark, keys):
    """Every inserted key probes present, for any insert set."""
    from logspout_kinesis_tests_spark.operators.timeseries import (
        bloom_build,
        bloom_probe,
    )

    df = spark.createDataFrame([(k,) for k in set(keys)], "key long")
    sketch = bloom_build(df, "key", k=4, m=1 << 12)
    probed = bloom_probe(sketch, df, "key", k=4, m=1 << 12)
    assert probed.filter(~F.col("present")).count() == 0
