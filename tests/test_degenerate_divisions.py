"""Repo-wide NaN sweep over a degenerate corpus (VERDICT r5 item #5).

The proven driver-divergence class is Spark emitting NaN where DuckDB
yields NULL (0/0, sqrt of a rounding-negative zero-variance term).  Point
fixes exist where the class actually fired (c2_corr_matrix,
enrichment_queries zero-variance guard, the r6 ACF ``den <= 0`` guards),
but any new ratio query can reintroduce it.  This test makes the class
structurally un-reintroducible: EVERY registered query runs against a
corpus whose every float/double/embedding column is CONSTANT — so every
variance, covariance, spread, and span that can be zero IS zero — and no
output cell may be NaN (NULL is the correct degenerate answer), infinite,
or an error.

The corpus keeps ids, keys, strings and timestamps intact (joins, windows
and text operators still exercise their real paths); only the numeric
value space is collapsed.
"""

from __future__ import annotations

import pytest as _pytest_mark_mod

#: registry-wide sweep / heavy e2e — excluded from the fast dev loop
pytestmark = _pytest_mark_mod.mark.slow

import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from logspout_kinesis_tests_spark.plans import REGISTRY
from logspout_kinesis_tests_spark.sources.tables import TABLES, load_table
from tests.conftest import SF_SMOKE

#: The constant every float-typed cell collapses to.
_CONST = 5.0


@pytest.fixture(scope="module")
def degen_dir(spark, tmp_path_factory) -> str:
    root = tmp_path_factory.mktemp("degenerate_corpus")
    for name in TABLES:
        df = load_table(spark, SF_SMOKE, name)
        cols = []
        for f in df.schema.fields:
            if isinstance(f.dataType, (T.DoubleType, T.FloatType)):
                cols.append(
                    F.lit(_CONST).cast(f.dataType).alias(f.name)
                )
            elif isinstance(f.dataType, T.ArrayType) and isinstance(
                f.dataType.elementType, (T.DoubleType, T.FloatType)
            ):
                # constant vectors: every pairwise cosine ties at 1.0,
                # every per-dimension variance is zero
                cols.append(
                    F.transform(
                        F.col(f.name),
                        lambda _: F.lit(0.25).cast(f.dataType.elementType),
                    ).alias(f.name)
                )
            else:
                cols.append(F.col(f.name))
        df.select(*cols).write.mode("overwrite").parquet(
            str(root / f"{name}.parquet")
        )
    return str(root)


def _bad_floats(value, path=""):
    """Yield column paths holding NaN/inf, recursing into arrays/structs."""
    if isinstance(value, float) and (math.isnan(value) or math.isinf(value)):
        yield path
    elif isinstance(value, (list, tuple)):
        for i, v in enumerate(value):
            yield from _bad_floats(v, f"{path}[{i}]")
    elif isinstance(value, dict):
        for k, v in value.items():
            yield from _bad_floats(v, f"{path}.{k}")


def test_no_query_emits_nan_on_constant_corpus(spark, degen_dir):
    offenders: dict[str, str] = {}
    for name, spec in REGISTRY.items():
        try:
            rows = spec.build(spark, degen_dir).collect()
        except Exception as exc:  # noqa: BLE001 — report, don't abort sweep
            offenders[name] = f"raised {type(exc).__name__}: {exc}"[:200]
            continue
        for row in rows:
            bad = sorted(
                {
                    f"{col}{p}"
                    for col, v in row.asDict().items()
                    for p in _bad_floats(v)
                }
            )
            if bad:
                offenders[name] = f"NaN/inf in {bad}"
                break
    assert not offenders, (
        "queries diverging on the constant corpus (NaN where the oracle "
        f"yields NULL, or a degenerate-input crash): {offenders}"
    )
