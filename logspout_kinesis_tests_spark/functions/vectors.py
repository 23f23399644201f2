"""Vector math over ``array<float>`` embedding columns — all JVM-side.

Built from ``F.zip_with`` + ``F.aggregate`` (higher-order functions), which
run inside codegen — no Python UDF, no serialization of 100 TB of vectors
through Arrow.  Elements are cast to double before folding; the fold is a
deterministic left-to-right sequence, which keeps results reproducible and
comparable against the DuckDB oracle's list functions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot_product(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ as a sequential left fold (deterministic order)."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(vec: Column) -> Column:
    """‖v‖₂ via the same deterministic fold."""
    return F.sqrt(
        F.aggregate(_as_double(vec), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """cos(a, b) = a·b / (‖a‖‖b‖); NULL-safe for zero vectors."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom == 0, F.lit(None)).otherwise(dot_product(a, b) / denom)
