"""Named query registry — the engine's correctness/bench surface.

Every operator claimed in SURVEY.md §2 registers here as a named query:
a PySpark builder ``(spark, sf_dir) -> DataFrame`` plus (where the semantics
are ANSI-SQL-expressible) a DuckDB oracle SQL string over the same parquet
tables.  The driver runs both sides at sf=0.01 and compares row-count +
schema + order-insensitive value hash, so:

- every computed column is aliased identically in Spark and SQL;
- float aggregates go through decimal casts in BOTH engines (order-independent
  exact arithmetic) and back to double, so the hashes match bit-for-bit;
- timestamps are emitted as fixed-width strings (µs precision) on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None → driver runs rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register a query builder under ``name``."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(name=name, build=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return wrap


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.build for name, spec in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle}
