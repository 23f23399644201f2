"""Query plans — importing this package populates the registry."""

from logspout_kinesis_tests_spark.plans import etl_queries, relational  # noqa: F401
from logspout_kinesis_tests_spark.plans.registry import (
    REGISTRY,
    all_oracles,
    all_queries,
)

__all__ = ["REGISTRY", "all_oracles", "all_queries"]
