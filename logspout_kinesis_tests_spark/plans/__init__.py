"""Query plans — importing this package populates the registry."""

from logspout_kinesis_tests_spark.plans import (  # noqa: F401
    curation_queries,
    etl_queries,
    llm_queries,
    llm_sampling,
    relational,
    relational_ext,
    temporal_queries,
    timeseries_queries,
    tpch_suite,
    tpch_suite2,
)
from logspout_kinesis_tests_spark.plans.registry import (
    REGISTRY,
    all_oracles,
    all_queries,
)

__all__ = ["REGISTRY", "all_oracles", "all_queries"]
