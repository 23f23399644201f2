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

# round-3 additions import LAST: rotation orders unseen queries by
# registration order, so pre-existing unverified queries keep their place
# at the front of the driver's correctness window
from logspout_kinesis_tests_spark.plans import retrieval_queries  # noqa: F401,E402
from logspout_kinesis_tests_spark.plans import analytics_queries  # noqa: F401,E402

# round-4 additions, again last for the same rotation-ordering reason
from logspout_kinesis_tests_spark.plans import profiling_queries  # noqa: F401,E402
from logspout_kinesis_tests_spark.plans import enrichment_queries  # noqa: F401,E402
from logspout_kinesis_tests_spark.plans import audit_queries  # noqa: F401,E402
from logspout_kinesis_tests_spark.plans import graph_queries  # noqa: F401,E402
from logspout_kinesis_tests_spark.plans import stats_queries  # noqa: F401,E402
from logspout_kinesis_tests_spark.plans import monitor_queries  # noqa: F401,E402
from logspout_kinesis_tests_spark.plans import rerank_queries  # noqa: F401,E402
from logspout_kinesis_tests_spark.plans import multimodal_ext_queries  # noqa: F401,E402

# round-5 additions, again last for the same rotation-ordering reason
from logspout_kinesis_tests_spark.plans import breadth_queries  # noqa: F401,E402

# round-6 additions, again last for the same rotation-ordering reason
from logspout_kinesis_tests_spark.plans import round6_queries  # noqa: F401,E402
from logspout_kinesis_tests_spark.plans import round6b_queries  # noqa: F401,E402

# round-7 additions, again last for the same rotation-ordering reason
from logspout_kinesis_tests_spark.plans import round7_queries  # noqa: F401,E402
from logspout_kinesis_tests_spark.plans import round8_queries  # noqa: F401,E402
from logspout_kinesis_tests_spark.plans import round9_queries  # noqa: F401,E402
from logspout_kinesis_tests_spark.plans import round10_queries  # noqa: F401,E402
from logspout_kinesis_tests_spark.plans import round11_queries  # noqa: F401,E402
from logspout_kinesis_tests_spark.plans import round12_queries  # noqa: F401,E402
from logspout_kinesis_tests_spark.plans import round13_queries  # noqa: F401,E402
from logspout_kinesis_tests_spark.plans import registry as _registry_mod
from logspout_kinesis_tests_spark.plans.registry import (
    REGISTRY,
    all_oracles,
    all_queries,
)
from logspout_kinesis_tests_spark.plans.rotation import rotated as _rotated

# Reorder the registry in place so never-driver-verified queries occupy the
# driver's ~50-entry correctness window (see rotation.py).  In-place so every
# consumer — all_queries(), all_oracles(), direct REGISTRY iteration — sees
# the rotated order.
_ordered = _rotated(dict(REGISTRY))
REGISTRY.clear()
REGISTRY.update(_ordered)
assert REGISTRY is _registry_mod.REGISTRY

__all__ = ["REGISTRY", "all_oracles", "all_queries"]
