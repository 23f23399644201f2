"""Dump ``explain("formatted")`` for named registry queries to text files.

Usage::

    python scripts/explain_plans.py <outdir> <query> [<query> ...] [--suffix before]

Writes ``<outdir>/<query>_<suffix>.txt`` with the formatted physical plan of
each named query built against ``$SPARK_GRAFT_SF_DIR`` (default sf0.1).
Used for the optimization-round plan evidence (plans/r15/...): the judge
cannot run Spark and checks plan claims against these files.

Note: some builders execute eager sub-jobs during *build* (localCheckpoint,
geometry probes, index writes) — the dump therefore really builds each query
and captures the plan of the frame the bench would materialize.
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    suffix = "before"
    for a in sys.argv[1:]:
        if a.startswith("--suffix="):
            suffix = a.split("=", 1)[1]
    outdir, names = args[0], args[1:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from logspout_kinesis_tests_spark.plans import REGISTRY
    from logspout_kinesis_tests_spark.session import get_spark

    spark = get_spark(app_name="explain-plans")
    for name in names:
        df = REGISTRY[name].build(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
