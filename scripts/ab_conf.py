"""Interleaved same-session A/B of runtime SQL confs over registry queries.

Usage::

    python scripts/ab_conf.py --confs k1=v1,k2=v2 --queries q1,q2 \
        [--repeats 5] [--sf-dir /root/testdata/sf0.1]

For each query: one untimed warmup per side, then ``repeats`` timed runs
ALTERNATING A (baseline confs as the session built them) and B (the
overridden confs), through the noop sink.  Alternation makes the comparison
robust to box drift (SCALE.md round-6a protocol); medians per side are
printed as JSON.  Confs must be runtime-mutable SQL confs.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--confs", required=True, help="k=v[,k=v...] for the B side")
    ap.add_argument("--queries", required=True)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from logspout_kinesis_tests_spark.plans import REGISTRY
    from logspout_kinesis_tests_spark.session import get_spark

    overrides = dict(kv.split("=", 1) for kv in args.confs.split(","))
    names = args.queries.split(",")
    spark = get_spark(app_name="ab-conf")
    baseline = {k: spark.conf.get(k, None) for k in overrides}

    def set_side(b: bool) -> None:
        for k, v in overrides.items():
            if b:
                spark.conf.set(k, v)
            elif baseline[k] is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, baseline[k])

    out: dict[str, dict] = {}
    for name in names:
        build = REGISTRY[name].build
        for side in (False, True):
            set_side(side)
            build(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        runs_a, runs_b = [], []
        for _ in range(args.repeats):
            for side, runs in ((False, runs_a), (True, runs_b)):
                set_side(side)
                t0 = time.perf_counter()
                build(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
                runs.append(round(time.perf_counter() - t0, 3))
        out[name] = {
            "A_median": round(statistics.median(runs_a), 3),
            "B_median": round(statistics.median(runs_b), 3),
            "ratio_B_over_A": round(
                statistics.median(runs_b) / statistics.median(runs_a), 3
            ),
            "A_runs": runs_a,
            "B_runs": runs_b,
        }
        print(json.dumps({name: out[name]}), flush=True)
    set_side(False)
    tot_a = sum(v["A_median"] for v in out.values())
    tot_b = sum(v["B_median"] for v in out.values())
    print(json.dumps({"TOTAL": {"A": round(tot_a, 3), "B": round(tot_b, 3),
                                "ratio": round(tot_b / tot_a, 3)}}))


if __name__ == "__main__":
    main()
