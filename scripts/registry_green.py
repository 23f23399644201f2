"""Full-registry oracle sweep → committed REGISTRY_GREEN.json (VERDICT r15 #9).

The driver's per-round correctness sweep samples ~50 queries, so its
round-over-round "queries_dropped" list compares two different samples and
reads as mass drops when nothing changed.  This artifact records the FULL
registry verdict map in one committed file so any future "dropped" list can
be cross-checked in one step.

Methodology (same as .claude/skills/verify): fresh plain local[8] session,
sf0.01, tests/oracle.compare (exact value equality after column-name sort).
Queries with no registered oracle are recorded ``rows_only`` with their row
count (>0 smoke).

Usage: python scripts/registry_green.py  (writes REGISTRY_GREEN.json)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("registry-green")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e
    from oracle import compare, duckdb_connection

    con = duckdb_connection(SF_DIR)
    queries, oracles = e.queries(), e.oracle_sql()
    verdicts: dict[str, dict] = {}
    t0 = time.time()
    for name, fn in sorted(queries.items()):
        try:
            df = fn(spark, SF_DIR)
            if name in oracles:
                ok, msg = compare(df, con, oracles[name])
                verdicts[name] = (
                    {"verdict": "pass"}
                    if ok
                    else {"verdict": "fail", "msg": str(msg)[:200]}
                )
            else:
                verdicts[name] = {
                    "verdict": "rows_only",
                    "n_rows": df.count(),
                }
        except Exception as exc:  # noqa: BLE001 — record, keep sweeping
            verdicts[name] = {"verdict": "error", "msg": str(exc)[:200]}
        print(name, verdicts[name]["verdict"], flush=True)
    rev = subprocess.run(
        ["git", "rev-parse", "HEAD"], capture_output=True, text=True, cwd=_REPO
    ).stdout.strip()
    counts = {
        v: sum(1 for r in verdicts.values() if r["verdict"] == v)
        for v in ("pass", "rows_only", "fail", "error")
    }
    out = {
        "methodology": (
            "fresh plain local[8] session, sf0.01, tests/oracle.compare "
            "(exact equality after column-name sort); rows_only = declared "
            "no-oracle query, smoke row count recorded"
        ),
        "sf_dir": SF_DIR,
        "git_rev": rev,
        "sweep_seconds": round(time.time() - t0, 1),
        "counts": counts,
        "n_registry": len(verdicts),
        "queries": verdicts,
    }
    with open(os.path.join(_REPO, "REGISTRY_GREEN.json"), "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(json.dumps({"counts": counts, "n": len(verdicts)}))


if __name__ == "__main__":
    main()
