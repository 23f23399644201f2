"""Regenerate the ORGANIC sf=1 TPC-H probe corpus (rounds 6c/7a).

The replicated 10× probes (scale_probe_r5.py) keep per-key group sizes
flat; the organic corpus — DuckDB's public TPC-H generator at sf=1, cast
to the testdata schema — grows degree/group distributions with the data,
which is what the iterative graph probes (k-core, modularity, link
prediction, label propagation) need.  Rounds 6c/7a generated it ad hoc;
this script makes the recipe reproducible.

REQUIRES NETWORK once: ``INSTALL tpch`` downloads the extension (round 8's
offline box could not — SCALE.md round-8b documents the supplier-shared
replication fallback used instead).  After the first install the extension
is cached under ``~/.duckdb`` and this runs offline.

Usage: python scripts/gen_organic_sf1.py [out_dir]   (default /tmp/organic_sf1)
Writes orders/lineitem/customer/supplier parquet in the testdata column
subset, ~30 row groups each so Spark scans parallelize.
"""

from __future__ import annotations

import os
import sys

import duckdb

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/organic_sf1"

TABLES = {
    "orders": "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, "
    "o_orderdate, o_orderpriority FROM orders",
    "lineitem": "SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, "
    "l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, "
    "l_shipdate FROM lineitem",
    "customer": "SELECT c_custkey, c_name, c_nationkey, c_acctbal FROM customer",
    "supplier": "SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier",
}


def main() -> None:
    con = duckdb.connect()
    try:
        con.execute("INSTALL tpch; LOAD tpch")
    except duckdb.Error as exc:
        raise SystemExit(
            f"tpch extension unavailable ({exc}); needs network once — "
            "use scripts/scale_probe_r5.py's replicated corpus meanwhile"
        )
    con.execute("CALL dbgen(sf=1)")
    os.makedirs(OUT, exist_ok=True)
    for name, sql in TABLES.items():
        path = os.path.join(OUT, f"{name}.parquet")
        # ~30 row groups: 6M lineitem rows / 200k per group
        con.execute(
            f"COPY ({sql}) TO '{path}' (FORMAT PARQUET, ROW_GROUP_SIZE 200000)"
        )
        n = con.execute(f"SELECT count(*) FROM '{path}'").fetchone()[0]
        print(f"{name}: {n} rows -> {path}")


if __name__ == "__main__":
    main()
