"""As-of join tolerance semantics (the untolerated path is oracle-matched
via c15_asof_join)."""

from __future__ import annotations

import datetime as dt

from logspout_kinesis_tests_spark.operators.temporal import asof_join


def test_asof_tolerance_nulls_stale_matches(spark):
    L = spark.createDataFrame(
        [(1, dt.datetime(2026, 1, 1, 12, 0), "L-recent"),
         (2, dt.datetime(2026, 1, 1, 12, 0), "L-stale")],
        "k int, ts timestamp, tag string",
    )
    R = spark.createDataFrame(
        [(1, dt.datetime(2026, 1, 1, 11, 50), "R1"),   # 10 min before
         (2, dt.datetime(2026, 1, 1, 10, 0), "R2")],   # 2 h before
        "k int, ts timestamp, tag string",
    )
    out = {
        r["tag"]: (r["tag_right"], r["ts_right"])
        for r in asof_join(L, R, on="k", right_cols=("tag",), tolerance="30 minutes").collect()
    }
    assert out["L-recent"][0] == "R1"          # within tolerance → kept
    assert out["L-stale"] == (None, None)      # stale match nulled, row kept
    # without tolerance the stale match is carried
    full = {
        r["tag"]: r["tag_right"]
        for r in asof_join(L, R, on="k", right_cols=("tag",)).collect()
    }
    assert full["L-stale"] == "R2"
