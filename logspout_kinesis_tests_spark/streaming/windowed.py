"""Streaming windowed aggregations — the plain (non-``GroupState``) side of
the streaming family: event-time windows + algebraic aggregates that the
state store merges incrementally, no custom state walk needed.

``streaming_ohlc`` is the streaming twin of the batch ``c16_ohlc_bars``
query (plans/round8_queries.py): both sides aggregate the SAME projection
and expression list (``operators/timeseries.ohlc_projection`` /
``ohlc_aggs``), so batch/stream parity is a property of one expression
list.  min_by/max_by over the (ts, event_id) struct are order-insensitive
and mergeable, which is exactly what makes an OHLC bar maintainable by a
streaming aggregation: each micro-batch folds its rows into the window's
partial bar regardless of arrival order, and late rows (inside the
watermark) amend the same bar rather than opening a new one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logspout_kinesis_tests_spark.operators.timeseries import (
    ohlc_aggs,
    ohlc_projection,
)


def streaming_ohlc(
    stream: DataFrame,
    window: str = "1 day",
    watermark: str | None = "1 hour",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-(event_type, event-time window) OHLC bars over a stream.

    ``watermark`` bounds state: bars whose window end falls behind the
    watermark are finalized (and emitted, in append mode) and their state
    dropped — pass ``None`` only for ``complete``-mode debugging sinks.
    Output matches the batch query's columns plus the window bounds.
    """
    src = stream
    if watermark is not None:
        src = src.withWatermark(ts_col, watermark)
    return (
        ohlc_projection(src, ts_col=ts_col, value_col=value_col)
        .groupBy(F.window(ts_col, window).alias("w"), F.col("event_type"))
        .agg(*ohlc_aggs())
        .select(
            F.col("w.start").alias("bar_start"),
            F.col("w.end").alias("bar_end"),
            "event_type",
            "open_c",
            "high_c",
            "low_c",
            "close_c",
            "volume",
            "turnover_c",
        )
    )
