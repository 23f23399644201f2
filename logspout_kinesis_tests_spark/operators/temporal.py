"""Temporal joins Spark lacks as built-ins: as-of join and range join.

Both are expressed as compositions of existing DataFrame operators — no
Pandas UDF, no mapPartitions:

- **as-of join**: the union-and-carry pattern.  Tag both sides, union,
  sort within each key by (ts, side); a ``last(..., ignorenulls)`` window
  carries the most recent right-side row forward onto each left row.  One
  shuffle on the key (the same shuffle a sort-merge join would do); state
  per row is O(carried columns).  This is how event-time point-in-time
  lookups (feature stores, trade/quote joins) scale: no per-key loops, no
  range probing.
- **range join**: interval bucketization.  A naive ``value BETWEEN lo AND
  hi`` join is a broadcast-nested-loop (O(n·m)); mapping each interval to
  the fixed-width buckets it overlaps and each probe value to its single
  bucket turns it into an equi-join + residual refine — the standard
  approach (Databricks' range-join optimization does exactly this
  internally).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: tuple[str, ...] = (),
    suffix: str = "_right",
    tolerance: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the latest right row of the same key with
    ``right_ts <= left_ts`` (``direction="backward"``, the default) or the
    EARLIEST right row with ``right_ts >= left_ts`` (``"forward"`` — the
    next-reading/next-quote lookup).  Left-outer semantics: no match →
    NULLs.

    Ties at equal timestamps match in both directions (inclusive bound,
    same as DuckDB's ASOF JOIN with ``>=``/``<=``).  ``tolerance`` (an
    INTERVAL string like ``'30 minutes'``) additionally bounds the match
    window on the matching side — stale matches are nulled out, the left
    row is kept (pandas ``merge_asof`` semantics).

    All right columns are carried as ONE struct through a single
    ``last(ignorenulls)`` — never per-column — so the attached values always
    come from the same right row even when some of them are NULL.  Among
    right rows sharing (key, ts) the struct itself is the final sort key, so
    the carried row is the field-wise MAXIMUM for ``backward`` (descending
    struct reaches the left row last) and the field-wise MINIMUM for
    ``forward`` (ascending struct, ``first`` match): deterministic across
    runs and partitionings either way.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    backward = direction == "backward"
    carried = [f"{c}{suffix}" for c in (*right_cols, right_ts)]
    rstruct = F.struct(
        *[F.col(c).alias(f"{c}{suffix}") for c in (*right_cols, right_ts)]
    )
    rstruct_type = right.select(rstruct.alias("_r")).schema["_r"].dataType
    # sort side order so the matching-direction window frame INCLUDES a
    # right row at the exact left timestamp (inclusive-tie contract)
    lside, rside = (1, 0) if backward else (0, 1)
    l_tagged = left.select(
        F.col(on),
        F.col(left_ts).alias("_ts"),
        F.lit(lside).alias("_side"),
        *[F.col(c) for c in left.columns if c not in (on,)],
        F.lit(None).cast(rstruct_type).alias("_rstruct"),
    )
    r_tagged = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(rside).alias("_side"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left.columns if c != on],
        rstruct.alias("_rstruct"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    if backward:
        w = (
            Window.partitionBy(on)
            .orderBy("_ts", "_side", "_rstruct")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carry = F.last("_rstruct", ignorenulls=True).over(w)
    else:
        w = (
            Window.partitionBy(on)
            .orderBy("_ts", "_side", "_rstruct")
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        carry = F.first("_rstruct", ignorenulls=True).over(w)
    out = unioned.select(
        F.col(on),
        "_ts",
        "_side",
        *[F.col(c) for c in left.columns if c != on],
        carry.alias("_r"),
    ).filter(F.col("_side") == lside)
    if tolerance is not None:
        if backward:
            stale = F.col(f"_r.{right_ts}{suffix}") < F.col("_ts") - F.expr(
                f"INTERVAL {tolerance}"
            )
        else:
            stale = F.col(f"_r.{right_ts}{suffix}") > F.col("_ts") + F.expr(
                f"INTERVAL {tolerance}"
            )
        out = out.withColumn(
            "_r", F.when(stale, F.lit(None).cast(rstruct_type)).otherwise(F.col("_r"))
        )
    out = out.select(
        "*", *[F.col(f"_r.{c}").alias(c) for c in carried]
    )
    return out.drop("_side", "_ts", "_r")


def range_join_bucketized(
    values: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: float = 20.0,
) -> DataFrame:
    """Inner join ``values`` to every interval with ``lo <= value < hi``.

    Each interval explodes to the buckets it overlaps; each value maps to
    exactly one bucket, so the equi-join on the bucket produces no
    duplicates and the residual predicate only refines.  ``bucket_width``
    should approximate the median interval width — narrower buckets cut
    false candidates, wider buckets cut the interval replication factor.
    """
    b = float(bucket_width)
    exploded = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / b).cast("long"),
                # hi is exclusive: the bucket containing hi is only needed
                # when hi is not exactly on a bucket boundary
                F.floor(
                    (F.col(hi_col) - F.lit(1e-9)) / b
                ).cast("long"),
            )
        ),
    )
    probed = values.withColumn("_bucket", F.floor(F.col(value_col) / b).cast("long"))
    return (
        probed.join(exploded, "_bucket")
        .filter(
            (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
        )
        .drop("_bucket")
    )


def sessionize(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    tiebreak_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Assign a per-key session sequence number to every row: a new session
    starts when the gap since the previous event is >= ``gap`` (end-
    exclusive, matching ``F.session_window``'s merge semantics).

    This is the row-level generalization of ``session_window`` (which only
    yields per-session aggregates): downstream operators get each event
    tagged with (key, session_seq) — the classic gaps-and-islands
    lag+cumsum, costing exactly one shuffle on the key.
    """
    # tie-break columns make the walk order (hence session numbering)
    # deterministic when a key has several rows at one timestamp
    w = Window.partitionBy(key_col).orderBy(ts_col, *tiebreak_cols)
    # timestamp - timestamp is a day-time interval; compare intervals
    # directly (a cast-to-long detour silently compares mismatched units)
    new_session = (F.col(ts_col) - F.lag(ts_col).over(w)) >= F.expr(
        f"INTERVAL {gap}"
    )
    return df.withColumn(
        "session_seq",
        F.sum(F.when(new_session, 1).otherwise(0)).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
