"""Dataset writer — partitioned, size-controlled parquet output.

The reading side of a 100 TB pipeline is only half the story: the written
dataset must come out with sane file sizes (no small-file explosion, no
multi-GB monoliths), useful partition directories, and optional in-file
ordering for row-group skipping.  This wraps the three Spark levers that
control that:

- ``repartition(n[, cols])``  → number of output tasks ≈ number of files
- ``maxRecordsPerFile``       → hard per-file row cap (splits big tasks)
- ``sortWithinPartitions``    → clustered row groups → min/max skipping
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame


def write_dataset(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = (),
    target_rows_per_file: int = 1_000_000,
    approx_total_rows: int | None = None,
    sort_within: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    """Write parquet with controlled file count and sizes.

    ``approx_total_rows`` (pass a known count or estimate; counting 100 TB
    to plan a write is wasteful) sizes the repartition; ``maxRecordsPerFile``
    backstops estimation error.  With ``partition_by``, repartitioning on
    the partition columns lines tasks up with directories so each task
    writes few files (avoiding the files = tasks × directories blowup).
    """
    writer_df = df
    if approx_total_rows is not None:
        n_files = max(1, math.ceil(approx_total_rows / target_rows_per_file))
        if partition_by:
            writer_df = df.repartition(n_files, *partition_by)
        else:
            writer_df = df.repartition(n_files)
    elif partition_by:
        writer_df = df.repartition(*partition_by)
    if sort_within:
        writer_df = writer_df.sortWithinPartitions(*sort_within)
    writer = (
        writer_df.write.mode(mode)
        .option("maxRecordsPerFile", str(target_rows_per_file))
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: tuple[str, ...],
    n_buckets: int = 8,
    sort_cols: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    """Write a hash-bucketed (optionally sorted) parquet table.

    Bucketing is the write-once/join-many lever: two tables bucketed the
    same way on their join key co-locate matching rows in matching bucket
    files, so joins and aggregations on that key run with NO exchange —
    at 100 TB that deletes the dominant cost of every fact-fact join on a
    pre-declared key (fact-dim joins should broadcast instead).  With
    ``sort_cols`` the sort-merge join also skips its per-task sort.

    Bucket metadata lives in the catalog, hence ``saveAsTable`` (a plain
    ``parquet(path)`` write cannot record it).  ``n_buckets`` sets a hard
    parallelism floor/ceiling for bucket-local stages: pick ≈ cluster cores
    × small integer at the target scale.
    """
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def zorder_key(col_a, col_b, bits: int = 21):
    """Interleave the low ``bits`` of two non-negative integer columns into
    a Z-curve (Morton) key — the multi-dimensional locality layout lever:
    sorting/range-partitioning by the key keeps rows close in BOTH
    dimensions close on disk, so two-sided range predicates prune files the
    way one-dimensional sorting can only do for one column.

    Pure bit arithmetic (one aggregate over bit positions, codegen) —
    deterministic and engine-portable, which is what lets the layout be
    oracle-verified rather than trusted.
    """
    from pyspark.sql import functions as F

    return F.expr(
        f"""
        aggregate(
          sequence(0, {bits - 1}),
          0L,
          (acc, i) -> acc
            + shiftleft(shiftright(CAST({col_a} AS LONG), i) & 1L, 2 * i)
            + shiftleft(shiftright(CAST({col_b} AS LONG), i) & 1L, 2 * i + 1))
        """
    )
