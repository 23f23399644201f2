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


def compact_dataset(
    spark,
    in_dir: str,
    out_dir: str,
    target_rows_per_file: int = 1_000_000,
    max_concurrent_groups: int = 8,
) -> dict:
    """Execute the small-file compaction the ``c19_compaction_plan`` query
    plans: fold many undersized parquet files into ~target-row outputs
    WITHOUT a shuffle.

    How (the Delta/Iceberg OPTIMIZE shape, expressed on plain parquet):

    1. MANIFEST — one column-pruned scan groups row counts by
       ``input_file_name()``.  The manifest is |files| rows; collecting it
       to the driver is the same driver-side file planning every table
       format's compactor performs (and Spark's own scan planner already
       holds the file list in driver memory).
    2. PLAN — files in name order, exclusive running sum, group =
       floor(cum_before / target): identical arithmetic to the registered
       oracle-verified query.
    3. EXECUTE — each group reads ONLY its own files and ``coalesce(1)``s
       into one output task: a narrow dependency, so no shuffle exchange
       anywhere; groups run as concurrent driver-submitted jobs.
       ``maxRecordsPerFile`` backstops a group inflated by one oversized
       input.

    Returns ``{"n_input_files": ..., "n_groups": ..., "n_rows": ...}``.
    """
    import glob
    import os
    import shutil
    from concurrent.futures import ThreadPoolExecutor

    from pyspark.sql import functions as F

    manifest = (
        spark.read.parquet(in_dir)
        .groupBy(F.input_file_name().alias("file"))
        .agg(F.count("*").alias("rows"))
        .collect()
    )
    files = sorted((r["file"], r["rows"]) for r in manifest)
    groups: dict[int, list[str]] = {}
    cum_before = 0
    for path, rows in files:
        groups.setdefault(cum_before // target_rows_per_file, []).append(path)
        cum_before += rows

    # Concurrent jobs cannot append to ONE path (they fight over the shared
    # _temporary committer dir) — each group commits into its own hidden
    # staging dir, then the driver moves the part files in: the staged-swap
    # pattern streaming/batch_apply.py uses for index compaction.  On an
    # object store the move is the table format's manifest commit instead.
    os.makedirs(out_dir, exist_ok=True)

    def write_group(item: tuple[int, list[str]]) -> None:
        gid, paths = item
        stage = os.path.join(out_dir, f"_compact_stage_{gid}")
        (
            spark.read.parquet(*paths)
            .coalesce(1)
            .write.mode("overwrite")
            .option("maxRecordsPerFile", str(target_rows_per_file * 2))
            .parquet(stage)
        )
        for i, part in enumerate(sorted(glob.glob(os.path.join(stage, "part-*")))):
            os.replace(
                part, os.path.join(out_dir, f"group-{gid:05d}-{i}.parquet")
            )
        shutil.rmtree(stage)

    with ThreadPoolExecutor(max_workers=max_concurrent_groups) as pool:
        list(pool.map(write_group, groups.items()))
    return {
        "n_input_files": len(files),
        "n_groups": len(groups),
        "n_rows": cum_before,
    }
