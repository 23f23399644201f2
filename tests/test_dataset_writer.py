"""Dataset writer: file sizing, partition directories, roundtrip."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from logspout_kinesis_tests_spark.sources.dataset import write_dataset
from logspout_kinesis_tests_spark.sources.tables import load_table


def test_file_count_and_row_cap(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")  # 1000 rows at sf0.001
    out = str(tmp_path / "ds")
    write_dataset(ev, out, target_rows_per_file=300, approx_total_rows=1000)
    files = glob.glob(out + "/*.parquet")
    # ceil(1000/300)=4 tasks; maxRecordsPerFile enforces the 300 cap
    assert len(files) >= 4
    back = spark.read.parquet(out)
    assert back.count() == 1000
    per_file = (
        back.withColumn("f", F.input_file_name()).groupBy("f").count().collect()
    )
    assert max(r["count"] for r in per_file) <= 300


def test_partitioned_layout_roundtrip(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    out = str(tmp_path / "by_type")
    write_dataset(
        ev, out, partition_by=("event_type",), sort_within=("ts",),
        target_rows_per_file=10_000, approx_total_rows=1000,
    )
    dirs = {p.split("=")[-1].rstrip("/") for p in glob.glob(out + "/event_type=*")}
    assert dirs == {"click", "error", "purchase", "signup", "view"}
    back = spark.read.parquet(out)
    assert back.count() == ev.count()
    # partition pruning: reading one directory's worth only
    one = back.filter(F.col("event_type") == "click")
    assert one.count() == ev.filter(F.col("event_type") == "click").count()


def test_compact_dataset_folds_small_files_without_shuffle(spark, sf_dir, tmp_path):
    from logspout_kinesis_tests_spark.sources.dataset import compact_dataset

    ev = load_table(spark, sf_dir, "events")  # 1000 rows at sf0.001
    small = str(tmp_path / "small")
    ev.repartition(20).write.parquet(small)  # the small-file explosion
    assert len(glob.glob(small + "/part-*.parquet")) == 20

    out = str(tmp_path / "compacted")
    stats = compact_dataset(spark, small, out, target_rows_per_file=250)
    # 1000 rows / 250 target -> 4 output groups, one file each
    assert stats == {"n_input_files": 20, "n_groups": 4, "n_rows": 1000}
    assert len(glob.glob(out + "/group-*.parquet")) == 4

    back = spark.read.parquet(out)
    assert back.count() == 1000
    # content preserved exactly (ts column read as raw int64 ns either side)
    a = sorted(r["event_id"] for r in back.select("event_id").collect())
    b = sorted(r["event_id"] for r in ev.select("event_id").collect())
    assert a == b
    # shuffle-free: a group's read->coalesce->write plans no Exchange
    one_group_plan = (
        spark.read.parquet(*glob.glob(small + "/part-*.parquet")[:5])
        .coalesce(1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in one_group_plan
