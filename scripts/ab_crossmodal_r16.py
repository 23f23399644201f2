"""Interleaved same-session A/B for the r16 crossmodal pair-generator fuse.

OLD side: the r15 shape — two separate pair generators (ngram_jaccard_pairs
inverted-index join + phash_verified_pairs banded join), reproduced inline
exactly as committed at c8fd582.  NEW side: the registry's fused
c8_crossmodal_keep_best (one side-tagged union self-join + one grouped
aggregation).  Alternating runs (median of ``--repeats``) cancel box drift
per the SCALE.md round-6a protocol; rows compared identical first.

Usage:  python scripts/ab_crossmodal_r16.py [--repeats 5] [--sf-dir ...]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def build_old(spark, sf_dir):
    """The committed r15 builder body (two separate pair generators)."""
    from logspout_kinesis_tests_spark.operators.dedup import (
        dedup_keep_best,
        ngram_jaccard_pairs,
    )
    from logspout_kinesis_tests_spark.plans.multimodal_ext_queries import (
        phash_hashes,
        phash_verified_pairs,
    )
    from logspout_kinesis_tests_spark.plans.round12_queries import (
        _XM_IMG_OFFSET,
        _XM_JACCARD,
        _XM_TEXT_OFFSET,
    )
    from logspout_kinesis_tests_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.lower("text").alias("text")
    )
    w = F.split("text", " ")
    variant_words = F.when(
        F.size(w) >= 10,
        F.concat(
            F.slice(w, 1, 9),
            F.array(F.concat(F.element_at(w, 10), F.lit("x"))),
            F.slice(w, 11, F.size(w) - 10),
        ),
    ).otherwise(F.concat(w, F.array(F.lit("x"))))
    seventh = docs.filter(F.col("doc_id") % 7 == 0)
    cmod = (
        docs.unionAll(
            seventh.select(
                (F.col("doc_id") + _XM_TEXT_OFFSET).alias("doc_id"),
                "lang",
                F.concat("text", F.lit(" zz9")).alias("text"),
            )
        )
        .unionAll(
            seventh.select(
                (F.col("doc_id") + _XM_IMG_OFFSET).alias("doc_id"),
                "lang",
                F.array_join(variant_words, " ").alias("text"),
            )
        )
        .localCheckpoint(eager=True)
    )
    text_pairs = ngram_jaccard_pairs(
        cmod, threshold=_XM_JACCARD, block_cols=("lang",)
    ).select("id_a", "id_b")
    img_pairs = phash_verified_pairs(
        spark, phash_hashes(cmod.select("doc_id", w.alias("w")))
    ).select("id_a", "id_b")
    pairs = text_pairs.unionAll(img_pairs)
    kept = dedup_keep_best(
        cmod.withColumn("score", F.length("text")), pairs, "score"
    )
    return kept.select("doc_id", F.col("score").cast("long").alias("score"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()

    from logspout_kinesis_tests_spark.plans import REGISTRY
    from logspout_kinesis_tests_spark.session import get_spark

    spark = get_spark(app_name="ab-crossmodal-r16")
    spark.sparkContext.setLogLevel("ERROR")
    build_new = REGISTRY["c8_crossmodal_keep_best"].build

    old_rows = sorted(map(tuple, build_old(spark, args.sf_dir).collect()))
    new_rows = sorted(map(tuple, build_new(spark, args.sf_dir).collect()))
    identical = old_rows == new_rows

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # one untimed warmup per side
    noop(build_old(spark, args.sf_dir))
    noop(build_new(spark, args.sf_dir))
    runs_old, runs_new = [], []
    for _ in range(args.repeats):
        for build, runs in ((build_old, runs_old), (build_new, runs_new)):
            t0 = time.perf_counter()
            noop(build(spark, args.sf_dir))
            runs.append(round(time.perf_counter() - t0, 3))
    out = {
        "c8_crossmodal_keep_best_fused_pairs": {
            "rows_identical": identical,
            "n_rows": len(new_rows),
            "old": runs_old,
            "new": runs_new,
            "old_med": round(statistics.median(runs_old), 3),
            "new_med": round(statistics.median(runs_new), 3),
            "ratio": round(
                statistics.median(runs_new) / statistics.median(runs_old), 3
            ),
        }
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
