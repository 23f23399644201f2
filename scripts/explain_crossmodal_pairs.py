"""Dump the PAIR-GENERATION subplan of c8_crossmodal_keep_best.

The query-level explain (plans/r16/c8_crossmodal_keep_best_*.txt) is
truncated at the connected-components edge checkpoint — the pair
generators run during build, so the r16 fuse is invisible there.  This
script rebuilds just the ``pairs`` frame (text union image candidate
edges, everything before CC) and explains it, for both the fused (current
code) and the unfused (r15) shape depending on which worktree it runs in.

Usage: python scripts/explain_crossmodal_pairs.py <outfile>
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def build_pairs(spark, sf_dir):
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
    try:
        # fused shape (r16): reproduce the builder's pair block
        from logspout_kinesis_tests_spark.operators.dedup import exploded_shingles
        from logspout_kinesis_tests_spark.plans.multimodal_ext_queries import (
            _PHASH_BANDS,
            _PHASH_HAMMING,
            phash_hashes,
        )
        from logspout_kinesis_tests_spark.sources.tables import spread_for_compute

        import logspout_kinesis_tests_spark.plans.round12_queries as r12

        src = open(r12.__file__).read()
        if "Fused pair generation (r16" not in src:
            raise ImportError("unfused build")
        inv = exploded_shingles(
            spread_for_compute(cmod.select("doc_id", "lang", "text")),
            "doc_id",
            "text",
            3,
            ("lang",),
        ).select("doc_id", "lang", F.xxhash64("shingle").alias("shingle"))
        inv = inv.localCheckpoint(eager=True)
        sizes = inv.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
        hashed = phash_hashes(cmod.select("doc_id", w.alias("w")))
        bands = spark.range(_PHASH_BANDS).select(
            F.col("id").cast("int").alias("band")
        )
        banded = hashed.crossJoin(F.broadcast(bands)).select(
            "doc_id",
            "h",
            (
                F.col("band").cast("long") * 65536
                + F.expr("shiftright(h, band * 16) & 65535")
            ).alias("key"),
        )
        null_h = F.lit(None).cast("long")
        tagged = inv.select(
            F.lit(0).alias("side"),
            "lang",
            F.col("shingle").alias("key"),
            F.col("doc_id").alias("id"),
            null_h.alias("h"),
        ).unionAll(
            banded.select(
                F.lit(1).alias("side"),
                F.lit("").alias("lang"),
                "key",
                F.col("doc_id").alias("id"),
                "h",
            )
        )
        a, b = tagged.alias("a"), tagged.alias("b")
        grouped = (
            a.join(
                b,
                (F.col("a.side") == F.col("b.side"))
                & (F.col("a.lang") == F.col("b.lang"))
                & (F.col("a.key") == F.col("b.key"))
                & (F.col("a.id") < F.col("b.id")),
            )
            .groupBy(
                F.col("a.side").alias("side"),
                F.col("a.id").alias("id_a"),
                F.col("b.id").alias("id_b"),
                F.col("a.h").alias("h_a"),
                F.col("b.h").alias("h_b"),
            )
            .agg(F.count("*").alias("n_inter"))
        )
        sa, sb = sizes.alias("sa"), sizes.alias("sb")
        jac = F.col("n_inter").cast("double") / (
            F.col("sa.n_shingles") + F.col("sb.n_shingles") - F.col("n_inter")
        ).cast("double")
        img_ok = (F.col("side") == 1) & (
            F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
            <= _PHASH_HAMMING
        )
        text_ok = (F.col("side") == 0) & (jac >= _XM_JACCARD)
        pairs = (
            grouped.join(sa, F.col("id_a") == F.col("sa.doc_id"), "left")
            .join(sb, F.col("id_b") == F.col("sb.doc_id"), "left")
            .filter(img_ok | text_ok)
            .select("id_a", "id_b")
        )
        return pairs, "fused"
    except ImportError:
        from logspout_kinesis_tests_spark.operators.dedup import (
            ngram_jaccard_pairs,
        )
        from logspout_kinesis_tests_spark.plans.multimodal_ext_queries import (
            phash_hashes,
            phash_verified_pairs,
        )

        text_pairs = ngram_jaccard_pairs(
            cmod, threshold=_XM_JACCARD, block_cols=("lang",)
        ).select("id_a", "id_b")
        img_pairs = phash_verified_pairs(
            spark, phash_hashes(cmod.select("doc_id", w.alias("w")))
        ).select("id_a", "id_b")
        return text_pairs.unionAll(img_pairs), "unfused"


def main() -> None:
    outfile = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from logspout_kinesis_tests_spark.session import get_spark

    spark = get_spark(app_name="explain-crossmodal-pairs")
    pairs, shape = build_pairs(spark, sf_dir)
    plan = spark._sc._jvm.PythonSQLUtils.explainString(
        pairs._jdf.queryExecution(), "formatted"
    )
    with open(outfile, "w") as fh:
        fh.write(f"# pair-generation subplan, shape={shape}\n{plan}")
    print(f"wrote {outfile} ({shape})")


if __name__ == "__main__":
    main()
