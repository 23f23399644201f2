"""Round-12 additions: cross-modal dedup composite + streaming-ANN recall
monitor parity.

Registered LAST (plans/__init__) so the driver window's stale-green drain
(the r5/r6 cohort, VERDICT r11 #2) loses as few slots as possible — this
round's batch is deliberately small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logspout_kinesis_tests_spark.plans.registry import register
from logspout_kinesis_tests_spark.sources.tables import load_table

# --------------------------------------------------------------------------
# C8+/C12+ — cross-modal keep-best dedup (VERDICT r11 #5): pHash image
# near-dup pairs and n-gram-Jaccard text near-dup pairs resolved into ONE
# cluster space, one quality-ranked survivor per cluster.
# --------------------------------------------------------------------------

#: planted-variant knobs shared by the Spark builder and the oracle: every
#: 7th doc gets a TEXT variant (suffix — text-similar, and 4 chars longer
#: so keep-best observably prefers it over the original) and an IMAGE
#: variant (one word perturbed — flips <= 2 dHash bits).
_XM_TEXT_OFFSET = 1_000_000
_XM_IMG_OFFSET = 7_000_000
_XM_JACCARD = 0.3


def _crossmodal_oracle() -> str:
    from logspout_kinesis_tests_spark.plans.multimodal_ext_queries import (
        PHASH_SQL_CTES,
    )

    return f"""
    WITH RECURSIVE base AS (
        SELECT doc_id, lang, lower(text) AS text FROM documents),
    cmod AS MATERIALIZED (
        SELECT doc_id, lang, text FROM base
        UNION ALL
        SELECT doc_id + {_XM_TEXT_OFFSET}, lang, text || ' zz9'
        FROM base WHERE doc_id % 7 = 0
        UNION ALL
        SELECT doc_id + {_XM_IMG_OFFSET}, lang,
               array_to_string(CASE WHEN len(w) >= 10
                    THEN list_concat(list_concat(
                             list_slice(w, 1, 9), [w[10] || 'x']),
                             list_slice(w, 11, len(w)))
                    ELSE list_append(w, 'x') END, ' ')
        FROM (SELECT doc_id, lang, string_split(text, ' ') AS w FROM base)
        WHERE doc_id % 7 = 0),
    corpus AS MATERIALIZED (
        SELECT doc_id, string_split(text, ' ') AS w FROM cmod),
    {PHASH_SQL_CTES},
    sh AS MATERIALIZED (
        SELECT c.doc_id, c.lang,
               list_distinct(CASE WHEN len(w.w) >= 3
                    THEN list_transform(range(1, len(w.w) - 1),
                           i -> array_to_string(list_slice(w.w, i, i + 2), ' '))
                    ELSE [array_to_string(w.w, ' ')] END) AS shingles
        FROM cmod c JOIN corpus w USING (doc_id)),
    txtpairs AS MATERIALIZED (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
                 / CAST(len(a.shingles) + len(b.shingles)
                        - len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
              >= {_XM_JACCARD}),
    edges AS MATERIALIZED (
        SELECT id_a AS src, id_b AS dst FROM txtpairs
        UNION SELECT id_a, id_b FROM imgpairs
        UNION SELECT id_b, id_a FROM txtpairs
        UNION SELECT id_b, id_a FROM imgpairs),
    reach(id, lbl) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.id),
    comp AS MATERIALIZED (SELECT id, min(lbl) AS component FROM reach GROUP BY id),
    best AS MATERIALIZED (
        SELECT doc_id FROM (
            SELECT c.doc_id,
                   ROW_NUMBER() OVER (PARTITION BY comp.component
                                      ORDER BY length(c.text) DESC, c.doc_id) AS rn
            FROM cmod c JOIN comp ON c.doc_id = comp.id)
        WHERE rn = 1)
    SELECT doc_id, CAST(length(text) AS BIGINT) AS score FROM cmod
    WHERE doc_id IN (SELECT doc_id FROM best)
       OR doc_id NOT IN (SELECT id FROM comp)
    """


@register(
    "c8_crossmodal_keep_best",
    oracle=_crossmodal_oracle(),
    doc="C8+/C12+ composite (VERDICT r11 #5): cross-MODAL duplicate "
    "resolution — perceptual-hash image near-dup pairs (the "
    "c12_phash_neardup banded dHash pipeline, shared helpers) and exact "
    "n-gram-Jaccard text near-dup pairs (inverted-index, lang-blocked) "
    "are UNIONED into one edge set, resolved by one connected-components "
    "pass, and each cluster keeps its highest-quality member "
    "(longest text, ties -> lowest id; the c8_dedup_keep_best policy).  "
    "Planted per-source text and image variants bridge through the "
    "source doc into ONE 3-member cluster, so the cross-modal "
    "transitivity is observable: exactly one of the three survives.  "
    "Scale shape: both pair generators are banded/inverted-index joins "
    "(never all-pairs), the edge union is linear in pairs, CC is the "
    "shared min-label fixpoint, and the keep-best window partitions by "
    "cluster (tiny by construction) with singletons bypassing via "
    "anti-join.",
)
def c8_crossmodal_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logspout_kinesis_tests_spark.operators.dedup import (
        dedup_keep_best,
        ngram_jaccard_pairs,
    )
    from logspout_kinesis_tests_spark.plans.multimodal_ext_queries import (
        phash_hashes,
        phash_verified_pairs,
    )

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
        ).unionAll(
            seventh.select(
                (F.col("doc_id") + _XM_IMG_OFFSET).alias("doc_id"),
                "lang",
                F.array_join(variant_words, " ").alias("text"),
            )
        )
        # four consumers (jaccard index build, phash_hashes, keep-best's
        # clustered join + singles anti-join) — materialize the corpus +
        # variant construction once instead of re-scanning per branch
        .localCheckpoint(eager=True)
    )
    text_pairs = ngram_jaccard_pairs(
        cmod, threshold=_XM_JACCARD, block_cols=("lang",)
    ).select("id_a", "id_b")
    img_pairs = phash_verified_pairs(
        spark, phash_hashes(cmod.select("doc_id", w.alias("w")))
    ).select("id_a", "id_b")
    # no checkpoint here: connected_components (inside dedup_keep_best) is
    # the edge set's ONLY consumer and materializes its own symmetrized
    # copy — an extra barrier would just add a job
    pairs = text_pairs.unionAll(img_pairs)
    kept = dedup_keep_best(
        cmod.withColumn("score", F.length("text")), pairs, "score"
    )
    return kept.select("doc_id", F.col("score").cast("long").alias("score"))


# --------------------------------------------------------------------------
# C10+ — streaming-ANN recall monitor, batch parity (VERDICT r11 #6).
# --------------------------------------------------------------------------

_ANN_MON_EPOCHS = 3
_ANN_MON_PANEL = 50
_ANN_MON_K = 5
#: minimum panel-agreement (of 50 queries x 5 exact neighbors = 250 pairs)
#: per epoch before the monitor emits a violation row.  Measured agreement
#: across sf0.001/0.01/0.1: 163-189 (nprobe=4 of nlist=16 on near-uniform
#: synthetic vectors ≈ 65-75% recall) — the gate sits ~25% below the
#: observed floor, so it trips only on a real probe/rank regression.
_ANN_MON_FLOOR = 120


def _ann_monitor_oracle() -> str:
    rows = [
        f"""SELECT CAST('epoch_{n}_self_matches' AS VARCHAR) AS gate,
               CAST(count(*) AS BIGINT) AS observed
        FROM embeddings WHERE vec_id < {_ANN_MON_PANEL} AND vec_id % {_ANN_MON_EPOCHS} <= {n}"""
        for n in range(_ANN_MON_EPOCHS)
    ]
    return " UNION ALL ".join(rows)


@register(
    "c10_ann_recall_monitor",
    # Self-checking gate (the c10_ivf_recall_gate shape): the healthy
    # output is one COMPUTED row per epoch — how many frozen-panel queries
    # recovered THEMSELVES from the epoch snapshot — which the oracle
    # derives structurally from the same table (a panel query's own vector
    # is in the snapshot iff its epoch has arrived; IVF always probes the
    # query's own cell and cosine(q,q)=1 ranks first).  Low-agreement
    # violation rows (vs the exact cosine top-5 on the same snapshot) go
    # red against the oracle when emitted.
    oracle=_ann_monitor_oracle(),
    doc="C10+/C7+ (VERDICT r11 #6): batch parity for the streaming ANN "
    "recall monitor (streaming/batch_apply.py _streaming_ann_ingest "
    "probe_panel) — the corpus arrives in 3 deterministic epochs "
    "(vec_id mod 3), IVF centroids train ONCE on epoch 0 (the streaming "
    "train-once contract), and after each epoch the frozen 50-query "
    "panel is searched approximately (ivf_topk over the accumulated "
    "snapshot index) and exactly (cosine_topk over the same snapshot); "
    "per-epoch self-match counts are the oracle-pinned structural truth "
    "and agreement-floor violations are the tripwire.  Scale shape: the "
    "panel is broadcast, each epoch costs one probe join + one exact "
    "scan bounded by panel size, and the snapshot index grows by "
    "ivf_assign increments exactly like the stream.",
)
def c10_ann_recall_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logspout_kinesis_tests_spark.operators.ann import (
        ivf_assign,
        ivf_index,
        ivf_topk,
    )
    from logspout_kinesis_tests_spark.operators.similarity import cosine_topk

    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            "embedding",
            (F.col("vec_id") % _ANN_MON_EPOCHS).alias("e"),
        )
        .localCheckpoint(eager=True)  # read by every epoch's 3 branches
    )
    panel = (
        emb.filter(F.col("vec_id") < _ANN_MON_PANEL)
        .select(F.col("vec_id").alias("query_id"), "embedding")
        .localCheckpoint(eager=True)  # read by 2 searches x 3 epochs
    )
    cents = ivf_index(
        emb.filter(F.col("e") == 0), nlist=16, iters=2
    )[1].localCheckpoint(eager=True)  # train-once: frozen after epoch 0
    # ONE inverted-file assignment for the whole corpus: per-vector cell
    # membership is snapshot-independent (frozen centroids), and
    # ivf_topk's corpus-side join restricts it to each epoch's filtered
    # view — the streaming equivalent is the codes table the epochs append
    # to, read here in one piece instead of re-assigned per epoch
    assign = ivf_assign(emb, cents).localCheckpoint(eager=True)
    out: DataFrame | None = None
    for n in range(_ANN_MON_EPOCHS):
        snap = emb.filter(F.col("e") <= n).select("vec_id", "embedding")
        # no per-epoch checkpoints: every branch below reads only
        # checkpointed inputs, and the single final action runs all
        # epochs' probe/exact subplans as parallel stages
        approx = ivf_topk(
            panel, snap, k=_ANN_MON_K, nprobe=4, index=(assign, cents)
        ).select("query_id", "vec_id")
        exact = cosine_topk(panel, snap, k=_ANN_MON_K).select("query_id", "vec_id")
        self_row = (
            approx.filter(F.col("query_id") == F.col("vec_id"))
            .agg(F.count("*").cast("long").alias("observed"))
            .select(
                F.lit(f"epoch_{n}_self_matches").alias("gate"), "observed"
            )
        )
        viol_row = (
            exact.join(approx, ["query_id", "vec_id"], "leftsemi")
            .agg(F.count("*").alias("agree"))
            .filter(F.col("agree") < _ANN_MON_FLOOR)
            .select(
                F.lit(f"epoch_{n}_low_agreement").alias("gate"),
                F.col("agree").cast("long").alias("observed"),
            )
        )
        rows = self_row.unionByName(viol_row)
        out = rows if out is None else out.unionByName(rows)
    return out
