"""Round-4g multimodal extension: perceptual-hash image near-duplication.

Registered LAST (see plans/__init__) so longer-waiting unverified queries
keep their place at the front of the driver's correctness window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logspout_kinesis_tests_spark.plans.registry import register
from logspout_kinesis_tests_spark.sources.tables import load_table

#: 8×8 pseudo-pixel grid → 63-bit difference hash; near-dup cut.
_PHASH_PIXELS = 64
_PHASH_HAMMING = 3
#: Banding: 4 bands × 16 bits.  One perturbed pixel flips ≤2 adjacent hash
#: bits, so any pair within the Hamming cut shares ≥1 untouched band
#: (pigeonhole over 4 bands vs ≤3 flipped bits) — candidates come from
#: band equi-joins, never an all-pairs comparison.
_PHASH_BANDS = 4

#: The pixel-grid → dHash → banding → verified-pair pipeline as DuckDB CTE
#: text, shared by c12_phash_neardup and the cross-modal composite
#: (round12_queries) — expects an in-scope CTE ``corpus`` with
#: (doc_id, w array<varchar>); yields ``imgpairs`` (id_a, id_b, hamming).
PHASH_SQL_CTES = f"""
    px AS (
        SELECT doc_id,
               list_transform(range({_PHASH_PIXELS}),
                   i -> CASE WHEN i < len(w)
                             THEN CAST(length(w[i + 1]) % 251 AS BIGINT)
                             ELSE CAST((i * 7) % 251 AS BIGINT) END) AS p
        FROM corpus),
    hashed AS (
        SELECT doc_id,
               CAST(list_sum(list_transform(range({_PHASH_PIXELS - 1}),
                   i -> CASE WHEN p[i + 1] > p[i + 2]
                             THEN (CAST(1 AS BIGINT) << i)
                             ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS h
        FROM px),
    banded AS (
        SELECT doc_id, h, b.k AS band,
               (h >> (b.k * 16)) & 65535 AS band_val
        FROM hashed CROSS JOIN (SELECT unnest(range({_PHASH_BANDS})) AS k) b),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, a.h AS h_a,
                        c.doc_id AS id_b, c.h AS h_b
        FROM banded a JOIN banded c
          ON a.band = c.band AND a.band_val = c.band_val
             AND a.doc_id < c.doc_id),
    imgpairs AS (
        SELECT id_a, id_b,
               CAST(bit_count(xor(h_a, h_b)) AS INT) AS hamming
        FROM cand WHERE bit_count(xor(h_a, h_b)) <= {_PHASH_HAMMING})
"""


def phash_hashes(corpus: DataFrame) -> DataFrame:
    """(doc_id, w array<string>) → (doc_id, h 63-bit dHash), CHECKPOINTED.

    Materialized ONCE (the SimHash pattern): the pixel/hash lambdas are
    interpreted higher-order functions, and without this barrier Catalyst's
    projection collapsing inlines them through the downstream self-join —
    re-evaluating the whole fold PER CANDIDATE PAIR (millions of times)
    instead of once per doc.  16-byte rows, |docs| rows at any scale —
    always worth pinning."""
    px = corpus.select(
        "doc_id",
        F.expr(
            f"transform(sequence(0, {_PHASH_PIXELS - 1}), "
            "i -> IF(i < size(w), CAST(length(element_at(w, i + 1)) % 251 AS BIGINT), "
            "CAST((i * 7) % 251 AS BIGINT)))"
        ).alias("p"),
    )
    return px.select(
        "doc_id",
        F.expr(
            f"aggregate(sequence(0, {_PHASH_PIXELS - 2}), 0L, "
            "(acc, i) -> acc + IF(element_at(p, i + 1) > element_at(p, i + 2), "
            "shiftleft(1L, i), 0L))"
        ).alias("h"),
    ).localCheckpoint(eager=True)


def phash_verified_pairs(spark: SparkSession, hashed: DataFrame) -> DataFrame:
    """Banded-candidate generation + exact Hamming verify over a pinned
    (doc_id, h) table → (id_a, id_b, hamming ≤ cut).  4×16-bit pigeonhole
    bands: the shuffle carries (band, bucket, 8-byte hash) per doc, never
    an all-pairs comparison."""
    bands = spark.range(_PHASH_BANDS).select(F.col("id").cast("int").alias("band"))
    banded = hashed.crossJoin(F.broadcast(bands)).select(
        "doc_id",
        "h",
        "band",
        F.expr("shiftright(h, band * 16) & 65535").alias("band_val"),
    )
    a = banded.select(
        F.col("doc_id").alias("id_a"), F.col("h").alias("h_a"), "band", "band_val"
    )
    b = banded.select(
        F.col("doc_id").alias("id_b"), F.col("h").alias("h_b"), "band", "band_val"
    )
    cand = (
        a.join(b, ["band", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "h_a", "id_b", "h_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return cand.filter(hamming <= _PHASH_HAMMING).select(
        "id_a", "id_b", hamming.cast("int").alias("hamming")
    )


@register(
    "c12_phash_neardup",
    # The "decode" is the documented deterministic stub (multimodal.py):
    # pseudo-pixels derive LOCALITY-PRESERVINGLY from the payload (word
    # lengths), unlike an avalanche hash — which is exactly the property a
    # real grayscale-resize decode has and that perceptual hashing needs.
    # list_sum widens to HUGEINT in DuckDB — cast back (r3 lesson).
    oracle=f"""
    WITH base AS (SELECT doc_id, lower(text) AS text FROM documents),
    corpus AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM base
        UNION ALL
        SELECT doc_id + 7000000,
               CASE WHEN len(w) >= 10
                    THEN list_concat(list_concat(
                             list_slice(w, 1, 9), [w[10] || 'x']),
                             list_slice(w, 11, len(w)))
                    ELSE list_append(w, 'x') END
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM base)
        WHERE doc_id % 7 = 0),
    {PHASH_SQL_CTES}
    SELECT id_a, id_b, hamming FROM imgpairs
    """,
    doc="C12+: perceptual-hash (dHash-style) image near-duplication — the "
    "image-side analogue of SimHash text dedup: an 8×8 pseudo-pixel grid "
    "per payload, a 63-bit adjacent-difference hash, 4×16-bit pigeonhole "
    "banding for candidates, exact Hamming≤3 verify.  The pixel grid is "
    "the documented deterministic decode stub (word-length grid — "
    "locality-preserving like a real grayscale resize, so a one-'pixel' "
    "edit flips ≤2 hash bits; planted single-word variants of every 7th "
    "doc are caught while unrelated docs sit ~30 bits apart).  Everything "
    "is scan-side expression arithmetic — no UDF, no all-pairs join; the "
    "shuffle carries (band, 16-bit bucket, 8-byte hash) per doc.  Short "
    "docs share filler-tail bands (one hot bucket — AQE splits it; the "
    "production lever is the stop-shingle df-cut from the text LSH ops).  At "
    "100 TB the stub swaps for the real mapInPandas decode "
    "(operators/multimodal.extract_features) with the SAME hash/banding "
    "plan downstream.",
)
def c12_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.lower("text").alias("text")
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
    corpus = docs.select("doc_id", w.alias("w")).unionAll(
        docs.filter(F.col("doc_id") % 7 == 0).select(
            (F.col("doc_id") + 7000000).alias("doc_id"), variant_words.alias("w")
        )
    )
    return phash_verified_pairs(spark, phash_hashes(corpus))


# --- C3+: null-safe equality join ------------------------------------------


@register(
    "c3_null_safe_join",
    # NULL keys planted on both sides (every 97th order, every 13th
    # customer); <=> matches NULL with NULL where = drops both rows.
    oracle="""
    WITH o AS (
        SELECT o_orderkey,
               CASE WHEN o_custkey % 97 = 0 THEN NULL ELSE o_custkey END AS k
        FROM orders),
    c AS (
        SELECT c_custkey, c_mktsegment,
               CASE WHEN c_custkey % 13 = 0 THEN NULL ELSE c_custkey END AS k
        FROM customer)
    SELECT coalesce(c.c_mktsegment, 'NULL_KEY') AS segment,
           CAST(count(*) AS BIGINT) AS n_matched,
           CAST(sum(CASE WHEN o.k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_null_matches
    FROM o JOIN c ON o.k IS NOT DISTINCT FROM c.k
    GROUP BY 1
    """,
    doc="C3+: null-safe equality join (Spark `eqNullSafe` / SQL `<=>` / "
    "ANSI IS NOT DISTINCT FROM) — the join variant entity-resolution "
    "pipelines need when the key itself is nullable and NULL must mean "
    "'same unknown bucket' rather than 'matches nothing'.  NULL keys are "
    "planted on both sides; the NULL×NULL block is a deliberate hot cell "
    "(every null-keyed order pairs with every null-keyed customer — the "
    "n_null_matches column sizes it), which is exactly why production "
    "null-safe joins either pre-filter NULLs into a separate path or "
    "salt them; here the block is bounded and the plan stays a hash join "
    "(Spark plans <=> as an equi-join key, NOT a nested loop).",
)
def c3_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(F.col("o_custkey") % 97 == 0, None)
        .otherwise(F.col("o_custkey"))
        .alias("k"),
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.when(F.col("c_custkey") % 13 == 0, None)
        .otherwise(F.col("c_custkey"))
        .alias("k"),
    )
    joined = orders.alias("o").join(
        cust.alias("c"), F.col("o.k").eqNullSafe(F.col("c.k"))
    )
    return joined.groupBy(
        F.coalesce(F.col("c.c_mktsegment"), F.lit("NULL_KEY")).alias("segment")
    ).agg(
        F.count("*").alias("n_matched"),
        F.sum(F.when(F.col("o.k").isNull(), 1).otherwise(0)).alias(
            "n_null_matches"
        ),
    )
