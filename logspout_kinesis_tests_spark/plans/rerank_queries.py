"""Round-4f retrieval diversification: maximal-marginal-relevance re-rank.

Registered LAST (see plans/__init__) so longer-waiting unverified queries
keep their place at the front of the driver's correctness window.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logspout_kinesis_tests_spark.plans.llm_queries import _sql_cos
from logspout_kinesis_tests_spark.plans.registry import register
from logspout_kinesis_tests_spark.sources.tables import load_table

#: Candidate cut and number of diversified picks.  The greedy loop runs
#: over a TakeOrdered cut list bounded by _MMR_CUT — a constant, so the
#: single-task selection stage is O(cut² · k) regardless of corpus size.
_MMR_CUT = 20
_MMR_K = 5
#: λ = 1/2 exactly: relevance and redundancy weighted by an exact power of
#: two, so every score is one multiply + one subtract on identical doubles.
_MMR_LAMBDA = 0.5


def _mmr_oracle() -> str:
    """Greedy argmax unrolled to _MMR_K picks — each pick is one CTE pair
    (score the remaining candidates against the selected set, take the
    lexicographic-tie-broken max), the same unrolling trick as the
    PageRank oracle: a constant iteration count needs no recursion."""
    head = f"""
    WITH qv AS (SELECT embedding AS q_vec FROM embeddings WHERE vec_id = 0),
    scored AS (
        SELECT e.vec_id AS doc_id, {_sql_cos('e.embedding', 'qv.q_vec')} AS rel,
               e.embedding
        FROM embeddings e CROSS JOIN qv WHERE e.vec_id != 0),
    cand AS (SELECT * FROM scored ORDER BY rel DESC, doc_id LIMIT {_MMR_CUT}),
    sims AS (
        SELECT a.doc_id AS a, b.doc_id AS b,
               {_sql_cos('a.embedding', 'b.embedding')} AS sim
        FROM cand a JOIN cand b ON a.doc_id != b.doc_id),
    p1 AS (SELECT doc_id, 0.5 * rel - 0.5 * 0.0 AS score, 1 AS rank
           FROM cand ORDER BY rel DESC, doc_id LIMIT 1),
    s1 AS (SELECT doc_id FROM p1)"""
    blocks = []
    for k in range(2, _MMR_K + 1):
        blocks.append(f""",
    r{k} AS (
        SELECT c.doc_id, 0.5 * c.rel - 0.5 * max(s.sim) AS score
        FROM cand c
        JOIN sims s ON s.a = c.doc_id
            AND s.b IN (SELECT doc_id FROM s{k - 1})
        WHERE c.doc_id NOT IN (SELECT doc_id FROM s{k - 1})
        GROUP BY c.doc_id, c.rel),
    p{k} AS (SELECT doc_id, score, {k} AS rank FROM r{k}
             ORDER BY score DESC, doc_id LIMIT 1),
    s{k} AS (SELECT doc_id FROM s{k - 1} UNION ALL SELECT doc_id FROM p{k})""")
    union = " UNION ALL ".join(
        f"SELECT * FROM p{k}" for k in range(1, _MMR_K + 1)
    )
    return (
        head
        + "".join(blocks)
        + f"""
    SELECT CAST(rank AS INT) AS rank, doc_id, round(score, 9) AS mmr_score
    FROM ({union})
    """
    )


@register(
    "c10_mmr_rerank",
    oracle=_mmr_oracle(),
    doc="C10+: maximal-marginal-relevance diversification — the re-rank "
    "stage after retrieval/fusion: greedily pick k results maximizing "
    "λ·relevance − (1−λ)·max-similarity-to-already-picked (λ=1/2), so "
    "near-duplicate hits don't crowd the result page.  Relevance and the "
    "candidate-pairwise similarities are exact JVM-side cosines over a "
    "TakeOrdered top-20 cut (no corpus-sized window, no full pairwise "
    "matrix — 20×19 pairs by construction); the greedy walk itself is "
    "sequential, so it runs as ONE bounded Arrow batch via applyInPandas "
    "and hash-matches the unrolled greedy-argmax DuckDB oracle with "
    "lexicographic tie-breaks.  O(cut²·k) selection cost at ANY corpus "
    "size; scale lives in the candidate generation, which is the already-"
    "benched ANN path.",
)
def c10_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from logspout_kinesis_tests_spark.functions.vectors import cosine_similarity

    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_vec"))
    scored = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            cosine_similarity(F.col("embedding"), F.col("q_vec")).alias("rel"),
            "embedding",
        )
    )
    cand = scored.orderBy(F.desc("rel"), "doc_id").limit(_MMR_CUT)
    a = cand.select(
        F.col("doc_id").alias("a"), F.col("rel").alias("rel_a"),
        F.col("embedding").alias("emb_a"),
    )
    b = cand.select(
        F.col("doc_id").alias("b"), F.col("embedding").alias("emb_b")
    )
    # LEFT join so a singleton candidate (corpus of one) still reaches the
    # greedy walk with a null partner row — otherwise the pairs frame is
    # empty and the query returns 0 rows while the oracle emits pick 1.
    pairs = (
        a.join(F.broadcast(b), F.col("a") != F.col("b"), "left")
        .select(
            "a",
            "rel_a",
            "b",
            cosine_similarity(F.col("emb_a"), F.col("emb_b")).alias("sim"),
        )
    )

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        rel = {}
        sim = {}
        for r in pdf.itertuples(index=False):
            rel[r.a] = r.rel_a
            if pd.notna(r.b):
                sim[(r.a, r.b)] = r.sim
        picked: list[tuple[int, int, float]] = []
        selected: list = []
        for rank in range(1, _MMR_K + 1):
            best = None
            for c in sorted(rel):
                if c in selected:
                    continue
                redundancy = (
                    max(sim[(c, s)] for s in selected) if selected else 0.0
                )
                score = 0.5 * rel[c] - 0.5 * redundancy
                # lexicographic tie-break: strictly-greater wins, equal keeps
                # the earlier (smaller) doc_id from the sorted scan
                if best is None or score > best[1]:
                    best = (c, score)
            if best is None:
                # fewer candidates than _MMR_K: degrade to fewer picks,
                # exactly as the oracle's empty p{k} blocks do
                break
            picked.append((rank, best[0], best[1]))
            selected.append(best[0])
        return pd.DataFrame(picked, columns=["rank", "doc_id", "mmr_score"])

    out = pairs.groupBy(F.lit(0).alias("_g")).applyInPandas(
        greedy, schema="rank int, doc_id long, mmr_score double"
    )
    return out.select("rank", "doc_id", F.round("mmr_score", 9).alias("mmr_score"))
