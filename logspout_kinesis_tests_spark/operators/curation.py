"""Training-data curation operators (C20+): repetition quality, benchmark
decontamination, domain-mixture weights, and sequence packing.

These are the corpus-preparation steps a pretraining pipeline runs after
dedup and before tokenization.  All four are pure DataFrame compositions —
no Python execution — and every arithmetic path is chosen for cross-engine
exactness (int÷int and IEEE sqrt are correctly-rounded in both Spark and
DuckDB; float sums go through 6dp decimal).

Scale notes per operator are in the docstrings; the common theme is that
nothing here ever joins document text against document text — documents are
reduced to counts/n-grams at the scan, and only those move.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from logspout_kinesis_tests_spark.sources.tables import spread_for_compute


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Gopher-style repetition metrics per document (Rae et al. 2021 §A1.1):
    distinct-word ratio, fraction of occurrences claimed by the most common
    word 2-gram, and duplicate word-3-gram fraction.  Boilerplate, spam and
    degenerate generations score high on the last two; the standard filter
    drops docs above fixed thresholds.

    All three ratios are exact rationals (bigint ÷ bigint in IEEE double),
    so the oracle comparison is bit-exact with no rounding policy.

    Scale: word/trigram stats are computed inside the scan projection
    (array expressions, no shuffle); the top-bigram count is one
    explode → two-level groupBy on (id, bigram) — partial aggregation
    absorbs the per-doc fan-out map-side, and the shuffle carries
    (id, bigram-hash-sized rows), never document text.
    """
    spread = spread_for_compute(df)
    staged = spread.select(
        F.col(id_col), F.split(F.lower(F.col(text_col)), " ").alias("_w")
    )
    base = staged.select(
        F.col(id_col),
        F.size("_w").alias("n_words"),
        F.size(F.array_distinct("_w")).alias("n_distinct_words"),
        # trigram stats stay array-level: sizes only, never exploded
        F.expr(
            "CASE WHEN size(_w) >= 3 THEN size(_w) - 2 ELSE 0 END"
        ).alias("_n_tri"),
        F.expr(
            "CASE WHEN size(_w) >= 3 THEN size(array_distinct("
            "transform(sequence(1, size(_w) - 2), "
            "i -> concat_ws(' ', slice(_w, i, 3))))) ELSE 0 END"
        ).alias("_n_tri_distinct"),
    )
    # bigram transform inlined into the explode over the materialized word
    # array — materializing the bigram array first makes Generate ~5×
    # slower (SCALE.md scan notes)
    bg_stats = (
        staged.select(
            F.col(id_col),
            F.explode(
                F.expr(
                    "CASE WHEN size(_w) >= 2 THEN transform(sequence(1, size(_w) - 1), "
                    "i -> concat_ws(' ', slice(_w, i, 2))) ELSE array() END"
                )
            ).alias("bigram"),
        )
        .groupBy(id_col, "bigram")
        .agg(F.count("*").alias("_c"))
        .groupBy(id_col)
        .agg(F.max("_c").alias("_top_bg"), F.sum("_c").alias("_n_bg"))
    )
    return (
        base.join(bg_stats, id_col, "left")
        .select(
            F.col(id_col),
            "n_words",
            (
                F.col("n_distinct_words").cast("double")
                / F.col("n_words").cast("double")
            ).alias("distinct_word_ratio"),
            F.when(
                F.col("_n_bg").isNull() | (F.col("_n_bg") == 0), F.lit(0.0)
            )
            .otherwise(F.col("_top_bg").cast("double") / F.col("_n_bg").cast("double"))
            .alias("top_bigram_frac"),
            F.when(F.col("_n_tri") == 0, F.lit(0.0))
            .otherwise(
                (F.col("_n_tri") - F.col("_n_tri_distinct")).cast("double")
                / F.col("_n_tri").cast("double")
            )
            .alias("dup_trigram_frac"),
        )
    )


def contaminated_docs(
    df: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    ngram: int = 8,
) -> DataFrame:
    """Documents sharing any word ``ngram``-gram with a benchmark/eval set —
    the test-set decontamination pass (GPT-3 appendix C / PaLM §C: drop or
    flag training docs with a 8-13-gram collision against the benchmark).

    Returns (id, n_hits): how many *distinct* benchmark n-grams the
    document contains.  Anti-join the result against the corpus to drop.

    Scale: the benchmark side is eval sets — thousands of docs, not
    billions — so its distinct n-gram set broadcasts; the corpus side
    explodes to distinct n-grams at the scan and the broadcast hash join
    filters them map-side.  No shuffle touches the corpus until the final
    per-doc count, which carries only (id, ngram) hits.
    """
    def grams(col: str) -> F.Column:
        return F.expr(
            f"CASE WHEN size(_w) >= {ngram} "
            f"THEN array_distinct(transform(sequence(1, size(_w) - {ngram - 1}), "
            f"i -> concat_ws(' ', slice(_w, i, {ngram})))) "
            f"ELSE array() END"
        )

    bench_grams = (
        benchmark.select(F.split(F.lower(F.col(bench_text_col)), " ").alias("_w"))
        .select(F.explode(grams("_w")).alias("ngram"))
        .distinct()
    )
    doc_grams = (
        spread_for_compute(df)
        .select(F.col(id_col), F.split(F.lower(F.col(text_col)), " ").alias("_w"))
        .select(F.col(id_col), F.explode(grams("_w")).alias("ngram"))
    )
    return (
        doc_grams.join(F.broadcast(bench_grams), "ngram")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hits"))
    )


def domain_mixture_weights(
    df: DataFrame,
    domain_col: str = "source",
    size_col: str = "n_chars",
) -> DataFrame:
    """Temperature-smoothed domain sampling weights (the multilingual /
    multi-source mixture rule, alpha = 0.5): weight_d ∝ sqrt(share_d),
    normalized.  Down-weights dominant domains, up-weights the tail —
    the standard alternative to proportional sampling when one crawl
    dominates the corpus.

    sqrt is IEEE-correctly-rounded in both engines, so per-domain values
    are bit-exact; the normalizing sum runs over 6dp decimals (exact,
    order-independent) and only the final division returns to double.

    Scale: one map-combined groupBy over the corpus, then a broadcast of
    the (tiny) per-domain table against the single-row total.  Nothing
    else moves.
    """
    per_domain = df.groupBy(domain_col).agg(
        F.count("*").alias("n_docs"), F.sum(size_col).alias("total_size")
    )
    total = per_domain.agg(F.sum("total_size").alias("_grand"))
    raw = per_domain.crossJoin(F.broadcast(total)).select(
        F.col(domain_col),
        "n_docs",
        "total_size",
        F.round(
            F.sqrt(F.col("total_size").cast("double") / F.col("_grand").cast("double")),
            6,
        )
        .cast("decimal(18,6)")
        .alias("_rw"),
    )
    norm = raw.agg(F.sum("_rw").alias("_z"))
    return raw.crossJoin(F.broadcast(norm)).select(
        F.col(domain_col),
        "n_docs",
        "total_size",
        (F.col("_rw").cast("double") / F.col("_z").cast("double")).alias("weight"),
    )


def sequence_packing(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 256,
    n_shards: int = 16,
) -> DataFrame:
    """Concat-and-chunk packing plan: documents are laid end-to-end in a
    deterministic pseudo-random order and cut into fixed ``chunk_tokens``
    windows (the GPT-style pretraining packing).  Returns, per document,
    its shard, position, token span, and the first/last chunk index it
    lands in — the metadata a tokenizer worker needs to emit examples
    without materializing the concatenation.

    Token count = whitespace word count (swap in a BPE estimate upstream
    if needed).  All span arithmetic is integer → bit-exact oracle.

    Scale: a single global ordered cumsum cannot distribute, so packing is
    per-shard: shard = first hex nibble of md5(text) (content-stable, so
    re-runs and re-partitions give identical layouts).  Each shard's
    running sum is one window over its own partition — ``n_shards``
    independent sequential scans, each 1/n of the corpus, and the shard
    count scales with the cluster (production would use 4 hex chars =
    65k shards).
    """
    toks = F.size(F.split(F.lower(F.col(text_col)), " "))
    shard = F.substring(F.md5(F.col(text_col)), 1, 1)
    w = (
        W.partitionBy("shard")
        .orderBy(F.md5(F.col(text_col)), F.col(id_col))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    staged = df.select(
        F.col(id_col), shard.alias("shard"), toks.alias("n_tokens"), F.col(text_col)
    ).withColumn("end_tok", F.sum("n_tokens").over(w))
    return staged.select(
        F.col(id_col),
        "shard",
        "n_tokens",
        (F.col("end_tok") - F.col("n_tokens")).alias("start_tok"),
        F.floor((F.col("end_tok") - F.col("n_tokens")) / chunk_tokens).alias(
            "first_chunk"
        ),
        F.floor((F.col("end_tok") - 1) / chunk_tokens).alias("last_chunk"),
    )


def greedy_packing(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bin_tokens: int = 256,
    n_shards: int = 16,
) -> DataFrame:
    """Next-fit bin packing without document splitting: walk each shard's
    deterministic document order, close the current bin whenever the next
    document would overflow ``bin_tokens``.  The no-truncation alternative
    to concat-and-chunk (``sequence_packing``) — each example is whole
    documents, padded to the context length.

    The bin boundary is a running *stateful* decision (each break depends on
    the previous break), not a cumsum — inexpressible as a window function,
    so this is the canonical ``applyInPandas`` operator: one Arrow batch per
    shard, a vectorized-enough numpy walk inside, output (id, shard, bin,
    bin_fill).  Docs longer than ``bin_tokens`` get a bin of their own
    (fill > bin_tokens, flagged ``oversize``).

    Scale: same content-stable sharding as ``sequence_packing``; state
    never leaves a shard, shards are independent Arrow batches, and the
    per-shard walk is O(docs) with no Python-per-row boxing (numpy arrays
    in, numpy arrays out).
    """
    import pandas as pd

    toks = F.size(F.split(F.lower(F.col(text_col)), " "))
    staged = df.select(
        F.col(id_col),
        F.substring(F.md5(F.col(text_col)), 1, 1).alias("shard"),
        toks.alias("n_tokens"),
        F.md5(F.col(text_col)).alias("_h"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["_h", id_col], kind="mergesort").reset_index(drop=True)
        sizes = pdf["n_tokens"].to_numpy()
        bins = []
        fills = []
        cur_bin, cur_fill = 0, 0
        for s in sizes:  # O(shard docs); numpy-typed scalars, no boxing
            if cur_fill > 0 and cur_fill + s > bin_tokens:
                cur_bin += 1
                cur_fill = 0
            cur_fill += int(s)
            bins.append(cur_bin)
            fills.append(cur_fill)
        pdf["bin"] = pd.Series(bins, dtype="int64")
        pdf["_fill"] = pd.Series(fills, dtype="int64")
        out = pdf.merge(
            pdf.groupby("bin", as_index=False)["_fill"].max().rename(
                columns={"_fill": "bin_fill"}
            ),
            on="bin",
        )
        out["oversize"] = out["n_tokens"] > bin_tokens
        return out[[id_col, "shard", "n_tokens", "bin", "bin_fill", "oversize"]]

    schema = (
        f"{id_col} long, shard string, n_tokens int, "
        "bin long, bin_fill long, oversize boolean"
    )
    return staged.groupBy("shard").applyInPandas(pack, schema=schema)


def weighted_sample(
    df: DataFrame, n: int, weight_col: str, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis-
    Spirakis A-ES): rank by ``-ln(u)/w`` with ``u`` a per-row uniform
    derived from ``md5(id)`` — no RNG state, so the sample is reproducible
    across reruns, executors, and engines, and composable the same way as
    the hash sample.

    The 52-bit md5 prefix is exactly representable in a double; ``(v+1)/
    (2^52+2)`` keeps u in (0,1) so ln never sees 0.  The key is rounded to
    9dp before ranking (libm-parity precedent: ties then break on id), and
    selection is ``orderBy().limit(n)`` — Spark plans a TakeOrdered, i.e.
    per-partition top-n then a driver merge of n·partitions candidate rows,
    never a global sort of the corpus.

    A-ES is defined only for strictly positive weights: w=0 would give an
    Inf key and w<0 flips the key's sign, silently sorting such rows
    first/last differently per engine.  Any row with ``weight_col`` NULL or
    <= 0 raises at execution time instead (per-row guard, no extra action).
    """
    v = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 13), 16, 10
    ).cast("double")
    u = (v + F.lit(1.0)) / F.lit(float((1 << 52) + 2))
    w = F.col(weight_col).cast("double")
    key = F.when(w > 0, F.round(-F.log(u) / w, 9)).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "weighted_sample requires strictly positive weights; "
                    f"got {weight_col}="
                ),
                F.coalesce(w.cast("string"), F.lit("NULL")),
                F.lit(f" at {id_col}="),
                F.col(id_col).cast("string"),
            )
        ).cast("double")
    )
    return (
        df.withColumn("sample_key", key)
        .orderBy("sample_key", id_col)
        .limit(n)
    )
