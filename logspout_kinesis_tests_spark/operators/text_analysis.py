"""Text analysis operators for LLM-data pipelines (SURVEY.md §2 C11).

All pure ``pyspark.sql.functions`` expressions — language ID, quality
scoring, token counting, fingerprinting run scan-side in codegen, which is
what makes them viable over 100 TB of documents.  Formulas use only exact
arithmetic (+, *, /, comparisons) so results are bit-identical to the DuckDB
oracle's evaluation of the same expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from logspout_kinesis_tests_spark.sources.tables import spread_for_compute

#: Shared stopword list (ASCII, matches the synthetic corpus vocabulary).
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

#: Heuristic language-ID marker words, checked in fixed priority order.
LANG_MARKERS = {
    "en": ("the", "and", "of"),
    "es": ("el", "la", "de"),
    "de": ("der", "die", "das"),
    "fr": ("le", "les", "et"),
}

#: BPE-ish tokenizer regex: lowercase runs, digit runs, single other symbols.
TOKEN_REGEX = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def words(text_col: str = "text") -> Column:
    return F.split(F.lower(F.col(text_col)), " ")


def text_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document stats: token count, distinct ratio, stopword ratio,
    mean token length — the building blocks of quality filters."""
    w = words(text_col)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n = F.size(w)
    n_stop = F.size(F.array_intersect(w, stop_arr))  # distinct-stopword hits
    n_distinct = F.size(F.array_distinct(w))
    total_chars = F.aggregate(w, F.lit(0), lambda acc, x: acc + F.length(x))
    return df.select(
        F.col(id_col),
        n.alias("n_tokens"),
        n_distinct.alias("n_distinct_tokens"),
        (n_distinct.cast("double") / n.cast("double")).alias("distinct_ratio"),
        n_stop.alias("n_stopword_types"),
        (total_chars.cast("double") / n.cast("double")).alias("mean_token_len"),
    )


def quality_score(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Composite quality score in [0, 1] from exact-arithmetic signals:
    length saturation, stopword-type presence, vocabulary diversity.

    score = 0.4·min(1, n_tokens/50) + 0.3·(stopword_types/8) +
            0.3·distinct_ratio
    """
    w = words(text_col)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n = F.size(w).cast("double")
    n_stop = F.size(F.array_intersect(w, stop_arr)).cast("double")
    n_distinct = F.size(F.array_distinct(w)).cast("double")
    score = (
        F.lit(0.4) * F.least(F.lit(1.0), n / F.lit(50.0))
        + F.lit(0.3) * (n_stop / F.lit(float(len(STOPWORDS))))
        + F.lit(0.3) * (n_distinct / n)
    )
    return df.select(F.col(id_col), score.alias("quality"))


def language_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic language ID: count marker-word *types* per language, pick
    the max with fixed priority (en > es > de > fr), 'und' when all zero.

    A real deployment swaps the marker lists for n-gram profiles; the
    operator mechanics (argmax over per-language evidence, computed
    scan-side) are what this pins down.
    """
    w = words(text_col)
    counts = {
        lang: F.size(F.array_intersect(w, F.array(*[F.lit(m) for m in marks])))
        for lang, marks in LANG_MARKERS.items()
    }
    best = F.greatest(*counts.values())
    pred = F.when(best <= 0, F.lit("und"))
    for lang in LANG_MARKERS:  # dict order = fixed priority
        pred = pred.when(counts[lang] == best, F.lit(lang))
    return df.select(F.col(id_col), pred.alias("predicted_lang"))


def token_count(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Token counts: whitespace tokens and BPE-ish regex tokens."""
    return df.select(
        F.col(id_col),
        F.size(words(text_col)).alias("n_ws_tokens"),
        F.size(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_REGEX), 0)
        ).alias("n_re_tokens"),
    )


def fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Canonical content fingerprint: md5 of the sorted distinct word set.

    Invariant to word order and repetition — catches shuffled/near-identical
    documents that exact hashing misses, at one 16-byte key per doc.
    """
    w = words(text_col)
    return df.select(
        F.col(id_col),
        F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(w)))).alias("fingerprint"),
    )


def term_frequencies(df: DataFrame, text_col: str = "text", top_n: int = 20) -> DataFrame:
    """Corpus-level top-N term frequencies (explode → count → top-k).

    The explode happens after an in-codegen split; the aggregate is
    map-side-combined so the shuffle carries (term, partial count).
    """
    return (
        df.select(F.explode(words(text_col)).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("term"))
        .limit(top_n)
    )


# --------------------------------------------------------------------------
# TF-IDF / BM25 relevance scoring.
# --------------------------------------------------------------------------

def tfidf_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
) -> DataFrame:
    """(doc, term, tf, df_, tfidf) with smooth idf = ln((1+N)/(1+df)) + 1.

    Plan shape: one tokenize+explode scan → (doc, term) counts (map-side
    combined) → term document frequencies → two broadcast joins of the tiny
    (term→df) and (scalar N) sides back onto the tf rows.  The shuffle
    carries (term, id, count) — never text.  ``tfidf`` is rounded to 6
    decimals: ln differs between runtimes in the last ulp, and 6dp is what
    downstream ranking consumes (full-precision stays available as
    tf × idf recomputed where needed).
    """
    toks = df.select(F.col(id_col), F.explode(words(text_col)).alias("term"))
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df_")).filter(
        F.col("df_") >= min_df
    )
    n = df.agg(F.count("*").alias("n"))
    idf = F.log((1 + F.col("n")) / (1 + F.col("df_"))) + F.lit(1.0)
    return (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n))
        .select(
            F.col(id_col),
            "term",
            "tf",
            "df_",
            F.round(F.col("tf") * idf, 6).alias("tfidf"),
        )
    )


def bm25_scores(
    df: DataFrame,
    query_terms: tuple[str, ...],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 of every document against a bag of query terms.

    Per-term contributions are rounded to 6 decimals and summed in
    decimal(18,6): float addition is order-dependent and a distributed sum
    has no stable order, so the decimal sum is what makes the score
    deterministic across partitionings (and bit-comparable to any other
    engine computing the same formula).  Documents matching no query term
    score 0 and are kept (left join) — ranking needs the zeros.
    """
    toks = df.select(F.col(id_col), F.explode(words(text_col)).alias("term"))
    dl = toks.groupBy(id_col).agg(F.count("*").alias("dl"))
    tf = (
        toks.filter(F.col("term").isin(*query_terms))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df_"))
    stats = dl.agg(
        F.count("*").alias("n"),
        (F.sum("dl").cast("double") / F.count("*").cast("double")).alias("avgdl"),
    )
    idf = F.log(
        (F.col("n") - F.col("df_") + 0.5) / (F.col("df_") + 0.5) + F.lit(1.0)
    )
    contrib = F.round(
        idf
        * (F.col("tf") * (k1 + 1))
        / (
            F.col("tf")
            + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
        ),
        6,
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(
            F.sum(contrib.cast("decimal(18,6)")).cast("double").alias("bm25")
        )
    )
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(F.col(id_col), F.coalesce("bm25", F.lit(0.0)).alias("bm25"))
    )


def lm_doc_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    smoothing: float = 0.5,
) -> DataFrame:
    """Average bigram log-probability of each document under a language
    model trained on the corpus itself — the standard LM-quality filter for
    pretraining data (gibberish and boilerplate score far from the mode).

    Model: P(w2|w1) = (c(w1,w2) + k) / (c(w1·) + k·V), add-k smoothed.
    Two grouped counts build the model (bigram and prefix totals, both
    map-side combined); scoring is one equi-join of the doc bigrams against
    the model — at 100 TB the model is corpus-wide state that never exceeds
    vocab² rows and the join key is the bigram, so no document text moves
    twice.  Per-bigram log-probs are rounded to 6dp and summed in
    decimal(18,6) (order-independent, cross-engine exact — same policy as
    BM25), then divided by the bigram count.
    """
    words_df = spread_for_compute(df).select(
        F.col(id_col), F.split(F.lower(F.col(text_col)), " ").alias("_w")
    ).filter(F.size("_w") >= 2)
    bigrams = words_df.select(
        F.col(id_col),
        F.explode(
            F.expr(
                "transform(sequence(1, size(_w) - 1), "
                "i -> struct(element_at(_w, i) AS w1, element_at(_w, i + 1) AS w2))"
            )
        ).alias("bg"),
    ).select(F.col(id_col), F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    # The exploded bigram table feeds the model counts, the vocab count AND
    # the scoring join — materialize it once instead of re-running the
    # scan+explode for each consumer (measured 1.97 s -> 1.54 s at sf0.1).
    bigrams = bigrams.localCheckpoint(eager=True)
    bigram_counts = bigrams.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    prefix_counts = bigram_counts.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = bigrams.select(F.col("w1").alias("w")).union(
        bigrams.select(F.col("w2").alias("w"))
    ).agg(F.countDistinct("w").alias("v"))
    logp = F.round(
        F.log(
            (F.col("c12") + smoothing)
            / (F.col("c1") + smoothing * F.col("v"))
        ),
        6,
    )
    return (
        bigrams.join(bigram_counts, ["w1", "w2"])
        .join(F.broadcast(prefix_counts), "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            (
                F.sum(logp.cast("decimal(18,6)")).cast("double")
                / F.count("*").cast("double")
            ).alias("avg_logprob"),
            F.count("*").alias("n_bigrams"),
        )
    )


def passage_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_words: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Overlapping word-window passages per document — the splitter feeding
    context-bounded consumers (embedding models, rerankers, RAG indexes).
    Windows of ``chunk_words`` start every ``stride`` words; the final
    window may be short; ``chunk_words - stride`` words overlap.

    All span arithmetic is integer (bit-exact oracle); the window transform
    is inlined into the explode over the materialized word split (the fast
    Generate shape, SCALE.md).  One row out per (doc, window): at 100 TB
    this is a scan-side row multiplier with no shuffle at all.
    """
    extra = (
        f"greatest(0, (size(_w) - {chunk_words} + {stride - 1}) DIV {stride})"
    )
    win = (
        f"transform(sequence(0, {extra}), c -> struct("
        f"c AS chunk_id, "
        f"concat_ws(' ', slice(_w, c * {stride} + 1, {chunk_words})) AS chunk_text, "
        f"least({chunk_words}, size(_w) - c * {stride}) AS n_words))"
    )
    return (
        spread_for_compute(df)
        .select(F.col(id_col), F.split(F.lower(F.col(text_col)), " ").alias("_w"))
        .select(F.col(id_col), F.explode(F.expr(win)).alias("_c"))
        .select(
            F.col(id_col),
            F.col("_c.chunk_id").alias("chunk_id"),
            F.col("_c.chunk_text").alias("chunk_text"),
            F.col("_c.n_words").alias("n_words"),
        )
    )


def hashed_linear_classifier(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 65536,
    steepness: float = 8.0,
) -> DataFrame:
    """FastText-shaped linear text classifier over hashed bag-of-words.

    The production shape (a fastText/logistic quality filter: hash tokens
    into a fixed bucket space, average the buckets' learned weights, squash
    through a sigmoid) with a deterministic stand-in weight table: bucket
    ``b``'s weight is the Knuth multiplicative hash ``(b * 2654435761) %
    2**20``, kept in the INTEGER domain until one final division so the
    doc score is exact under any partitioning / aggregation order.  A real
    model swaps the arithmetic weight for a broadcast ``bucket -> weight``
    lookup join — same plan shape, same cost.

    Scale shape: tokenize + hash happen inside the scan projection
    (explode is a scan-side row multiplier, no shuffle); the only shuffle
    is the map-combined ``groupBy(id)`` carrying ``(id, int sum, count)``
    — never text.  Output: ``n_tokens``, ``quality_prob`` (6dp-rounded
    sigmoid), ``keep`` (prob > 0.5).
    """
    tok = spread_for_compute(df).select(
        F.col(id_col), F.explode(words(text_col)).alias("_w")
    )
    bucket = F.conv(F.substring(F.md5("_w"), 1, 4), 16, 10).cast("long") % F.lit(
        n_buckets
    )
    m = (bucket * F.lit(2654435761)) % F.lit(1048576)
    agg = tok.groupBy(id_col).agg(
        F.sum(m).alias("_raw"), F.count("*").alias("n_tokens")
    )
    mean = F.col("_raw").cast("double") / (
        F.col("n_tokens").cast("double") * F.lit(1048576.0)
    ) - F.lit(0.5)
    prob = F.round(
        F.lit(1.0) / (F.lit(1.0) + F.exp(F.lit(-steepness) * mean)), 6
    )
    return agg.select(
        F.col(id_col),
        F.col("n_tokens"),
        prob.alias("quality_prob"),
        (prob > 0.5).alias("keep"),
    )


def char_entropy(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Shannon character entropy per document — the cheap statistical
    quality signal (gibberish and boilerplate sit at the entropy extremes).

    Stays entirely scan-side: per-doc distinct chars (≤ alphabet size) are
    counted with array expressions instead of exploding every character
    through a shuffle — at 100 TB an explode here would shuffle the whole
    corpus character-by-character.  Cross-engine exactness: terms are
    c·log2(c) rounded to 6dp (libm parity), folded in sorted-character
    order so both engines sum in the same sequence, giving bit-identical
    doubles without a decimal detour.
    """
    chars = f"split({text_col}, '')"
    counts = (
        f"transform(array_sort(array_distinct({chars})), "
        f"c -> size(filter({chars}, x -> x = c)))"
    )
    fold = (
        f"aggregate({counts}, CAST(0.0 AS DOUBLE), "
        f"(acc, c) -> acc + round(c * log2(c), 6))"
    )
    n = f"length({text_col})"
    return df.select(
        F.col(id_col),
        F.expr(n).alias("n_chars_text"),
        F.expr(
            f"CASE WHEN {n} = 0 THEN CAST(0.0 AS DOUBLE) "
            f"ELSE round(log2({n}) - {fold} / {n}, 6) END"
        ).alias("entropy_bits"),
    )
