"""Benchmark harness — prints ONE JSON line with per-query wall times.

Contract (driver): run the headline queries at ``$SPARK_GRAFT_SF_DIR``
(default /root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and print
``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}``.

Execution forces full materialization through the noop sink (no driver-side
collect, no result-size bias).  One warmup query amortizes JVM/codegen
startup out of the timings; each query gets one untimed warmup (its own
codegen compile / shuffle-file setup), then reports the MEDIAN of
``$SPARK_GRAFT_BENCH_REPEATS`` (default 3) timed runs, so a single
GC/scheduling hiccup can't fake a regression — VERDICT r2 flagged a +26%
n=1 drift on ``c10_cosine_topk`` as unfalsifiable; medians make drift real
or gone.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

#: Headline queries: the scan/agg, join, window, ETL-serialize, dedup,
#: similarity and text-analysis paths — one per operator family.
HEADLINE = (
    "flagship_event_stats",
    "c1_filter_pushdown",
    "c2_pricing_summary",
    "c3_star_join_revenue",
    "c3_sort_merge_join",
    "c4_topk_orders",
    "c5_window_running_lag",
    "c7_tumbling_window",
    "c7_session_window",
    "a13_serialize_json_v1",
    "c8_exact_dedup",
    "c9_ngram_jaccard",
    "c9_minhash_lsh",
    "c9_winnowing",
    "c10_cosine_topk",
    "c11_text_stats",
    "c11_term_frequencies",
    "c14_dataset_split",
    "c15_asof_join",
    "c16_hypertable_rollup",
    "c8_dedup_clusters",
    "c11_tfidf",
    "c11_bm25",
    "c11_lm_score",
    "c11_repetition",
    "c8_decontaminate",
    "c14_sequence_packing",
    "c14_greedy_packing",
    "c8_semantic_dedup",
    "c20_curation_pipeline",
    "c11_passage_chunks",
    "c8_substring_dedup",
    "c8_line_dedup",
    "c8_incremental_dedup",
    "c10_quantized_topk",
    "c12_png_header_decode",
    # heavy paths added r3 (VERDICT r2 #4): multi-join TPC-H shapes, global
    # cumsum budget, interval-weighted TWAP, semantic decontamination
    "tpch_q9_product_profit",
    "tpch_q21_waiting_suppliers",
    "c14_token_budget",
    "c16_twap",
    "c8_semantic_decontaminate",
    "c10_hybrid_rrf",
    "c8_containment_decontaminate",
    "c14_leakage_safe_split",
    "c20_training_prep",
    # r3b additions: PQ ANN (codes-only ADC scan + re-rank), bounded-frame
    # rolling anomaly detection, interpolated gap fill, tolerance as-of,
    # HTML strip, Pareto share
    "c10_pq_topk",
    # r4 (VERDICT r3 #5): the amortized ANN path — search against a
    # persisted index built once per (session, sf_dir); the bench warmup
    # run pays the build, the timed repeats measure search only, which is
    # the steady-state number a 100 TB operator regression-gates.
    "c10_pq_topk_search_only",
    "c10_ivf_topk_search_only",
    "c16_rolling_zscore",
    "c16_gap_fill_interp",
    "c15_asof_tolerance",
    "c11_html_strip",
    "c2_pareto_share",
    # r4 breadth: split-scan exact column profiling, broadcast-NLJ interval
    # overlap, inverted-index novelty, single-shuffle EWMA taps
    "c2_column_profile",
    "c15_interval_overlap_join",
    "c11_ngram_novelty",
    "c16_ewma",
    # r4b breadth: Arrow-batched stateful walk (applyInPandas), explode +
    # co-partitioned term join divergence, single-scan correlation matrix
    "c16_holt_smoothing",
    "c11_kl_divergence",
    "c2_corr_matrix",
    # r4c: iterative checkpointed joins (5 PageRank rounds), two-shuffle
    # corpus report card
    "c17_pagerank",
    "c20_data_card",
    # r4d: distributed-CDF order statistics (bucket-offset KS test)
    "c2_ks_test",
    # r4e: three-table key-cardinality sweep with decimal-exact HHI
    "c2_skew_report",
    # r5 (VERDICT r4 #5): regression-gate the remaining distinct round-4
    # execution shapes — banded pigeonhole self-join over checkpointed
    # signatures (the repo's most expensive query), bounded greedy
    # Arrow-batch walk, per-series stateful CUSUM recurrence, two-pass
    # bucket-offset exact quantiles
    "c12_phash_neardup",
    "c10_mmr_rerank",
    "c16_cusum",
    "c2_percentiles_twopass",
    # r5 breadth: ×B/4 hash fan-out Poisson bootstrap (the distributed
    # resampling shape), wedge-join triangle closure, inverted-index
    # link prediction
    "c2_bootstrap_ci",
    "c17_triangle_count",
    "c17_link_prediction",
    "c16_lttb_downsample",
    # round 6
    "c16_acf_by_user",
    "c2_theil_sen",
    "c16_seasonal_decompose",
    "c16_hampel",
    "c17_kcore",
    "c17_modularity",
    "c13_cogroup_asof",
    "c20_psi_drift",
    "c2_theil_sen_by_user",
    "c2_quantile_normalize",
    "c16_seasonal_residual_outliers",
    "c5_markov_stationary",
    "c14_soft_dedup_weights",
    "c15_asof_nearest",
    "c2_winsorized_mean",
    # round 8
    "c16_ohlc_bars",
    "c2_kruskal_wallis",
    "c16_pettitt_changepoint",
    "c17_label_propagation",
    "c14_pareto_skyline",
    # round 9 — the heavier representatives of the new batch (the pure
    # bounded-table projections like candle shapes / RSI ride the same
    # hourly rollup as ohlc/bollinger and add no distinct plan shape)
    "c7_session_stats",
    "c7_session_entry_exit",
    "c20_grid_percentiles",
    "c16_bollinger_breach",
    "c2_spearman_rho",
    "c2_brown_forsythe",
    "c17_clustering_coefficient",
    "c17_degree_assortativity",
    "c11_lexical_diversity",
    "c20_vocab_coverage",
    "c14_temporal_split_days",
    "c10_knn_label_vote",
    # round 10 — distinct plan shapes of the new batch: rank-arithmetic
    # interval overlap (bucketed CDF, no pair join), 2-hop neighbor join,
    # bounded joint-table Kendall concordance, DF-rollup + broadcast term
    # monitor, ordered session funnel, mapInPandas PNG pixel decode,
    # min-by-cluster dedup-aware sampling
    "c15_session_overlap",
    "c17_two_hop_neighborhood",
    "c2_kendall_tau",
    "c20_term_monitor",
    "c7_session_funnel",
    "c12_png_pixel_stats",
    "c14_dedup_aware_sample",
    # round 11 — distinct plan shapes of the new batch: the 3-epoch
    # search-before-append dedup cascade, the 32-replicate hash-bootstrap
    # fan-out, broadcast-moment Mahalanobis scoring, triangle-support
    # rollup off the degree-ordered iterator, posexplode norm audit, and
    # the minute-bucket signed cumsum (entropy/skew/histogram/rich-club
    # ride existing rollup shapes and add no new plan)
    "c9_minhash_ingest_parity",
    "c2_cohens_d_bootstrap",
    "c2_mahalanobis_outlier",
    "c17_truss_support",
    "c10_embedding_norm_audit",
    "c16_obv",
    # the JPEG decode rides the same mapInPandas shape as the PNG row but
    # its hot loop is the pure-Python Huffman bit reader — benched so a
    # decoder regression is visible
    "c12_jpeg_pixel_stats",
    # container walk + frame sampling + per-frame JPEG decode
    "c12_video_frame_stats",
    # round 12 — cross-modal composite: two banded near-dup pair
    # generators (text inverted-index + image dHash) unioned into one
    # adaptive-CC + keep-best resolution; and the 3-epoch train-once IVF
    # recall monitor (broadcast panel probe + exact scan per epoch)
    "c8_crossmodal_keep_best",
    "c10_ann_recall_monitor",
    # round 13 — ANN index compaction parity: builds the epoch-partitioned
    # PQ index on disk, folds a copy with compact_ann_index, searches the
    # fragmented and folded index in one action (real parquet IO both ways)
    "c10_index_compaction_parity",
)


# --------------------------------------------------------------------------
# Host-state calibration (VERDICT r6 #1).
#
# Cross-round bench totals were dominated by host drift, not code: r6's
# recorded shared-query total ran 1.26× r5's with zero changes on the moved
# paths (judge idle-box A/B), which would completely mask a real 1.2× code
# regression.  Fix: before the headline loop, time a FROZEN calibration set
# of three trivial queries — defined INLINE here, never via the registry, so
# no future builder edit can move the yardstick — and report
#
#   host_factor      = calibration_total_now / _CAL_REF_TOTAL
#   value_calibrated = value / host_factor
#
# alongside the raw total.  Rounds compare ``value_calibrated``; any mover
# >1.3× CALIBRATED gets the worktree A/B treatment (SCALE.md round-6a).
# The three shapes mirror the r5-era plans of c4_topk_orders /
# c1_filter_pushdown / flagship_event_stats: a TakeOrdered scan, a
# pushed-down filter scan, and a two-shuffle agg — scheduling floor, scan
# throughput, and shuffle setup, the three axes host state moves.
# --------------------------------------------------------------------------

#: Frozen reference medians (sec), re-recorded 2026-08-16 (round 11) in
#: the NEW in-position convention: median across 3 FRESH sessions of the
#: recorded sample AFTER one full untimed calibration prewarm pass
#: (_CAL_PREWARM_PASSES, VERDICT r10 #5) — the old convention measured the
#: session-start JIT transient (same-session A/B: transient/warmed =
#: 1.2-1.5× per query, SCALE.md round-11b), which is why r9/r10 start
#: factors sat ~2× above their mid-loop samples and kept tripping
#: host_drift_within_run on a quiet box.  Quiet box, sf0.1, local[32],
#: 2 untimed warmups + median of 7 per query, recorded after the prewarm.
#: Do NOT re-record casually: a new reference resets the comparability
#: baseline and must be noted in SCALE.md with a same-session A/B against
#: the old one (as this re-pin was).
_CAL_REF = {
    "cal_topk_scan": 0.158,
    "cal_filter_scan": 0.222,
    "cal_groupby_agg": 0.241,
}
_CAL_REF_TOTAL = round(sum(_CAL_REF.values()), 3)
_CAL_REPEATS = 7
_CAL_WARMUPS = 2
#: Full untimed passes of the calibration set run BEFORE the recorded
#: session-start sample (VERDICT r10 #5) — the start sample must measure
#: the same warmed steady state the mid-loop samples see, not the JVM/JIT
#: tiering transient of the session's first seconds.
_CAL_PREWARM_PASSES = 1

#: Mid-loop calibration cadence (VERDICT r9 #6): both r9 runs tripped the
#: within-run drift warning, discarding the calibrated totals wholesale
#: because a start + end sample cannot say WHICH queries ran on the drifted
#: box.  A sample every ~25 headline queries records per-segment host
#: factors, so a mover adjudication attributes each query to its segment's
#: factor instead of throwing away the whole run.
_CAL_SEGMENT_EVERY = 25

#: Parallel-compute diagnostic probe (r14).  The three frozen calibration
#: plans are FLOOR-shaped (1-2 task waves, 0.15-0.25 s): a box that loses
#: parallel-compute throughput to a co-tenant runs the 32-core-saturated
#: headline rows 4-9× slow while host_factor still reads ~1.0 — observed
#: in the r14 pairing-A run (ngram/minhash/cosine rows 4-9×, calibration
#: 0.87-1.16 mid-loop).  This probe is a 32-partition compute-bound fold
#: (spark.range, no tables, no package helpers) whose factor is reported
#: SEPARATELY as ``parallel_factor`` — diagnostic only, never folded into
#: value_calibrated, so cross-round comparability of the calibrated
#: headline is untouched.  Reference pinned 2026-08-16 per the _CAL_REF
#: protocol: median of 3 fresh-session medians (0.445/0.401/0.428) after
#: 2 untimed prewarm passes, quiet box, local[32].
_CAL_PAR_REF = 0.428
_CAL_PAR_N = 1_600_000
#: 2 matches the reference-pinning protocol above ("after 2 untimed
#: prewarm passes") — at 1 the runtime probe ran one fewer warmup than
#: the pin, biasing parallel_sec/parallel_factor slightly high against
#: the 0.428 reference (ADVICE r14)
_CAL_PAR_WARMUPS = 2
_CAL_PAR_REPEATS = 3
#: parallel_factor this far above the same sample's host_factor means the
#: box lost parallel throughput specifically — flag the saturated rows
_PAR_DEGRADE_RATIO = 1.5


def parallel_degradation_warning(samples: list[tuple[float, float]]) -> str | None:
    """Warn when any calibration sample shows parallel-compute throughput
    degrading while the floor factor looks healthy.  ``samples`` is
    [(host_factor, parallel_factor), ...]; pure for unit-testability."""
    worst = None
    for host, par in samples:
        if par is None:
            continue
        ratio = par / max(host, 1e-9)
        if ratio >= _PAR_DEGRADE_RATIO and (worst is None or ratio > worst[2]):
            worst = (host, par, ratio)
    if worst is None:
        return None
    return (
        f"parallel-compute probe factor {worst[1]} vs floor host_factor "
        f"{worst[0]} (x{round(worst[2], 2)}): the box is losing SATURATED "
        "throughput (co-tenant?) that the floor-shaped calibration cannot "
        "see — treat this run's compute-heavy movers as suspect and "
        "re-pair on a quiet box"
    )


def quotable_verdict(
    yardstick_msg: str | None, drift_msg: str | None, par_msg: str | None
) -> bool:
    """Machine-readable run-quality verdict (VERDICT r14 #4): the r14
    pairing-A cycle was burned diagnosing a degraded-box run post-hoc even
    though the probes had fired in-run.  A run is quotable for ratio
    pairings / cross-round mover tables ONLY when none of the three box
    diagnostics tripped: the yardstick band (the BOX moved vs the frozen
    reference), within-run drift (the box turned mid-run), and the
    parallel-compute probe (saturated throughput lost to a co-tenant while
    the floor calibration read healthy).  SCALE.md's multi-pairing protocol
    keys off this flag instead of judgment."""
    return yardstick_msg is None and drift_msg is None and par_msg is None


#: host_factor band outside which the frozen yardstick itself is suspect
#: (VERDICT r7 #5): calibration corrects same-box drift (observed class
#: ~1.25×), but a factor this far from 1.0 means the BOX changed — the
#: arithmetic would still "work" while silently rescaling every total, so
#: warn that _CAL_REF needs re-recording per its own comment's discipline.
_HOST_FACTOR_BAND = (0.6, 1.6)

#: Queries benched with extra repeats (VERDICT r7 #1): the heavy
#: ANN/iterative family's same-code spread is large enough (observed
#: 1.33–1.7× between same-round sessions, SCALE.md round-8a) that
#: median-of-3 noise can trip the 1.3× calibrated-mover tripwire.
_HEAVY_REPEATS = 7
_HEAVY = frozenset(
    {
        "c10_pq_topk",
        "c10_pq_topk_search_only",
        "c10_ivf_topk_search_only",
        "c12_phash_neardup",
        "c17_pagerank",
        # widest same-code spread outside the ANN set (2.8-3.9 s across the
        # r6-r8 driver runs) — median-of-7 keeps it off the 1.3x wire
        "c16_hampel",
        # 12-checkpoint sequential cascade: per-job scheduler jitter
        # compounds across the epoch chain (same-code within-run spread
        # 5.0-6.5 s at r12, still descending at run 3) — median-of-7
        # reaches the steady state median-of-3 misses
        "c9_minhash_ingest_parity",
        # real parquet writes + copytree + staged-swap folds: filesystem
        # jitter gives a 1.4x same-code spread (5.4-7.5 s observed r13)
        "c10_index_compaction_parity",
    }
)


def segment_boundaries(n_queries: int, every: int = _CAL_SEGMENT_EVERY) -> list[int]:
    """Headline-loop indices at which a mid-loop calibration sample runs
    (VERDICT r9 #6).  A sample fires BEFORE query ``i`` for every non-zero
    multiple of ``every`` — so query i belongs to the segment whose sample
    preceded it, and start/mid.../end factors tile the whole loop.  Pure
    function for unit-testability (tests/test_bench_contract.py)."""
    return [i for i in range(1, n_queries) if i % every == 0]


def assign_segment_factors(
    n_queries: int,
    start_factor: float,
    mid_segments: list[dict],
    end_factor: float,
) -> list[float]:
    """Per-query host factors from the calibration samples that bracketed
    each query (VERDICT r11 #4): the start sample sits at loop position 0,
    each mid sample at its ``after_index`` (it fired BEFORE that query),
    and the end sample at position ``n_queries``.  Query ``i`` (center
    ``i + 0.5``) takes the factor of the NEAREST sample — earlier sample on
    ties — so a box that turns mid-run reprices only the queries that
    actually ran on the turned box, instead of the start factor silently
    repricing the whole loop.  Pure function for unit-testability."""
    samples: list[tuple[float, float]] = [(0.0, start_factor)]
    samples += [(float(s["after_index"]), s["host_factor"]) for s in mid_segments]
    samples.append((float(n_queries), end_factor))
    out = []
    for i in range(n_queries):
        center = i + 0.5
        best = min(samples, key=lambda s: (abs(s[0] - center), s[0]))
        out.append(best[1])
    return out


def drift_warning(start_factor: float, end_factor: float, loop_secs: float) -> str | None:
    """Warning when the host factor moved materially DURING the headline
    loop (within-run drift band [0.8, 1.25] on end/start).  Pure function
    for unit-testability, like :func:`yardstick_warning`."""
    if start_factor <= 0:
        return None
    drift = end_factor / start_factor
    if 0.8 <= drift <= 1.25:
        return None
    return (
        f"host_factor moved {start_factor} -> {end_factor} during the "
        f"{round(loop_secs)}s headline loop (x{round(drift, 3)}); "
        "value_calibrated assumes a stable box — treat this run's movers "
        "as suspect and prefer the per-query spread."
    )


def yardstick_warning(host_factor: float) -> str | None:
    """Return a warning when ``host_factor`` falls outside the band where
    calibration is correcting drift rather than papering over a box swap.

    None inside ``_HOST_FACTOR_BAND``; a human-readable message outside it.
    Kept as a pure function so the band logic is unit-testable without a
    Spark session (tests/test_bench_contract.py).
    """
    lo, hi = _HOST_FACTOR_BAND
    if lo <= host_factor <= hi:
        return None
    return (
        f"host_factor {host_factor} is outside [{lo}, {hi}]: the frozen "
        "_CAL_REF medians no longer describe this host — the calibration "
        "yardstick itself has moved (box swap or major host change). "
        "value_calibrated is still arithmetically consistent but is being "
        "rescaled by the whole factor; re-record _CAL_REF on the new box "
        "(3 fresh-session medians, quiet box) and note the re-pin in "
        "SCALE.md with a same-session A/B against the old reference."
    )


def compact_headline(
    value: float, n_queries: int, sf: float | None, start_factor: float
) -> dict:
    """The compact final-line JSON dict (pure, unit-testable).

    ``value_calibrated_segmented`` — the HEADLINE metric rounds compare
    (VERDICT r12 #4) — is appended by ``main`` once the mid/end calibration
    samples exist; ``headline_basis`` names it up front so a reader of any
    single artifact knows which figure is authoritative.
    ``value_calibrated`` (raw / session-start host factor) is the LEGACY
    r6-r12 normalization, kept for cross-round continuity: on a drifting
    box it misprices every query that ran after the box turned (r12's
    driver run: 115.6 start-basis vs 148.1 segmented in the same run).
    """
    return {
        "metric": "headline query wall time (noop sink, warm session)",
        "value": value,
        "unit": "sec",
        "n_queries": n_queries,
        "sf": sf,
        "host_factor": start_factor,
        "value_calibrated": round(value / start_factor, 3),
        "headline_basis": "value_calibrated_segmented",
    }


def _calibration_builders():
    """Three frozen trivial plans, self-contained (plain ``spark.read`` +
    ``pyspark.sql.functions``, no package helpers — helper edits must not
    move the yardstick)."""
    from pyspark.sql import functions as F

    def cal_topk_scan(spark, sf_dir):
        o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
        return (
            o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
            .limit(10)
            .select("o_orderkey", "o_custkey", "o_totalprice")
        )

    def cal_filter_scan(spark, sf_dir):
        li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        return li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        ).select(
            "l_orderkey",
            "l_partkey",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
        )

    def cal_groupby_agg(spark, sf_dir):
        ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        return ev.groupBy("event_type").agg(
            F.count("*").alias("n_events"),
            F.count_distinct(F.col("user_id")).alias("n_users"),
            F.sum("value").alias("total_value"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )

    return {
        "cal_topk_scan": cal_topk_scan,
        "cal_filter_scan": cal_filter_scan,
        "cal_groupby_agg": cal_groupby_agg,
    }


def _run_calibration(spark, sf_dir, builders=None, prewarm_passes: int = 0) -> dict:
    """Median-of-``_CAL_REPEATS`` (7) timings for the frozen set + the
    derived host factor.

    ``prewarm_passes`` runs that many full UNTIMED passes of the whole set
    first (VERDICT r10 #5): the session-start sample otherwise lands inside
    the JVM/JIT warm-up transient — r10's start factor read 1.067 against
    four stable mid-loop samples at 0.50-0.65, tripping
    ``host_drift_within_run`` on a quiet box.  Per-query ``_CAL_WARMUPS``
    can't fix that (they run inside the same first-seconds window); a full
    extra pass pushes the recorded sample past the tiering cliff.
    ``builders`` is injectable for the bench-contract test (injected
    builders skip the parallel-compute probe: fake sessions can't run
    it)."""
    injected = builders is not None
    if builders is None:
        builders = _calibration_builders()
    for _ in range(prewarm_passes):
        for name, build in builders.items():
            for _ in range(_CAL_WARMUPS + _CAL_REPEATS):
                build(spark, sf_dir).write.format("noop").mode("overwrite").save()
    cal: dict[str, float] = {}
    for name, build in builders.items():
        for _ in range(_CAL_WARMUPS):
            build(spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs = []
        for _ in range(_CAL_REPEATS):
            t0 = time.perf_counter()
            build(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        cal[name] = round(statistics.median(runs), 3)
    total = round(sum(cal.values()), 3)
    # host_factor = MEDIAN of per-query now/ref ratios, not the total
    # ratio: a single-query hiccup (observed: one 2.0x outlier while the
    # other two sat at 1.15x) would otherwise shift the factor by the
    # outlier's weight; the median needs 2 of 3 frozen queries to move
    # before the factor does, which is what genuine host drift looks like
    ratios = sorted(cal[name] / _CAL_REF[name] for name in cal)
    out = {
        "queries": cal,
        "total": total,
        "ref_total": _CAL_REF_TOTAL,
        "ref_queries": _CAL_REF,
        "per_query_ratio": {n: round(cal[n] / _CAL_REF[n], 3) for n in cal},
        "host_factor": round(ratios[len(ratios) // 2], 3),
    }
    if not injected:
        # saturated-throughput diagnostic (r14) — real runs only; the
        # contract tests inject fake builders/sessions that can't run it
        from pyspark.sql import functions as F

        def par(spark_):
            return (
                spark_.range(0, _CAL_PAR_N, 1, 32)
                .select(
                    F.aggregate(
                        F.sequence(F.lit(1), F.lit(32)),
                        F.lit(0.0),
                        lambda acc, x: acc + F.sin(x * F.col("id")),
                    ).alias("s")
                )
                .agg(F.sum("s").alias("total"))
            )

        for _ in range(_CAL_PAR_WARMUPS):
            par(spark).write.format("noop").mode("overwrite").save()
        runs = []
        for _ in range(_CAL_PAR_REPEATS):
            t0 = time.perf_counter()
            par(spark).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        out["parallel_sec"] = round(statistics.median(runs), 3)
        out["parallel_factor"] = round(out["parallel_sec"] / _CAL_PAR_REF, 3)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from logspout_kinesis_tests_spark.plans import REGISTRY
    from logspout_kinesis_tests_spark.session import get_spark

    spark = get_spark(app_name="bench")

    # warmup: JVM, codegen, parquet footer caches
    REGISTRY["c4_topk_orders"].build(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    # host-state index FIRST (frozen plans, registry-independent);
    # _CAL_PREWARM_PASSES full untimed passes put the recorded start
    # sample past the session-start JIT transient (VERDICT r10 #5)
    calibration = _run_calibration(spark, sf_dir, prewarm_passes=_CAL_PREWARM_PASSES)
    run_started = time.perf_counter()

    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    timings: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    # per-segment host factors (VERDICT r9 #6): one calibration sample per
    # _CAL_SEGMENT_EVERY headline queries; each entry says which factor was
    # live while its segment's queries ran
    segments: list[dict] = []
    boundaries = set(segment_boundaries(len(HEADLINE)))
    cal_secs = 0.0  # mid-sample time, excluded from the reported loop span
    for i, name in enumerate(HEADLINE):
        if i in boundaries:
            c0 = time.perf_counter()
            seg = _run_calibration(spark, sf_dir)
            cal_secs += time.perf_counter() - c0
            segments.append(
                {
                    "after_index": i,
                    "after_query": HEADLINE[i - 1],
                    "host_factor": seg["host_factor"],
                    "parallel_factor": seg.get("parallel_factor"),
                    "queries": seg["queries"],
                }
            )
        build = REGISTRY[name].build
        # one untimed warmup: per-query codegen compile + shuffle-file setup
        # otherwise lands in the median (5-run probes show first runs 2-3×
        # the steady state on shuffle-heavy queries) — the driver grades
        # steady-state throughput, not compile latency
        build(spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs = []
        n = max(repeats, _HEAVY_REPEATS) if name in _HEAVY else repeats
        for _run in range(n):
            t0 = time.perf_counter()
            build(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(runs), 3)
        spread[name] = [round(r, 3) for r in runs]

    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:  # custom SPARK_GRAFT_SF_DIR not named sf<N>
        sf = None
    # Full per-query JSON first, compact headline line LAST: the driver
    # keeps only the stdout tail, and the 70+-entry queries dict once grew
    # the single line past the capture window, truncating the line head and
    # losing the headline value (BENCH_r05 "parsed": null).  The final line
    # is ~150 bytes and always survives tail capture intact.
    value = round(sum(timings.values()), 3)
    headline = compact_headline(value, len(timings), sf, calibration["host_factor"])
    warning = yardstick_warning(calibration["host_factor"])
    if warning is not None:
        # stderr keeps the stdout JSON-line contract intact; the full
        # artifact also records it so the judge sees a moved yardstick
        print(f"WARNING: {warning}", file=sys.stderr)
    # Second calibration AFTER the headline loop (r8): five same-code runs
    # in one day spanned raw 71.0-97.0 s with start-factors ANTI-correlated
    # to the raw totals — the box state can move during the multi-minute
    # loop itself, which a single start-of-run sample cannot see.
    # value_calibrated's definition is unchanged (start factor, for
    # cross-round comparability); the end factor and the within-run drift
    # ratio are recorded so a mover adjudication can tell "slow box all
    # run" from "box turned mid-run".
    calibration_end = _run_calibration(spark, sf_dir)
    drift = round(
        calibration_end["host_factor"] / calibration["host_factor"], 3
    )
    drift_msg = drift_warning(
        calibration["host_factor"],
        calibration_end["host_factor"],
        time.perf_counter() - run_started - cal_secs,
    )
    if drift_msg is not None:
        print(f"WARNING: {drift_msg}", file=sys.stderr)
    # segment-corrected per-query medians (VERDICT r11 #4): each query
    # divided by the factor of the calibration sample nearest to it in loop
    # position, so round-over-round mover tables survive within-run drift.
    # value_calibrated_segmented is the HEADLINE total (VERDICT r12 #4);
    # value_calibrated keeps its start-factor definition as a legacy field
    # for r6-r12 cross-round continuity.
    factors = assign_segment_factors(
        len(HEADLINE), calibration["host_factor"], segments,
        calibration_end["host_factor"],
    )
    queries_calibrated = {
        name: round(timings[name] / factors[i], 3)
        for i, name in enumerate(HEADLINE)
    }
    headline["value_calibrated_segmented"] = round(
        sum(queries_calibrated.values()), 3
    )
    par_samples = [
        (calibration["host_factor"], calibration.get("parallel_factor")),
        *[(s["host_factor"], s.get("parallel_factor")) for s in segments],
        (calibration_end["host_factor"], calibration_end.get("parallel_factor")),
    ]
    par_msg = parallel_degradation_warning(par_samples)
    if par_msg is not None:
        print(f"WARNING: {par_msg}", file=sys.stderr)
    headline["quotable"] = quotable_verdict(warning, drift_msg, par_msg)
    full = {
        **headline,
        "queries": timings,
        "queries_calibrated": queries_calibrated,
        "spread": spread,
        "calibration": calibration,
        "calibration_mid": segments,
        "calibration_end": calibration_end,
        "host_drift_within_run": drift,
        **({"calibration_warning": warning} if warning else {}),
        **({"parallel_warning": par_msg} if par_msg else {}),
    }
    print(json.dumps(full))
    # local artifact with the per-query detail, for cross-round comparisons
    # independent of what the driver's capture keeps
    try:
        out = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json"
        )
        with open(out, "w") as fh:
            json.dump(full, fh, indent=1)
    except OSError:
        pass
    print(json.dumps(headline))


if __name__ == "__main__":
    main()
