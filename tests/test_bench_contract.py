"""bench.py contract gates that need no Spark session.

The calibration block (bench.py, VERDICT r6 #1) corrects same-box host
drift by dividing raw totals by ``host_factor``; VERDICT r7 flagged that a
factor persistently far from 1.0 means the FROZEN reference itself is
describing a different machine — the arithmetic still "works" while
silently rescaling every total by the whole factor.  ``yardstick_warning``
is the pure-function guard for that band; these tests pin it with fake
references so a box swap can't pass silently.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


@pytest.mark.parametrize("factor", [0.6, 0.8, 1.0, 1.25, 1.6])
def test_yardstick_silent_inside_band(factor):
    # drift the calibration is DESIGNED to absorb (observed class ~1.25×)
    assert bench.yardstick_warning(factor) is None


@pytest.mark.parametrize("factor", [0.2, 0.59, 1.61, 3.0])
def test_yardstick_warns_outside_band(factor):
    msg = bench.yardstick_warning(factor)
    assert msg is not None
    # the message must name the remedy: re-record _CAL_REF, note in SCALE.md
    assert "_CAL_REF" in msg and "SCALE.md" in msg
    assert str(factor) in msg


def test_parallel_degradation_silent_when_healthy():
    # factors moving TOGETHER (plain box drift) must not trip the
    # saturated-throughput warning, nor must missing probes (injected
    # builders skip it → parallel_factor None)
    assert bench.parallel_degradation_warning([]) is None
    assert bench.parallel_degradation_warning([(1.0, 1.1), (1.2, 1.3)]) is None
    assert bench.parallel_degradation_warning([(1.0, None), (0.9, 1.2)]) is None


def test_parallel_degradation_warns_on_co_tenant_signature():
    # the r14 pairing-A shape: floor calibration ~1.0 while saturated
    # throughput collapses — exactly what the probe exists to catch
    msg = bench.parallel_degradation_warning([(1.0, 1.05), (0.94, 3.2)])
    assert msg is not None
    assert "SATURATED" in msg and "3.2" in msg and "0.94" in msg
    # worst sample wins when several trip
    msg2 = bench.parallel_degradation_warning([(1.0, 1.6), (1.0, 4.0)])
    assert "4.0" in msg2


def test_quotable_verdict_keys_off_all_three_diagnostics():
    """VERDICT r14 #4: the emitted JSON carries quotable=false whenever ANY
    box diagnostic fired (yardstick band, within-run drift, parallel
    probe), so the multi-pairing protocol keys off the flag instead of a
    post-hoc judgment call."""
    assert bench.quotable_verdict(None, None, None) is True
    assert bench.quotable_verdict("yardstick moved", None, None) is False
    assert bench.quotable_verdict(None, "drift", None) is False
    assert bench.quotable_verdict(None, None, "saturated loss") is False
    assert bench.quotable_verdict("a", "b", "c") is False
    # the probe's own warmup count must match its pinning protocol
    # (ADVICE r14: _CAL_PAR_REF was pinned after 2 untimed passes)
    assert bench._CAL_PAR_WARMUPS == 2


def test_heavy_family_is_a_headline_subset():
    # a heavy entry not in HEADLINE would silently never get its 7 repeats
    missing = bench._HEAVY - set(bench.HEADLINE)
    assert not missing, f"_HEAVY entries not benched at all: {sorted(missing)}"


def test_calibration_docstring_matches_repeats():
    # ADVICE r7: the stated methodology must match _CAL_REPEATS
    doc = bench._run_calibration.__doc__ or ""
    assert "_CAL_REPEATS" in doc or str(bench._CAL_REPEATS) in doc


@pytest.mark.parametrize("start,end", [(1.0, 1.0), (1.0, 1.2), (1.0, 0.85)])
def test_drift_silent_inside_band(start, end):
    assert bench.drift_warning(start, end, 300.0) is None


@pytest.mark.parametrize("start,end", [(1.0, 1.3), (1.0, 0.7), (0.736, 1.176)])
def test_drift_warns_outside_band(start, end):
    # r8's observed day: same-code factors swung 0.736 <-> 1.176
    msg = bench.drift_warning(start, end, 500.0)
    assert msg is not None and "spread" in msg


def test_segment_boundaries_tile_the_headline_loop():
    # VERDICT r9 #6: mid-loop calibration samples every _CAL_SEGMENT_EVERY
    # queries — no boundary at 0 (that's the start sample), none at/after
    # the end (that's calibration_end), and every headline query falls in
    # exactly one [prev_boundary, next_boundary) segment.
    n = len(bench.HEADLINE)
    bounds = bench.segment_boundaries(n)
    assert bounds == sorted(set(bounds))
    assert all(0 < b < n for b in bounds)
    assert all(b % bench._CAL_SEGMENT_EVERY == 0 for b in bounds)
    # the current headline list is long enough that the feature is live
    assert len(bounds) == (n - 1) // bench._CAL_SEGMENT_EVERY >= 3


def test_segment_boundaries_small_loop_is_unsegmented():
    assert bench.segment_boundaries(10) == []
    assert bench.segment_boundaries(25) == []
    assert bench.segment_boundaries(26) == [25]


def test_assign_segment_factors_nearest_sample_wins():
    # VERDICT r11 #4: 10 queries, one mid sample before query 5, end sample
    # at 10.  Query centers 0.5/1.5 are nearest the start sample (pos 0),
    # 2.5 ties start vs mid → earlier sample (start) wins, 3.5..6.5 are
    # nearest the mid (pos 5), 7.5 ties mid vs end → mid wins, 8.5/9.5 are
    # nearest the end (pos 10).
    f = bench.assign_segment_factors(
        10, 1.0, [{"after_index": 5, "host_factor": 2.0}], 4.0
    )
    assert f == [1.0, 1.0, 1.0] + [2.0] * 5 + [4.0, 4.0]


def test_assign_segment_factors_no_mids_splits_start_end():
    # without mid samples the loop's first half prices at the start factor,
    # the second half at the end factor
    f = bench.assign_segment_factors(4, 1.0, [], 2.0)
    assert f == [1.0, 1.0, 2.0, 2.0]
    # a stable box yields a constant factor regardless of segmentation
    assert set(bench.assign_segment_factors(7, 1.1, [], 1.1)) == {1.1}


def test_assign_segment_factors_covers_headline_length():
    n = len(bench.HEADLINE)
    mids = [
        {"after_index": b, "host_factor": 1.0}
        for b in bench.segment_boundaries(n)
    ]
    assert len(bench.assign_segment_factors(n, 1.0, mids, 1.0)) == n


def test_calibration_prewarm_runs_untimed_full_passes():
    """VERDICT r10 #5: the recorded session-start sample must sit PAST the
    JIT warm-up transient — ``prewarm_passes`` full untimed passes of the
    whole set run first, and only the post-prewarm runs reach the medians.
    Driven with injected builders (no Spark session): a fake whose first
    full-set pass is 'slow' must not move the recorded median."""
    calls: list[str] = []

    class _Save:
        def save(self):  # terminal of the write chain
            pass

    class _Mode:
        def mode(self, _):
            return _Save()

    class _Write:
        def format(self, _):
            return _Mode()

    class _DF:
        write = _Write()

    def mk(name):
        def build(spark, sf_dir):
            calls.append(name)
            return _DF()
        return build

    builders = {n: mk(n) for n in bench._CAL_REF}
    out = bench._run_calibration(None, None, builders=builders, prewarm_passes=1)
    per_query = bench._CAL_WARMUPS + bench._CAL_REPEATS
    # one full untimed pass + the recorded pass = 2x per-query runs each
    assert len(calls) == 2 * per_query * len(builders)
    # prewarm covers the WHOLE set before any recorded run: the first
    # per_query*len calls are the prewarm pass in builder order
    assert calls[: per_query * len(builders)] == [
        n for n in builders for _ in range(per_query)
    ]
    assert set(out["queries"]) == set(bench._CAL_REF)


def test_compact_headline_is_segmented_basis():
    """VERDICT r12 #4: the headline metric is the segmented figure; the
    start-factor number stays only as the legacy ``value_calibrated``."""
    h = bench.compact_headline(100.0, 120, 0.1, 1.25)
    assert h["headline_basis"] == "value_calibrated_segmented"
    assert h["value_calibrated"] == 80.0  # legacy start-basis, still present
    assert h["value"] == 100.0 and h["host_factor"] == 1.25
    # main() appends the segmented total to THIS dict before printing both
    # the full artifact and the compact final line, so the key must not be
    # pre-filled with a stale/placeholder value here
    assert "value_calibrated_segmented" not in h


def test_start_sample_is_prewarmed():
    # the constant main() passes to the session-start sample; 0 would
    # silently restore the r9/r10 transient-starts
    assert bench._CAL_PREWARM_PASSES >= 1
