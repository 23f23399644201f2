"""Registry rotation — the driver's ~50-entry correctness window must be
spent on queries with no prior driver verdict (VERDICT.md r2 item #1)."""

from __future__ import annotations

import json

from logspout_kinesis_tests_spark.plans import REGISTRY
from logspout_kinesis_tests_spark.plans.rotation import (
    driver_verified_names,
    latest_failed_names,
    rotated,
)

WINDOW = 50  # observed driver window: CORRECTNESS_r01/r02 each hold 50 names


def test_unseen_queries_fill_driver_window():
    """Window head = latest-failed fixes first (small set needing driver
    re-confirmation), then the never-verified frontier; green queries may
    not appear while either group still has members waiting."""
    seen = driver_verified_names()
    failed = latest_failed_names()
    names = list(REGISTRY)
    priority_total = sum(1 for n in names if n not in seen or n in failed)
    head = names[: min(WINDOW, priority_total)]
    n_failed = sum(1 for n in names if n in failed)
    assert all(n in failed for n in head[:n_failed])
    assert all(n not in seen or n in failed for n in head), (
        "driver window contains green queries while unverified/failed "
        f"ones wait: {[n for n in head if n in seen and n not in failed]}"
    )


def test_rotation_preserves_content_and_is_stable(tmp_path):
    reg = {"a": 1, "b": 2, "c": 3, "d": 4}
    # empty verdict dicts: seen, and counted as failed (no passing fields)
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({"a": {}, "c": {}}))
    out = rotated(reg, repo_root=tmp_path)
    assert out == reg  # same key->value mapping
    assert list(out) == ["a", "c", "b", "d"]  # failed first, original order kept
    assert list(rotated(reg, repo_root=tmp_path)) == list(out)  # deterministic


def test_rotation_requeues_latest_failures_first(tmp_path):
    """A query whose LATEST verdict hash-failed goes ahead of everything —
    its fix needs driver confirmation even when the unseen frontier alone
    would overflow the window; a fail later superseded by a pass does not
    requeue, and rows-only (no_oracle) checks are not failures."""
    ok = {"rows_match": True, "schema_match": True, "hash_match": True}
    bad = {"rows_match": True, "schema_match": True, "hash_match": False}
    reg = {"a": 1, "b": 2, "c": 3, "d": 4, "e": 5}
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({"a": ok, "b": bad, "d": bad})
    )
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps({"d": ok, "e": {"err": "no_oracle", "rows_match": None,
                                   "schema_match": None, "hash_match": None}})
    )
    assert latest_failed_names(repo_root=tmp_path) == {"b"}
    assert list(rotated(reg, repo_root=tmp_path)) == ["b", "c", "a", "d", "e"]


def test_rotation_ignores_malformed_files(tmp_path):
    (tmp_path / "CORRECTNESS_r01.json").write_text("not json{")
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps(["a", "list"]))
    assert driver_verified_names(repo_root=tmp_path) == set()


def test_union_converges():
    """Each window grows the verified union by (WINDOW - requeued fixes):
    the failed re-verifications are already in ``seen``, so they spend
    window slots without growing the union — by design."""
    seen = driver_verified_names()
    failed_requeues = len(latest_failed_names() & seen)
    names = list(REGISTRY)
    projected = len(seen | set(names[:WINDOW]))
    floor = min(len(names), len(seen) + WINDOW - failed_requeues)
    assert projected >= floor >= 130
