"""Registry rotation — the driver's ~50-entry correctness window must be
spent on queries with no prior driver verdict (VERDICT.md r2 item #1)."""

from __future__ import annotations

import json

from logspout_kinesis_tests_spark.plans import REGISTRY
from logspout_kinesis_tests_spark.plans.rotation import (
    changed_since_snapshot,
    driver_verified_names,
    fingerprint,
    latest_failed_names,
    latest_rows_only_names,
    rotated,
)

WINDOW = 50  # observed driver window: CORRECTNESS_r01/r02 each hold 50 names


def _reoracled() -> set[str]:
    return {
        n
        for n in latest_rows_only_names()
        if n in REGISTRY and REGISTRY[n].oracle
    }


def test_unseen_queries_fill_driver_window():
    """Window head = latest-failed fixes first (small set needing driver
    re-confirmation), then rows-only queries that have since gained an
    oracle, then the never-verified frontier; green queries may not appear
    while any priority group still has members waiting."""
    seen = driver_verified_names()
    failed = latest_failed_names()
    reoracled = _reoracled()
    changed = changed_since_snapshot(dict(REGISTRY))
    names = list(REGISTRY)
    priority = {
        n
        for n in names
        if n not in seen or n in failed or n in reoracled or n in changed
    }
    head = names[: min(WINDOW, len(priority))]
    n_failed = sum(1 for n in names if n in failed)
    assert all(n in failed for n in head[:n_failed])
    assert all(n in priority for n in head), (
        "driver window contains green queries while unverified/failed/"
        f"re-oracled ones wait: {[n for n in head if n not in priority]}"
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


def test_rotation_promotes_reoracled_rows_only(tmp_path):
    """A query whose latest verdict was rows-only (``no_oracle``) but whose
    registry entry NOW binds an oracle jumps ahead of the unseen frontier —
    the weaker verdict is stale and the hash check is finally possible.
    Rows-only queries still WITHOUT an oracle stay filed as verified."""

    class Spec:
        def __init__(self, oracle):
            self.oracle = oracle

    ok = {"rows_match": True, "schema_match": True, "hash_match": True}
    ro = {"err": "no_oracle", "rows_match": None, "schema_match": None,
          "hash_match": None}
    reg = {
        "green": Spec("SELECT 1"),
        "gained_oracle": Spec("SELECT 2"),
        "still_rows_only": Spec(None),
        "unseen": Spec("SELECT 3"),
    }
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({"green": ok, "gained_oracle": ro, "still_rows_only": ro})
    )
    assert list(rotated(reg, repo_root=tmp_path)) == [
        "gained_oracle", "unseen", "green", "still_rows_only",
    ]
    # a later hash verdict clears the promotion; within the verified group
    # the r01 verdicts (green, still_rows_only) are now STALER than
    # gained_oracle's fresh r02 verdict, so they re-verify first
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps({"gained_oracle": ok})
    )
    assert list(rotated(reg, repo_root=tmp_path)) == [
        "unseen", "green", "still_rows_only", "gained_oracle",
    ]


def test_rotation_promotes_fingerprint_changed_greens(tmp_path):
    """A verified-green query whose oracle or builder source changed since
    the ORACLE_FPRINTS snapshot outranks untouched greens AND the unseen
    frontier: its verdict describes code that no longer exists.  Unseen
    names in the snapshot-diff are NOT promoted (they're already frontier),
    and a missing/corrupt snapshot degrades to no promotion."""

    class Spec:
        def __init__(self, oracle):
            self.oracle = oracle
            self.build = None

    ok = {"rows_match": True, "schema_match": True, "hash_match": True}
    reg = {"a": Spec("SELECT 1"), "b": Spec("SELECT 2"), "c": Spec("SELECT 3")}
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({"a": ok, "b": ok})
    )
    snap = {n: fingerprint(s) for n, s in reg.items()}
    snap["b"] = "0" * 32  # b's code changed since the snapshot
    snap["c"] = "0" * 32  # c differs too but is unseen -> frontier anyway
    (tmp_path / "ORACLE_FPRINTS.json").write_text(json.dumps(snap))
    assert changed_since_snapshot(reg, repo_root=tmp_path) == {"b", "c"}
    # b (changed green) -> c (unseen) -> a (untouched green)
    assert list(rotated(reg, repo_root=tmp_path)) == ["b", "c", "a"]
    # corrupt snapshot: no promotion, plain unseen-then-green order
    (tmp_path / "ORACLE_FPRINTS.json").write_text("not json{")
    assert list(rotated(reg, repo_root=tmp_path)) == ["c", "a", "b"]


def test_rotation_reverifies_stalest_greens_first(tmp_path):
    """Once the frontier is empty the window is regression-detection budget:
    among verified greens, the one whose LATEST verdict is oldest re-checks
    first, and within one round registration order is preserved."""
    ok = {"rows_match": True, "schema_match": True, "hash_match": True}
    reg = {"a": 1, "b": 2, "c": 3, "d": 4}
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({"c": ok, "a": ok}))
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({"b": ok, "a": ok}))
    (tmp_path / "CORRECTNESS_r03.json").write_text(json.dumps({"d": ok}))
    # latest verdicts: c->r01, a/b->r02, d->r03; registration order ties a<b
    assert list(rotated(reg, repo_root=tmp_path)) == ["c", "a", "b", "d"]


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


def test_fingerprint_sees_shared_helper_edits(tmp_path):
    """r6 ADVICE (medium): a builder that is a one-line wrapper over a
    shared helper must change its fingerprint when the HELPER changes, not
    only when its own body does — otherwise the changed-promotion tier is
    blind to the factored-helper pattern (``_theil_sen``, ``asof_join``)."""
    import sys
    import textwrap

    mod_path = tmp_path / "fpmod_helpers_case.py"
    mod_path.write_text(textwrap.dedent("""
        def helper(x):
            return x + 1

        def build(spark, sf_dir):
            return helper(2)
    """))
    sys.path.insert(0, str(tmp_path))
    try:
        import fpmod_helpers_case as m

        # make the module count as package-local for the walk
        from logspout_kinesis_tests_spark.plans import rotation

        old_prefix = rotation._PKG_PREFIX
        rotation._PKG_PREFIX = "fpmod_helpers_case"
        try:
            class Spec:
                oracle = "SELECT 1"
                build = staticmethod(m.build)

            before = fingerprint(Spec)
            # edit ONLY the helper; the wrapper body is untouched
            mod_path.write_text(mod_path.read_text().replace("x + 1", "x + 2"))
            import importlib
            import linecache

            linecache.clearcache()
            importlib.reload(m)
            Spec.build = staticmethod(m.build)
            after = fingerprint(Spec)
            assert before != after, "helper edit did not flip the fingerprint"
        finally:
            rotation._PKG_PREFIX = old_prefix
    finally:
        sys.path.remove(str(tmp_path))
        sys.modules.pop("fpmod_helpers_case", None)


def test_fingerprint_covers_registered_wrapper_helpers():
    """The real registry's known wrapper builders must gather their shared
    helpers into the fingerprint (regression pin for the recursive walk,
    including function-local ``from ..operators import`` shapes)."""
    from logspout_kinesis_tests_spark.plans.rotation import (
        _gather_referenced_sources,
    )

    expectations = {
        "c2_theil_sen": "_theil_sen",
        "c16_seasonal_decompose": "_detrended_hourly",
        "c15_asof_nearest": "asof_join",
    }
    for name, helper in expectations.items():
        parts: list[str] = []
        _gather_referenced_sources(REGISTRY[name].build, set(), parts)
        assert any(f"def {helper}" in p for p in parts), (
            f"{name} fingerprint misses shared helper {helper}"
        )


def test_changed_since_snapshot_warns_on_degraded_snapshot(tmp_path):
    """r6 ADVICE (low): a skipped gen_oracle_fprints.py run must be noisy,
    not a silent degradation of the changed-promotion tier."""
    import warnings as w

    class Spec:
        oracle = "SELECT 1"
        build = None

    reg = {f"q{i}": Spec() for i in range(20)}
    # missing file -> warn
    with w.catch_warnings(record=True) as rec:
        w.simplefilter("always")
        assert changed_since_snapshot(reg, repo_root=tmp_path) == set()
    assert any("unreadable" in str(r.message) for r in rec)
    # stale snapshot covering almost none of the registry -> warn
    (tmp_path / "ORACLE_FPRINTS.json").write_text(json.dumps({"q0": "x" * 32}))
    with w.catch_warnings(record=True) as rec:
        w.simplefilter("always")
        changed_since_snapshot(reg, repo_root=tmp_path)
    assert any("stale" in str(r.message) for r in rec)
    # complete snapshot -> quiet
    snap = {n: fingerprint(s) for n, s in reg.items()}
    (tmp_path / "ORACLE_FPRINTS.json").write_text(json.dumps(snap))
    with w.catch_warnings(record=True) as rec:
        w.simplefilter("always")
        assert changed_since_snapshot(reg, repo_root=tmp_path) == set()
    assert not rec


def test_fingerprint_resolves_function_local_relative_imports():
    """ADVICE r7: ``from ..operators.x import y`` inside a builder compiles
    to the PREFIX-LESS dotted path ('operators.x') in co_names; the walk
    must resolve it against the builder module's ancestor packages, not
    only fully-prefixed absolute paths."""
    from logspout_kinesis_tests_spark.plans.rotation import (
        _ancestor_candidates,
        _gather_referenced_sources,
    )

    # compile a builder whose __module__ sits inside the real package; the
    # relative import never runs (no job execution), only its co_names
    g = {"__name__": "logspout_kinesis_tests_spark.plans.fake_relative"}
    exec(
        "def build(spark, sf_dir):\n"
        "    from ..operators.dedup import exact_dedup\n"
        "    return exact_dedup\n",
        g,
    )
    build = g["build"]
    assert _ancestor_candidates(build, "operators.dedup") == [
        "logspout_kinesis_tests_spark.plans.operators.dedup",
        "logspout_kinesis_tests_spark.operators.dedup",
    ]
    parts: list[str] = []
    _gather_referenced_sources(build, set(), parts)
    assert any("def exact_dedup" in p for p in parts), (
        "relative function-local import was not resolved into the fingerprint"
    )


def test_no_ambiguous_function_local_relative_imports():
    """Bare-name level-1 relative imports (``from .helpers import y``)
    compile to just 'helpers' in co_names — indistinguishable from an
    attribute load, so the fingerprint walk cannot resolve them.  Forbid
    the shape package-wide (module-level relative imports are fine: their
    objects land in globals and resolve via g.get)."""
    import re
    from pathlib import Path

    import logspout_kinesis_tests_spark as pkg

    pkg_dir = Path(pkg.__file__).parent
    offenders = []
    pat = re.compile(r"^[ \t]+from\s+\.", re.MULTILINE)
    for py in sorted(pkg_dir.rglob("*.py")):
        for m in pat.finditer(py.read_text()):
            line_no = py.read_text()[: m.start()].count("\n") + 1
            offenders.append(f"{py.relative_to(pkg_dir)}:{line_no}")
    assert not offenders, (
        "function-local RELATIVE imports are invisible to the fingerprint "
        f"walk when bare (level-1); use absolute imports instead: {offenders}"
    )


def test_import_levels_read_from_bytecode():
    """Relative-import levels are recovered from the compiled bytecode
    (LOAD_CONST level; LOAD_CONST fromlist; IMPORT_NAME name), so a
    prefix-less dotted name binds to exactly the base its level names —
    a same-named shadow module at an inner package level cannot flip the
    fingerprint resolution."""
    from logspout_kinesis_tests_spark.plans.rotation import _import_levels

    src = (
        "def f():\n"
        "    from operators.x import a\n"          # absolute: level 0
        "    def g():\n"
        "        from a.b.c import d\n"            # nested code object
        "    return g\n"
    )
    code = compile(src, "<t>", "exec").co_consts[0]
    levels = _import_levels(code)
    assert levels == {"operators.x": 0, "a.b.c": 0}

    # relative levels survive compilation with a package context
    rel = compile(
        "def f():\n    from ..operators.dedup import exact_duplicates\n",
        "<t>",
        "exec",
    ).co_consts[0]
    assert _import_levels(rel) == {"operators.dedup": 2}
