"""Driver-window rotation for the query registry.

The driver's correctness harness emits verdicts for roughly the first 50
entries of ``queries()`` in iteration order (CORRECTNESS_r01/r02 each hold
exactly the first 50 names of the then-current registry).  With far more
registered queries than the window holds, a static order starves everything
registered late: after round 2, 55 queries — the whole TPC-H suite, C15
temporal joins, C16 sketches, most C14 sampling — had local oracle parity
but no driver verdict.

Fix: at import time, scan the repo root for ``CORRECTNESS_r*.json`` and
reorder the registry so the window is spent where a verdict is worth most:

1. queries whose **latest** verdict was a hash/row/schema FAIL — a fix has
   presumably landed and needs driver confirmation.  These outrank the
   frontier: a standing red row misrepresents a fixed engine, and the
   failed set is small (≤8 historically) while the unseen frontier can
   exceed the window whenever a round registers new queries — which would
   otherwise push the fixes out of the window entirely;
2. verified queries whose oracle SQL or builder source **changed since the
   last driver verify** (md5 fingerprints vs the committed
   ``ORACLE_FPRINTS.json`` snapshot): their green verdicts describe code
   that no longer exists, so they need re-verification more than any
   still-untouched green.  The snapshot is regenerated at ROUND START from
   the round-start HEAD (``scripts/gen_oracle_fprints.py``) — i.e. the
   exact state the previous verify ran against — so mid-round edits show
   up as changed until the next round re-snapshots;
3. queries with **no driver verdict in any prior round** (the frontier);
4. everything already verified green (or justified rows-only), ordered
   **oldest latest-verdict first**: once the frontier is empty the window
   becomes pure regression-detection budget, and a green last checked in
   round 1 has survived several rounds of refactoring unverified — worth a
   slot before a green re-confirmed last round.

Within groups 1–3 the original registration order is preserved; group 4
orders by (latest-verdict round, registration order).  The rotation is
deterministic for a given set of CORRECTNESS files — reruns within a round
see the same order — and the union of verdicts converges to the full
registry with no manual bookkeeping, then cycles through the greens
oldest-first.
"""

from __future__ import annotations

import json
from pathlib import Path

# repo root = parent of the package directory (plans/ -> package -> repo)
_REPO_ROOT = Path(__file__).resolve().parent.parent.parent


def _verdicts_by_round(root: Path) -> list[dict]:
    """Parsed CORRECTNESS_r*.json payloads in round order."""
    out = []
    for path in sorted(root.glob("CORRECTNESS_r*.json")):
        try:
            data = json.loads(path.read_text())
        except (OSError, json.JSONDecodeError):
            continue
        if isinstance(data, dict):
            out.append(data)
    return out


def driver_verified_names(repo_root: Path | None = None) -> set[str]:
    """Names that received ANY driver verdict (pass, fail, or rows-only)
    in a prior round's CORRECTNESS_r*.json.  Presence in the file is what
    matters: it proves the name was inside the driver's window."""
    seen: set[str] = set()
    for data in _verdicts_by_round(repo_root or _REPO_ROOT):
        seen.update(data.keys())
    return seen


def latest_failed_names(repo_root: Path | None = None) -> set[str]:
    """Names whose most recent driver verdict was a FAIL (rows, schema, or
    hash mismatch; a rows-only ``no_oracle`` check is not a fail)."""
    latest: dict[str, bool] = {}
    for data in _verdicts_by_round(repo_root or _REPO_ROOT):
        for name, v in data.items():
            if not isinstance(v, dict):
                continue
            if v.get("err") == "no_oracle":
                latest[name] = False
                continue
            latest[name] = not (
                v.get("rows_match") and v.get("schema_match") and v.get("hash_match")
            )
    return {name for name, failed in latest.items() if failed}


def latest_rows_only_names(repo_root: Path | None = None) -> set[str]:
    """Names whose most recent driver verdict was a rows-only ``no_oracle``
    check.  If the registry has SINCE gained an oracle for such a name, the
    weaker verdict is stale and a hash verdict is worth a window slot."""
    latest: dict[str, bool] = {}
    for data in _verdicts_by_round(repo_root or _REPO_ROOT):
        for name, v in data.items():
            if isinstance(v, dict):
                latest[name] = v.get("err") == "no_oracle"
    return {name for name, rows_only in latest.items() if rows_only}


#: Committed per-name fingerprint snapshot, regenerated each round start
#: from the round-start HEAD by ``scripts/gen_oracle_fprints.py``.
FPRINT_FILE = "ORACLE_FPRINTS.json"


#: Package prefix bounding the recursive source walk — only helpers defined
#: inside this package count toward a builder's fingerprint (stdlib/pyspark
#: churn must not flip prints).
_PKG_PREFIX = __name__.split(".")[0]


def _collect_code_names(code) -> set[str]:
    """All global names referenced by a code object, including nested code
    objects (comprehensions, lambdas, inner defs)."""
    import types

    names: set[str] = set()
    stack = [code]
    while stack:
        c = stack.pop()
        names.update(c.co_names)
        for const in c.co_consts:
            if isinstance(const, types.CodeType):
                stack.append(const)
    return names


def _import_levels(code) -> dict:
    """Map imported dotted names → their relative-import level, read from
    the bytecode itself (the compile pattern is ``LOAD_CONST level;
    LOAD_CONST fromlist; IMPORT_NAME name``), recursing into nested code
    objects.  This pins a prefix-less name like ``operators.x`` to the ONE
    base its level binds to, so a future same-named shadow module at an
    inner package level cannot flip fingerprints silently."""
    import dis
    import types

    levels: dict = {}
    stack = [code]
    while stack:
        c = stack.pop()
        instrs = list(dis.get_instructions(c))
        for i, ins in enumerate(instrs):
            if ins.opname == "IMPORT_NAME" and i >= 2:
                lvl = instrs[i - 2]
                if lvl.opname == "LOAD_CONST" and isinstance(lvl.argval, int):
                    levels[ins.argval] = lvl.argval
        for const in c.co_consts:
            if isinstance(const, types.CodeType):
                stack.append(const)
    return levels


def _ancestor_candidates(fn, dotted: str) -> list:
    """Package-local module paths a prefix-less dotted import name could
    resolve to, tried innermost-first: for a builder in
    ``<pkg>.plans.x`` and name ``operators.dedup``, yields
    ``<pkg>.plans.operators.dedup`` then ``<pkg>.operators.dedup``."""
    out = []
    base = (getattr(fn, "__module__", "") or "").rsplit(".", 1)[0]
    while base.startswith(_PKG_PREFIX):
        out.append(f"{base}.{dotted}")
        if base == _PKG_PREFIX:
            break
        base = base.rsplit(".", 1)[0]
    return out


def _gather_referenced_sources(fn, seen: set, parts: list) -> None:
    """Recursively append the source of package-local callables that ``fn``
    references through its globals.  Two lookup shapes are covered: a direct
    global (``_theil_sen(...)``) and attribute access on a package module
    (``temporal.asof_join(...)`` — the module and the attribute both appear
    in ``co_names``).  Classes are hashed by their own source but not
    recursed (their methods' helpers are a depth this registry doesn't use).
    """
    import inspect

    import importlib

    code = getattr(fn, "__code__", None)
    g = getattr(fn, "__globals__", None)
    if code is None or g is None:
        return
    names = _collect_code_names(code)
    levels = _import_levels(code)
    for name in sorted(names):
        obj = g.get(name)
        if obj is None and "." in name:
            # function-local imports compile to the dotted module path in
            # co_names with the imported names as attribute loads.  An
            # ABSOLUTE ``from logspout_kinesis_tests_spark.operators.x
            # import y`` appears fully prefixed; a RELATIVE ``from
            # ..operators.x import y`` compiles to the PREFIX-LESS path
            # ('operators.x' — the compiler strips the dots, the level
            # lives in the bytecode argument).  The level IS recovered from
            # the bytecode (``_import_levels``) and pins the name to the
            # ONE base it binds to; the ancestor-package walk is only the
            # fallback for names whose IMPORT_NAME wasn't preceded by a
            # constant level (never the case for CPython source).  IMPORT the
            # module (not sys.modules.get: lazily-imported modules would
            # make the fingerprint depend on what ran before, flipping
            # prints between a fresh interpreter and one that already
            # built queries).  Bare-name level-1 relative imports
            # (``from .helpers import y`` → just 'helpers' in co_names)
            # stay ambiguous against attribute loads — a lint in
            # tests/test_rotation.py forbids those in builder modules.
            lvl = levels.get(name, 0)
            if name.startswith(_PKG_PREFIX + "."):
                candidates = [name]
            elif lvl > 0:
                # a level-N import binds to the module's __package__
                # trimmed by N-1 (NOT __module__ trimmed by N: for a
                # builder in a package __init__, __module__ ==
                # __package__ and the rsplit would land one level too
                # high).  Keep the ancestor walk as fallback so a failed
                # import never silently drops the module from the print.
                pkg = (getattr(fn, "__globals__", {}) or {}).get("__package__")
                if not pkg:
                    pkg = (getattr(fn, "__module__", "") or "").rsplit(".", 1)[0]
                base = pkg.rsplit(".", lvl - 1)[0] if lvl > 1 else pkg
                candidates = [f"{base}.{name}"] if base else []
                candidates += [
                    c for c in _ancestor_candidates(fn, name) if c not in candidates
                ]
            else:
                candidates = _ancestor_candidates(fn, name)
            for cand in candidates:
                try:
                    obj = importlib.import_module(cand)
                    break
                except ImportError:
                    obj = None
        if obj is None:
            continue
        targets = []
        if inspect.ismodule(obj):
            if (getattr(obj, "__name__", "") or "").startswith(_PKG_PREFIX):
                targets = [
                    getattr(obj, attr)
                    for attr in sorted(names)
                    if attr != name and hasattr(obj, attr)
                ]
        elif inspect.isfunction(obj) or inspect.isclass(obj):
            if (getattr(obj, "__module__", "") or "").startswith(_PKG_PREFIX):
                targets = [obj]
        for t in targets:
            if not (inspect.isfunction(t) or inspect.isclass(t)):
                continue
            if not (getattr(t, "__module__", "") or "").startswith(_PKG_PREFIX):
                continue
            key = (getattr(t, "__module__", ""), getattr(t, "__qualname__", repr(t)))
            if key in seen:
                continue
            seen.add(key)
            try:
                parts.append(inspect.getsource(t))
            except (OSError, TypeError):
                continue
            if inspect.isfunction(t):
                _gather_referenced_sources(t, seen, parts)


def fingerprint(spec) -> str:
    """md5 over (oracle SQL, builder source, sources of every package-local
    helper the builder transitively references) — what the driver's verdict
    is actually evidence about.  The transitive closure matters: many
    builders are one-line wrappers over shared helpers (``_theil_sen``,
    ``operators/temporal.asof_join``), and an edit to the helper invalidates
    the wrapper's green verdict just as surely as an edit to the wrapper."""
    import hashlib
    import inspect

    oracle = getattr(spec, "oracle", None) or ""
    build = getattr(spec, "build", None)
    try:
        src = inspect.getsource(build) if build is not None else ""
    except (OSError, TypeError):
        src = ""
    parts: list[str] = []
    if build is not None:
        _gather_referenced_sources(build, set(), parts)
    return hashlib.md5(
        ("\n\x00\n".join([oracle, src] + parts)).encode("utf-8", "replace")
    ).hexdigest()


def changed_since_snapshot(registry: dict, repo_root: Path | None = None) -> set[str]:
    """Names whose current fingerprint differs from the committed snapshot.

    Degraded snapshots are NOISY, not silent: a missing/malformed
    ``ORACLE_FPRINTS.json``, or one that predates newly-registered names,
    means ``scripts/gen_oracle_fprints.py`` was not run at round start — the
    changed-promotion tier would then misreport a whole round of edits, so a
    ``UserWarning`` is emitted (new names alone are expected mid-round and
    warn only when they exceed a sanity margin of the registry)."""
    import warnings

    path = (repo_root or _REPO_ROOT) / FPRINT_FILE
    try:
        snap = json.loads(path.read_text())
    except (OSError, json.JSONDecodeError) as exc:
        warnings.warn(
            f"rotation: {FPRINT_FILE} unreadable ({exc!r}) — changed-query "
            "promotion disabled this run; regenerate with "
            "scripts/gen_oracle_fprints.py at round start",
            UserWarning,
            stacklevel=2,
        )
        return set()
    if not isinstance(snap, dict):
        warnings.warn(
            f"rotation: {FPRINT_FILE} is not a JSON object — changed-query "
            "promotion disabled; regenerate with scripts/gen_oracle_fprints.py",
            UserWarning,
            stacklevel=2,
        )
        return set()
    missing = [name for name in registry if name not in snap]
    # a few missing names = queries registered mid-round (normal); most of
    # the registry missing = a stale/foreign snapshot, which deserves noise
    if missing and len(missing) > max(10, len(registry) // 4):
        warnings.warn(
            f"rotation: {len(missing)}/{len(registry)} registered names "
            f"absent from {FPRINT_FILE} — snapshot looks stale; regenerate "
            "with scripts/gen_oracle_fprints.py",
            UserWarning,
            stacklevel=2,
        )
    return {
        name
        for name, spec in registry.items()
        if isinstance(snap.get(name), str) and snap[name] != fingerprint(spec)
    }


def latest_verdict_rounds(repo_root: Path | None = None) -> dict[str, int]:
    """Name -> index of the LAST round whose CORRECTNESS file contains it
    (0-based over the sorted CORRECTNESS_r*.json files).  Drives the
    staleness ordering of the verified-green group."""
    rounds: dict[str, int] = {}
    for i, data in enumerate(_verdicts_by_round(repo_root or _REPO_ROOT)):
        for name in data:
            rounds[name] = i
    return rounds


def rotated(registry: dict, repo_root: Path | None = None) -> dict:
    """Return a new dict ordered latest-failed -> fingerprint-changed ->
    re-oracled -> unseen -> verified-green, preserving registration order
    within each group.

    "Re-oracled" = latest driver verdict was rows-only (``no_oracle``) but
    the registry now binds an oracle for the name — e.g. c14_greedy_packing
    and c16_count_min_sketch gained full oracles in round 4 after their
    rows-only verdicts; without this group they'd be filed as verified and
    never receive the now-possible hash check."""
    seen = driver_verified_names(repo_root)
    failed = latest_failed_names(repo_root)
    changed = {
        name
        for name in changed_since_snapshot(registry, repo_root)
        if name in seen
    }
    reoracled = {
        name
        for name in latest_rows_only_names(repo_root)
        if name in registry and getattr(registry[name], "oracle", None)
    }
    out = {k: v for k, v in registry.items() if k in failed}
    out.update(
        {k: v for k, v in registry.items() if k in changed and k not in failed}
    )
    out.update({k: v for k, v in registry.items() if k in reoracled})
    out.update({k: v for k, v in registry.items() if k not in seen})
    # verified greens: stalest verdict first (Python sort is stable, so
    # registration order is preserved within a round), making the window's
    # leftover slots a rolling re-verification of the oldest evidence
    verdict_round = latest_verdict_rounds(repo_root)
    greens = [
        k
        for k in registry
        if k in seen
        and k not in failed
        and k not in changed
        and k not in reoracled
    ]
    greens.sort(key=lambda k: verdict_round.get(k, -1))
    out.update({k: registry[k] for k in greens})
    return out
