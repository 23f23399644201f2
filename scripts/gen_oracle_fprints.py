"""Regenerate ORACLE_FPRINTS.json — run at ROUND START, before any edits.

The rotation (plans/rotation.py) promotes registered queries whose
fingerprint (md5 over oracle SQL + builder source) differs from this
committed snapshot: a green driver verdict is evidence about the code the
verify actually ran, so when that code changes mid-round the verdict is
stale and the query deserves a re-verification slot ahead of untouched
greens.  For the promotion to see THIS round's edits, the snapshot must
describe the round-START state (what the previous verify ran against) —
hence: regenerate first thing each round, commit, then start editing.

Usage: python scripts/gen_oracle_fprints.py [output_path]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from logspout_kinesis_tests_spark.plans import REGISTRY  # noqa: E402
from logspout_kinesis_tests_spark.plans.rotation import (  # noqa: E402
    FPRINT_FILE,
    fingerprint,
)


def main() -> None:
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else (
        Path(__file__).resolve().parent.parent / FPRINT_FILE
    )
    prints = {name: fingerprint(spec) for name, spec in sorted(REGISTRY.items())}
    out.write_text(json.dumps(prints, indent=0, sort_keys=True) + "\n")
    print(f"wrote {len(prints)} fingerprints to {out}")


if __name__ == "__main__":
    main()
