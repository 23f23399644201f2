"""Scalar expression builders — reference operators A8-A11.

All are pure Column→Column builders over pyspark.sql.functions, so they stay
inside whole-stage codegen (no Python in the executor hot path) and Catalyst
constant-folds / pushes around them freely.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def split_image_name(image: Column) -> Column:
    """Image name = everything before the FIRST ``:`` — ``splitImage``,
    logspoutkinesis.go:223-229.

    The reference splits at the first colon, so ``reg.io:5000/app:v2`` →
    name ``reg.io`` (surprising but replicated exactly; FIXTURES.md B.3).
    ``substring_index(col, ':', 1)`` has exactly first-index semantics and
    returns the whole string when no ``:`` is present.
    """
    return F.substring_index(image, ":", 1)


def split_image_tag(image: Column) -> Column:
    """Image tag = everything after the FIRST ``:``; empty string when there
    is no colon (logspoutkinesis.go:226-228 leaves ``tag = ""``)."""
    return F.when(
        F.instr(image, ":") > 0,
        F.substring(image, F.instr(image, ":") + 1, F.length(image)),
    ).otherwise(F.lit(""))


def cid_prefix(container_id: Column, length: int = 12) -> Column:
    """First 12 chars of the container ID — ``m.Container.ID[0:12]``,
    logspoutkinesis.go:233."""
    return F.substring(container_id, 1, length)


def strip_leading_slash(name: Column) -> Column:
    """Drop the leading ``/`` from the container name —
    ``m.Container.Name[1:]``, logspoutkinesis.go:234.

    The reference unconditionally drops the first character; Docker names
    always start with ``/`` so we keep the unconditional semantics.
    """
    return F.substring(name, 2, 0x7FFFFFFF)


def rfc3339(ts: Column, fractional_digits: int = 6) -> Column:
    """Event time → RFC3339 string — ``m.Time.Format(time.RFC3339Nano)``,
    logspoutkinesis.go:236.

    Documented deviation (SURVEY.md §7): Spark TimestampType is µs-precision,
    so we emit 6 fractional digits where Go emits up to 9.  Go's RFC3339Nano
    also strips trailing zeros; we keep fixed-width digits for stability
    (machine parsers accept both).  UTC offset renders as ``Z``.
    """
    pattern = "yyyy-MM-dd'T'HH:mm:ss." + "S" * fractional_digits + "XXX"
    return F.date_format(ts, pattern)
