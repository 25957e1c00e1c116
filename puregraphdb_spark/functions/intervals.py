"""Validated interval literals (ADVICE r6).

User-supplied interval strings (funnel ``within``, interval-join
``before``/``after``) used to be interpolated directly into
``F.expr(f"interval {s}")`` — a malformed or untrusted string became an
arbitrary SQL expression or an opaque Catalyst parse error. This module
is the one place interval strings become Column expressions: the string
is validated against the closed interval grammar first, so a bad value
fails at the API boundary with a clear message and nothing but interval
literals can reach ``expr``.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_INTERVAL_RE = re.compile(
    r"^\s*(\d+)\s+"
    r"(microsecond|millisecond|second|minute|hour|day|week|month|year)"
    r"s?\s*$",
    re.IGNORECASE,
)


def validate_interval(s: str) -> str:
    """Return the normalized ``'<n> <unit>'`` form, or raise ValueError.

    Only simple single-unit intervals are in the public API surface;
    compound intervals ('1 day 2 hours') are deliberately rejected —
    call sites that need them compose two validated intervals.
    """
    if not isinstance(s, str):
        raise ValueError(f"interval must be a string, got {type(s).__name__}")
    m = _INTERVAL_RE.match(s)
    if not m:
        raise ValueError(
            f"unsupported interval: {s!r} (expected '<n> <unit>' with unit "
            "in microsecond/millisecond/second/minute/hour/day/week/"
            "month/year)"
        )
    return f"{m.group(1)} {m.group(2).lower()}"


def interval_expr(s: str) -> Column:
    """A Column interval literal from a VALIDATED interval string."""
    return F.expr(f"interval {validate_interval(s)}")
