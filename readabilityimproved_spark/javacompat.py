"""Java numeric / string semantics that the reference's scoring relies on.

The reference stores every score as a Java ``int`` and leans on Java's
truncating arithmetic and ``String.split`` trailing-empty behavior; these
quirks are load-bearing (SURVEY.md §2 notes) so they are re-specified here
as tiny pure functions with exhaustive unit tests.

Reference cites:
  * int division truncation toward zero: Readability.java:370 (``/2``),
    ReadabilityForImg.java:968 (``/2``), 1101 (``textScore / 3``)
  * float->int cast truncation (NaN -> 0): Readability.java:805-810
  * ``split(",|，")`` comma segmentation: Readability.java:361
  * link density 0/0 -> NaN, x/0 -> Inf: Readability.java:509-517
"""

from __future__ import annotations

import math
import re

INT_MIN = -(2**31)
INT_MAX = 2**31 - 1


def jdiv(a: int, b: int) -> int:
    """Java integer division: truncates toward zero (Python // floors)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def jint(x: float) -> int:
    """Java ``(int)`` cast of a float/double.

    NaN -> 0; +/-Inf -> INT_MAX/INT_MIN; otherwise truncate toward zero
    and clamp to 32-bit range (JLS 5.1.3 narrowing conversion).
    """
    if isinstance(x, float):
        if math.isnan(x):
            return 0
        if math.isinf(x):
            return INT_MAX if x > 0 else INT_MIN
    t = math.trunc(x)
    if t > INT_MAX:
        return INT_MAX
    if t < INT_MIN:
        return INT_MIN
    return int(t)


def jfloat_div(num: float, den: float) -> float:
    """Java float division: 0/0 -> NaN, x/0 -> +/-Inf (no exception)."""
    if den == 0.0:
        if num == 0.0:
            return float("nan")
        return float("inf") if num > 0 else float("-inf")
    return num / den


def java_split(s: str, pattern: str) -> list[str]:
    """Java ``String.split(regex)`` with default limit=0.

    Trailing empty strings are removed from the result; splitting the
    empty string yields ``[""]`` (length 1).
    """
    if s == "":
        return [""]
    parts = re.split(pattern, s)
    while parts and parts[-1] == "":
        parts.pop()
    return parts


def comma_segments(text: str) -> int:
    """``innerText.split(",|，").length`` (Readability.java:361).

    Counts comma-delimited segments with Java trailing-empty-drop
    semantics; both ASCII and full-width commas split.

    Computed by counting (C-speed) instead of materializing the split
    list: Java drops trailing empties, so trailing commas are stripped
    first; the count is then separators + 1. Two edge cases diverge:
    the EMPTY string splits to [""] (length 1), while a non-empty
    all-comma string splits to all-empty segments which are ALL dropped
    (length 0). Identical to ``len(java_split(text, ",|，"))`` for
    every string (pinned in tests/test_javacompat.py).
    """
    t = text.rstrip(",，")
    if not t:
        return 1 if not text else 0
    return t.count(",") + t.count("，") + 1
