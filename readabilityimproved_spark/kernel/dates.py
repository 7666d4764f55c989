r"""Date-from-URL extraction (TimeUtil.getDateFromUrl, TimeUtil.java:245-261).

This is the only TimeUtil path on the critical extraction route: image
src dates vs page date drive I4 scoring (ReadabilityForImg.java:536-595).
The reference's wall-clock reads (``new Date()``, ``Calendar.getInstance``)
are parameterized as an explicit ``ref_date`` for determinism
(SURVEY.md §7 "nondeterminism to eliminate").

Level-1 formats (TimeUtil.java:124-201):
  yyyy[-_./]m?m[-_./]d?d   (trailing non-digit required, year > 1990)
  yyyymmdd (8 digits; future dates rejected vs ref_date, TimeUtil.java:83-106)
  yyyymm[-_./]d?d          (trailing non-digit required)
  m?m/d?d/yyyy             (trailing non-digit required)
Level-2 (TimeUtil.java:215-237): yy[-_./]m?m[-_./]d?d -> 20yy.

Quirks kept: the first regex hit is validated once and on failure the
level falls through to the NEXT format (not the next match); the ``[^\d]``
trailing guard means a date at end-of-string does not match L1 patterns
1/3/4; SimpleDateFormat's lenient parse (Feb 31 -> Mar 3) is reproduced
by ``lenient_date``.
"""

from __future__ import annotations

import datetime as dt
import re
from functools import lru_cache

from ..javacompat import jint

# Java regexes copied verbatim (TimeUtil.java:127, 140, 159, 174, 219)
_L1_YMD = re.compile(r"(?<!\d)([12][09][0-9]{2}[-_./][01]?[0-9][-_./][0123]?[0-9])[^\d]")
_L1_8DIGIT = re.compile(r"(?<!\d)([12][09][0-9]{2}[01]?[0-9][0123]?[0-9])")
_L1_YM_D = re.compile(r"(?<!\d)([12][09][0-9]{2}[01]?[0-9][-_./][0123]?[0-9])[^\d]")
_L1_MDY = re.compile(r"(?<!\d)([0123]?[0-9]/[01]?[0-9]/[12][09][0-9]{2})[^\d]")
_L2_YMD = re.compile(r"(?<!\d)([0-9][0-9][-_./][01]?[0-9][-_./][0123]?[0-9])[^\d]")
_SEP = re.compile(r"[-_./]")

#: deterministic stand-in for the reference's wall clock (new Date());
#: jobs override via config (see plans.pipeline).
DEFAULT_REF_DATE = dt.datetime(2019, 6, 18, 12, 0, 0)


def lenient_date(year: int, month: int, day: int) -> dt.datetime:
    """SimpleDateFormat lenient yyyy-MM-dd parse: day overflow rolls over."""
    return dt.datetime(year, month, 1) + dt.timedelta(days=day - 1)


def string2date(s: str) -> dt.datetime | None:
    """yyyy-MM-dd -> datetime at midnight (ReadabilityForImg.java:663-675)."""
    try:
        y, m, d = s.split("-")
        return lenient_date(int(y), int(m), int(d))
    except (ValueError, AttributeError):
        return None


def time_difference_days(date1: dt.datetime, date2: dt.datetime) -> int:
    """(date2 - date1) in whole days, Java int truncation toward zero
    (ReadabilityForImg.java:680-683)."""
    ms = (date2 - date1).total_seconds() * 1000.0
    return jint(ms / (1000 * 3600 * 24))


def is_normal_date(year: str, month: str, day: str, ref_date: dt.datetime) -> bool:
    """Not-in-the-future check (TimeUtil.java:83-106), vs ref_date."""
    try:
        d = lenient_date(int(year), int(month), int(day))
    except ValueError:
        return True  # parse failure leaves result=true in the reference
    return not (d > ref_date)


def _first_date_l1(s: str, ref_date: dt.datetime) -> str | None:
    m = _L1_YMD.search(s)
    if m:
        parts = _SEP.split(m.group(1))
        yyyy, mm, dd = parts[0], int(parts[1]), int(parts[2])
        if 0 < mm <= 12 and 0 < dd <= 31 and int(yyyy) > 1990:
            return f"{yyyy}-{mm:02d}-{dd:02d}"

    m = _L1_8DIGIT.search(s)
    if m:
        g = m.group(1)
        if len(g) == 8:
            yyyy, mm, dd = g[:4], int(g[4:6]), int(g[6:])
            if 0 < mm <= 12 and 0 < dd <= 31 and int(yyyy) > 1990:
                if is_normal_date(yyyy, g[4:6], g[6:], ref_date):
                    return f"{yyyy}-{mm:02d}-{dd:02d}"

    m = _L1_YM_D.search(s)
    if m:
        parts = _SEP.split(m.group(1))
        if len(parts) == 2:
            yyyymm = int(parts[0])
            yyyy, mm, dd = str(yyyymm // 100), yyyymm % 100, int(parts[1])
            if 0 < mm <= 12 and 0 < dd <= 31 and int(yyyy) > 1990:
                return f"{yyyy}-{mm:02d}-{dd:02d}"

    m = _L1_MDY.search(s)
    if m:
        parts = _SEP.split(m.group(1))
        yyyy, mm, dd = parts[2], int(parts[0]), int(parts[1])
        if 0 < mm <= 12 and 0 < dd <= 31 and int(yyyy) > 1990:
            return f"{yyyy}-{mm:02d}-{dd:02d}"
    return None


def _first_date_l2(s: str) -> str | None:
    m = _L2_YMD.search(s)
    if m:
        parts = _SEP.split(m.group(1))
        yy, mm, dd = parts[0], int(parts[1]), int(parts[2])
        if 0 < mm <= 12 and 0 < dd <= 31:
            return f"20{yy}-{mm:02d}-{dd:02d}"
    return None


def date_from_url(url: str | None, ref_date: dt.datetime = DEFAULT_REF_DATE) -> str | None:
    """TimeUtil.getDateFromUrl: first L1 hit, else first L2 hit, else None.

    Memoized: a pure function of (url, ref_date), and the kernel calls
    it with heavily repeated arguments — the page base URI once per
    image (I4 compares every image date against the page date) and
    duplicate image srcs. The cache is bounded (LRU), so a long-lived
    executor worker cannot grow without limit.
    """
    if url is None or url.strip() == "":
        return None
    return _date_from_url_cached(url, ref_date)


@lru_cache(maxsize=16384)
def _date_from_url_cached(url: str, ref_date: dt.datetime) -> str | None:
    return _first_date_l1(url, ref_date) or _first_date_l2(url)
