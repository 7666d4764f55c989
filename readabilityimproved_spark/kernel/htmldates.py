r"""Date-from-HTML extraction (T2): TimeUtil.getDateFromHtml,
TimeUtil.java:299-342 plus its ~800 lines of helpers.

Weighted multi-level extraction: locate the title anchor position
(loadHtml, TimeUtil.java:498-577), generate dated candidates per format
battery (numeric L1-L4, Chinese ChL1-ChL5 incl. full-width digits and
hanzi numerals, English month-name EnL1), skip matches inside <script>
(TimeUtil.java:371-407), weight each candidate as
``match_offset - title_pos + format_weight`` (TimeUtil.java:422-431,
format weights TimeUtil.java:1554-1577), and return the minimum-weight
candidate of the first non-empty tier.

Quirks kept faithfully:
  * the datetime format short-circuits to weight 1 regardless of position
  * candidates ABOVE the title anchor keep weight INT_MAX (never chosen
    unless everything else is null-dated)
  * the dotted mm.dd.yyyy / dd.mm.yyyy separators are dead (the Java
    code split on an unescaped "." regex)
  * the English "yyyy Month dd" block is dead (splits on ``\s+,`` after
    removing commas), as are both 2-digit-year English blocks
    (``year < 1990`` rejects them)
  * ``getBest`` replaces a null-dated best by ANY later candidate
    regardless of weight
  * full-width ５ is missing from the full-width digit map -- Java
    throws NumberFormatException there; our ``_strict_int`` rejects
    non-ASCII digits the same way (Python's int() would otherwise accept
    them), and the whole call returns None where Java would crash
    (documented deviation: total function, per-doc isolation)
  * the reference's wall-clock year (L3/ChL3/mm_dd_hh_MM) and not-found
    fallback become the explicit ``ref_date`` parameter
"""

from __future__ import annotations

import datetime as dt
import re

from ..javacompat import INT_MAX, java_split
from .dates import DEFAULT_REF_DATE, date_from_url

# format weights (Weight class, TimeUtil.java:1554-1577)
W_YMD_HM = 0
W_YMD = 10
W_MDY = 50
W_YMD8 = 5000
W_YY_MD = 500
W_YY_MD_CN = 10000
W_MD_HM = 10
W_MD = 100000
W_YM = 20000
W_Y = 200000

_MONTHS_ALT = (
    "Jan|Feb|Mar|Apr|Jun|Jul|Aug|Sep|Oct|Nov|Dec|January|February|March|April"
    "|May|June|July|August|September|October|November|December"
)

_FULL_MONTHS = {
    "january": 1, "february": 2, "march": 3, "april": 4, "may": 5,
    "june": 6, "july": 7, "august": 8, "september": 9, "october": 10,
    "november": 11, "december": 12,
}
_ABBR_MONTHS = (
    ("jan", 1), ("feb", 2), ("mar", 3), ("apr", 4), ("may", 5), ("jun", 6),
    ("jul", 7), ("aug", 8), ("sep", 9), ("oct", 10), ("nov", 11), ("dec", 12),
)


class _ParseIntError(Exception):
    pass


def _strict_int(s: str) -> int:
    """Java Integer.parseInt: ASCII digits only (int() accepts U+FF15 etc.)."""
    if not re.fullmatch(r"[+-]?[0-9]+", s or ""):
        raise _ParseIntError(s)
    return int(s)


class _WeightedDate:
    """TimeUtil.WeightedDate (TimeUtil.java:416-459)."""

    __slots__ = ("weight", "date")

    def __init__(self) -> None:
        self.weight = INT_MAX
        self.date: str | None = None

    def set_weight(self, offset: int, head_pos: int, fmt_weight: int) -> None:
        if fmt_weight == W_YMD_HM:
            self.weight = 1
            return
        if offset - head_pos < 0:
            return  # stays INT_MAX: candidates above the title anchor lose
        self.weight = offset - head_pos + fmt_weight

    @staticmethod
    def _fix_year(yyyy: str) -> str:
        if len(yyyy) == 2 and yyyy[0] in "01":
            return "20" + yyyy
        if len(yyyy) == 2:
            return "19" + yyyy
        return yyyy

    def set_date(self, yyyy: str, mm: int, dd: int) -> None:
        if mm <= 0 or dd <= 0 or mm > 12 or dd > 31:
            return
        self.date = f"{self._fix_year(yyyy)}-{mm:02d}-{dd:02d}"

    def set_datetime(self, yyyy: str, mm: int, dd: int, hh: int, mi: int, ss: int) -> None:
        if mm <= 0 or dd <= 0 or mm > 12 or dd > 31 or hh > 24 or mi > 59 or ss > 59:
            return
        self.date = (
            f"{self._fix_year(yyyy)}-{mm:02d}-{dd:02d} {hh:02d}:{mi:02d}:{ss:02d}"
        )


def _get_best(wds: list[_WeightedDate]) -> _WeightedDate | None:
    """TimeUtil.getBest (TimeUtil.java:467-482), quirks included."""
    if not wds:
        return None
    best = wds[0]
    for wd in wds:
        if wd.date is not None and wd.weight < best.weight:
            best = wd
        elif best.date is None:
            best = wd
    return best


_CN_REPLACES = [
    ("两千零", "200"), ("二千零", "200"), ("二千", "2000"), ("两千", "2000"),
    ("二十一", "21"), ("二十二", "22"), ("二十三", "23"), ("二十四", "24"),
    ("二十五", "25"), ("二十六", "26"), ("二十七", "27"), ("二十八", "28"),
    ("二十九", "29"), ("三十一", "31"), ("十一", "11"), ("十二", "12"),
    ("十三", "13"), ("十四", "14"), ("十五", "15"), ("十六", "16"),
    ("十七", "17"), ("十八", "18"), ("十九", "19"), ("三十", "30"),
    ("二十", "20"), ("十", "10"), ("九", "9"), ("八", "8"), ("七", "7"),
    ("六", "6"), ("五", "5"), ("四", "4"), ("三", "3"), ("二", "2"),
    ("一", "1"), ("零", "0"), ("〇", "0"),
]

# NOTE: ５ (full-width five) intentionally missing (TimeUtil.java:1433-1453)
_FW_REPLACES = [
    ("０", "0"), ("１", "1"), ("２", "2"), ("３", "3"), ("４", "4"),
    ("６", "6"), ("７", "7"), ("８", "8"), ("９", "9"),
]


def _replace_chinese(text: str) -> str:
    for a, b in _CN_REPLACES:
        text = text.replace(a, b)
    return text


def _replace_fullwidth(text: str) -> str:
    for a, b in _FW_REPLACES:
        text = text.replace(a, b)
    return text


def _get_en_month(month_str: str) -> int:
    l = month_str.lower()
    if l in _FULL_MONTHS:
        return _FULL_MONTHS[l]
    for abbr, n in _ABBR_MONTHS:
        if abbr in l:
            return n
    return -1


class _HtmlDates:
    """One loaded HTML document (TimeUtil's html/hPosition state)."""

    def __init__(self, html: str, title: str | None, ref_date: dt.datetime):
        self.html = html
        self.h_position = 0
        self.ref_year = str(ref_date.year)
        self._load(title)

    # --- title anchoring (TimeUtil.java:498-577) -------------------------
    def _load(self, title: str | None) -> None:
        for i in range(1, 7):
            if self._regex_h(rf"<h{i}.*?</h{i}>"):
                return
        if title is not None and self._title_position(title):
            return
        if self._regex_h("<STRONG>"):
            return
        if self._regex_h("<B>"):
            return
        self.h_position = self.html.find("<body")

    def _regex_h(self, pattern: str) -> bool:
        pro_index = 0
        h_num = 0
        for m in re.finditer(pattern, self.html, re.IGNORECASE):
            h_num += 1
            if pro_index != 0 and m.start() - pro_index > 1000:
                break
            if m.start() < len(self.html) // 8:
                pro_index = m.start()
        if h_num == 1 or pro_index != 0:
            self.h_position = pro_index + 10
            return True
        return False

    def _title_position(self, title: str) -> bool:
        body_index = self.html.find("<body")
        if body_index == -1:
            body_index = self.html.find("<BODY")
        # Java indexOf treats a negative fromIndex as 0
        title_index = self.html.find(title, max(body_index, 0))
        if title_index == -1:
            return False
        tmp_index = -1
        try:
            # the reference interpolates the raw title into the regex
            # (TimeUtil.java:561); a title with regex metachars crashes
            # Java -- we treat the refinement as not-found instead
            pat = re.compile(
                "<([^>]*)>[^<]*" + title + "[^<]*</([^>]*)>", re.IGNORECASE
            )
            for m in pat.finditer(self.html):
                if m.group(2).lower() not in ("a", "title"):
                    tmp_index = m.start(1)
                    break
        except re.error:
            pass
        if tmp_index != -1:
            title_index = tmp_index
        self.h_position = title_index
        return True

    # --- script detection (TimeUtil.java:371-407) --------------------------
    def _in_script(self, index: int) -> bool:
        script = "script"
        end = self.html.find("</script>", index)
        if end < 0:
            script = "SCRIPT"
            end = self.html.find("</SCRIPT>", index)
            if end < 0:
                return False
        else:
            tmp = self.html.find("</SCRIPT>", index)
            if 0 < tmp < end:
                script = "SCRIPT"
                end = tmp
        begin = self.html.find("<" + script, index)
        if begin < 0:
            alt = script.lower() if script == "SCRIPT" else script.upper()
            begin = self.html.find("<" + alt, index)
        if begin < 0:
            begin = len(self.html)
        return begin >= end

    # --- level batteries ------------------------------------------------------
    def l1(self) -> _WeightedDate | None:
        """Numeric level 1 (TimeUtil.java:607-717)."""
        wds: list[_WeightedDate] = []
        html = self.html

        pat = (
            r"[12][09][0-9]{2}[-_./][01]?[0-9][-_./][0123]?[0-9]\s+"
            r"(?:[01]?[0-9]|2[0-4])[:：](?:[0-5]?[0-9])([:：][0-9]{1,2}){0,1}"
        )
        for m in re.finditer(pat, html):
            wd = _WeightedDate()
            parts = java_split(
                re.sub(r"\s{2,}", " ", m.group()), r"[-_./ :：]"
            )
            try:
                if len(parts) == 5:
                    wd.set_datetime(
                        parts[0], _strict_int(parts[1]), _strict_int(parts[2]),
                        _strict_int(parts[3]), _strict_int(parts[4]), 0,
                    )
                else:
                    wd.set_datetime(
                        parts[0], _strict_int(parts[1]), _strict_int(parts[2]),
                        _strict_int(parts[3]), _strict_int(parts[4]),
                        _strict_int(parts[5]),
                    )
            except (_ParseIntError, IndexError):
                continue
            if self._in_script(m.start()) or _strict_int(parts[0]) < 1990:
                continue
            wd.set_weight(m.start(), self.h_position, W_YMD_HM)
            wds.append(wd)

        for m in re.finditer(
            r"(?<!\d)([12][09][0-9]{2}[-_./][01]?[0-9][-_./][0123]?[0-9])", html
        ):
            g = m.group(1)
            if (
                len(java_split(g, "-")) != 3
                and len(java_split(g, "_")) != 3
                and len(java_split(g, "/")) != 3
                and len(java_split(g, r"\.")) != 3
            ):
                continue
            parts = java_split(g, r"[-_./]")
            if self._in_script(m.start()) or _strict_int(parts[0]) < 1990:
                continue
            wd = _WeightedDate()
            wd.set_date(parts[0], _strict_int(parts[1]), _strict_int(parts[2]))
            wd.set_weight(m.start(), self.h_position, W_YMD)
            wds.append(wd)

        for m in re.finditer(
            r"(?<!\d)([01]?[0-9][-_./][0123]?[0-9][-_./][12][09][0-9]{2})", html
        ):
            g = m.group(1)
            # the "." separator check uses an UNESCAPED dot (dead leg)
            if (
                len(java_split(g, "-")) != 3
                and len(java_split(g, ".")) != 3
                and len(java_split(g, "/")) != 3
            ):
                continue
            parts = java_split(g, r"[-_./]")
            if self._in_script(m.start()) or _strict_int(parts[2]) < 1990:
                continue
            wd = _WeightedDate()
            wd.set_date(parts[2], _strict_int(parts[0]), _strict_int(parts[1]))
            wd.set_weight(m.start(), self.h_position, W_MDY)
            wds.append(wd)

        for m in re.finditer(
            r"(?<!\d)([0123]?[0-9][-_./][01]?[0-9][-_./][12][09][0-9]{2})", html
        ):
            g = m.group(1)
            if (
                len(java_split(g, "-")) != 3
                and len(java_split(g, ".")) != 3
                and len(java_split(g, "/")) != 3
            ):
                continue
            parts = java_split(g, r"[-_./]")
            if self._in_script(m.start()) or _strict_int(parts[2]) < 1990:
                continue
            wd = _WeightedDate()
            wd.set_date(parts[2], _strict_int(parts[1]), _strict_int(parts[0]))
            wd.set_weight(m.start(), self.h_position, W_YMD)  # quirk: not MDY
            wds.append(wd)

        for m in re.finditer(r"(?<!\d)([12][09][0-9]{2}[01][0-9][0123][0-9])", html):
            g = m.group(1)
            if self._in_script(m.start()) or _strict_int(g[:4]) < 1990:
                continue
            wd = _WeightedDate()
            wd.set_date(g[:4], _strict_int(g[4:6]), _strict_int(g[6:8]))
            wd.set_weight(m.start(), self.h_position, W_YMD8)
            wds.append(wd)

        return _get_best(wds)

    def l2(self) -> _WeightedDate | None:
        """yy-mm-dd (TimeUtil.java:731-753)."""
        wds = []
        for m in re.finditer(
            r"[^\d]([0-9]{2}[-_./][01]?[0-9][-_./][0123]?[0-9])[^\d]", self.html
        ):
            if self._in_script(m.start()):
                continue
            g = m.group(1)
            if (
                len(java_split(g, "-")) != 3
                and len(java_split(g, "_")) != 3
                and len(java_split(g, "/")) != 3
                and len(java_split(g, r"\.")) != 3
            ):
                continue
            parts = java_split(g, r"[-_./]")
            wd = _WeightedDate()
            wd.set_date(parts[0], _strict_int(parts[1]), _strict_int(parts[2]))
            wd.set_weight(m.start(), self.h_position, W_YY_MD)
            wds.append(wd)
        return _get_best(wds)

    def l3(self) -> _WeightedDate | None:
        """mm-dd with the reference's current year -> ref year
        (TimeUtil.java:767-786)."""
        wds = []
        for m in re.finditer(r"(?<!\d)[01]?[0-9][-_/][0123]?[0-9]", self.html):
            if self._in_script(m.start()):
                continue
            parts = java_split(m.group(), r"[-_/]")
            wd = _WeightedDate()
            wd.set_date(self.ref_year, _strict_int(parts[0]), _strict_int(parts[1]))
            wd.set_weight(m.start(), self.h_position, W_MD)
            wds.append(wd)
        return _get_best(wds)

    def l4(self) -> _WeightedDate | None:
        """yyyy-mm -> day 1 (TimeUtil.java:798-816)."""
        wds = []
        for m in re.finditer(
            r"[^\d]([12][09][0-9]{2}[-_./][01]?[0-9])[^\d]", self.html
        ):
            if self._in_script(m.start()):
                continue
            parts = java_split(m.group(1), r"[-_./]")
            wd = _WeightedDate()
            wd.set_date(parts[0], _strict_int(parts[1]), 1)
            wd.set_weight(m.start(), self.h_position, W_YM)
            wds.append(wd)
        return _get_best(wds)

    def ch_l1(self) -> _WeightedDate | None:
        """yyyy年mm月dd日 (+datetime, full-width, hanzi) TimeUtil.java:829-911."""
        wds = []
        html = self.html

        pat = (
            r"[12][09][0-9]{2}年[01]?[0-9]月[0123]?[0-9]日\s+"
            r"(?:[01]?[0-9]|2[0-4])[:：](?:[0-5]?[0-9])([:：][0-9]{1,2}){0,1}"
        )
        for m in re.finditer(pat, html):
            parts = java_split(re.sub(r"\s", "", m.group()), "[年月日:：]")
            try:
                y = _strict_int(parts[0])
            except _ParseIntError:
                continue
            if self._in_script(m.start()) or y < 1990:
                continue
            wd = _WeightedDate()
            try:
                if len(parts) == 5:
                    wd.set_datetime(
                        parts[0], _strict_int(parts[1]), _strict_int(parts[2]),
                        _strict_int(parts[3]), _strict_int(parts[4]), 0,
                    )
                else:
                    wd.set_datetime(
                        parts[0], _strict_int(parts[1]), _strict_int(parts[2]),
                        _strict_int(parts[3]), _strict_int(parts[4]),
                        _strict_int(parts[5]),
                    )
            except (_ParseIntError, IndexError):
                continue
            wd.set_weight(m.start(), self.h_position, W_YMD_HM)
            wds.append(wd)

        for m in re.finditer(r"[12][09][0-9]{2}年[01]?[0-9]月[0123]?[0-9]日", html):
            parts = java_split(m.group(), "[年月日]")
            if self._in_script(m.start()) or _strict_int(parts[0]) < 1990:
                continue
            wd = _WeightedDate()
            wd.set_date(parts[0], _strict_int(parts[1]), _strict_int(parts[2]))
            wd.set_weight(m.start(), self.h_position, W_YMD)
            wds.append(wd)

        for m in re.finditer(
            r"[１２][0０９][0０１２３４５６７８９]{2}年[0０１]?[0０１２３４５６７８９]月"
            r"[0０１２３]?[0０１２３４５６７８９]日",
            html,
        ):
            parts = java_split(_replace_fullwidth(m.group()), "[年月日]")
            try:
                y = _strict_int(parts[0])
            except _ParseIntError:
                raise  # Java NumberFormatException propagates (crash path)
            if self._in_script(m.start()) or y < 1990:
                continue
            wd = _WeightedDate()
            wd.set_date(parts[0], _strict_int(parts[1]), _strict_int(parts[2]))
            wd.set_weight(m.start(), self.h_position, W_YY_MD)  # quirk
            wds.append(wd)

        for m in re.finditer(
            r"([0〇零一二三四五六七八九十两千]{4})年[零0〇一二三四五六七八九十]{1,2}月"
            r"[0〇零一二三四五六七八九十]{1,3}日",
            html,
        ):
            parts = java_split(_replace_chinese(m.group()), "[年月日]")
            if self._in_script(m.start()) or _strict_int(parts[0]) < 1990:
                continue
            wd = _WeightedDate()
            wd.set_date(parts[0], _strict_int(parts[1]), _strict_int(parts[2]))
            wd.set_weight(m.start(), self.h_position, W_YY_MD_CN)
            wds.append(wd)

        return _get_best(wds)

    def ch_l2(self) -> _WeightedDate | None:
        """yy年mm月dd日 battery (TimeUtil.java:923-973)."""
        wds = []
        for m in re.finditer(r"[0-9]{2}年[01]?[0-9]月[0123]?[0-9]日", self.html):
            parts = java_split(m.group(), "[年月日]")
            wd = _WeightedDate()
            wd.set_date(parts[0], _strict_int(parts[1]), _strict_int(parts[2]))
            wd.set_weight(m.start(), self.h_position, W_YY_MD)
            wds.append(wd)
        for m in re.finditer(
            r"[0０１２３４５６７８９]{2}年[0０１]?[0０１２３４５６７８９]月"
            r"[0０１２３]?[0０１２３４５６７８９]日",
            self.html,
        ):
            parts = java_split(_replace_fullwidth(m.group()), "[年月日]")
            wd = _WeightedDate()
            wd.set_date(parts[0], _strict_int(parts[1]), _strict_int(parts[2]))
            wd.set_weight(m.start(), self.h_position, W_YY_MD)
            wds.append(wd)
        for m in re.finditer(
            r"[0〇零一二三四五六七八九十两千]{2}年[0零〇一二三四五六七八九十]{1,2}月"
            r"[0〇零一二三四五六七八九十]{1,3}日",
            self.html,
        ):
            parts = java_split(_replace_chinese(m.group()), "[年月日]")
            wd = _WeightedDate()
            if len(parts[0]) in (4, 2):
                wd.set_date(parts[0], _strict_int(parts[1]), _strict_int(parts[2]))
            wd.set_weight(m.start(), self.h_position, W_YY_MD)
            wds.append(wd)
        return _get_best(wds)

    def ch_l3(self) -> _WeightedDate | None:
        """mm月dd日 with ref year (TimeUtil.java:985-1038)."""
        wds = []
        for pat, conv in (
            (r"[01]?[0-9]月[0123]?[0-9]日", None),
            (
                r"[0０１]?[0０１２３４５６７８９]月[0０１２３]?[0０１２３４５６７８９]日",
                _replace_fullwidth,
            ),
            (
                r"[零0〇一二三四五六七八九十]{1,2}月[0〇零一二三四五六七八九十]{1,3}日",
                _replace_chinese,
            ),
        ):
            for m in re.finditer(pat, self.html):
                if self._in_script(m.start()):
                    continue
                g = conv(m.group()) if conv else m.group()
                parts = java_split(g, "[月日]")
                wd = _WeightedDate()
                try:
                    wd.set_date(
                        self.ref_year, _strict_int(parts[0]), _strict_int(parts[1])
                    )
                except _ParseIntError:
                    raise  # Java crash path (full-width 5)
                wd.set_weight(m.start(), self.h_position, W_MD)
                wds.append(wd)
        return _get_best(wds)

    def ch_l4(self) -> _WeightedDate | None:
        """yyyy年mm月 -> day 1 (TimeUtil.java:1050-1098)."""
        wds = []
        for pat, conv in (
            (r"[12][09][0-9]{2}年[01]?[0-9]月", None),
            (
                r"[１２][0０９][0０１２３４５６７８９]{2}年[0０１]?[0０１２３４５６７８９]月",
                _replace_fullwidth,
            ),
            (
                r"([0〇零一二三四五六七八九十两千]{4})年[零0〇一二三四五六七八九十]{1,2}月",
                _replace_chinese,
            ),
        ):
            for m in re.finditer(pat, self.html):
                if self._in_script(m.start()):
                    continue
                g = conv(m.group()) if conv else m.group()
                parts = java_split(g, "[年月]")
                wd = _WeightedDate()
                wd.set_date(parts[0], _strict_int(parts[1]), 1)
                wd.set_weight(m.start(), self.h_position, W_YM)
                wds.append(wd)
        return _get_best(wds)

    def ch_l5(self) -> _WeightedDate | None:
        """yyyy年 alone -> Jan 1 (TimeUtil.java:1109-1155)."""
        wds = []
        for pat, conv in (
            (r"[12][09][0-9]{2}年", None),
            (r"[１２][0０９][0０１２３４５６７８９]{2}年", _replace_fullwidth),
            (r"([0〇零一二三四五六七八九十两千]{4})年", _replace_chinese),
        ):
            for m in re.finditer(pat, self.html):
                if self._in_script(m.start()):
                    continue
                g = conv(m.group()) if conv else m.group()
                wd = _WeightedDate()
                wd.set_date(g[:4], 1, 1)
                wd.set_weight(m.start(), self.h_position, W_Y)
                wds.append(wd)
        return _get_best(wds)

    def en_l1(self) -> _WeightedDate | None:
        """English month-name formats (TimeUtil.java:1162-1346)."""
        wds: list[_WeightedDate] = []
        html = self.html
        # English news often put the time before the headline
        self.h_position -= 500

        def strip_ord(s: str) -> str:
            return (
                s.lower().replace("st", "").replace("nd", "").replace("rd", "")
                .replace("th", "")
            )

        # hh:MM, Month dd[th], yyyy
        pat = (
            r"(?:[01]?[0-9]|2[0-3]):[0-5][0-9]\s*,?(" + _MONTHS_ALT + r")"
            r"\s{0,5}\d{1,2}(th|st|nd|rd){0,1},?\s{0,5}\d{4}"
        )
        for m in re.finditer(pat, html, re.IGNORECASE):
            parts = java_split(re.sub(r"[,:]", " ", m.group()), r"\s+")
            if len(parts) != 5:
                continue
            month = _get_en_month(parts[2])
            if month == -1:
                continue
            if self._in_script(m.start()) or _strict_int(parts[4]) < 1990:
                continue
            wd = _WeightedDate()
            try:
                wd.set_datetime(
                    parts[4], month, _strict_int(strip_ord(parts[3])),
                    _strict_int(parts[0]), _strict_int(parts[1]), 0,
                )
            except _ParseIntError:
                continue
            wd.set_weight(m.start(), self.h_position, W_MDY)
            wds.append(wd)

        # Month dd[th], yyyy
        pat = (
            r"(" + _MONTHS_ALT + r")\s{0,5}\d{1,2}(th|st|nd|rd){0,1},{0,1}"
            r"\s{0,5}\d{4}"
        )
        for m in re.finditer(pat, html, re.IGNORECASE):
            parts = java_split(m.group().replace(",", " "), r"\s+")
            if len(parts) != 3:
                continue
            month = _get_en_month(parts[0])
            if month == -1:
                continue
            if self._in_script(m.start()) or _strict_int(parts[2]) < 1990:
                continue
            wd = _WeightedDate()
            try:
                wd.set_date(parts[2], month, _strict_int(strip_ord(parts[1])))
            except _ParseIntError:
                continue
            wd.set_weight(m.start(), self.h_position, W_MDY)
            wds.append(wd)

        # dd[th] Month, yyyy
        pat = (
            r"\d{1,2}(th|st|nd|rd)?\s{0,5}(" + _MONTHS_ALT + r"),{0,1},?"
            r"\s{0,5}\d{4}"
        )
        for m in re.finditer(pat, html, re.IGNORECASE):
            parts = java_split(m.group().replace(",", " "), r"\s+")
            if len(parts) != 3:
                continue
            month = _get_en_month(parts[1])
            if month == -1:
                continue
            if self._in_script(m.start()) or _strict_int(parts[2]) < 1990:
                continue
            wd = _WeightedDate()
            try:
                wd.set_date(parts[2], month, _strict_int(strip_ord(parts[0])))
            except _ParseIntError:
                continue
            wd.set_weight(m.start(), self.h_position, W_MDY)
            wds.append(wd)

        # dd-Month-yyyy (hyphenated; 2-digit years die on the 1990 gate)
        pat = (
            r"(?<!\d)\d{1,2}(th|st|nd|rd)?,?-(" + _MONTHS_ALT + r"),{0,1}-"
            r"\d{2,4}"
        )
        for m in re.finditer(pat, html, re.IGNORECASE):
            parts = java_split(m.group().replace(",", " "), r"\s+|-")
            if len(parts) != 3:
                continue
            month = _get_en_month(parts[1])
            if month == -1:
                continue
            if self._in_script(m.start()) or _strict_int(parts[2]) < 1990:
                continue
            wd = _WeightedDate()
            try:
                wd.set_date(parts[2], month, _strict_int(strip_ord(parts[0])))
            except _ParseIntError:
                continue
            wd.set_weight(m.start(), self.h_position, W_YY_MD)
            wds.append(wd)

        # Month dd[th] hh:MM [AM|PM] -- uses the ref year
        pat = (
            r"(" + _MONTHS_ALT + r")\s{0,5}\d{1,2}(th|st|nd|rd){0,1}\s*,?\s*"
            r"[01]?[0-9]:[0-5]?[0-9]\s+(AM|PM)?"
        )
        for m in re.finditer(pat, html, re.IGNORECASE):
            cleaned = re.sub(r"\s{2,}", " ", re.sub(r"[,:]", " ", m.group()))
            parts = java_split(cleaned, r"\s+")
            if len(parts) < 4:
                continue
            month = _get_en_month(parts[0])
            if month == -1:
                continue
            if self._in_script(m.start()):
                continue
            try:
                hour = _strict_int(parts[2])
                if len(parts) == 5 and parts[4] == "PM" and hour < 12:
                    hour += 12
                wd = _WeightedDate()
                wd.set_datetime(
                    self.ref_year, month, _strict_int(strip_ord(parts[1])),
                    hour, _strict_int(parts[3]), 0,
                )
            except _ParseIntError:
                continue
            wd.set_weight(m.start(), self.h_position, W_MD_HM)
            wds.append(wd)

        # yyyy Month dd -- DEAD in the reference (splits on '\s+,' after
        # removing commas, so length is always < 3); kept for parity
        pat = (
            r"\d{4}\s*,?(" + _MONTHS_ALT + r")\s{0,5}\d{1,2}(th|st|nd|rd){0,1},?"
        )
        for m in re.finditer(pat, html, re.IGNORECASE):
            parts = java_split(m.group().replace(",", " "), r"\s+,")
            if len(parts) < 3:
                continue
            # unreachable (see docstring)

        self.h_position += 500
        return _get_best(wds)


_EPOCH_PAT = re.compile(
    r"[12][09][0-9]{2}-[01][0-9]-[0123]?[0-9]\s+(?:[01]?[0-9]|2[0-4])"
    r"[:：](?:[0-5]?[0-9]):[0-9]{1,2}"
)


def date_from_html(
    html: str,
    title: str | None = None,
    ref_date: dt.datetime = DEFAULT_REF_DATE,
) -> str | None:
    """TimeUtil.getDateFromHtml(String, title) (TimeUtil.java:299-342).

    Returns 'yyyy-mm-dd' (or 'yyyy-mm-dd hh:mm:ss' for datetime formats),
    else None. Total: Java's uncaught crash paths return None here.
    """
    try:
        state = _HtmlDates(html, title, ref_date)
        # Epoch Times special case (TimeUtil.java:348-363)
        if "大纪元" in html and "美东时间:" in html:
            m = _EPOCH_PAT.search(html)
            if m:
                return m.group()

        tier1 = [w for w in (state.l1(), state.ch_l1(), state.en_l1()) if w]
        if tier1:
            best = _get_best(tier1)
            return best.date if best else None
        tier2 = [
            w
            for w in (
                state.l2(), state.ch_l2(), state.l3(), state.l4(),
                state.ch_l3(), state.ch_l4(),
            )
            if w
        ]
        if tier2:
            best = _get_best(tier2)
            return best.date if best else None
        wd = state.ch_l5()
        return wd.date if wd else None
    except Exception:
        return None


def date_from_doc(
    html: str,
    title: str | None,
    url: str | None,
    ref_date: dt.datetime = DEFAULT_REF_DATE,
) -> str:
    """The byte[] overload's cascade (TimeUtil.java:277-292): URL first,
    then HTML, then the wall clock -> ref_date."""
    d = date_from_url(url, ref_date)
    if d is None:
        d = date_from_html(html, title, ref_date)
    if d is None:
        d = ref_date.strftime("%Y-%m-%d %H:%M:%S")
    return d
