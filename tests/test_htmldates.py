"""T2 date-from-html vectors (TimeUtil.java:299-342 + batteries)."""

import datetime as dt

from readabilityimproved_spark.kernel.htmldates import date_from_doc, date_from_html

REF = dt.datetime(2019, 6, 18, 12, 0, 0)


def page(body: str) -> str:
    return f"<html><head><title>T</title></head><body><h1>Headline</h1>{body}</body></html>"


def test_l1_iso_date():
    assert date_from_html(page("<p>published 2019-06-18 ok</p>"), None, REF) == "2019-06-18"


def test_l1_datetime_includes_time():
    got = date_from_html(page("<p>2019-06-18 10:30:25</p>"), None, REF)
    assert got == "2019-06-18 10:30:25"


def test_datetime_beats_closer_plain_date():
    # datetime weight short-circuits to 1 (TimeUtil.java:423-426)
    body = "<p>2018-01-01</p>" + "x" * 500 + "<p>2019-06-18 10:30</p>"
    assert date_from_html(page(body), None, REF) == "2019-06-18 10:30:00"


def test_closest_to_title_wins():
    body = "<p>2019-06-18 first</p>" + "y" * 300 + "<p>2017-01-01 later</p>"
    assert date_from_html(page(body), None, REF) == "2019-06-18"


def test_script_dates_skipped():
    body = '<script>var d="2011-11-11";</script><p>2019-06-18 ok</p>'
    assert date_from_html(page(body), None, REF) == "2019-06-18"


def test_chinese_l1():
    assert date_from_html(page("<p>2019年6月18日</p>"), None, REF) == "2019-06-18"


def test_chinese_hanzi_numerals():
    got = date_from_html(page("<p>二零一九年六月十八日</p>"), None, REF)
    assert got == "2019-06-18"
    # 5-hanzi years ('二千零一九') crash Java's parseInt -> our None
    assert date_from_html(page("<p>二千零一九年六月十八日</p>"), None, REF) is None


def test_english_month_name():
    got = date_from_html(page("<p>January 15, 2019</p>"), None, REF)
    assert got == "2019-01-15"


def test_english_ordinal_day():
    got = date_from_html(page("<p>March 3rd, 2019</p>"), None, REF)
    assert got == "2019-03-03"


def test_english_dd_month_yyyy():
    got = date_from_html(page("<p>15 January 2019</p>"), None, REF)
    assert got == "2019-01-15"


def test_tier2_yy_format():
    got = date_from_html(page("<p>19.06.18</p>"), None, REF)
    assert got == "2019-06-18"


def test_tier2_yyyy_mm():
    got = date_from_html(page("<p>posted 2019-06 x</p>"), None, REF)
    assert got == "2019-06-01"


def test_tier2_mm_dd_uses_ref_year():
    got = date_from_html(page("<p>posted 06-18 x</p>"), None, REF)
    assert got == "2019-06-18"


def test_tier3_year_only():
    got = date_from_html(page("<p>拍摄于2016年</p>"), None, REF)
    assert got == "2016-01-01"


def test_year_gate_1990():
    # L1 rejects year<1990, but tier-2 L4 (yyyy-mm, NO year gate) then
    # wins over L3's ref-year mm-dd -> '1989-06-01' (reference quirk)
    assert date_from_html(page("<p>1989-06-18 old</p>"), None, REF) == "1989-06-01"


def test_no_date():
    assert date_from_html(page("<p>no dates here at all</p>"), None, REF) is None


def test_tier1_suppresses_tier2():
    # a tier-1 ISO date beats a closer tier-2 yy date (tier cascade,
    # TimeUtil.java:306-334)
    body = "<p>19.01.01</p><p>2019-06-18</p>"
    assert date_from_html(page(body), None, REF) == "2019-06-18"


def test_epochtimes_special_case():
    html = "<html><body>大纪元 美东时间: 2019-06-18 10:30:25 报道</body></html>"
    assert date_from_html(html, None, REF) == "2019-06-18 10:30:25"


def test_title_anchor_without_h1():
    html = (
        "<html><head><title>My Headline</title></head><body>"
        "<p>2017-01-01 nav date</p>"
        "<div>My Headline</div><p>2019-06-18 body</p></body></html>"
    )
    # the nav date sits ABOVE the title anchor -> weight stays INT_MAX
    assert date_from_html(html, "My Headline", REF) == "2019-06-18"


def test_date_from_doc_cascade():
    # URL wins over HTML; wall-clock fallback is the ref date
    assert (
        date_from_doc(page("<p>2018-01-01</p>"), None,
                      "http://h/2019-06/18/a.html", REF)
        == "2019-06-18"
    )
    assert date_from_doc(page("<p>2018-01-01</p>"), None, None, REF) == "2018-01-01"
    assert date_from_doc(page("<p>none</p>"), None, None, REF) == "2019-06-18 12:00:00"


def test_format_weight_orders_same_battery():
    # MDY (weight 50) close to the anchor beats YMD (weight 10) far away
    body = "<p>06/18/2019 x</p>" + "z" * 200 + "<p>2017-01-01 y</p>"
    assert date_from_html(page(body), None, REF) == "2019-06-18"
    # ...but YMD wins when distances are comparable (lower format weight)
    body2 = "<p>06/18/2019 x 2017-01-01 y</p>"
    assert date_from_html(page(body2), None, REF) == "2017-01-01"


def test_fullwidth_digit_date():
    got = date_from_html(page("<p>２０１９年６月１８日</p>"), None, REF)
    assert got == "2019-06-18"


def test_fullwidth_five_crashes_like_java():
    # ５ missing from the full-width map -> Java NumberFormatException -> None
    assert date_from_html(page("<p>２０１５年６月１８日</p>"), None, REF) is None


def test_anchor_multiple_h1_early_position():
    # several h1s: anchor snaps to the last one inside the first 1/8 of
    # the page (regexH proIndex rule, TimeUtil.java:519-543)
    filler = "z" * 4000
    html = (
        "<html><body><h1>nav</h1><h1>real headline</h1>"
        "<p>2019-06-18 near</p>" + filler + "<p>2018-01-01 far</p></body></html>"
    )
    assert date_from_html(html, None, REF) == "2019-06-18"


def test_strong_anchor_fallback():
    # no h tags, no title match -> <STRONG> anchors the position, but
    # only a match inside the first 1/8 of the page sets proIndex;
    # a single match beyond that anchors at position 10 (regexH quirk,
    # TimeUtil.java:533-539)
    filler = "z" * 2000  # pushes len/8 past the <strong> position
    html = (
        "<html><body><p>2017-01-01 above</p>"
        "<strong>Headline</strong><p>2019-06-18 below</p>"
        + filler + "</body></html>"
    )
    assert date_from_html(html, None, REF) == "2019-06-18"

    # short page: <strong> at pos 35 > len/8 -> anchor = 0+10, so the
    # earlier date (closest to position 10) wins -- quirk kept
    html2 = (
        "<html><body><p>2017-01-01 above</p>"
        "<strong>Headline</strong><p>2019-06-18 below</p></body></html>"
    )
    assert date_from_html(html2, None, REF) == "2017-01-01"


def test_title_refinement_skips_anchor_tags():
    # the title-position regex ignores <a>/<title> wrappers and anchors
    # on the real container (TimeUtil.java:561-570)
    html = (
        "<html><body>"
        '<a href="/x">My Story</a><p>2017-01-01 nav</p>'
        + "q" * 500 +
        "<div>My Story</div><p>2019-06-18 body</p></body></html>"
    )
    assert date_from_html(html, "My Story", REF) == "2019-06-18"


def test_regex_metachar_title_survives():
    # the reference interpolates the raw title into a regex and would
    # crash on metachars; we treat the refinement as not-found
    html = "<html><body><div>What?! (part 2)</div><p>2019-06-18</p></body></html>"
    assert date_from_html(html, "What?! (part 2)", REF) == "2019-06-18"
