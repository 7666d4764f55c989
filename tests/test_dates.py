"""date_from_url vectors from FIXTURES.md §3 (TimeUtil.java:124-261)."""

import datetime as dt

from readabilityimproved_spark.kernel.dates import (
    date_from_url,
    lenient_date,
    string2date,
    time_difference_days,
)

REF = dt.datetime(2019, 6, 18, 12, 0, 0)


def test_l1_separated():
    assert date_from_url("http://h/2019-06/18/img1.jpg", REF) == "2019-06-18"
    assert date_from_url("http://h/2019/6/8/x.html", REF) == "2019-06-08"
    assert date_from_url("http://h/a_2018.12.31_b", REF) == "2018-12-31"


def test_trailing_nondigit_guard():
    # L1 pattern 1 needs a char AFTER the date; end-of-string does not match
    # pattern 1 but the plain 8-digit pattern may still fire elsewhere.
    assert date_from_url("http://h/x-2019-06-18", REF) is None


def test_8digit_and_future_rejection():
    assert date_from_url("http://h/20150923/a.html", REF) == "2015-09-23"
    # future vs ref_date -> rejected (isNormalDate)
    assert date_from_url("http://h/20290101/a.html", REF) is None
    # 1912.html: '1912' is only 4 digits of [12][09]\d\d -> group len != 8
    assert date_from_url("http://h/1912.html", REF) is None


def test_yyyymm_sep_dd():
    assert date_from_url("http://h/201906/18/x.jpg", REF) == "2019-06-18"


def test_mdy():
    assert date_from_url("http://h/6/18/2019/x", REF) == "2019-06-18"


def test_l2_two_digit_year():
    assert date_from_url("http://h/19-06-18/x.jpg", REF) == "2019-06-18"


def test_year_1990_gate():
    # yyyy must be > 1990 for L1 (TimeUtil.java:135)
    assert date_from_url("http://h/1989-06-18/x.jpg", REF) is None


def test_empty_and_none():
    assert date_from_url(None, REF) is None
    assert date_from_url("  ", REF) is None
    assert date_from_url("http://h/nodate/x.jpg", REF) is None


def test_lenient_rollover():
    # SimpleDateFormat lenient parse: Feb 31 -> Mar 3
    assert lenient_date(2019, 2, 31) == dt.datetime(2019, 3, 3)
    assert string2date("2019-02-31") == dt.datetime(2019, 3, 3)


def test_time_difference_truncates():
    d1 = dt.datetime(2019, 6, 18)
    assert time_difference_days(d1, dt.datetime(2019, 6, 20)) == 2
    # a fractional day truncates toward zero (also for negatives)
    assert time_difference_days(d1, dt.datetime(2019, 6, 18, 23)) == 0
    assert time_difference_days(d1, dt.datetime(2019, 6, 17, 1)) == 0
