"""Java-semantics helpers: the quirks everything else leans on."""

import math

from readabilityimproved_spark.javacompat import (
    INT_MAX,
    INT_MIN,
    comma_segments,
    java_split,
    jdiv,
    jfloat_div,
    jint,
)


def test_jdiv_truncates_toward_zero():
    assert jdiv(7, 2) == 3
    assert jdiv(-7, 2) == -3  # Python // would give -4
    assert jdiv(7, -2) == -3
    assert jdiv(-7, -2) == 3
    assert jdiv(1, 2) == 0
    assert jdiv(-1, 2) == 0


def test_jint_truncation_and_nan():
    assert jint(4.9) == 4
    assert jint(-4.9) == -4
    assert jint(float("nan")) == 0  # Java (int)NaN == 0
    assert jint(float("inf")) == INT_MAX
    assert jint(float("-inf")) == INT_MIN
    assert jint(7 * 0.7) == 4  # the C8 scale case from FIXTURES.md


def test_jfloat_div():
    assert math.isnan(jfloat_div(0.0, 0.0))
    assert jfloat_div(1.0, 0.0) == float("inf")
    assert jfloat_div(-1.0, 0.0) == float("-inf")
    assert jfloat_div(1.0, 2.0) == 0.5
    # NaN comparisons are all false (drives C7/C11 behavior)
    nan = jfloat_div(0.0, 0.0)
    assert not (nan < 0.25) and not (nan > 0.25) and not (nan == 0.0)


def test_java_split_trailing_empties():
    assert java_split("a,b,,", ",") == ["a", "b"]
    assert java_split("", ",") == [""]  # Java: [""] for empty input
    assert java_split(",,,", ",") == []
    assert java_split("abc", ",") == ["abc"]
    assert java_split("a  b", " ") == ["a", "", "b"]


def test_comma_segments():
    # Java "a,b，c".split(",|，").length == 3 (full-width comma splits too)
    assert comma_segments("a,b，c") == 3
    assert comma_segments("hello") == 1
    assert comma_segments("a,b,") == 2  # trailing comma adds no segment
    assert comma_segments("") == 1
    assert comma_segments(",x") == 2  # leading empty IS kept
