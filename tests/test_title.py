"""T0 title extraction (Extractor.java:28-76) unit vectors."""

from readabilityimproved_spark.kernel.title import get_title


def test_h1_equals_title():
    assert get_title("<title>Foo Bar</title><h1>Foo Bar</h1>") == "Foo Bar"


def test_h1_contains_title():
    html = "<title>Foo</title><h1>Breaking: Foo today</h1>"
    assert get_title(html) == "Breaking: Foo today"


def test_no_h1_falls_back_to_title():
    assert get_title("<title>Just Title</title><p>x</p>") == "Just Title"


def test_unrelated_h1_returns_none():
    assert get_title("<title>Foo</title><h1>Other</h1>") is None


def test_no_title_no_h1():
    assert get_title("<p>x</p>") is None
    assert get_title("<h1>Only H1</h1>") is None


def test_longest_h1_wins():
    # sorted by text length desc; the longer matching h1 is tried first
    html = (
        "<title>Foo</title>"
        "<h1>Foo</h1>"
        "<h1>Much Longer Heading Containing Foo Inside</h1>"
    )
    assert get_title(html) == "Much Longer Heading Containing Foo Inside"


def test_empty_h1_skipped():
    html = "<title>Foo</title><h1></h1><h1>Foo</h1>"
    assert get_title(html) == "Foo"


def test_prefix_leg_never_fires():
    # the substring(0, len-1) comparison compares different lengths --
    # reference quirk kept: never equal
    html = "<title>Foobar</title><h1>Fooba</h1>"  # h1 = title[:5], len 5 vs 5...
    # h1text == title_text[:len(h1text)-1] -> 'Fooba' == 'Foob' -> False
    assert get_title(html) is None