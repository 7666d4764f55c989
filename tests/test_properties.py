"""Property tests: kernel totality and Python-vs-DuckDB scalar equivalence.

The date/comma SQL renderings (functions/sqlgen.py) must agree with the
Python kernel implementations on arbitrary inputs — this is what keeps
the driver oracle honest when inputs drift.
"""

import datetime as dt

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from readabilityimproved_spark.functions import sqlgen
from readabilityimproved_spark.javacompat import comma_segments
from readabilityimproved_spark.kernel.dates import date_from_url
from readabilityimproved_spark.kernel.readability import extract_document
from readabilityimproved_spark.dom import parse

REF = dt.datetime(2019, 6, 18, 12, 0, 0)


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


DATE_SQL = (
    "SELECT " + sqlgen.date_from_url_sql("u", sqlgen.DUCKDB)
    + " FROM (SELECT ?::VARCHAR AS u)"
)
COMMA_SQL = (
    "SELECT " + sqlgen.comma_segments_sql("u", sqlgen.DUCKDB)
    + " FROM (SELECT ?::VARCHAR AS u)"
)


# url-ish strings: digits, separators, path chars
_URL_ALPHABET = "0123456789-_./abcxyz:"


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=_URL_ALPHABET, min_size=0, max_size=60))
def test_date_from_url_matches_duckdb(duck, s):
    url = "http://h/" + s
    py = date_from_url(url, REF)
    db = duck.execute(DATE_SQL, [url]).fetchone()[0]
    assert py == db, f"url={url!r} py={py!r} duckdb={db!r}"


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="ab ,，", min_size=0, max_size=30))
def test_comma_segments_matches_duckdb(duck, s):
    py = comma_segments(s)
    db = duck.execute(COMMA_SQL, [s]).fetchone()[0]
    assert py == db, f"s={s!r} py={py} duckdb={db}"


# html-ish soup including tags, entities, brokenness
_HTML_ALPHABET = "<>/=\"' abcdeipl123&;-"


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=_HTML_ALPHABET, min_size=0, max_size=200))
def test_kernel_total_on_soup(s):
    r = extract_document(s, base_uri="http://h/2019-06/18/x.html")
    assert r.status == "ok" or r.status.startswith(("error", "oversize"))
    # offsets always dense regardless of input
    assert [sp[3] for sp in r.spans] == list(range(len(r.spans)))


@settings(max_examples=150, deadline=None)
@given(st.text(alphabet=_HTML_ALPHABET, min_size=0, max_size=150))
def test_dom_roundtrip_stable(s):
    # parse -> serialize -> parse -> serialize must be a fixed point
    doc = parse(s)
    once = doc.body().html()
    doc2 = parse(once)
    assert doc2.body().html() == once
