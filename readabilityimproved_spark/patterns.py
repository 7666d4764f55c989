"""Regex batteries from both reference variants, compiled once per process.

Mirrors the lazy ``Pattern`` singletons (Readability.java:694-768,
ReadabilityForImg.java:1345-1458). Two variants exist because the image
fork tweaked several alternations:

  * UNLIKELY_CANDIDATES: the img variant drops ``header``
    (Readability.java:718 vs ReadabilityForImg.java:1376)
  * POSITIVE: img variant adds ``main`` (ReadabilityForImg.java:1389)
  * NEGATIVE: img variant adds ``share|scan`` (ReadabilityForImg.java:1397)

All matching is CASE_INSENSITIVE ``find()`` (= ``re.search``).
"""

from __future__ import annotations

import re

I = re.IGNORECASE

#: Java regex \s is ASCII-only ([ \t\n\x0B\f\r]); Python \s matches
#: unicode whitespace (\xa0, 　) and would over-match on nbsp pages
JS = r"[ \t\n\x0B\f\r]"

# --- shared string-rewrite regexes (Readability.java:701-706) -------------
REGEX_REPLACE_BRS = re.compile(r"(<br[^>]*>[ \n\r\t]*){2,}", I)
REGEX_REPLACE_FONTS = re.compile(r"<(\/?)font[^>]*>", I)
REGEX_NORMALIZE = re.compile(JS + r"{2,}")
REGEX_KILL_BREAKS = re.compile(r"(<br" + JS + r"*\/?>(" + JS + r"|&nbsp;?)*){1,}")

# --- text variant (Readability.java:712-767) ------------------------------
UNLIKELY_CANDIDATES_TEXT = re.compile(
    r"combx|comment|disqus|foot|header|menu|meta|nav|rss|shoutbox|sidebar|sponsor", I
)
POSITIVE_TEXT = re.compile(
    r"article|body|content|entry|hentry|page|pagination|post|text", I
)
NEGATIVE_TEXT = re.compile(
    r"combx|comment|contact|foot|footer|footnote|link|media|meta|promo|related"
    r"|scroll|shoutbox|sponsor|tags|widget",
    I,
)

# --- img variant (ReadabilityForImg.java:1371-1457) ------------------------
UNLIKELY_CANDIDATES_IMG = re.compile(
    r"combx|comment|disqus|foot|menu|meta|nav|rss|shoutbox|sidebar|sponsor", I
)
POSITIVE_IMGVARIANT = re.compile(
    r"article|body|content|entry|hentry|page|pagination|post|text|main", I
)
NEGATIVE_IMGVARIANT = re.compile(
    r"combx|comment|contact|foot|footer|footnote|link|media|meta|promo|related"
    r"|scroll|shoutbox|sponsor|tags|widget|share|scan",
    I,
)

# --- shared candidate regexes ----------------------------------------------
OK_MAYBE_ITS_A_CANDIDATE = re.compile(r"and|article|body|column|main", I)
DIV_TO_P_ELEMENTS = re.compile(r"<(a|blockquote|dl|div|img|ol|p|pre|table|ul)", I)
VIDEO = re.compile(r"http:\/\/(www\.)?(youtube|vimeo)\.com", I)

# --- image scoring regexes (ReadabilityForImg.java:1415-1453) ---------------
IMGPARENT_CANDIDATES = re.compile(
    r"center|text-align(" + JS + r")?:(" + JS + r")?center", I
)
IMG_UNLIKELY_CANDIDATES = re.compile(r"display(" + JS + r")?:(" + JS + r")?none", I)
POSITIVE_IMG = re.compile(
    r"article|body|content|entry|hentry|image-container|main|news|page|photo|post|text",
    I,
)
NEGATIVE_IMG = re.compile(
    r"bar|combx|cursor|header|link|pointer|promo|related|scroll|share|shoutbox"
    r"|uppage|widget",
    I,
)
REMOVE_IMG = re.compile(
    r"-ads|ad1|ad2|^[a-zA-Z]ads|advertise|comment|contact|facebook|flashplayer"
    r"|foot|icon|logo|meta|qq|qrcode|scan|sina|sponsor|tags|twitter|vote|weibo"
    r"|weixin|点赞|分享|参与互动|微信公众号",
    I,
)

# width/height style attribute parsing (ReadabilityForImg.java:286-311)
STYLE_WIDTH = re.compile(
    r"width(" + JS + r")?:(" + JS + r")?[0-9]+(([pP][xX])|%)?;", I
)
STYLE_HEIGHT = re.compile(
    r"height(" + JS + r")?:(" + JS + r")?[0-9]+(([pP][xX])|%)?;", I
)
DIGITS = re.compile(r"[0-9]+")
PX_UNIT = re.compile(r"[pP][xX]")

# sibling "sentence-ish" check, Java String.matches = full match
# (Readability.java:435)
SENTENCE_FULLMATCH = re.compile(r".*\.( |$).*")


class Variant:
    """Regex bundle for one reference variant."""

    __slots__ = ("unlikely", "positive", "negative", "noscript_minus5", "name")

    def __init__(self, name, unlikely, positive, negative, noscript_minus5):
        self.name = name
        self.unlikely = unlikely
        self.positive = positive
        self.negative = negative
        # img variant adds noscript to the -5 tag prior list
        # (ReadabilityForImg.java:388)
        self.noscript_minus5 = noscript_minus5


TEXT_VARIANT = Variant(
    "text", UNLIKELY_CANDIDATES_TEXT, POSITIVE_TEXT, NEGATIVE_TEXT, False
)
IMG_VARIANT = Variant(
    "img", UNLIKELY_CANDIDATES_IMG, POSITIVE_IMGVARIANT, NEGATIVE_IMGVARIANT, True
)
