"""Title extraction (Extractor.getTitle, Extractor.java:28-76).

Algorithm: take <title> text and all <h1> elements; sort h1s by text
length descending (stable); return the first non-empty h1 whose text
equals the title, equals the title's prefix of len(h1)-1 chars (a
reference quirk: the lengths differ so this leg never fires), or
CONTAINS the title. If there are no h1s but a title exists, return the
title; otherwise None.

Deviation: Java ``substring(0, h1len-1)`` throws when the h1 text is
longer than the title+1; Python slicing doesn't -- we keep slice
semantics (the comparison is always false either way).
"""

from __future__ import annotations

from ..dom import Document, parse


def get_title_from_doc(doc: Document) -> str | None:
    title_tags = doc.get_elements_by_tag("title", include_self=False)
    h1_tags = doc.get_elements_by_tag("h1", include_self=False)

    if title_tags and h1_tags:
        title_text = title_tags[0].text().strip()
        # stable sort by text length desc (Extractor.java:37-48)
        for h1 in sorted(h1_tags, key=lambda e: -len(e.text())):
            h1_full = h1.text()
            if len(h1_full) == 0:
                continue
            h1text = h1_full.strip()
            if (
                h1text == title_text
                or h1text == title_text[: len(h1text) - 1]
                or title_text in h1text
            ):
                return h1_full  # un-trimmed, like the reference
        return None
    if not h1_tags and title_tags:
        return title_tags[0].text()
    return None


def get_title(html: str, base_uri: str = "") -> str | None:
    try:
        return get_title_from_doc(parse(html, base_uri))
    except Exception:
        return None
