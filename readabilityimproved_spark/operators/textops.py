"""Batched text operators over span-shaped tables: title extraction and
per-document content scoring surface (the reference's scored-DOM debug
intermediate, ReadabilityForImg.java:786-791, as a queryable column)."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from ..kernel.title import get_title
from .extract import reconstruct_html

TITLE_SCHEMA = "doc_id string, title string"


def _title_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        has_base = "base_uri" in pdf.columns
        rows = []
        for row in pdf.itertuples(index=False):
            spans = getattr(row, "spans")
            html = reconstruct_html(
                [dict(s) for s in spans] if spans is not None else []
            )
            base = getattr(row, "base_uri") if has_base else ""
            rows.append(
                {"doc_id": getattr(row, "doc_id"), "title": get_title(html, base or "")}
            )
        yield pd.DataFrame(rows, columns=["doc_id", "title"])


def extract_titles(df):
    """documents(doc_id, spans[, base_uri]) -> (doc_id, title)."""
    return df.mapInPandas(_title_batches, schema=TITLE_SCHEMA)
