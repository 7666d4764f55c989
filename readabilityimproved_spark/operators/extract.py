"""The extraction operator: spans-in -> spans-out as one fused Arrow kernel.

Spark mapping of the reference's whole per-document pipeline
(Extractor.main driving ReadabilityForImg.init, Extractor.java:77-130):
a single ``mapInPandas`` stage so every DOM operator (P*/C*/A*/I*,
SURVEY.md §2) runs tree-at-a-time inside one Arrow batch — columnar at
the boundary, scalar kernel inside, zero per-row Python at the Spark
layer (BASELINE.json: "no per-row Python anywhere").

Input:  doc_id string, spans array<struct<kind,text,media_ref,offset>>,
        optional base_uri string, optional part int (passed through).
Output: doc_id, part, spans (extracted), n_spans, n_images, status.

Why mapInPandas and not pandas_udf: the kernel returns a variable-length
nested array per doc plus metrics columns; an iterator of DataFrames also
lets one batch of giant documents stream through without concat-ing the
whole partition.
"""

from __future__ import annotations

import datetime as dt
import html
from collections.abc import Iterator
from functools import partial

import pandas as pd

from ..kernel.dates import DEFAULT_REF_DATE
from ..kernel.readability import ExtractionResult, extract_document

EXTRACTED_SCHEMA = (
    "doc_id string, part int, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, "
    "n_spans int, n_images int, top_score int, status string"
)

#: documents whose reconstructed HTML exceeds this are not parsed at all
#: (status='oversize'); protects executor memory/CPU from pathological
#: inputs at 10^12-doc scale (SURVEY.md §7)
MAX_HTML_BYTES = 20 * 1024 * 1024


def reconstruct_html(spans: list[dict]) -> str:
    """Rebuild the page from its span sequence (offset order).

    kind='html'/'text' spans contribute their text; kind='image' spans
    (bare media attachments) materialize as plain ``<img src=...>`` tags
    so the kernel sees them in document position.
    """
    parts = []
    for span in sorted(spans, key=lambda s: s["offset"] if s["offset"] is not None else 0):
        kind = span.get("kind")
        if kind == "image":
            ref = span.get("media_ref") or ""
            # escape the attribute value: a '"' or '>' inside the ref would
            # otherwise truncate the tag and silently distort extraction
            parts.append(f'<img src="{html.escape(ref, quote=True)}">')
        else:
            parts.append(span.get("text") or "")
    return "".join(parts)


def _extract_batches(
    batches: Iterator[pd.DataFrame],
    ref_date: dt.datetime,
    variant: str,
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        has_base = "base_uri" in pdf.columns
        has_part = "part" in pdf.columns
        out_rows = []
        for row in pdf.itertuples(index=False):
            spans_in = getattr(row, "spans")
            html = reconstruct_html(
                [dict(s) for s in spans_in] if spans_in is not None else []
            )
            base_uri = getattr(row, "base_uri") if has_base else ""
            if not isinstance(base_uri, str):  # None/NaN from null columns
                base_uri = ""
            if len(html) > MAX_HTML_BYTES:
                result = ExtractionResult(spans=[], status="oversize")
            else:
                result = extract_document(
                    html, base_uri=base_uri, ref_date=ref_date, variant=variant
                )
            part_val = getattr(row, "part") if has_part else None
            out_rows.append(
                {
                    "doc_id": getattr(row, "doc_id"),
                    "part": int(part_val) if not pd.isna(part_val) else -1,
                    "spans": [
                        {"kind": k, "text": t, "media_ref": m, "offset": o}
                        for (k, t, m, o) in result.spans
                    ],
                    "n_spans": len(result.spans),
                    "n_images": len(result.images),
                    # the reference's scored-DOM intermediate distilled to
                    # its decisive number (top candidate content score,
                    # cf. test/newsHTML.txt golden dump)
                    "top_score": result.top_content_score,
                    "status": result.status,
                }
            )
        yield pd.DataFrame(
            out_rows,
            columns=[
                "doc_id", "part", "spans", "n_spans", "n_images",
                "top_score", "status",
            ],
        )


def extract_spans(df, ref_date: dt.datetime = DEFAULT_REF_DATE, variant: str = "img"):
    """documents(doc_id, spans[, base_uri, part]) -> extracted table."""
    kernel = partial(_extract_batches, ref_date=ref_date, variant=variant)
    return df.mapInPandas(kernel, schema=EXTRACTED_SCHEMA)
