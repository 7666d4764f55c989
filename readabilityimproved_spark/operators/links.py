"""Outlink extraction over interleaved documents — the crawl-frontier /
link-graph side of a web-scale extraction engine.

The reference's pipeline consumes pages a crawler fetched; a production
deployment of the same engine also has to FEED that crawler: every page's
anchors, resolved to absolute URLs, become the next frontier, and the
host-to-host aggregate of those edges drives scheduling and per-host
quality priors. This module extracts both from the same interleaved span
representation the extraction kernel reads (reconstruct -> parse ->
anchor walk, `dom.py`'s jsoup-style ``absUrl`` resolution, cf.
reference `Extractor.java:17-26` where jsoup's Document carries the
fetch URL as its base URI).

Scale shape:

* `extract_outlinks` is ONE `mapInPandas` stage — Arrow-batched,
  tree-at-a-time inside, zero per-row Python at the Spark layer, and a
  narrow map (no shuffle: output partitioning = input partitioning).
  The same oversize guard as the extraction kernel applies, and
  ``max_links_per_doc`` caps the fan-out so a pathological 10^6-anchor
  page cannot blow up one batch's memory.
* `host_link_graph` is a single groupBy over (src_host, dst_host) —
  hosts are short strings with heavy map-side combine (a host appears
  once per shuffle key regardless of how many billions of links it
  receives), so the exchange carries the DISTINCT host-pair space, not
  the edge volume.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..dom import parse
from .extract import MAX_HTML_BYTES, reconstruct_html

OUTLINKS_SCHEMA = (
    "doc_id string, link_no int, url string, anchor string, rel string"
)


def _outlink_batches(
    batches: Iterator[pd.DataFrame], max_links: int
) -> Iterator[pd.DataFrame]:
    cols = ["doc_id", "link_no", "url", "anchor", "rel"]
    for pdf in batches:
        has_base = "base_uri" in pdf.columns
        rows = []
        for row in pdf.itertuples(index=False):
            spans_in = getattr(row, "spans")
            html = reconstruct_html(
                [dict(s) for s in spans_in] if spans_in is not None else []
            )
            if len(html) > MAX_HTML_BYTES:
                continue  # same oversize policy as the extraction kernel
            base_uri = getattr(row, "base_uri") if has_base else ""
            if not isinstance(base_uri, str):
                base_uri = ""
            doc = parse(html, base_uri=base_uri)
            link_no = 0
            for a in doc.get_elements_by_tag("a", include_self=False):
                if link_no >= max_links:
                    break
                if not a.attr("href"):
                    continue  # anchors without a target aren't links
                url = a.abs_url("href")
                if not url:
                    continue  # unresolvable (no base + relative href)
                rows.append(
                    {
                        "doc_id": getattr(row, "doc_id"),
                        "link_no": link_no,
                        "url": url,
                        "anchor": a.text(),
                        "rel": a.attr("rel"),
                    }
                )
                link_no += 1
        yield pd.DataFrame(rows, columns=cols)


def extract_outlinks(df: DataFrame, max_links_per_doc: int = 10_000) -> DataFrame:
    """documents(doc_id, spans[, base_uri]) ->
    (doc_id, link_no, url, anchor, rel): every resolvable anchor, in
    document (DOM pre-order) position, href resolved against the page's
    base URI (jsoup ``absUrl`` semantics — relative hrefs with no base
    resolve to '' and are dropped). ``link_no`` numbers the EMITTED
    links 0..k-1. ``rel`` is the raw attribute ('' when absent) so the
    caller can apply nofollow policy — dropping is policy, not
    extraction.
    """
    if max_links_per_doc < 1:
        raise ValueError(
            f"max_links_per_doc must be >= 1, got {max_links_per_doc}"
        )

    def gen(batches):
        return _outlink_batches(batches, max_links_per_doc)

    return df.mapInPandas(gen, schema=OUTLINKS_SCHEMA)


def host_link_graph(
    outlinks: DataFrame, src_url_col: str = "base_uri"
) -> DataFrame:
    """(src_host, dst_host, n_links): the host-level aggregate of an
    outlink table that carries the page URL in ``src_url_col``. Hosts
    are lowercased; rows whose src or dst host cannot be parsed are
    dropped (a graph edge needs both ends).
    """
    # try_parse_url: a malformed URL must become NULL (dropped below),
    # not an [INVALID_URL] job failure — one bad row in 10^12 cannot be
    # allowed to kill the aggregation
    src = F.lower(F.try_parse_url(F.col(src_url_col), F.lit("HOST")))
    dst = F.lower(F.try_parse_url(F.col("url"), F.lit("HOST")))
    return (
        outlinks.select(src.alias("src_host"), dst.alias("dst_host"))
        .filter(F.col("src_host").isNotNull() & F.col("dst_host").isNotNull())
        .groupBy("src_host", "dst_host")
        .agg(F.count(F.lit(1)).alias("n_links"))
    )


def registrable_domain(url_col: str, labels: int = 2) -> F.Column:
    """The last ``labels`` dot-labels of the URL's host, lowercased —
    the blocklist join key. With the default 2 this is the registrable
    domain for generic TLDs (example.com); ccTLD second-level registries
    (co.uk) need ``labels=3`` or a public-suffix table — a real PSL is a
    data file, not an algorithm, so it is the caller's plug point.
    Malformed URLs yield NULL."""
    if labels < 1:
        raise ValueError(f"labels must be >= 1, got {labels}")
    host = F.lower(F.try_parse_url(F.col(url_col), F.lit("HOST")))
    parts = F.split(host, r"\.")
    n = F.size(parts)
    start = F.greatest(n - F.lit(labels) + 1, F.lit(1))
    return F.array_join(F.slice(parts, start, F.lit(labels)), ".")


def filter_blocked_domains(
    df: DataFrame,
    blocked: DataFrame,
    url_col: str = "url",
    labels: int = 2,
    mode: str = "drop",
) -> DataFrame:
    """Drop (``mode='drop'``) or keep-only (``mode='keep'``) rows whose
    URL's registrable domain appears in ``blocked`` (a one-column
    DataFrame of domains, matched case-insensitively). Rows with an
    unparsable URL are KEPT under 'drop' (an unparsable URL proves
    nothing against the row) and dropped under 'keep'.

    Scale shape: one narrow domain projection + ONE broadcast hash
    anti/semi-join — the corpus never shuffles and the blocklist (even
    millions of domains) broadcasts once per executor. This is the C4 /
    CommonCrawl-style domain-blocklist gate as a join, not a per-row
    regex scan over the list.
    """
    if mode not in ("drop", "keep"):
        raise ValueError(f"mode must be 'drop' or 'keep', got {mode!r}")
    if len(blocked.columns) != 1:
        raise ValueError(
            f"blocked must have exactly one column, got {blocked.columns}"
        )
    if url_col not in df.columns:
        raise ValueError(
            f"url column {url_col!r} not in input; columns: {df.columns}"
        )
    key = blocked.columns[0]
    # no distinct(): semi/anti join semantics ignore duplicate build
    # keys, and dropping it keeps the ENTIRE plan exchange-free apart
    # from the broadcast itself
    bl = blocked.select(
        F.lower(F.trim(F.col(key))).alias("_blocked_domain")
    )
    tagged = df.withColumn("_dom", registrable_domain(url_col, labels))
    how = "left_anti" if mode == "drop" else "left_semi"
    out = tagged.join(
        F.broadcast(bl),
        tagged["_dom"] == F.col("_blocked_domain"),
        how,
    )
    return out.drop("_dom")
