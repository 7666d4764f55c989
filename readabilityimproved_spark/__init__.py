"""PySpark-native main-content extraction engine.

A brand-new implementation (not a port) of the capabilities of
``francisforeverhappy/ReadabilityImproved``: arc90-Readability-style
main-content extraction plus inline-image extraction, re-expressed as a
vectorized Arrow/pandas-UDF pipeline over Iceberg-shaped tables of
interleaved text+media documents ``(doc_id, spans)``.

Layout:
    javacompat   -- Java int/float/split semantics the reference relies on
    patterns     -- the compiled regex batteries (both variants)
    dom          -- lightweight mutable DOM on html.parser (jsoup stand-in)
    kernel/      -- per-document scalar kernels (text + image scoring)
    functions/   -- pure Spark column expressions (oracle-checkable)
    operators/   -- DataFrame-level operators (extract, dedup, similarity)
    sources/     -- synthetic corpus generator + IO helpers
    plans/       -- end-to-end pipeline (partitioning, lineage, resume)
    streaming/   -- Structured Streaming variant of the extraction job
"""

__version__ = "0.1.0"
