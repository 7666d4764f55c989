"""PDF / layout-parse tier: positioned text blocks -> ordered spans.

The north rule's extraction scope is "HTML boilerplate strip, PDF/layout
parse, DOM heuristics"; the HTML path is the kernel
(kernel/readability.py), this module is the layout path. A layout
document is a flat table of positioned blocks::

    (doc_id, page int, block_id int,
     x0 double, y0 double, x1 double, y1 double, text string)

-- the shape every PDF text extractor (pdfminer, PyMuPDF, pdfplumber)
emits. The operators reconstruct reading order and strip page furniture
with DETERMINISTIC rules so results are engine-independent and
oracle-checkable; the actual PDF binary -> blocks decode is a plug
point (``decode_pdf_blocks``), stubbed like the multimodal codecs
because no PDF library ships in this container, with a deterministic
fake twin (``fake_pdf_blocks``) that keeps all the Spark-side plumbing
real and driver-verified.

Scale design (10^12 documents):

* every window partitions on ``doc_id`` -- per-document state only, so
  the tier parallelizes across the corpus with ONE hash exchange on
  doc_id (both window functions share the partitioning; Catalyst plans
  one Exchange + two in-partition sorts);
* furniture detection is a per-doc groupBy (map-side partial
  aggregation on (doc_id, text-key) -- never a corpus-global key) and a
  left-anti join back, both on doc-local keys;
* no Python anywhere: pure built-in expressions, whole-stage codegen
  end to end (only the stubbed decode would be a mapInPandas).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: US-Letter points; PDF's historical default media box width
DEFAULT_PAGE_WIDTH = 612.0


def reading_order(
    blocks: DataFrame, page_width: float = DEFAULT_PAGE_WIDTH
) -> DataFrame:
    """Add ``order_idx`` (1-based, per doc): banded two-column Manhattan
    reading order.

    Rule (deterministic; the simplified XY-cut every layout-analysis
    paper starts from):

    * a block is FULL-WIDTH if it straddles the page midline
      (``x0 < mid < x1``); otherwise it is in the left (``x1 <= mid``)
      or right column;
    * each full-width block opens a new vertical BAND; blocks below it
      (and above the next full-width block) belong to that band;
    * within a band: the full-width opener first, then the ENTIRE left
      column top-to-bottom, then the right column (newspaper order --
      NOT naive y-order, which interleaves the columns);
    * bands in y-order, pages in page order; ties broken by
      (y0, x0, block_id) everywhere for determinism.

    Both windows partition on doc_id only (band numbering is monotone
    across pages because the ordering leads with ``page``, and only the
    final ``order_idx`` is emitted) -- one exchange, two sorts.
    """
    mid = F.lit(page_width / 2.0)
    is_full = (F.col("x0") < mid) & (F.col("x1") > mid)
    col = F.when(is_full, F.lit(-1)).when(
        F.col("x1") <= mid, F.lit(0)
    ).otherwise(F.lit(1))
    w_band = (
        Window.partitionBy("doc_id")
        .orderBy("page", "y0", "x0", "block_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_band = blocks.withColumn("_col", col).withColumn(
        "_band", F.sum(is_full.cast("int")).over(w_band)
    )
    w_order = Window.partitionBy("doc_id").orderBy(
        "page", "_band", "_col", "y0", "x0", "block_id"
    )
    return with_band.withColumn(
        "order_idx", F.row_number().over(w_order)
    ).drop("_col", "_band")


def strip_repeated_furniture(
    blocks: DataFrame,
    min_pages: int = 2,
    y_bucket: float = 20.0,
) -> DataFrame:
    """Drop page furniture: blocks whose normalized text recurs at
    (nearly) the same vertical position on >= ``min_pages`` pages of
    the SAME document -- running headers, footers, page numbers with
    the number normalized away.

    Normalization: lowercase, trimmed, digit runs collapsed to ``#``
    (so "Page 3" == "Page 17"). Vertical tolerance via a
    ``floor(y0 / y_bucket)`` bucket. Detection is a per-doc groupBy on
    (doc_id, norm, bucket) counting DISTINCT pages (map-side partial),
    then a left-anti join back on the same doc-local key -- nothing
    keys on corpus-global values, so giant corpora add tasks, not skew.
    """
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"[0-9]+", "#")
    yb = F.floor(F.col("y0") / F.lit(y_bucket))
    keyed = blocks.withColumn("_norm", norm).withColumn("_yb", yb)
    furniture = (
        keyed.groupBy("doc_id", "_norm", "_yb")
        .agg(F.count_distinct("page").alias("_np"))
        .filter(F.col("_np") >= min_pages)
        .select("doc_id", "_norm", "_yb")
    )
    return keyed.join(
        furniture, ["doc_id", "_norm", "_yb"], "left_anti"
    ).drop("_norm", "_yb")


def layout_spans(
    blocks: DataFrame,
    page_width: float = DEFAULT_PAGE_WIDTH,
    min_pages: int = 2,
    y_bucket: float = 20.0,
) -> DataFrame:
    """The layout tier end-to-end: strip furniture, reconstruct reading
    order, and emit the engine's span shape (SURVEY.md §1) --
    ``(doc_id, kind, text, media_ref, span_offset)`` with
    ``span_offset`` dense from 0 in reading order. The PDF-path
    counterpart of the HTML flagship's output contract."""
    kept = strip_repeated_furniture(
        blocks, min_pages=min_pages, y_bucket=y_bucket
    )
    ordered = reading_order(kept, page_width=page_width)
    return ordered.select(
        "doc_id",
        F.lit("text").alias("kind"),
        "text",
        F.lit(None).cast("string").alias("media_ref"),
        (F.col("order_idx") - 1).cast("int").alias("span_offset"),
    )


# ---------------------------------------------------------------------------
# PDF decode plug point + deterministic fake twin (no PDF lib in container)
# ---------------------------------------------------------------------------

def decode_pdf_blocks(df: DataFrame, binary_col: str = "data") -> DataFrame:
    """Plug point: PDF binary -> positioned block table.

    A real deployment maps ``binary_col`` through a pdfminer/PyMuPDF
    Arrow batch (mapInPandas, same pattern as
    operators/multimodal.py); neither library ships in this container,
    so this raises at the documented plug point. The Spark-side
    contract (block schema, per-doc explode shape) is exercised by
    ``fake_pdf_blocks``, which the driver verifies end to end."""
    raise NotImplementedError(
        "PDF decoding needs pdfminer/PyMuPDF (not in this container); "
        "use fake_pdf_blocks for the deterministic plumbing twin"
    )


#: fake layout geometry (points, US-Letter): mid = 306
_TOKENS_PER_BLOCK = 4
_SLOTS_PER_PAGE = 7  # slot 0 = full-width title band, 1-6 = 2 cols x 3 rows
_FOOTER_BLOCK_BASE = 100_000


def fake_pdf_blocks(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    with_footer: bool = True,
) -> DataFrame:
    """Deterministic fake decode: documents -> positioned blocks.

    Chunks the document's whitespace tokens into 4-token blocks laid
    out 7 to a page: slot 0 a full-width title band (y=40), slots 1-6
    a 2-column x 3-row grid (left 36-288, right 324-576; rows at
    y=100/300/500) -- so naive y-order INTERLEAVES the columns and the
    reading-order operator must un-interleave them. ``with_footer``
    adds an identical full-width footer block (y=770) on every page:
    multi-page documents get recurring furniture for
    strip_repeated_furniture to find; single-page ones keep it.

    Pure narrow ops (split + explode bounded by token count); the
    arithmetic is integer/half-point exact so the DuckDB oracle
    replicates it bit-for-bit.
    """
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("toks"),
    ).withColumn(
        "nb",
        F.ceil(F.size("toks") / F.lit(float(_TOKENS_PER_BLOCK))).cast("int"),
    )
    b = d.select(
        "doc_id",
        "toks",
        F.explode(F.sequence(F.lit(0), F.col("nb") - 1)).alias("block_id"),
    )
    slot = F.pmod(F.col("block_id"), F.lit(_SLOTS_PER_PAGE))
    row = ((slot - 1) / 2).cast("int")  # grid row for slots 1-6
    left = F.pmod(slot - 1, F.lit(2)) == 0  # slots 1,3,5 left; 2,4,6 right
    content = b.select(
        "doc_id",
        (F.col("block_id") / _SLOTS_PER_PAGE).cast("int").alias("page"),
        "block_id",
        F.when(slot == 0, F.lit(36.0))
        .when(left, F.lit(36.0))
        .otherwise(F.lit(324.0))
        .alias("x0"),
        F.when(slot == 0, F.lit(40.0))
        .otherwise((100 + row * 200).cast("double"))
        .alias("y0"),
        F.when(slot == 0, F.lit(576.0))
        .when(left, F.lit(288.0))
        .otherwise(F.lit(576.0))
        .alias("x1"),
        F.when(slot == 0, F.lit(60.0))
        .otherwise((280 + row * 200).cast("double"))
        .alias("y1"),
        F.array_join(
            F.slice(
                F.col("toks"),
                F.col("block_id") * _TOKENS_PER_BLOCK + 1,
                _TOKENS_PER_BLOCK,
            ),
            " ",
        ).alias("text"),
    )
    if not with_footer:
        return content
    footers = (
        content.select("doc_id", "page")
        .distinct()
        .select(
            "doc_id",
            "page",
            (F.lit(_FOOTER_BLOCK_BASE) + F.col("page")).alias("block_id"),
            F.lit(36.0).alias("x0"),
            F.lit(770.0).alias("y0"),
            F.lit(576.0).alias("x1"),
            F.lit(790.0).alias("y1"),
            F.concat(
                F.lit("confidential draft p. "),
                (F.col("page") + 1).cast("string"),
            ).alias("text"),
        )
    )
    return content.unionByName(footers)
