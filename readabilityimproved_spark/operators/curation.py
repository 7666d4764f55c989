"""Training-corpus curation operators: the steps between "extracted
web documents" and "training-ready data" that the extraction engine's
users run next. No reference analogue (the reference stops at span
extraction); these are the engine's Spark-first additions, shaped by
the same scale rules as the dedup tier.

* ``decontaminate`` — benchmark n-gram overlap (test-set contamination
  screening): the benchmark side is SMALL by definition (eval sets are
  thousands of docs, the corpus is 10^12), so its distinct gram table is
  broadcast and the corpus side NEVER shuffles on gram keys — the only
  exchange is the final per-doc hit count (partial-aggregated map-side).
* ``keep_per_group`` — per-domain/source caps (crawl-style frequency
  capping): one window over (group, priority), a single hash exchange
  on the group key; skewed giant domains cost one task each, bounded by
  the cap's early filter.
* ``pack_sequences`` — fixed-token-budget sequence packing for training
  batches: documents are split across ``num_streams`` independent
  streams (hash of the id), packed by running token count WITHIN each
  stream — the window parallelizes across streams, so no global sort
  exists anywhere; the pack boundary rule (a document belongs to the
  pack its first token lands in, packs may overshoot the budget by at
  most one document) is deterministic and engine-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import sqlgen
from .dedup import _gram_array


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document count of DISTINCT word n-grams shared with the
    benchmark set: (id, n_hits) for every contaminated training doc.

    Consumers drop rows above a hit threshold or anti-join the id list;
    emitting the count (not just a flag) lets the threshold be chosen
    downstream without recomputing."""
    bench_grams = benchmark.select(
        F.explode(F.array_distinct(_gram_array(text_col, n))).alias("g")
    ).distinct()
    train_grams = train.select(
        F.col(id_col),
        F.explode(F.array_distinct(_gram_array(text_col, n))).alias("g"),
    )
    return (
        train_grams.join(F.broadcast(bench_grams), "g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


def keep_per_group(
    docs: DataFrame,
    group_col: str = "source",
    per_group: int = 10,
    order_col: str = "n_chars",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep at most ``per_group`` documents per group, highest
    ``order_col`` first (ties broken by id for determinism): the
    domain-frequency cap every crawl-derived corpus applies."""
    w = Window.partitionBy(group_col).orderBy(
        F.col(order_col).desc(), F.col(id_col).asc()
    )
    return (
        docs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= per_group)
        .select(group_col, id_col, "rank")
    )


def pack_sequences(
    docs: DataFrame,
    token_budget: int = 512,
    num_streams: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign each document a (stream, pack_id) so every pack holds a
    contiguous run of documents whose combined whitespace-token count
    first crosses ``token_budget`` at its last member.

    Token semantics match functions.sqlgen.token_count_sql exactly, so
    the operator is oracle-checkable; integer division keeps pack ids
    exact at any scale (no float accumulation)."""
    n_tokens = F.expr(sqlgen.token_count_sql(text_col, sqlgen.SPARK)).cast("int")
    stream = F.pmod(F.col(id_col), F.lit(num_streams)).cast("int")
    t = docs.select(
        F.col(id_col), stream.alias("stream"), n_tokens.alias("n_tokens")
    )
    w = Window.partitionBy("stream").orderBy(F.col(id_col).asc())
    return (
        t.withColumn("_running", F.sum("n_tokens").over(w).cast("bigint"))
        .select(
            id_col,
            "stream",
            "n_tokens",
            F.expr(f"CAST((_running - n_tokens) div {token_budget} AS INT)").alias(
                "pack_id"
            ),
        )
    )
