"""Similarity search over embedding columns (array<float>).

  * cosine_topk      -- brute-force cosine top-k: broadcast the (small)
                        query set against the corpus; the scan side never
                        shuffles. The baseline ANN path.
  * ann_bucketed_topk-- sign-bit LSH (hyperplanes = first B axes): corpus
                        and queries bucket by the sign pattern of their
                        leading dimensions; top-k within the query's
                        bucket only. Recall < 1 by design; at 10^12 rows
                        the bucket join replaces the full scan.

Determinism across engines (the DuckDB oracle must hash-match): floats
are scaled to integers with floor(x*1000 + 0.5) before the dot product,
so the sum is exact in both engines; the final cosine is rounded to 6dp
and ties break on vec_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SCALED = "transform({col}, x -> cast(floor(cast(x as double) * 1000.0 + 0.5) as bigint))"
_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"
)
_NORM2 = "aggregate(transform({a}, x -> x * x), 0L, (acc, v) -> acc + v)"


def _with_scaled(df: DataFrame, col: str = "embedding") -> DataFrame:
    return df.withColumn("vec", F.expr(_SCALED.format(col=col))).withColumn(
        "norm2", F.expr(_NORM2.format(a="vec"))
    )


def cosine_topk(
    embeddings: DataFrame,
    k: int = 5,
    num_queries: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Top-k cosine neighbors for the first ``num_queries`` ids.

    The query side is broadcast (small by construction); the corpus scan
    is embarrassingly parallel -- no shuffle until the final per-query
    top-k, which AQE coalesces.
    """
    corpus = _with_scaled(
        embeddings.select(F.col(id_col).alias("cand_id"), F.col(emb_col))
    ).select("cand_id", F.col("vec").alias("cvec"), F.col("norm2").alias("cnorm"))
    queries = _with_scaled(
        embeddings.filter(F.col(id_col) < num_queries).select(
            F.col(id_col).alias("query_id"), F.col(emb_col)
        )
    ).select("query_id", F.col("vec").alias("qvec"), F.col("norm2").alias("qnorm"))

    scored = (
        corpus.crossJoin(F.broadcast(queries))
        .filter(F.col("cand_id") != F.col("query_id"))
        .withColumn("dot", F.expr(_DOT.format(a="qvec", b="cvec")))
        .withColumn(
            "cosine",
            F.round(
                F.col("dot")
                / (F.sqrt(F.col("qnorm").cast("double")) * F.sqrt(F.col("cnorm").cast("double"))),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("cand_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine", "rank")
    )


def sign_bucket(emb_col: str, bits: int = 8) -> F.Column:
    """LSH bucket id: sign pattern of the first ``bits`` dimensions."""
    expr = " + ".join(
        f"(CASE WHEN element_at({emb_col}, {i + 1}) >= 0 THEN {1 << i} ELSE 0 END)"
        for i in range(bits)
    )
    return F.expr(f"cast({expr} as int)")


def ann_bucketed_topk(
    embeddings: DataFrame,
    k: int = 5,
    num_queries: int = 10,
    bits: int = 8,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's sign bucket."""
    bucketed = embeddings.withColumn("bucket", sign_bucket(emb_col, bits))
    corpus = _with_scaled(
        bucketed.select(F.col(id_col).alias("cand_id"), emb_col, "bucket")
    ).select("cand_id", "bucket", F.col("vec").alias("cvec"), F.col("norm2").alias("cnorm"))
    queries = _with_scaled(
        bucketed.filter(F.col(id_col) < num_queries).select(
            F.col(id_col).alias("query_id"), emb_col, "bucket"
        )
    ).select("query_id", "bucket", F.col("vec").alias("qvec"), F.col("norm2").alias("qnorm"))

    scored = (
        corpus.join(F.broadcast(queries), "bucket")
        .filter(F.col("cand_id") != F.col("query_id"))
        .withColumn("dot", F.expr(_DOT.format(a="qvec", b="cvec")))
        .withColumn(
            "cosine",
            F.round(
                F.col("dot")
                / (F.sqrt(F.col("qnorm").cast("double")) * F.sqrt(F.col("cnorm").cast("double"))),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("cand_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine", "rank")
    )


def ivf_topk(
    embeddings: DataFrame,
    k: int = 5,
    num_queries: int = 10,
    num_centroids: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """IVF-style ANN: assign every vector to its nearest centroid, then
    each query probes only its ``nprobe`` nearest clusters.

    Centroids here are the first ``num_centroids`` vectors (deterministic
    seeds; a production build would k-means a sample offline -- the
    dataflow is identical). At 10^12 rows the cluster assignment is one
    broadcast-join map and the search touches nprobe/num_centroids of
    the corpus.
    """
    scaled = _with_scaled(
        embeddings.select(F.col(id_col).alias("vid"), F.col(emb_col))
    ).select("vid", "vec", "norm2")
    centroids = (
        scaled.filter(F.col("vid") < num_centroids)
        .select(
            F.col("vid").alias("cent_id"),
            F.col("vec").alias("cvec"),
            F.col("norm2").alias("cnorm"),
        )
    )

    def nearest(df, n, out_name):
        sims = (
            df.crossJoin(F.broadcast(centroids))
            .withColumn("cdot", F.expr(_DOT.format(a="vec", b="cvec")))
            .withColumn(
                "csim",
                F.round(
                    F.col("cdot")
                    / (
                        F.sqrt(F.col("norm2").cast("double"))
                        * F.sqrt(F.col("cnorm").cast("double"))
                    ),
                    6,
                ),
            )
        )
        w = Window.partitionBy("vid").orderBy(
            F.col("csim").desc(), F.col("cent_id").asc()
        )
        return (
            sims.withColumn("crank", F.row_number().over(w))
            .filter(F.col("crank") <= n)
            .select("vid", F.col("cent_id").alias(out_name))
        )

    assignment = nearest(scaled, 1, "cluster")
    corpus = scaled.join(assignment, "vid").select(
        F.col("vid").alias("cand_id"),
        "cluster",
        F.col("vec").alias("evec"),
        F.col("norm2").alias("enorm"),
    )
    probes = nearest(
        scaled.filter(F.col("vid") < num_queries), nprobe, "cluster"
    ).withColumnRenamed("vid", "query_id")
    queries = (
        scaled.filter(F.col("vid") < num_queries)
        .select(
            F.col("vid").alias("query_id"),
            F.col("vec").alias("qvec"),
            F.col("norm2").alias("qnorm"),
        )
        .join(probes, "query_id")
    )

    scored = (
        corpus.join(F.broadcast(queries), "cluster")
        .filter(F.col("cand_id") != F.col("query_id"))
        .withColumn("dot", F.expr(_DOT.format(a="qvec", b="evec")))
        .withColumn(
            "cosine",
            F.round(
                F.col("dot")
                / (
                    F.sqrt(F.col("qnorm").cast("double"))
                    * F.sqrt(F.col("enorm").cast("double"))
                ),
                6,
            ),
        )
        .select("query_id", "cand_id", "cosine")
        # no dedup needed: each candidate lives in exactly one cluster,
        # so it joins at most one of a query's probe rows
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("cand_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine", "rank")
    )


def embedding_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    bits: int = 8,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via the sign-bucket LSH."""
    bucketed = _with_scaled(
        embeddings.withColumn("bucket", sign_bucket(emb_col, bits)).select(
            F.col(id_col).alias("id"), "bucket", emb_col
        )
    ).select("id", "bucket", "vec", "norm2")
    return (
        bucketed.alias("a")
        .join(bucketed.alias("b"), "bucket")
        .filter(F.col("a.id") < F.col("b.id"))
        .withColumn("dot", F.expr(_DOT.format(a="a.vec", b="b.vec")))
        .withColumn(
            "cosine",
            F.round(
                F.col("dot")
                / (
                    F.sqrt(F.col("a.norm2").cast("double"))
                    * F.sqrt(F.col("b.norm2").cast("double"))
                ),
                6,
            ),
        )
        .filter(F.col("cosine") >= threshold)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), "cosine")
    )
