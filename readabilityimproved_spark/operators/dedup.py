"""Deduplication operators for the training-data pipeline tier.

All Spark-native (built-in functions only -- no Python in the hot path):

  * exact_dedup        -- md5-fingerprint groupBy (exact duplicates)
  * ngram_jaccard_pairs-- word-shingle explode + self-join + Jaccard
  * minhash_lsh_pairs  -- minhash signatures via xxhash64, banded LSH
                          bucket join, candidate pairs (+ optional exact
                          Jaccard verification of candidates)
  * simhash64          -- 64-bit simhash from token xxhash64 bit-majority

Scale notes: the shingle self-join shuffles on the shingle key -- at
10^12 docs use minhash_lsh_pairs (signatures are fixed-width, the
band-bucket join touches only colliding docs) and let AQE's skew join
split hot buckets (stopword shingles are the classic skew source; the
DISTINCT shingle step bounds per-doc fanout first).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """md5 over lower-cased, whitespace-collapsed text."""
    return df.withColumn(
        "fingerprint",
        F.md5(F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")),
    )


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One row per distinct content: representative id + duplicate count."""
    return (
        fingerprint(df, text_col)
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("representative"),
            F.count("*").alias("dup_count"),
        )
    )


def _shingles(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """Distinct word n-gram shingles per document (id, shingle)."""
    tokens = F.split(F.trim(F.col(text_col)), r"\s+")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(tokens) - n),
        lambda i: F.concat_ws(" ", *[F.element_at(tokens, i + j + 1) for j in range(n)]),
    )
    return (
        df.select(F.col(id_col).alias("id"), F.explode(grams).alias("shingle"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs above threshold.

    Self-join on the shingle key (shuffle-heavy; see module docstring for
    the LSH alternative at scale). Pairs are emitted once (id_a < id_b).
    """
    sh = _shingles(df, id_col, text_col, n).cache()
    counts = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    inter = (
        sh.alias("a")
        .join(sh.alias("b"), "shingle")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(counts.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "na"), "id_a")
        .join(counts.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "nb"), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def dedup_keep_first(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The pipeline-facing dedup: keep only the representative (minimum
    id) row of every exact-duplicate group -- the deduplicated corpus."""
    reps = exact_dedup(df, id_col, text_col).select(
        F.col("representative").alias(id_col)
    )
    return df.join(reps, id_col, "left_semi")


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash signature per doc: num_hashes seeded xxhash64 minima."""
    sh = _shingles(df, id_col, text_col, shingle_n)
    mins = [
        F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy("id").agg(*mins)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    max_bucket_size: int = 100,
) -> DataFrame:
    """Near-duplicate candidate pairs via banded MinHash LSH.

    Signature is split into ``bands`` bands of ``num_hashes/bands`` rows;
    docs sharing any band bucket become a candidate pair. Emitted once
    (id_a < id_b) with the number of matching bands.

    Hot-bucket capping: buckets larger than ``max_bucket_size`` are
    dropped before the self-join. On low-entropy corpora (and at 10^12
    docs, inevitably) some band buckets collect an outsized share of
    documents; such buckets carry no near-dup signal but cost O(B^2)
    pairs -- capping bounds the join output to
    buckets * max_bucket_size^2 (the standard production LSH guard).
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, num_hashes, shingle_n)
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.xxhash64(*cols).alias("bucket"))
        )
    buckets = sig.select(
        "id", F.explode(F.array(*band_cols)).alias("bb")
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    small_buckets = (
        buckets.groupBy("band", "bucket")
        .count()
        .filter(F.col("count") <= max_bucket_size)
        .select("band", "bucket")
    )
    buckets = buckets.join(small_buckets, ["band", "bucket"])
    return (
        buckets.alias("a")
        .join(buckets.alias("b"), ["band", "bucket"])
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.countDistinct("band").alias("matching_bands"))
    )


def minhash_verified_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """The scale path end-to-end: LSH candidate generation followed by
    exact Jaccard verification of ONLY the candidate pairs. At 10^12 docs
    this replaces the all-pairs shingle self-join; the verification join
    touches candidate docs only."""
    candidates = minhash_lsh_pairs(
        df, id_col, text_col, num_hashes, bands, shingle_n
    ).select("id_a", "id_b")
    sh = _shingles(df, id_col, text_col, shingle_n)
    counts = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    inter = (
        candidates.join(sh.alias("a"), candidates["id_a"] == F.col("a.id"))
        .join(
            sh.alias("b"),
            (candidates["id_b"] == F.col("b.id"))
            & (F.col("a.shingle") == F.col("b.shingle")),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(
            counts.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "na"),
            "id_a",
        )
        .join(
            counts.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "nb"),
            "id_b",
        )
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash64(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash: per-token xxhash64, bitwise majority vote.

    One explode + one groupBy with 64 conditional sums -- stays entirely
    in whole-stage codegen.
    """
    tokens = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    ).withColumn("h", F.xxhash64("tok"))
    bit_sums = [
        F.sum(
            F.when(F.col("h").bitwiseAND(F.lit(1 << b)) != 0, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(63)  # bit 63 is the sign bit; skip to stay positive
    ]
    agg = tokens.groupBy("id").agg(*bit_sums)
    sim = None
    for b in range(63):
        term = F.when(F.col(f"b{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return agg.select("id", sim.cast("long").alias("simhash"))
