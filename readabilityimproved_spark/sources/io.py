"""Table IO: Iceberg-shaped layout with a parquet fallback.

The production design point is an Iceberg table partitioned by
``bucket(N, doc_id)`` (SURVEY.md §4 partition pruning); this sandbox has
no Iceberg runtime jars, so the same schema + stored ``part`` column is
materialized as parquet with directory partitioning -- identical
pruning behavior for the resume/wave filters. Set
``spark.sql.catalog.<name>`` configs and pass ``table=`` to use a real
catalog unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession, catalog: str = "spark_catalog") -> bool:
    impl = spark.conf.get(f"spark.sql.catalog.{catalog}", None)
    return impl is not None and "Iceberg" in str(impl)


def read_corpus(
    spark: SparkSession, path: str | None = None, table: str | None = None
) -> DataFrame:
    if table is not None:
        return spark.read.table(table)
    if path is None:
        raise ValueError("need path= or table=")
    return spark.read.parquet(path)


def write_corpus(
    df: DataFrame,
    path: str | None = None,
    table: str | None = None,
    mode: str = "append",
    partition_col: str = "part",
) -> None:
    if table is not None:
        writer = df.writeTo(table)
        if mode == "overwrite":
            writer.createOrReplace()
        else:
            writer.append()
        return
    if path is None:
        raise ValueError("need path= or table=")
    w = df.write.mode(mode)
    if partition_col and partition_col in df.columns:
        w = w.partitionBy(partition_col)
    w.parquet(path)
