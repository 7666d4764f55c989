"""Plan-quality regressions: the things .explain() must keep showing.

These guard the 100 TB story: column pruning reaching the scan, no
shuffle on the extraction hot path, broadcast on the small join side.
"""

from pyspark.sql import functions as F

from readabilityimproved_spark.operators.extract import extract_spans
from readabilityimproved_spark.operators.similarity import cosine_topk
from readabilityimproved_spark.plans.pipeline import salted_extract
from readabilityimproved_spark.sources.synth import synth_corpus_df


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_extraction_path_has_no_shuffle(spark, tmp_path):
    path = str(tmp_path / "c")
    synth_corpus_df(spark, 20, 2).write.parquet(path)
    out = salted_extract(spark.read.parquet(path), parallelism=4)  # bytes mode
    plan = plan_of(out)
    assert "Exchange" not in plan, plan
    assert "MapInPandas" in plan


def test_hash_strategy_spreads_giants(spark, tmp_path):
    path = str(tmp_path / "c2")
    synth_corpus_df(spark, 20, 2).write.parquet(path)
    out = salted_extract(
        spark.read.parquet(path), parallelism=4, strategy="hash"
    )
    plan = plan_of(out)
    assert "Exchange" in plan  # the explicit salting shuffle
    assert out.count() == 20


def test_flagship_scan_prunes_columns(spark):
    import importlib.util, sys

    spec = importlib.util.spec_from_file_location(
        "spark_entry_pq", "/root/repo/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    sys.modules["spark_entry_pq"] = m
    spec.loader.exec_module(m)
    df = m.queries()["extract_article_spans"](spark, "/root/testdata/sf0.001")
    plan = plan_of(df)
    # only doc_id and text may reach the parquet scan
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan, plan
    assert "Exchange" not in plan


def test_similarity_broadcasts_queries(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    plan = plan_of(cosine_topk(emb, k=3, num_queries=5))
    assert "BroadcastExchange" in plan or "Broadcast" in plan
