"""Multilingual kernel behavior + LSH recall self-consistency."""

from pyspark.sql import functions as F

from readabilityimproved_spark.kernel.readability import extract_document
from readabilityimproved_spark.operators.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)

BASE = "http://news.example.cn/2019-06/18/article.html"


def test_cjk_extraction():
    # the reference corpus is multilingual news (test/url_test.txt);
    # CJK text has no spaces -- length/comma gates must still work
    # (full-width comma counts, 25-char gate counts characters)
    text = "新华社北京六月十八日电，记者从应急管理部获悉，救援工作正在有序进行，灾区群众已得到妥善安置。"
    assert len(text) >= 25
    html = (
        f'<div class="article content"><p>{text}</p>'
        f'<img src="http://news.example.cn/2019-06/18/photo1.jpg"'
        f' width="600" height="400"></div>'
        f'<div class="sidebar"><a href="/x">推荐阅读</a></div>'
    )
    r = extract_document(html, base_uri=BASE)
    assert r.status == "ok"
    texts = [s[1] for s in r.spans if s[0] == "text"]
    assert texts == [text]
    assert r.images == ["http://news.example.cn/2019-06/18/photo1.jpg"]


def test_arabic_rtl_extraction():
    text = "أعلنت السلطات المحلية، يوم الثلاثاء، عن خطة جديدة لإعادة الإعمار في المنطقة المتضررة من الزلزال."
    html = f'<div class="article content"><p>{text}</p></div>'
    r = extract_document(html, base_uri=BASE)
    assert [s[1] for s in r.spans] == [text]


def test_minhash_catches_exact_duplicates(spark):
    # identical texts have identical signatures -> LSH recall on exact
    # duplicates is 1 by construction; verify end-to-end
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sample = docs.filter(F.col("doc_id") < 20)
    dups = sample.withColumn("doc_id", F.col("doc_id") + 10000)
    corpus = sample.unionByName(dups)
    pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(corpus).collect()
    }
    for i in range(20):
        assert (i, i + 10000) in pairs, f"duplicate pair {i} missed by LSH"


def test_jaccard_exact_duplicates_score_one(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sample = docs.filter(F.col("doc_id") < 10)
    dups = sample.withColumn("doc_id", F.col("doc_id") + 10000)
    corpus = sample.unionByName(dups)
    rows = ngram_jaccard_pairs(corpus, threshold=0.99).collect()
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in rows}
    for i in range(10):
        assert got.get((i, i + 10000)) == 1.0
