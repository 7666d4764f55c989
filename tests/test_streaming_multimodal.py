"""Streaming extraction (availableNow), windowed metrics, stateful
sessionization, and the multimodal decode plumbing."""

import pytest
from pyspark.sql import functions as F

from readabilityimproved_spark.operators.extract import extract_spans
from readabilityimproved_spark.operators.multimodal import (
    attach_media_features,
    decode_media_features,
    synth_media,
)
from readabilityimproved_spark.sources.synth import write_synth_corpus
from readabilityimproved_spark.streaming.stream import (
    sessionize_events,
    streaming_extraction,
    windowed_event_metrics,
)

N_DOCS = 60


def test_streaming_extraction_equals_batch(spark, tmp_path):
    corpus = str(tmp_path / "corpus")
    write_synth_corpus(spark, N_DOCS, corpus, partition_by_part=False)

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = streaming_extraction(spark, corpus, out, ckpt, available_now=True)
    q.awaitTermination(180)

    streamed = {
        r["doc_id"]: (r["spans"], r["status"])
        for r in spark.read.parquet(out).collect()
    }
    batch = {
        r["doc_id"]: (r["spans"], r["status"])
        for r in extract_spans(spark.read.parquet(corpus)).collect()
    }
    assert streamed == batch
    assert len(streamed) == N_DOCS

    # resume probe: re-running with the same checkpoint emits nothing new
    q2 = streaming_extraction(spark, corpus, out, ckpt, available_now=True)
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == N_DOCS


def test_windowed_event_metrics_batch_equivalence(spark):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    got = windowed_event_metrics(events, "1 hour")
    direct = (
        events.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .count()
    )
    assert got.count() == direct
    assert got.filter(F.col("n_events") <= 0).count() == 0


def test_windowed_metrics_streaming(spark, tmp_path):
    events_dir = str(tmp_path / "events")
    spark.read.parquet("/root/testdata/sf0.001/events.parquet").write.parquet(
        events_dir
    )
    schema = spark.read.parquet(events_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_dir)
    agg = windowed_event_metrics(stream, "1 hour", watermark="2 hours")
    out = str(tmp_path / "agg_out")
    q = (
        agg.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "agg_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # append mode only emits windows the watermark has closed; with a
    # finite batch the final windows stay open -> compare against the
    # batch result restricted to closed windows
    batch = windowed_event_metrics(
        spark.read.parquet(events_dir), "1 hour"
    )
    max_ts = spark.read.parquet(events_dir).agg(F.max("ts")).collect()[0][0]
    streamed = spark.read.parquet(out)
    if streamed.count() > 0:
        joined = streamed.join(
            batch, ["window_start", "event_type"], "left_anti"
        )
        assert joined.count() == 0  # every emitted row matches batch


def test_sessionize_events_stateful(spark, tmp_path):
    events_dir = str(tmp_path / "sess_events")
    spark.read.parquet("/root/testdata/sf0.001/events.parquet").limit(500).write.parquet(events_dir)
    schema = spark.read.parquet(events_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_dir)
    sessions = sessionize_events(stream)
    out = str(tmp_path / "sess_out")
    q = (
        sessions.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    # pending ProcessingTimeTimeouts keep availableNow scheduling empty
    # batches -- poll the sink for the first batch's rows, then stop
    import time

    rows = []
    deadline = time.time() + 150
    while time.time() < deadline:
        try:
            rows = spark.read.parquet(out).collect()
        except Exception:
            rows = []
        if rows:
            break
        time.sleep(2)
    q.stop()
    assert rows  # every user with events yields at least one open session
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for user, sess in by_user.items():
        for s in sess:
            assert s["session_start"] <= s["session_end"]
            assert s["n_events"] >= 1


def test_multimodal_decode_and_attach(spark):
    media = synth_media(spark, 30)
    feats = decode_media_features(media, mode="fake")
    rows = feats.collect()
    assert len(rows) == 30
    assert all(r["status"] == "ok-fake" for r in rows)
    assert all(len(r["embedding"]) == 16 for r in rows)
    # determinism: same payload -> same checksum/embedding
    again = {r["media_ref"]: (r["checksum"], r["embedding"]) for r in feats.collect()}
    first = {r["media_ref"]: (r["checksum"], r["embedding"]) for r in rows}
    assert again == first
    # width/height parsed from typed metadata
    assert all(r["width"] >= 200 and r["height"] >= 150 for r in rows)

    # real mode: plumbing survives, rows marked decode-unavailable
    real = decode_media_features(media, mode="real").collect()
    assert all(r["status"] == "decode-unavailable" for r in real)

    # attach features onto extracted image spans via broadcast join
    from readabilityimproved_spark.sources.synth import synth_corpus_df

    extracted = extract_spans(synth_corpus_df(spark, 30, num_slices=2))
    joined = attach_media_features(extracted, feats)
    assert joined.columns == [
        "doc_id", "media_ref", "span_offset", "n_bytes", "checksum",
        "width", "height", "status",
    ]
    joined.count()  # executes the broadcast join


def test_resize_and_frame_sample_stubs(spark):
    from readabilityimproved_spark.operators.multimodal import (
        resize_images,
        sample_frames,
    )

    media = synth_media(spark, 30)
    resized = resize_images(media, 128, 128).collect()
    assert resized and all(r["status"] == "ok-fake" for r in resized)
    assert all(r["target_w"] == 128 and r["payload"] for r in resized)

    frames = sample_frames(media).collect()
    assert frames and all(f["status"] == "ok-fake" for f in frames)
    by_ref = {}
    for f in frames:
        by_ref.setdefault(f["media_ref"], []).append(f["frame_idx"])
    for idxs in by_ref.values():
        assert sorted(idxs) == list(range(len(idxs)))  # dense frame indexes

    # real mode: plumbing intact, rows marked decode-unavailable
    real = resize_images(media, 64, 64, mode="real").collect()
    assert all(r["status"] == "decode-unavailable" for r in real)
