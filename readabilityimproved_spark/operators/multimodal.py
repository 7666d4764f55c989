"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schema, partitioning, Arrow batch shapes, UDF
signatures) is real and tested; the actual codec work is STUBBED because
no image/audio libraries ship in this container (and none are needed to
validate the dataflow): ``decode_mode='fake'`` produces deterministic
pseudo-features from the bytes, ``decode_mode='real'`` raises
NotImplementedError at the exact point a PIL/ffmpeg call would go.

media table shape:
    media(doc_id string, media_ref string, media_type string,
          payload binary, meta map<string,string>)
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_DDL = (
    "doc_id string, media_ref string, media_type string, "
    "payload binary, meta map<string,string>"
)

FEATURES_DDL = (
    "media_ref string, media_type string, n_bytes int, checksum bigint, "
    "width int, height int, embedding array<float>, status string"
)

EMBED_DIM = 16


def _fake_decode(payload: bytes, meta: dict) -> dict:
    """Deterministic stand-in for the codec: size/checksum from the bytes,
    dimensions from metadata, a seeded pseudo-embedding."""
    crc = zlib.crc32(payload or b"")
    rng = np.random.default_rng(crc)
    return {
        "n_bytes": len(payload or b""),
        "checksum": crc,
        "width": int(meta.get("width", -1)) if meta else -1,
        "height": int(meta.get("height", -1)) if meta else -1,
        "embedding": rng.standard_normal(EMBED_DIM).astype("float32").tolist(),
        "status": "ok-fake",
    }


def _real_decode(payload: bytes, meta: dict) -> dict:
    raise NotImplementedError(
        "real media decode requires PIL/ffmpeg, not present in this "
        "container -- this is the single point where the codec plugs in"
    )


def _decode_batches(
    batches: Iterator[pd.DataFrame], mode: str
) -> Iterator[pd.DataFrame]:
    decode = _fake_decode if mode == "fake" else _real_decode
    cols = [
        "media_ref", "media_type", "n_bytes", "checksum", "width", "height",
        "embedding", "status",
    ]
    for pdf in batches:
        rows = []
        for row in pdf.itertuples(index=False):
            meta = getattr(row, "meta") or {}
            try:
                feats = decode(getattr(row, "payload"), dict(meta))
            except NotImplementedError:
                feats = {
                    "n_bytes": -1, "checksum": -1, "width": -1, "height": -1,
                    "embedding": [], "status": "decode-unavailable",
                }
            rows.append(
                {
                    "media_ref": getattr(row, "media_ref"),
                    "media_type": getattr(row, "media_type"),
                    **feats,
                }
            )
        yield pd.DataFrame(rows, columns=cols)


def decode_media_features(media: DataFrame, mode: str = "fake") -> DataFrame:
    """media table -> per-media features via the Arrow-batched decode stub."""
    from functools import partial

    return media.mapInPandas(
        partial(_decode_batches, mode=mode), schema=FEATURES_DDL
    )


def attach_media_features(extracted: DataFrame, features: DataFrame) -> DataFrame:
    """Join decoded media features onto extracted image spans.

    The features side is usually small relative to the corpus -> broadcast;
    at 10^12 scale pre-bucket both sides by media_ref instead.
    """
    spans = extracted.select(
        "doc_id", F.explode("spans").alias("s")
    ).filter(F.col("s.kind") == "image")
    return spans.join(
        F.broadcast(features), spans["s.media_ref"] == features["media_ref"], "left"
    ).select(
        "doc_id",
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.offset").alias("span_offset"),
        "n_bytes", "checksum", "width", "height", "status",
    )


RESIZED_DDL = (
    "media_ref string, target_w int, target_h int, payload binary, status string"
)


def _resize_batches(
    batches: Iterator[pd.DataFrame], target_w: int, target_h: int, mode: str
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for row in pdf.itertuples(index=False):
            payload = getattr(row, "payload")
            if mode == "real":
                # PIL.Image.open(io.BytesIO(payload)).resize(...) goes here
                out, status = None, "decode-unavailable"
            else:
                # deterministic fake: size-prefixed checksum payload
                crc = zlib.crc32(payload or b"")
                out = f"resized:{target_w}x{target_h}:{crc}".encode()
                status = "ok-fake"
            rows.append(
                {
                    "media_ref": getattr(row, "media_ref"),
                    "target_w": target_w,
                    "target_h": target_h,
                    "payload": out,
                    "status": status,
                }
            )
        yield pd.DataFrame(
            rows, columns=["media_ref", "target_w", "target_h", "payload", "status"]
        )


def resize_images(
    media: DataFrame, target_w: int = 256, target_h: int = 256, mode: str = "fake"
) -> DataFrame:
    """Image resize over binary columns; codec stubbed, plumbing real."""
    from functools import partial

    return media.filter(F.col("media_type") == "image").mapInPandas(
        partial(_resize_batches, target_w=target_w, target_h=target_h, mode=mode),
        schema=RESIZED_DDL,
    )


FRAMES_DDL = "media_ref string, frame_idx int, frame_crc bigint, status string"


def _frames_batches(
    batches: Iterator[pd.DataFrame], every_n: int, mode: str
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for row in pdf.itertuples(index=False):
            payload = getattr(row, "payload") or b""
            ref = getattr(row, "media_ref")
            if mode == "real":
                # ffmpeg/pyav frame iteration goes here
                rows.append(
                    {"media_ref": ref, "frame_idx": -1, "frame_crc": -1,
                     "status": "decode-unavailable"}
                )
                continue
            # deterministic fake: one "frame" per every_n*64 bytes
            n_frames = max(len(payload) // (every_n * 64), 1)
            for i in range(n_frames):
                chunk = payload[i * every_n * 64 : (i + 1) * every_n * 64]
                rows.append(
                    {"media_ref": ref, "frame_idx": i,
                     "frame_crc": zlib.crc32(chunk), "status": "ok-fake"}
                )
        yield pd.DataFrame(
            rows, columns=["media_ref", "frame_idx", "frame_crc", "status"]
        )


def sample_frames(media: DataFrame, every_n: int = 2, mode: str = "fake") -> DataFrame:
    """Video frame sampling (one row per sampled frame); codec stubbed."""
    from functools import partial

    return media.filter(F.col("media_type") == "video").mapInPandas(
        partial(_frames_batches, every_n=every_n, mode=mode), schema=FRAMES_DDL
    )


def synth_media(spark, n: int) -> DataFrame:
    """Deterministic fake media table for tests/bench."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                payload = (f"media-bytes-{i}-" * (10 + i % 50)).encode()
                rows.append(
                    {
                        "doc_id": f"doc-{i:09d}",
                        "media_ref": f"http://m.example.com/2019-06/18/photo{i}_0.jpg",
                        "media_type": ("image", "audio", "video")[i % 3],
                        "payload": payload,
                        "meta": {"width": str(200 + i % 800), "height": str(150 + i % 600)},
                    }
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "media_ref", "media_type", "payload", "meta"]
            )

    return spark.range(n).mapInPandas(gen, schema=MEDIA_DDL)
