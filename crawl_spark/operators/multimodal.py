"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas UDFs.

The Spark-side machinery here is real and tested — schemas, partitioning,
mapInPandas batch shapes, metadata extraction from container headers.
The *codec* step (actual JPEG decode / audio resample / video frame
extraction) is stubbed: the sandbox has no image/audio libraries, so
``decode_image``-style helpers either parse what the raw container bytes
expose (magic numbers, PNG/JPEG/WAV header fields — pure struct parsing,
implemented for real) or raise ``NotImplementedError`` at the clearly
marked codec boundary.  Swapping in Pillow/librosa/pyav is a one-function
change; every DataFrame contract stays identical.

Scale notes: binary payloads ride Arrow batches (bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``); metadata extraction is
mapInPandas so payload bytes never round-trip through Python row objects;
downstream feature columns are small and columnar, so only stages that
need the payload ever read it (parquet column pruning).
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),      # image | audio | video
        T.StructField("payload", T.BinaryType()),   # opaque container bytes
        T.StructField("mime", T.StringType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("detected_mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("payload_md5", T.StringType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def sniff_container(payload: bytes | None):
    """Parse container headers (real implementation — pure byte parsing).

    Returns (mime, width, height, sample_rate); unknown fields None.
    """
    if not payload:
        return (None, None, None, None)
    if payload[:8] == b"\x89PNG\r\n\x1a\n" and len(payload) >= 24:
        w, h = struct.unpack(">II", payload[16:24])
        return ("image/png", int(w), int(h), None)
    if payload[:2] == b"\xff\xd8":
        return ("image/jpeg", None, None, None)  # SOF scan needs full decode
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE" and len(payload) >= 28:
        (rate,) = struct.unpack("<I", payload[24:28])
        return ("audio/wav", None, None, int(rate))
    if len(payload) > 11 and payload[4:8] == b"ftyp":
        return ("video/mp4", None, None, None)
    return ("application/octet-stream", None, None, None)


def decode_image(payload: bytes) -> "np.ndarray":
    """CODEC BOUNDARY — real decode needs Pillow/libjpeg (absent here)."""
    raise NotImplementedError("image decode requires an image codec library")


def fake_feature(payload: bytes | None, dim: int = 8) -> list[float]:
    """Deterministic stand-in for an embedding model: byte-histogram
    moments. Real plumbing, fake semantics — replace with a model call."""
    if not payload:
        return [0.0] * dim
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr % dim, minlength=dim).astype(np.float64)
    total = float(hist.sum()) or 1.0
    return [float(round(x / total, 6)) for x in hist]


def extract_media_meta(df: DataFrame) -> DataFrame:
    """mapInPandas: container sniff + md5 per media row (Arrow-batched)."""
    import hashlib

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                payload = bytes(payload) if payload is not None else None
                mime, w, h, rate = sniff_container(payload)
                rows.append(
                    {
                        "media_id": int(mid),
                        "kind": kind,
                        "detected_mime": mime,
                        "n_bytes": len(payload) if payload else 0,
                        "width": w,
                        "height": h,
                        "sample_rate": rate,
                        "payload_md5": hashlib.md5(payload).hexdigest() if payload else None,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in META_SCHEMA.fields])

    return df.select("media_id", "kind", "payload").mapInPandas(fn, META_SCHEMA)


def extract_media_features(df: DataFrame, dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction (deterministic fake embedding)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": [int(x) for x in pdf["media_id"]],
                    "feature": [
                        fake_feature(bytes(p) if p is not None else None, dim)
                        for p in pdf["payload"]
                    ],
                }
            )

    return df.select("media_id", "payload").mapInPandas(fn, FEATURE_SCHEMA)


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table (valid PNG/WAV/MP4 headers with
    junk payloads) for testing the plumbing without codec libs."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        body = bytes((i * 7 + j) % 256 for j in range(128))
        if kind == "image":
            payload = b"\x89PNG\r\n\x1a\n" + b"\x00" * 8 + struct.pack(">II", 16 + i, 9 + i) + body
            mime = "image/png"
        elif kind == "audio":
            payload = b"RIFF" + b"\x00" * 4 + b"WAVE" + b"fmt " + b"\x00" * 8 + struct.pack("<I", 8000 * (1 + i % 3)) + body
            mime = "audio/wav"
        else:
            payload = b"\x00\x00\x00\x18ftypisom" + body
            mime = "video/mp4"
        rows.append((i, kind, payload, mime, {"src": f"synth:{i}"}))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
