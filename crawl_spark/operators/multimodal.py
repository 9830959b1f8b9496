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
        T.StructField("duration_ms", T.LongType()),
        T.StructField("payload_md5", T.StringType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _jpeg_sof_dims(b: bytes):
    """Scan JPEG marker segments for the first SOFn frame header and read
    (width, height) — pure byte parsing, no codec needed."""
    sof_markers = frozenset(
        [0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF]
    )
    i, n = 2, len(b)
    while i + 4 <= n:
        if b[i] != 0xFF:
            i += 1  # resync on stray bytes between segments
            continue
        marker = b[i + 1]
        if marker == 0xFF:
            # fill byte (standard FF-padding before a marker): consume ONE
            # byte and re-test the next as the marker code — advancing by
            # 2 here would swallow the marker itself (FF FF C0 would skip
            # the SOF segment and lose the dimensions)
            i += 1
            continue
        if marker == 0x01 or 0xD0 <= marker <= 0xD9:
            i += 2  # standalone markers carry no length field
            continue
        seglen = (b[i + 2] << 8) | b[i + 3]
        if marker in sof_markers:
            if i + 9 <= n:
                h = (b[i + 5] << 8) | b[i + 6]
                w = (b[i + 7] << 8) | b[i + 8]
                return (w, h)
            return (None, None)
        if marker == 0xDA or seglen < 2:  # entropy-coded data starts: stop
            return (None, None)
        i += 2 + seglen
    return (None, None)


def _wav_info(b: bytes):
    """Walk RIFF chunks for `fmt ` (sample rate, byte rate) and `data`
    (payload size); duration_ms = data_size · 1000 / byte_rate — the
    header-math way to get audio duration without any codec."""
    rate = byte_rate = data_size = None
    i, n = 12, len(b)
    while i + 8 <= n:
        cid = b[i : i + 4]
        (size,) = struct.unpack("<I", b[i + 4 : i + 8])
        if cid == b"fmt " and i + 20 <= n:
            # fmt payload: format(2) channels(2) sample_rate(4) byte_rate(4)
            rate, byte_rate = struct.unpack("<II", b[i + 12 : i + 20])
        elif cid == b"data":
            data_size = size
        i += 8 + size + (size & 1)  # chunks are word-aligned
    dur = (
        data_size * 1000 // byte_rate
        if data_size is not None and byte_rate
        else None
    )
    return (int(rate) if rate else None, dur)


def _mp4_duration_ms(b: bytes):
    """ISO-BMFF box walk: top-level → `moov` → `mvhd`; duration_ms =
    mvhd.duration · 1000 / mvhd.timescale (version 0 and 1 layouts).
    Pure struct parsing, robust to prefix truncation (returns None)."""

    def walk(lo: int, hi: int, name: bytes):
        i = lo
        while i + 8 <= hi:
            (size,) = struct.unpack(">I", b[i : i + 4])
            btype = b[i + 4 : i + 8]
            hdr = 8
            if size == 1:  # 64-bit largesize
                if i + 16 > hi:
                    return None
                (size,) = struct.unpack(">Q", b[i + 8 : i + 16])
                hdr = 16
            if size < hdr:
                return None  # malformed box
            if btype == name:
                return (i + hdr, min(i + size, hi))
            i += size
        return None

    moov = walk(0, len(b), b"moov")
    if not moov:
        return None
    mvhd = walk(moov[0], moov[1], b"mvhd")
    if not mvhd:
        return None
    p, q = mvhd
    if q - p < 4:
        return None
    version = b[p]
    try:
        if version == 1:
            timescale, duration = struct.unpack(">IQ", b[p + 20 : p + 32])
        else:
            timescale, duration = struct.unpack(">II", b[p + 12 : p + 20])
    except struct.error:
        return None
    return int(duration) * 1000 // timescale if timescale else None


def sniff_container(payload: bytes | None):
    """Parse container headers (real implementation — pure byte parsing).

    Returns (mime, width, height, sample_rate, duration_ms); unknown
    fields None. A bounded PREFIX of the payload suffices (headers live
    up front), so callers can avoid shipping full blobs into Python.
    """
    if not payload:
        return (None, None, None, None, None)
    if payload[:8] == b"\x89PNG\r\n\x1a\n" and len(payload) >= 24:
        w, h = struct.unpack(">II", payload[16:24])
        return ("image/png", int(w), int(h), None, None)
    if payload[:2] == b"\xff\xd8":
        w, h = _jpeg_sof_dims(payload)
        return ("image/jpeg", w, h, None, None)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE" and len(payload) >= 28:
        rate, dur = _wav_info(payload)
        return ("audio/wav", None, None, rate, dur)
    if len(payload) > 11 and payload[4:8] == b"ftyp":
        return ("video/mp4", None, None, None, _mp4_duration_ms(payload))
    return ("application/octet-stream", None, None, None, None)


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


def extract_media_meta(df: DataFrame, prefix_bytes: int = 65536) -> DataFrame:
    """Per-media metadata: JVM-side md5/byte-length + Python header sniff.

    ``payload_md5`` and ``n_bytes`` are plain column expressions
    (``F.md5`` / ``F.length`` — JVM, whole-stage codegen); only a bounded
    ``prefix_bytes`` slice of each payload crosses the Arrow boundary for
    the header sniff, so full blobs NEVER enter Python. md5/len columns
    pass through the UDF untouched (no join, no second payload scan)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mimes, ws, hs, rates, durs = [], [], [], [], []
            for prefix in pdf["__prefix"]:
                mime, w, h, rate, dur = sniff_container(
                    bytes(prefix) if prefix is not None else None
                )
                mimes.append(mime)
                ws.append(w)
                hs.append(h)
                rates.append(rate)
                durs.append(dur)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "detected_mime": mimes,
                    "n_bytes": pdf["n_bytes"],
                    "width": ws,
                    "height": hs,
                    "sample_rate": rates,
                    "duration_ms": durs,
                    "payload_md5": pdf["payload_md5"],
                }
            )

    prepared = df.select(
        "media_id",
        "kind",
        F.substring(F.col("payload"), 1, prefix_bytes).alias("__prefix"),
        F.coalesce(F.length("payload").cast("long"), F.lit(0)).alias("n_bytes"),
        # NULL-for-empty contract: consumers use a null payload_md5 as the
        # "no payload" signal, so zero-length blobs must NOT hash to
        # d41d8cd9... (the bare F.md5 of b"") — gate on length > 0
        F.when(F.length("payload") > 0, F.md5("payload")).alias("payload_md5"),
    )
    return prepared.mapInPandas(fn, META_SCHEMA)


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


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("frame", T.BinaryType()),
    ]
)

RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("pixels", T.BinaryType()),
    ]
)


def decode_video_frame(payload: bytes, ts_ms: int) -> bytes:
    """CODEC BOUNDARY — real frame extraction needs pyav/ffmpeg (absent
    here)."""
    raise NotImplementedError("video decode requires a codec library")


def sample_frames(
    df: DataFrame,
    n_frames: int = 4,
    duration_ms: int = 10_000,
    fake_decode: bool = True,
) -> DataFrame:
    """Frame sampling plumbing: one video row → ``n_frames`` frame rows
    at evenly spaced timestamps.

    The Spark machinery is real (mapInPandas fan-out, one output row per
    (video, frame), Arrow-batched, frames as opaque binary); the codec
    step is the documented boundary — ``fake_decode=True`` emits a
    deterministic 64-byte pseudo-frame (md5-seeded from payload+ts) so
    the pipeline shape is testable, ``False`` hits the
    ``NotImplementedError`` a real deployment replaces with pyav.
    Timestamps: frame i ↦ floor(i · duration/n), the uniform-sampling
    contract a training pipeline uses for video."""
    import hashlib

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mids, idxs, tss, frames = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(payload) if payload is not None else b""
                for i in range(n_frames):
                    ts = i * duration_ms // n_frames
                    if fake_decode:
                        seed = hashlib.md5(
                            payload[:64] + str(ts).encode()
                        ).digest()
                        frame = (seed * 4)[:64]
                    else:
                        frame = decode_video_frame(payload, ts)
                    mids.append(int(mid))
                    idxs.append(i)
                    tss.append(ts)
                    frames.append(frame)
            yield pd.DataFrame(
                {"media_id": mids, "frame_idx": idxs, "ts_ms": tss, "frame": frames}
            )

    return (
        df.filter(F.col("kind") == "video")
        .select("media_id", "payload")
        .mapInPandas(fn, FRAME_SCHEMA)
    )


def resize_images(
    df: DataFrame, width: int = 32, height: int = 32, fake_decode: bool = True
) -> DataFrame:
    """Resize plumbing: image rows → fixed-size pixel buffers
    (width·height bytes, grayscale contract).

    Real machinery: prefix sniff for dimensions (PNG/JPEG headers),
    mapInPandas batch shape, bounded output buffers. The decode+resample
    itself is the codec boundary: ``fake_decode=True`` produces a
    deterministic byte-tiled buffer seeded from the payload (stable
    across runs — usable to test downstream batch/shuffle logic);
    ``False`` raises at the Pillow-shaped hole."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mids, pixels = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(payload) if payload is not None else b""
                if not fake_decode:
                    decode_image(payload)  # raises: codec boundary
                reps = (width * height) // max(len(payload), 1) + 1
                pixels.append((payload * reps)[: width * height])
                mids.append(int(mid))
            yield pd.DataFrame(
                {
                    "media_id": mids,
                    "width": [width] * len(mids),
                    "height": [height] * len(mids),
                    "pixels": pixels,
                }
            )

    return (
        df.filter(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(fn, RESIZED_SCHEMA)
    )


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table (valid PNG/WAV/MP4 headers with
    junk payloads) for testing the plumbing without codec libs."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        body = bytes((i * 7 + j) % 256 for j in range(128))
        if kind == "image" and i % 2:
            # minimal JPEG: SOI + APP0/JFIF + SOF0 with real dimensions
            app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
            sof0 = (
                b"\xff\xc0"
                + struct.pack(">HBHHB", 11, 8, 9 + i, 16 + i, 1)
                + b"\x01\x11\x00"
            )
            payload = b"\xff\xd8" + app0 + sof0 + body
            mime = "image/jpeg"
        elif kind == "image":
            payload = b"\x89PNG\r\n\x1a\n" + b"\x00" * 8 + struct.pack(">II", 16 + i, 9 + i) + body
            mime = "image/png"
        elif kind == "audio":
            # proper RIFF layout: fmt chunk (rate + byte_rate) then a data
            # chunk whose size/byte_rate ratio IS the duration
            rate = 8000 * (1 + i % 3)
            byte_rate = rate * 2  # mono 16-bit
            data = body * 8
            fmt = b"fmt " + struct.pack("<I", 16) + struct.pack(
                "<HHIIHH", 1, 1, rate, byte_rate, 2, 16
            )
            datach = b"data" + struct.pack("<I", len(data)) + data
            payload = b"RIFF" + struct.pack("<I", 4 + len(fmt) + len(datach)) + b"WAVE" + fmt + datach
            mime = "audio/wav"
        else:
            # ftyp + moov/mvhd (v0): timescale 1000, duration (i+1)*500 ms
            ftyp = struct.pack(">I", 16) + b"ftypisom" + b"\x00\x00\x00\x00"
            mvhd_payload = (
                b"\x00" + b"\x00\x00\x00"          # version 0 + flags
                + b"\x00" * 8                        # ctime + mtime
                + struct.pack(">II", 1000, (i + 1) * 500)  # timescale, duration
                + b"\x00" * 80
            )
            mvhd = struct.pack(">I", 8 + len(mvhd_payload)) + b"mvhd" + mvhd_payload
            moov = struct.pack(">I", 8 + len(mvhd)) + b"moov" + mvhd
            payload = ftyp + moov + body
            mime = "video/mp4"
        rows.append((i, kind, payload, mime, {"src": f"synth:{i}"}))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
