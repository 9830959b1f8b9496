"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas UDFs.

The Spark-side machinery here is real and tested — schemas, partitioning,
mapInPandas batch shapes, metadata extraction from container headers.
PNG additionally decodes FOR REAL (stdlib zlib inflate + RFC 2083
defilter, :func:`decode_png`), which powers honest perceptual hashing
(:func:`image_hashes`) and hamming-banded image near-dup
(:func:`image_neardup_pairs`). The remaining *codec* steps (JPEG decode
/ audio resample / video frame extraction) stay stubbed: the sandbox has
no image/audio libraries, so those helpers either parse what the raw
container bytes expose (magic numbers, JPEG/WAV header fields — pure
struct parsing, implemented for real) or raise ``NotImplementedError``
at the clearly marked codec boundary.  Swapping in Pillow/librosa/pyav
is a one-function change; every DataFrame contract stays identical.

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
    """Image decode dispatch. PNG decodes FOR REAL (stdlib zlib inflate
    + defilter — see :func:`decode_png` below); JPEG remains the honest
    CODEC BOUNDARY (needs libjpeg/Pillow, absent in this sandbox)."""
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_png(payload)
    raise NotImplementedError(
        "non-PNG image decode requires a codec library (JPEG: libjpeg)"
    )


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
    """Resize image rows → fixed-size pixel buffers (width·height
    bytes, grayscale contract).

    Round 5: decodable PNGs resize FOR REAL — :func:`decode_png` →
    BT.601 luma → deterministic area resize, actual pixels out. For
    payloads the stdlib can't decode (JPEG, malformed), the behavior is
    the original plumbing contract: ``fake_decode=True`` produces a
    deterministic byte-tiled buffer seeded from the payload (stable
    across runs — usable to test downstream batch/shuffle logic);
    ``False`` raises at the codec boundary."""
    import zlib

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mids, pixels = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(payload) if payload is not None else b""
                try:
                    arr = decode_png(payload)
                    cells = _area_resize(_to_gray(arr), width, height)
                    buf = bytes(
                        np.clip(np.round(cells), 0, 255).astype(np.uint8)
                    )
                except (
                    NotImplementedError,
                    ValueError,
                    zlib.error,
                    struct.error,
                    IndexError,
                ):
                    if not fake_decode:
                        decode_image(payload)  # raises: codec boundary
                    reps = (width * height) // max(len(payload), 1) + 1
                    buf = (payload * reps)[: width * height]
                pixels.append(buf)
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


# -- real PNG codec (stdlib) + perceptual hashing ---------------------------
# PNG is the one container the sandbox can decode HONESTLY: the pixel
# stream is zlib (stdlib) and the per-scanline filters are pure integer
# arithmetic (RFC 2083 §6). This closes the `decode_image` boundary for
# PNG — JPEG keeps its honest NotImplementedError (needs libjpeg) — and
# enables a REAL image near-dup operator: stdlib decode → grayscale →
# area resize → aHash/dHash → hamming-banded candidate-then-verify
# (the image twin of dedup.simhash / similarity.signbit_neardup_pairs).

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(payload: bytes) -> "np.ndarray":
    """Decode an 8-bit-depth, non-interlaced PNG with the stdlib only
    (zlib inflate + RFC 2083 defilter). Returns (h, w, channels) uint8;
    palette images resolve through PLTE to RGB.

    Honest boundaries: bit depths != 8 and Adam7 interlacing raise
    NotImplementedError (they need sub-byte unpacking / pass
    reassembly a real deployment gets from Pillow); malformed streams
    raise ValueError/zlib.error. The defilter is a per-byte Python
    loop for the sequential filters (Sub/Average/Paeth carry the
    reconstructed left neighbor) — the documented per-image cost of
    stdlib-only decode, paid inside an Arrow-batched pandas UDF."""
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG signature")
    ihdr = None
    plte = None
    idat = []
    pos = 8
    n = len(payload)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) < length:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + payload + crc
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8:
        raise NotImplementedError("PNG bit depth %d (only 8 supported)" % depth)
    if interlace:
        raise NotImplementedError("Adam7 interlaced PNG")
    if comp != 0 or filt != 0 or color not in _PNG_CHANNELS:
        raise ValueError("unsupported PNG compression/filter/color")
    if w == 0 or h == 0:
        raise ValueError("zero-dimension PNG")
    nch = _PNG_CHANNELS[color]
    stride = w * nch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) < h * (stride + 1):
        raise ValueError("short PNG pixel stream")
    out = bytearray(h * stride)
    prev = bytearray(stride)
    rp = 0
    for y in range(h):
        f = raw[rp]
        cur = bytearray(raw[rp + 1 : rp + 1 + stride])
        rp += 1 + stride
        if f == 0:
            pass
        elif f == 1:  # Sub
            for x in range(nch, stride):
                cur[x] = (cur[x] + cur[x - nch]) & 0xFF
        elif f == 2:  # Up
            for x in range(stride):
                cur[x] = (cur[x] + prev[x]) & 0xFF
        elif f == 3:  # Average
            for x in range(stride):
                a = cur[x - nch] if x >= nch else 0
                cur[x] = (cur[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                a = cur[x - nch] if x >= nch else 0
                c = prev[x - nch] if x >= nch else 0
                cur[x] = (cur[x] + _paeth(a, prev[x], c)) & 0xFF
        else:
            raise ValueError("unknown PNG filter %d" % f)
        out[y * stride : (y + 1) * stride] = cur
        prev = cur
    arr = np.frombuffer(bytes(out), dtype=np.uint8).reshape(h, w, nch)
    if color == 3:  # palette → RGB
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        pal = np.frombuffer(plte, dtype=np.uint8)
        pal = pal[: (len(pal) // 3) * 3].reshape(-1, 3)
        arr = pal[arr[:, :, 0]]
    return arr


def encode_png(arr: "np.ndarray", filter_type: int = 0) -> bytes:
    """Minimal PNG encoder (fixture/test utility — the operators only
    DECODE): 8-bit gray/gray+alpha/RGB/RGBA from a (h, w[, ch]) uint8
    array, every scanline filtered with ``filter_type`` (0-4) so tests
    can exercise each defilter path. Stdlib-only (zlib + crc32)."""
    import zlib

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, nch = a.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[nch]
    stride = w * nch
    lines = bytearray()
    prev = bytearray(stride)
    for y in range(h):
        cur = bytearray(a[y].tobytes())
        lines.append(filter_type)
        if filter_type == 0:
            lines += cur
        elif filter_type == 1:
            lines += bytes(
                (cur[x] - (cur[x - nch] if x >= nch else 0)) & 0xFF
                for x in range(stride)
            )
        elif filter_type == 2:
            lines += bytes((cur[x] - prev[x]) & 0xFF for x in range(stride))
        elif filter_type == 3:
            lines += bytes(
                (cur[x] - (((cur[x - nch] if x >= nch else 0) + prev[x]) >> 1))
                & 0xFF
                for x in range(stride)
            )
        elif filter_type == 4:
            lines += bytes(
                (
                    cur[x]
                    - _paeth(
                        cur[x - nch] if x >= nch else 0,
                        prev[x],
                        prev[x - nch] if x >= nch else 0,
                    )
                )
                & 0xFF
                for x in range(stride)
            )
        else:
            raise ValueError("filter_type must be 0-4")
        prev = cur

    def chunk(t: bytes, d: bytes) -> bytes:
        return (
            struct.pack(">I", len(d))
            + t
            + d
            + struct.pack(">I", zlib.crc32(t + d))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(lines)))
        + chunk(b"IEND", b"")
    )


def _to_gray(arr: "np.ndarray") -> "np.ndarray":
    """(h, w, ch) uint8 → (h, w) float64 luma (BT.601 for color)."""
    a = arr.astype(np.float64)
    if arr.shape[2] >= 3:
        return 0.299 * a[:, :, 0] + 0.587 * a[:, :, 1] + 0.114 * a[:, :, 2]
    return a[:, :, 0]


def _area_resize(g: "np.ndarray", out_w: int, out_h: int) -> "np.ndarray":
    """Box (area-mean) resize — deterministic, no interpolation libs.
    Cell (i, j) = mean of the source block [h·i/oh, h·(i+1)/oh) ×
    [w·j/ow, w·(j+1)/ow), blocks forced non-empty for tiny images."""
    h, w = g.shape
    ye = [h * i // out_h for i in range(out_h + 1)]
    xe = [w * j // out_w for j in range(out_w + 1)]
    out = np.empty((out_h, out_w), dtype=np.float64)
    for i in range(out_h):
        y0, y1 = ye[i], max(ye[i + 1], ye[i] + 1)
        y1 = min(y1, h) or 1
        for j in range(out_w):
            x0, x1 = xe[j], max(xe[j + 1], xe[j] + 1)
            x1 = min(x1, w) or 1
            out[i, j] = g[y0:y1, x0:x1].mean()
    return out


def _pack_bits64(bits) -> int:
    """Row-major MSB-first 64-bit pack → two's-complement int64 (the
    value Spark's LongType carries)."""
    v = 0
    for b in np.asarray(bits, dtype=bool).flatten():
        v = (v << 1) | int(b)
    return v - (1 << 64) if v >= (1 << 63) else v


def average_hash(gray: "np.ndarray") -> int:
    """aHash: 8×8 area resize, bit = cell ≥ mean of the 64 cells."""
    cells = _area_resize(gray, 8, 8)
    return _pack_bits64(cells >= cells.mean())


def dhash(gray: "np.ndarray") -> int:
    """dHash: 9×8 area resize, bit = right cell > left cell (gradient
    sign — more robust to global brightness shifts than aHash)."""
    cells = _area_resize(gray, 9, 8)
    return _pack_bits64(cells[:, 1:] > cells[:, :-1])


def _dct_rows(n: int, m: int) -> "np.ndarray":
    """First ``m`` rows of the orthonormal n-point DCT-II matrix —
    explicit cosines, so the transform is deterministic and
    dependency-free (no scipy in the container)."""
    k = np.arange(m, dtype=np.float64)[:, None]
    x = np.arange(n, dtype=np.float64)[None, :]
    rows = np.cos(np.pi * k * (2.0 * x + 1.0) / (2.0 * n)) * np.sqrt(2.0 / n)
    rows[0] /= np.sqrt(2.0)
    return rows


def phash(gray: "np.ndarray", hash_size: int = 8, highfreq: int = 4) -> int:
    """pHash: 32×32 area resize → 2-D DCT-II → keep the top-left
    hash_size² low-frequency block → bit = coeff > median of the block
    (DC included in the median, the common convention).

    Spectral, so invariant to uniform brightness shifts everywhere
    except the DC term (aHash flips cells near the mean; dHash flips
    ties) and robust to blur/resize (those attenuate high frequencies
    the hash never reads). Only the m×n DCT rows are materialized —
    low = M · cells · Mᵀ is two small matmuls per image."""
    n = hash_size * highfreq
    cells = _area_resize(gray, n, n)
    M = _dct_rows(n, hash_size)
    low = M @ cells @ M.T
    return _pack_bits64(low > np.median(low))


IMAGE_HASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("ahash", T.LongType()),
        T.StructField("dhash", T.LongType()),
        T.StructField("phash", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("decode_ok", T.BooleanType()),
    ]
)


def image_hashes(
    df: DataFrame, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """Per-image perceptual hashes over REAL stdlib PNG decode.

    Arrow-batched mapInPandas (payloads never round-trip through row
    objects); per row: decode_png → luma → aHash + dHash + pHash
    (spectral, round 5 — the near-dup default for anything beyond
    byte-identical resizes). Rows whose
    payload is not a decodable 8-bit PNG (JPEG — a codec boundary —
    or malformed bytes) emit ``decode_ok=false`` with NULL hashes:
    never a fake hash. 100 TB shape: the decode cost is embarrassingly
    parallel per partition, output is 3 longs + 2 ints per image, and
    downstream near-dup never touches payload bytes again."""
    import zlib

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mids, ahs, dhs, phs, ws, hs, oks = [], [], [], [], [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                mids.append(int(mid))
                try:
                    arr = decode_png(bytes(p) if p is not None else b"")
                    g = _to_gray(arr)
                    ahs.append(average_hash(g))
                    dhs.append(dhash(g))
                    phs.append(phash(g))
                    hs.append(arr.shape[0])
                    ws.append(arr.shape[1])
                    oks.append(True)
                except (
                    NotImplementedError,
                    ValueError,
                    zlib.error,
                    struct.error,
                    IndexError,
                ):
                    ahs.append(None)
                    dhs.append(None)
                    phs.append(None)
                    ws.append(None)
                    hs.append(None)
                    oks.append(False)
            yield pd.DataFrame(
                {
                    "media_id": mids,
                    "ahash": pd.array(ahs, dtype="Int64"),
                    "dhash": pd.array(dhs, dtype="Int64"),
                    "phash": pd.array(phs, dtype="Int64"),
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    "decode_ok": oks,
                }
            )

    return df.select(
        F.col(id_col).alias("media_id"), F.col(payload_col).alias("payload")
    ).mapInPandas(fn, IMAGE_HASH_SCHEMA)


def image_neardup_pairs(
    hashes: DataFrame,
    max_dist: int = 6,
    id_col: str = "media_id",
    hash_col: str = "dhash",
    bands: int | None = None,
) -> DataFrame:
    """Image near-dup pairs by hamming-banded candidate-then-verify
    over a 64-bit perceptual hash — the image twin of the simhash /
    sign-bucket text paths.

    EXACT under banding: with B ≥ max_dist+1 bands (the default), two
    hashes within hamming distance max_dist agree on at least one full
    band (pigeonhole), so every qualifying pair is a candidate in some
    band — no recall loss. Candidates join on (band_idx, band_value);
    the verify is two JVM column ops (bit_count(a XOR b), whole-stage
    codegen) — payloads and pixels never reappear. O(Σ bucket²) like
    every banded path; wider bands (fewer) = fewer, bigger buckets.

    Emits (id_a, id_b, hamming) with id_a < id_b, distance ≤ max_dist."""
    B = bands if bands is not None else max_dist + 1
    if B < max_dist + 1:
        raise ValueError(
            "bands=%d cannot guarantee recall at max_dist=%d (need ≥ %d: "
            "pigeonhole)" % (B, max_dist, max_dist + 1)
        )
    width = 64 // B
    h = hashes.filter(F.col(hash_col).isNotNull()).select(
        F.col(id_col), F.col(hash_col).alias("__h")
    )
    # (id, band_idx, band_val): last band absorbs the 64 % B remainder
    bexprs = []
    for b in range(B):
        shift = b * width
        wid = width + (64 % B if b == B - 1 else 0)
        mask = (1 << wid) - 1
        bexprs.append(
            F.struct(
                F.lit(b).alias("bi"),
                F.shiftrightunsigned(F.col("__h"), shift)
                .bitwiseAND(F.lit(mask))
                .alias("bv"),
            )
        )
    bands_df = h.select(
        F.col(id_col), F.col("__h"), F.explode(F.array(*bexprs)).alias("bd")
    ).select(id_col, "__h", F.col("bd.bi").alias("bi"), F.col("bd.bv").alias("bv"))
    a = bands_df.select(
        F.col(id_col).alias("id_a"), F.col("__h").alias("ha"), "bi", "bv"
    )
    c = bands_df.select(
        F.col(id_col).alias("id_b"), F.col("__h").alias("hb"), "bi", "bv"
    )
    return (
        a.join(c, ["bi", "bv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "hamming",
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).cast("int"),
        )
        .filter(F.col("hamming") <= max_dist)
        .select("id_a", "id_b", "hamming")
        .distinct()  # a pair may collide in several bands
    )


# -- audio tier: real stdlib WAV-PCM decode + spectral hashing (round 5) --
#
# The mirror of the PNG story: WAV PCM is pure struct parsing + numpy,
# so the decode is REAL; compressed codecs (MP3/AAC/float/ADPCM) stay an
# honest NotImplementedError boundary exactly like JPEG does for images.


def decode_wav(payload: bytes) -> tuple:
    """Decode a PCM WAV payload with the stdlib only. Returns
    (sample_rate, samples) where samples is mono float64 in [-1, 1]
    (multi-channel downmixed by mean).

    Honest boundaries: only format tag 1 (integer PCM) at 8 or 16 bits
    decodes; float PCM (tag 3), ADPCM, extensible (0xFFFE) and other
    codecs raise NotImplementedError — swapping in librosa/soundfile is
    a one-function change, every DataFrame contract stays identical.
    Malformed RIFF structure raises ValueError."""
    b = payload or b""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt = data = None
    i, n = 12, len(b)
    while i + 8 <= n:
        cid = b[i : i + 4]
        (size,) = struct.unpack("<I", b[i + 4 : i + 8])
        if cid == b"fmt ":
            fmt = b[i + 8 : i + 8 + size]
        elif cid == b"data":
            data = b[i + 8 : i + 8 + size]
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or len(fmt) < 16 or data is None:
        raise ValueError("missing fmt / data chunk")
    tag, nch, rate, _brate, _balign, bits = struct.unpack("<HHIIHH", fmt[:16])
    if tag != 1:
        raise NotImplementedError(
            "WAV codec boundary: only integer PCM (format 1) decodes "
            "stdlib-side; got format %d" % tag
        )
    if not nch or not rate:
        raise ValueError("zero channels / sample rate")
    if bits == 16:
        usable = len(data) // (2 * nch) * (2 * nch)
        a = np.frombuffer(data[:usable], dtype="<i2").astype(np.float64) / 32768.0
    elif bits == 8:
        usable = len(data) // nch * nch
        a = (
            np.frombuffer(data[:usable], dtype=np.uint8).astype(np.float64)
            - 128.0
        ) / 128.0
    else:
        raise NotImplementedError(
            "WAV codec boundary: only 8/16-bit PCM decodes stdlib-side; "
            "got %d-bit" % bits
        )
    if nch > 1:
        a = a.reshape(-1, nch).mean(axis=1)
    return int(rate), a


def encode_wav(
    samples: "np.ndarray", rate: int, bits: int = 16, channels: int = 1
) -> bytes:
    """Minimal PCM WAV encoder for fixtures (the audio twin of
    :func:`encode_png`): mono/interleaved float input in [-1, 1]."""
    a = np.asarray(samples, dtype=np.float64)
    if bits == 16:
        raw = (
            np.clip(np.round(a * 32768.0), -32768, 32767)
            .astype("<i2")
            .tobytes()
        )
    elif bits == 8:
        raw = (
            np.clip(np.round(a * 128.0 + 128.0), 0, 255)
            .astype(np.uint8)
            .tobytes()
        )
    else:
        raise ValueError("encode_wav: bits must be 8 or 16")
    balign = channels * bits // 8
    fmt = b"fmt " + struct.pack("<I", 16) + struct.pack(
        "<HHIIHH", 1, channels, rate, rate * balign, balign, bits
    )
    datach = b"data" + struct.pack("<I", len(raw)) + raw
    if len(raw) & 1:
        datach += b"\x00"
    return (
        b"RIFF"
        + struct.pack("<I", 4 + len(fmt) + len(datach))
        + b"WAVE"
        + fmt
        + datach
    )


def audio_spectral_hash(
    samples: "np.ndarray", segments: int = 8, bands: int = 8
) -> int:
    """64-bit spectral audio hash (Haitsma–Kalker-flavored, reduced to
    one word per clip): split the clip into ``segments`` equal windows,
    take each window's power spectrum (rfft, DC dropped), sum it into
    ``bands`` equal frequency bands, bit = band energy > MEAN of the
    segments×bands matrix. Mean, not median: audio spectra are often
    sparse (a tonal clip leaves most bands at numerical zero), and a
    median taken over mostly-zero cells collapses to the noise floor —
    every empty band's bit then flips on microscopic perturbations.
    The mean sits in the energetic range, so empty bands are stably 0.

    The audio twin of :func:`phash` — amplitude scaling moves every
    energy and the mean by the same factor (bits exactly invariant),
    and small additive noise perturbs only near-threshold bands. Near-dup pairs ride
    the SAME hamming-banded machinery as the image hashes
    (:func:`image_neardup_pairs` with ``hash_col=``)."""
    a = np.asarray(samples, dtype=np.float64)
    n = len(a) // segments
    if n < 2 * bands:
        raise ValueError(
            "clip too short: need >= %d samples for %d segments x %d bands"
            % (2 * bands * segments, segments, bands)
        )
    E = np.empty((segments, bands), dtype=np.float64)
    for s in range(segments):
        mag2 = np.abs(np.fft.rfft(a[s * n : (s + 1) * n])) ** 2
        for b, chunk in enumerate(np.array_split(mag2[1:], bands)):
            E[s, b] = chunk.sum()
    return _pack_bits64(E > E.mean())


AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("zcr", T.DoubleType()),
        T.StructField("spectral_hash", T.LongType()),
        T.StructField("decode_ok", T.BooleanType()),
    ]
)


def audio_features(
    df: DataFrame, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """Per-clip audio features over REAL stdlib WAV-PCM decode.

    Arrow-batched mapInPandas; per row: decode_wav → rms (energy), zcr
    (zero-crossing rate, a crude pitch/noisiness signal), duration from
    the actual sample count (not header math), and the 64-bit
    spectral hash for near-dup. Non-PCM / malformed payloads emit
    ``decode_ok=false`` with NULL features — never a fake value. Same
    100 TB shape as :func:`image_hashes`: embarrassingly parallel
    decode, a few scalars out per clip, payloads never reappear
    downstream."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ("media_id", "sample_rate", "n_samples", "duration_ms",
                    "rms", "zcr", "spectral_hash", "decode_ok")}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                out["media_id"].append(int(mid))
                try:
                    rate, a = decode_wav(bytes(p) if p is not None else b"")
                    if not len(a):
                        raise ValueError("empty data chunk")
                    out["sample_rate"].append(rate)
                    out["n_samples"].append(len(a))
                    out["duration_ms"].append(len(a) * 1000 // rate)
                    out["rms"].append(float(np.sqrt(np.mean(a * a))))
                    sgn = np.signbit(a)
                    out["zcr"].append(
                        float(np.count_nonzero(sgn[1:] != sgn[:-1]))
                        / max(len(a) - 1, 1)
                    )
                    try:
                        out["spectral_hash"].append(audio_spectral_hash(a))
                    except ValueError:  # too short for the 8x8 grid
                        out["spectral_hash"].append(None)
                    out["decode_ok"].append(True)
                except (NotImplementedError, ValueError, struct.error):
                    for k in ("sample_rate", "n_samples", "duration_ms",
                              "rms", "zcr", "spectral_hash"):
                        out[k].append(None)
                    out["decode_ok"].append(False)
            yield pd.DataFrame(
                {
                    "media_id": out["media_id"],
                    "sample_rate": pd.array(out["sample_rate"], dtype="Int32"),
                    "n_samples": pd.array(out["n_samples"], dtype="Int64"),
                    "duration_ms": pd.array(out["duration_ms"], dtype="Int64"),
                    "rms": pd.array(out["rms"], dtype="Float64"),
                    "zcr": pd.array(out["zcr"], dtype="Float64"),
                    "spectral_hash": pd.array(
                        out["spectral_hash"], dtype="Int64"
                    ),
                    "decode_ok": out["decode_ok"],
                }
            )

    return df.select(
        F.col(id_col).alias("media_id"), F.col(payload_col).alias("payload")
    ).mapInPandas(fn, AUDIO_FEATURE_SCHEMA)


# -- video tier: real MP4 demux (container-level), codec-free (round 5) --
#
# The container triad completed: PNG DECODES for real, WAV DECODES for
# real, and MP4 DEMUXES for real — walking the ISO-BMFF sample table is
# pure struct parsing, so per-frame encoded bytes and their true decode
# timestamps come out without any codec. Turning those bytes into
# pixels (H.264/AV1/...) remains the honest NotImplementedError
# boundary (`decode_video_frame`).


def _child_boxes(b: bytes, lo: int, hi: int):
    """Iterate (type, payload_lo, payload_hi) over the ISO-BMFF boxes in
    b[lo:hi] (64-bit largesize handled; malformed sizes end the walk)."""
    i = lo
    while i + 8 <= hi:
        (size,) = struct.unpack(">I", b[i : i + 4])
        btype = b[i + 4 : i + 8]
        hdr = 8
        if size == 1:
            if i + 16 > hi:
                return
            (size,) = struct.unpack(">Q", b[i + 8 : i + 16])
            hdr = 16
        if size < hdr:
            return
        yield btype, i + hdr, min(i + size, hi)
        i += size


def _find_box(b: bytes, lo: int, hi: int, name: bytes):
    for t, p, q in _child_boxes(b, lo, hi):
        if t == name:
            return (p, q)
    return None


_MAX_MP4_SAMPLES = 1 << 22  # malformed-count guard: ~4M samples/clip


def mp4_sample_table(payload: bytes) -> list:
    """REAL MP4 demux, no codec: walk ``moov → trak → mdia → minf →
    stbl`` of the first video-handler track (hdlr ``vide``; first track
    as fallback) and combine the four sample-table boxes —

    * ``stts`` decode deltas → per-sample timestamps,
    * ``stsz`` per-sample byte sizes,
    * ``stsc`` sample→chunk runs,
    * ``stco``/``co64`` chunk file offsets —

    into ``[(ts_ms, byte_offset, size), ...]``, one entry per sample in
    decode order. Offsets index into THIS payload (self-contained
    file-level MP4, the common crawl case). Raises ValueError on
    missing/malformed tables — callers surface that as ``demux_ok =
    false``, never fake data."""
    b = payload or b""
    moov = _find_box(b, 0, len(b), b"moov")
    if not moov:
        raise ValueError("no moov box")
    video_trak = first_trak = None
    for t, p, q in _child_boxes(b, *moov):
        if t != b"trak":
            continue
        if first_trak is None:
            first_trak = (p, q)
        mdia = _find_box(b, p, q, b"mdia")
        if mdia:
            hdlr = _find_box(b, *mdia, b"hdlr")
            if hdlr and b[hdlr[0] + 8 : hdlr[0] + 12] == b"vide":
                video_trak = (p, q)
                break
    trak = video_trak or first_trak
    if not trak:
        raise ValueError("no trak box")
    mdia = _find_box(b, *trak, b"mdia")
    if not mdia:
        raise ValueError("no mdia box")
    mdhd = _find_box(b, *mdia, b"mdhd")
    if not mdhd:
        raise ValueError("no mdhd box")
    p = mdhd[0]
    version = b[p]
    ts_off = p + (20 if version == 1 else 12)
    if ts_off + 4 > mdhd[1]:
        raise ValueError("truncated mdhd")
    (timescale,) = struct.unpack(">I", b[ts_off : ts_off + 4])
    if not timescale:
        raise ValueError("zero mdhd timescale")
    minf = _find_box(b, *mdia, b"minf")
    stbl = _find_box(b, *minf, b"stbl") if minf else None
    if not stbl:
        raise ValueError("no stbl box")

    def full(name, alt=None):
        box = _find_box(b, *stbl, name)
        if box is None and alt is not None:
            box = _find_box(b, *stbl, alt)
        if box is None:
            raise ValueError("missing %s box" % name.decode())
        return box

    # stts → cumulative decode time per sample
    p, q = full(b"stts")
    (n_ent,) = struct.unpack(">I", b[p + 4 : p + 8])
    deltas = []
    pos, t_total = p + 8, 0
    for _ in range(n_ent):
        if pos + 8 > q:
            raise ValueError("truncated stts")
        cnt, dt = struct.unpack(">II", b[pos : pos + 8])
        if cnt > _MAX_MP4_SAMPLES:
            raise ValueError("malformed stts count")
        deltas.append((cnt, dt))
        pos += 8
    # stsz → per-sample sizes
    p, q = full(b"stsz")
    uniform, n_samples = struct.unpack(">II", b[p + 4 : p + 12])
    if n_samples > _MAX_MP4_SAMPLES:
        raise ValueError("malformed stsz count")
    if uniform:
        sizes = [uniform] * n_samples
    else:
        if p + 12 + 4 * n_samples > q:
            raise ValueError("truncated stsz")
        sizes = list(
            struct.unpack(">%dI" % n_samples, b[p + 12 : p + 12 + 4 * n_samples])
        )
    # stco / co64 → chunk offsets
    co = _find_box(b, *stbl, b"stco")
    wide = False
    if co is None:
        co = _find_box(b, *stbl, b"co64")
        wide = True
    if co is None:
        raise ValueError("missing stco/co64 box")
    p, q = co
    (n_chunks,) = struct.unpack(">I", b[p + 4 : p + 8])
    if n_chunks > _MAX_MP4_SAMPLES:
        raise ValueError("malformed chunk count")
    w = 8 if wide else 4
    if p + 8 + w * n_chunks > q:
        raise ValueError("truncated chunk offsets")
    fmt = ">%d%s" % (n_chunks, "Q" if wide else "I")
    chunk_offs = list(struct.unpack(fmt, b[p + 8 : p + 8 + w * n_chunks]))
    # stsc → samples-per-chunk runs (first_chunk is 1-based)
    p, q = full(b"stsc")
    (n_runs,) = struct.unpack(">I", b[p + 4 : p + 8])
    runs = []
    pos = p + 8
    for _ in range(n_runs):
        if pos + 12 > q:
            raise ValueError("truncated stsc")
        first, spc, _desc = struct.unpack(">III", b[pos : pos + 12])
        runs.append((first, spc))
        pos += 12
    if not runs:
        raise ValueError("empty stsc")
    # expand: decode-order walk over chunks, slicing samples within each
    out = []
    t_cum = 0
    ts_iter = iter(deltas)
    cur_cnt, cur_dt = 0, 0
    si = 0
    for ci in range(n_chunks):
        spc = 0
        for first, s in runs:
            if first <= ci + 1:
                spc = s
            else:
                break
        off = chunk_offs[ci]
        for _ in range(spc):
            if si >= n_samples:
                break
            while cur_cnt == 0:
                try:
                    cur_cnt, cur_dt = next(ts_iter)
                except StopIteration:
                    cur_cnt, cur_dt = 1 << 62, 0  # stts exhausted: dt 0
            out.append((t_cum * 1000 // timescale, off, sizes[si]))
            t_cum += cur_dt
            cur_cnt -= 1
            off += sizes[si]
            si += 1
    if si != n_samples:
        raise ValueError(
            "stsc/stco cover %d of %d samples" % (si, n_samples)
        )
    return out


VIDEO_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("sample_bytes", T.BinaryType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("demux_ok", T.BooleanType()),
    ]
)


def extract_video_samples(
    df: DataFrame,
    n_frames: int = 4,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """REAL frame extraction at the container level: demux each clip's
    sample table (:func:`mp4_sample_table`) and emit the ``n_frames``
    samples nearest to evenly spaced true timestamps — ``sample_bytes``
    is the sample's actual encoded bytes sliced out of the payload,
    ``ts_ms`` its real decode timestamp. Decoding those bytes to pixels
    is the codec boundary (:func:`decode_video_frame`); a training
    pipeline with pyav plugs it in per sample without touching this
    plan. Un-demuxable payloads emit one ``demux_ok=false`` row (NULL
    frame fields) — never fake bytes. Same 100 TB shape as the other
    media operators: Arrow-batched mapInPandas, per-row fan-out bounded
    by n_frames, payload read once."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols = {k: [] for k in
                    ("media_id", "frame_idx", "ts_ms", "sample_bytes",
                     "n_samples", "demux_ok")}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(p) if p is not None else b""
                try:
                    table = mp4_sample_table(raw)
                    if not table:
                        raise ValueError("empty sample table")
                except (ValueError, struct.error):
                    cols["media_id"].append(int(mid))
                    cols["frame_idx"].append(None)
                    cols["ts_ms"].append(None)
                    cols["sample_bytes"].append(None)
                    cols["n_samples"].append(None)
                    cols["demux_ok"].append(False)
                    continue
                dur = table[-1][0]
                for i in range(n_frames):
                    want = i * dur // max(n_frames - 1, 1) if n_frames > 1 else 0
                    ts, off, size = min(
                        table, key=lambda s: (abs(s[0] - want), s[0])
                    )
                    cols["media_id"].append(int(mid))
                    cols["frame_idx"].append(i)
                    cols["ts_ms"].append(ts)
                    cols["sample_bytes"].append(raw[off : off + size])
                    cols["n_samples"].append(len(table))
                    cols["demux_ok"].append(True)
            yield pd.DataFrame(
                {
                    "media_id": cols["media_id"],
                    "frame_idx": pd.array(cols["frame_idx"], dtype="Int32"),
                    "ts_ms": pd.array(cols["ts_ms"], dtype="Int64"),
                    "sample_bytes": cols["sample_bytes"],
                    "n_samples": pd.array(cols["n_samples"], dtype="Int32"),
                    "demux_ok": cols["demux_ok"],
                }
            )

    return df.select(
        F.col(id_col).alias("media_id"), F.col(payload_col).alias("payload")
    ).mapInPandas(fn, VIDEO_SAMPLE_SCHEMA)


def encode_mp4(
    sample_bytes_list: list,
    chunks: list,
    timescale: int = 1000,
    delta: int = 100,
    handler: bytes = b"vide",
) -> bytes:
    """Minimal self-contained MP4 encoder for fixtures (the video twin
    of :func:`encode_png` / :func:`encode_wav`): ftyp + mdat holding the
    samples laid out per ``chunks`` (contiguous within a chunk, 2 junk
    bytes between chunks — the demux must skip them via stco) + a
    moov/trak/mdia/minf/stbl whose stts/stsz/stsc/stco describe exactly
    that layout. Sample i gets decode timestamp i·delta/timescale."""

    def box(t: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + t + payload

    ftyp = box(b"ftyp", b"isom" + b"\x00" * 8)
    body = b""
    chunk_offs_rel = []
    si = 0
    for ci, cnt in enumerate(chunks):
        if ci:
            body += b"\xee\xee"
        chunk_offs_rel.append(len(body))
        for _ in range(cnt):
            body += sample_bytes_list[si]
            si += 1
    if si != len(sample_bytes_list):
        raise ValueError("chunks must cover every sample exactly once")
    mdat = box(b"mdat", body)
    data_base = len(ftyp) + 8
    chunk_offs = [data_base + r for r in chunk_offs_rel]
    n = len(sample_bytes_list)
    stts = box(b"stts", struct.pack(">II", 0, 1) + struct.pack(">II", n, delta))
    stsz = box(
        b"stsz",
        struct.pack(">III", 0, 0, n)
        + b"".join(struct.pack(">I", len(s)) for s in sample_bytes_list),
    )
    runs = []
    for ci, cnt in enumerate(chunks):
        if ci == 0 or cnt != chunks[ci - 1]:
            runs.append((ci + 1, cnt))
    stsc = box(
        b"stsc",
        struct.pack(">II", 0, len(runs))
        + b"".join(struct.pack(">III", f, c, 1) for f, c in runs),
    )
    stco = box(
        b"stco",
        struct.pack(">II", 0, len(chunk_offs))
        + b"".join(struct.pack(">I", o) for o in chunk_offs),
    )
    stbl = box(b"stbl", stts + stsz + stsc + stco)
    minf = box(b"minf", stbl)
    hdlr = box(b"hdlr", b"\x00" * 8 + handler + b"\x00" * 13)
    mdhd = box(
        b"mdhd",
        b"\x00" * 12 + struct.pack(">II", timescale, n * delta) + b"\x00" * 4,
    )
    mdia = box(b"mdia", mdhd + hdlr + minf)
    return ftyp + mdat + box(b"moov", box(b"trak", mdia))
