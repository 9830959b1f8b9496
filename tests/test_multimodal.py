"""Multimodal binary-column plumbing: schema, Arrow batch shape,
container sniffing, deterministic feature stub (SURVEY.md / driver
mandate: real Spark plumbing, stubbed codecs)."""

from __future__ import annotations

import pytest

from crawl_spark.operators.multimodal import (
    decode_image,
    extract_media_features,
    extract_media_meta,
    fake_feature,
    sniff_container,
    synth_media,
)


def test_sniff_container_headers():
    import struct

    png = b"\x89PNG\r\n\x1a\n" + b"\x00" * 8 + struct.pack(">II", 640, 480)
    assert sniff_container(png) == ("image/png", 640, 480, None, None)
    # proper RIFF chunk walk: fmt carries (rate, byte_rate), data size /
    # byte_rate is the duration
    fmt = b"fmt " + struct.pack("<I", 16) + struct.pack("<HHIIHH", 1, 1, 44100, 88200, 2, 16)
    datach = b"data" + struct.pack("<I", 44100) + b"\x00" * 4  # truncated data is fine
    wav = b"RIFF" + struct.pack("<I", 4 + len(fmt) + len(datach)) + b"WAVE" + fmt + datach
    assert sniff_container(wav) == ("audio/wav", None, None, 44100, 500)
    assert sniff_container(b"\x00\x00\x00\x18ftypisom" + b"\x00" * 8)[0] == "video/mp4"
    assert sniff_container(b"\xff\xd8rest")[0] == "image/jpeg"
    # JPEG SOF scan: dimensions come from the first SOFn segment
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 480, 640, 1) + b"\x01\x11\x00"
    jpg = b"\xff\xd8" + app0 + sof0 + b"\xff\xda\x00\x02junk"
    assert sniff_container(jpg) == ("image/jpeg", 640, 480, None, None)
    # FF fill-byte padding before the SOF marker (FF FF C0 ...) must not
    # swallow the marker — the fill byte is consumed one at a time
    padded = b"\xff\xd8" + app0 + b"\xff" + sof0 + b"\xff\xda\x00\x02junk"
    assert sniff_container(padded) == ("image/jpeg", 640, 480, None, None)
    # truncated-before-SOF JPEG: mime detected, dims unknown
    assert sniff_container(b"\xff\xd8" + app0) == ("image/jpeg", None, None, None, None)
    assert sniff_container(None) == (None, None, None, None, None)
    assert sniff_container(b"junk")[0] == "application/octet-stream"


def test_mp4_mvhd_duration():
    import struct

    from crawl_spark.operators.multimodal import _mp4_duration_ms

    mvhd_payload = (
        b"\x00\x00\x00\x00" + b"\x00" * 8 + struct.pack(">II", 600, 1800) + b"\x00" * 80
    )
    mvhd = struct.pack(">I", 8 + len(mvhd_payload)) + b"mvhd" + mvhd_payload
    moov = struct.pack(">I", 8 + len(mvhd)) + b"moov" + mvhd
    ftyp = struct.pack(">I", 16) + b"ftypisom" + b"\x00" * 4
    assert _mp4_duration_ms(ftyp + moov) == 3000  # 1800/600 s
    # version-1 mvhd: 64-bit duration at a different offset
    v1 = b"\x01\x00\x00\x00" + b"\x00" * 16 + struct.pack(">IQ", 1000, 2500) + b"\x00" * 80
    mvhd1 = struct.pack(">I", 8 + len(v1)) + b"mvhd" + v1
    moov1 = struct.pack(">I", 8 + len(mvhd1)) + b"moov" + mvhd1
    assert _mp4_duration_ms(ftyp + moov1) == 2500
    # truncation robustness: prefix cut inside moov -> None, no raise
    assert _mp4_duration_ms((ftyp + moov)[: len(ftyp) + 10]) is None
    assert _mp4_duration_ms(ftyp) is None


def test_codec_boundary_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8")


def test_meta_extraction_spark(spark):
    media = synth_media(spark, 30)
    meta = extract_media_meta(media).toPandas().set_index("media_id")
    assert len(meta) == 30
    assert (meta.n_bytes > 0).all()
    png = meta[meta.detected_mime == "image/png"]
    assert (png.width.astype(int) >= 16).all()
    jpg = meta[meta.detected_mime == "image/jpeg"]
    assert len(jpg) > 0
    # width/height parsed from the SOF0 header (media_id i -> 16+i x 9+i)
    for mid, row in jpg.iterrows():
        assert int(row.width) == 16 + mid and int(row.height) == 9 + mid
    wav = meta[meta.detected_mime == "audio/wav"]
    assert wav.sample_rate.astype(int).isin([8000, 16000, 24000]).all()
    # WAV duration from the chunk walk: data = body*8 = 1024 B at
    # byte_rate = rate*2 -> 1024*1000 // (rate*2)
    for mid, row in wav.iterrows():
        rate = int(row.sample_rate)
        assert int(row.duration_ms) == 1024 * 1000 // (rate * 2)
    mp4 = meta[meta.detected_mime == "video/mp4"]
    # mvhd duration: media_id i -> (i+1)*500 ms at timescale 1000
    for mid, row in mp4.iterrows():
        assert int(row.duration_ms) == (mid + 1) * 500
    # md5 is per-payload deterministic
    meta2 = extract_media_meta(media).toPandas().set_index("media_id")
    assert (meta.payload_md5 == meta2.payload_md5).all()


def test_empty_payload_md5_is_null(spark):
    """NULL-for-no-payload contract: zero-length and null blobs both give
    a null payload_md5 (not md5(b'') = d41d8cd9...)."""
    from crawl_spark.operators.multimodal import MEDIA_SCHEMA

    rows = [
        (0, "image", b"", "application/octet-stream", {}),
        (1, "image", None, "application/octet-stream", {}),
        (2, "image", b"x", "application/octet-stream", {}),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    meta = extract_media_meta(media).toPandas().set_index("media_id")
    assert meta.loc[0].payload_md5 is None
    assert meta.loc[1].payload_md5 is None
    assert meta.loc[2].payload_md5 is not None
    assert int(meta.loc[0].n_bytes) == 0 and int(meta.loc[1].n_bytes) == 0


def test_feature_stub_deterministic_and_normalized(spark):
    media = synth_media(spark, 12)
    feats = extract_media_features(media, dim=8).toPandas()
    assert len(feats) == 12
    for v in feats.feature:
        assert len(v) == 8
        assert abs(sum(v) - 1.0) < 1e-3  # histogram normalized
    assert fake_feature(b"abc", 4) == fake_feature(b"abc", 4)
    assert fake_feature(None, 4) == [0.0] * 4


def test_frame_sampling_plumbing(spark):
    from pyspark.sql import functions as F

    from crawl_spark.operators.multimodal import sample_frames, synth_media

    media = synth_media(spark, 12)  # 4 videos (every 3rd row)
    frames = sample_frames(media, n_frames=4, duration_ms=8000).toPandas()
    n_videos = media.filter(F.col("kind") == "video").count()
    assert len(frames) == n_videos * 4
    per = frames[frames.media_id == frames.media_id.iloc[0]].sort_values("frame_idx")
    assert list(per.ts_ms) == [0, 2000, 4000, 6000]  # uniform sampling
    assert all(len(f) == 64 for f in frames.frame)
    # deterministic: same payload+ts -> same fake frame
    again = sample_frames(media, n_frames=4, duration_ms=8000).toPandas()
    merged = frames.merge(again, on=["media_id", "frame_idx"])
    assert all(a == b for a, b in zip(merged.frame_x, merged.frame_y))
    # the honest codec boundary
    with pytest.raises(Exception):
        sample_frames(media, n_frames=1, fake_decode=False).collect()


def test_resize_plumbing(spark):
    from pyspark.sql import functions as F

    from crawl_spark.operators.multimodal import resize_images, synth_media

    media = synth_media(spark, 12)
    out = resize_images(media, width=16, height=8).toPandas()
    assert len(out) == media.filter(F.col("kind") == "image").count()
    assert all(len(p) == 16 * 8 for p in out.pixels)
    assert (out.width == 16).all() and (out.height == 8).all()
    with pytest.raises(Exception):
        resize_images(media, fake_decode=False).collect()


# -- real PNG decode + perceptual hashing -----------------------------------


def _checker(h, w, nch, seed=3):
    import numpy as np

    rs = np.random.RandomState(seed)
    return rs.randint(0, 256, size=(h, w, nch), dtype=np.uint8)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("nch", [1, 2, 3, 4])
def test_decode_png_roundtrip_all_filters_and_colors(filter_type, nch):
    """decode(encode(arr)) == arr for every scanline filter (None, Sub,
    Up, Average, Paeth) × color type (gray, gray+alpha, RGB, RGBA)."""
    import numpy as np

    from crawl_spark.operators.multimodal import decode_png, encode_png

    arr = _checker(13, 7, nch, seed=filter_type * 10 + nch)
    got = decode_png(encode_png(arr, filter_type=filter_type))
    assert got.shape == arr.shape
    assert np.array_equal(got, arr)


def test_decode_png_palette_and_boundaries():
    import struct
    import zlib

    import numpy as np
    import pytest as _pytest

    from crawl_spark.operators.multimodal import _PNG_SIG, decode_png

    # hand-built palette PNG: 2×2, indices [[0,1],[2,0]]
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B entries

    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(">I", zlib.crc32(t + d))

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    scan = b"\x00" + bytes([0, 1]) + b"\x00" + bytes([2, 0])
    png = (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", pal)
        + chunk(b"IDAT", zlib.compress(scan))
        + chunk(b"IEND", b"")
    )
    got = decode_png(png)
    exp = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 0, 0]]], dtype=np.uint8
    )
    assert np.array_equal(got, exp)

    # honest boundaries: 16-bit depth and interlace raise NotImplementedError
    ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    png16 = _PNG_SIG + chunk(b"IHDR", ihdr16) + chunk(b"IDAT", zlib.compress(b"\x00" * 10)) + chunk(b"IEND", b"")
    with _pytest.raises(NotImplementedError):
        decode_png(png16)
    ihdr_i = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1)
    png_i = _PNG_SIG + chunk(b"IHDR", ihdr_i) + chunk(b"IDAT", zlib.compress(b"\x00" * 10)) + chunk(b"IEND", b"")
    with _pytest.raises(NotImplementedError):
        decode_png(png_i)
    with _pytest.raises(ValueError):
        decode_png(b"nope" * 4)


def test_decode_image_dispatch_jpeg_stays_boundary():
    import pytest as _pytest

    from crawl_spark.operators.multimodal import decode_image

    with _pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0junk")


def test_average_hash_and_dhash_hand_computed():
    """Hashes match a by-hand computation on an 8×8 (aHash) / 9×8
    (dHash) image where resize is the identity."""
    import numpy as np

    from crawl_spark.operators.multimodal import average_hash, dhash

    g = np.arange(64, dtype=np.float64).reshape(8, 8)  # mean = 31.5
    # aHash: bit i (row-major, MSB first) = g.flat[i] >= 31.5 → first 32
    # bits 0, last 32 bits 1 → value = (2^32 - 1)
    assert average_hash(g) == (1 << 32) - 1

    g2 = np.zeros((8, 9), dtype=np.float64)
    g2[:, 1] = 10.0  # only column pair (0→1) increases
    # dHash bit (row-major over 8 rows × 8 pairs): pair j compares
    # col j+1 > col j → bit 0 of each row set (MSB-first → bit index 0,
    # 8, 16, ... = unsigned Σ 2^(63-8k), carried as two's-complement
    # int64 like Spark's LongType)
    exp = sum(1 << (63 - 8 * k) for k in range(8))
    exp = exp - (1 << 64) if exp >= (1 << 63) else exp
    assert dhash(g2) == exp


def test_phash_matches_naive_dct():
    """phash ≡ an O(n⁴) textbook DCT-II computed loop-by-loop (the
    matmul in the operator is just that sum factored), on images where
    the 32×32 resize is the identity."""
    import math

    import numpy as np

    from crawl_spark.operators.multimodal import _area_resize, phash

    rng = np.random.RandomState(7)
    for _ in range(3):
        g = rng.randint(0, 256, size=(32, 32)).astype(np.float64)
        n, hs = 32, 8
        low = np.empty((hs, hs))
        for u in range(hs):
            for v in range(hs):
                s = 0.0
                for y in range(n):
                    for x in range(n):
                        s += (
                            g[y, x]
                            * math.cos(math.pi * u * (2 * y + 1) / (2 * n))
                            * math.cos(math.pi * v * (2 * x + 1) / (2 * n))
                        )
                cu = math.sqrt(1.0 / n) if u == 0 else math.sqrt(2.0 / n)
                cv = math.sqrt(1.0 / n) if v == 0 else math.sqrt(2.0 / n)
                low[u, v] = cu * cv * s
        bits = (low > np.median(low)).flatten()
        exp = 0
        for b in bits:
            exp = (exp << 1) | int(b)
        exp = exp - (1 << 64) if exp >= (1 << 63) else exp
        assert phash(g) == exp
        assert _area_resize(g, 32, 32).tolist() == g.tolist()


def test_phash_brightness_invariance_beats_ahash():
    """A uniform brightness shift only moves the DC coefficient, so
    pHash barely changes; aHash re-thresholds every cell against the
    shifted mean and flips the cells the shift crosses."""
    import numpy as np

    from crawl_spark.operators.multimodal import average_hash, phash

    rng = np.random.RandomState(11)
    g = rng.randint(60, 196, size=(64, 64)).astype(np.float64)
    g2 = np.clip(g + 30.0, 0, 255)

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert ham(phash(g), phash(g2)) <= 2
    # sanity on the mechanism, not a strict dominance claim: the
    # spectral hash must be at least as stable as the spatial one here
    assert ham(phash(g), phash(g2)) <= ham(average_hash(g), average_hash(g2))


def test_image_hashes_and_neardup_pairs(spark):
    """End-to-end: real PNGs through image_hashes (decode_ok=True, real
    dims), non-PNG rows nulled honestly; near-dup banding finds exactly
    the planted pairs with exact recall at max_dist."""
    import numpy as np

    from crawl_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        dhash,
        encode_png,
        image_hashes,
        image_neardup_pairs,
        _to_gray,
    )

    base = _checker(24, 24, 3, seed=7)
    near = base.copy()
    near[0, 0] = 255 - near[0, 0]  # tiny perturbation → small hamming
    far = _checker(24, 24, 3, seed=8)
    rows = [
        (0, "image", encode_png(base), "image/png", {}),
        (1, "image", encode_png(near), "image/png", {}),
        (2, "image", encode_png(far), "image/png", {}),
        (3, "image", b"\xff\xd8\xff\xe0jpegish", "image/jpeg", {}),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: r for r in image_hashes(df).collect()}
    assert got[0].decode_ok and got[0].width == 24 and got[0].height == 24
    assert not got[3].decode_ok and got[3].dhash is None
    # Spark-side hash equals the driver-side function on the same pixels
    assert got[0].dhash == dhash(_to_gray(base))
    d01 = bin(
        (got[0].dhash ^ got[1].dhash) & ((1 << 64) - 1)
    ).count("1")
    d02 = bin((got[0].dhash ^ got[2].dhash) & ((1 << 64) - 1)).count("1")
    assert d01 <= 6 < d02, (d01, d02)

    hashes = image_hashes(df)
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in image_neardup_pairs(hashes, max_dist=6).collect()
    }
    assert set(pairs) == {(0, 1)}
    assert pairs[(0, 1)] == d01
    # exact recall pinned: even a pair differing in max_dist bits in
    # adversarial positions is found (pigeonhole over bands)
    h0 = got[0].dhash
    # flip 6 bits spread across 6 different default bands (width 9)
    h_adv = h0
    for b in range(6):
        h_adv ^= 1 << (b * 9)
    import pandas as pd

    adv = spark.createDataFrame(
        pd.DataFrame({"media_id": [10, 11], "dhash": [h0, h_adv]})
    )
    advp = image_neardup_pairs(adv, max_dist=6).collect()
    assert [(r.id_a, r.id_b, r.hamming) for r in advp] == [(10, 11, 6)]
    # bands too few for the distance: loud error, not silent recall loss
    with pytest.raises(ValueError):
        image_neardup_pairs(adv, max_dist=6, bands=4)


def test_decode_wav_roundtrip_and_downmix():
    """encode_wav → decode_wav round-trips 16-bit and 8-bit PCM within
    quantization error; stereo downmixes by mean."""
    import numpy as np

    from crawl_spark.operators.multimodal import decode_wav, encode_wav

    t = np.arange(800) / 8000.0
    sine = 0.5 * np.sin(2 * np.pi * 440.0 * t)
    rate, a = decode_wav(encode_wav(sine, 8000))
    assert rate == 8000 and len(a) == 800
    assert np.abs(a - sine).max() < 1.0 / 32768 + 1e-12

    rate8, a8 = decode_wav(encode_wav(sine, 8000, bits=8))
    assert rate8 == 8000 and np.abs(a8 - sine).max() < 1.0 / 128 + 1e-12

    # stereo: L = sine, R = -sine → mean downmix ~ 0
    inter = np.empty(1600)
    inter[0::2] = sine
    inter[1::2] = -sine
    _, am = decode_wav(encode_wav(inter, 8000, channels=2))
    assert len(am) == 800 and np.abs(am).max() < 1.0 / 32768 + 1e-12


def test_decode_wav_honest_boundaries():
    """Float PCM (tag 3) and 24-bit stay NotImplementedError; junk is
    ValueError — mirrors the JPEG codec-boundary contract."""
    import struct

    import numpy as np
    import pytest

    from crawl_spark.operators.multimodal import decode_wav, encode_wav

    good = encode_wav(np.zeros(64), 8000)
    # flip format tag to 3 (IEEE float) in the fmt chunk (offset 20)
    float_wav = good[:20] + struct.pack("<H", 3) + good[22:]
    with pytest.raises(NotImplementedError):
        decode_wav(float_wav)
    bits24 = good[:34] + struct.pack("<H", 24) + good[36:]
    with pytest.raises(NotImplementedError):
        decode_wav(bits24)
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxJUNK")
    with pytest.raises(ValueError):
        decode_wav(b"")


def test_audio_features_sine_physics():
    """rms and zcr of a pure sine match theory: rms = amp/√2, zcr ≈
    2·f/rate (two sign flips per cycle)."""
    import numpy as np

    from crawl_spark.operators.multimodal import decode_wav, encode_wav

    rate, f, amp = 8000, 440.0, 0.5
    t = np.arange(rate) / rate  # 1 second
    payload = encode_wav(amp * np.sin(2 * np.pi * f * t), rate)
    _, a = decode_wav(payload)
    rms = float(np.sqrt(np.mean(a * a)))
    assert abs(rms - amp / np.sqrt(2)) < 1e-3
    sgn = np.signbit(a)
    zcr = np.count_nonzero(sgn[1:] != sgn[:-1]) / (len(a) - 1)
    assert abs(zcr - 2 * f / rate) < 5e-3


def test_audio_spectral_hash_neardup(spark):
    """Same tone + light noise → small hamming; different tone → large;
    amplitude scaling → identical hash. Near-dup pairs ride the image
    hamming banding unchanged."""
    import numpy as np
    import pandas as pd

    from crawl_spark.operators.multimodal import (
        audio_spectral_hash,
        image_neardup_pairs,
    )

    rng = np.random.RandomState(5)
    rate = 8000
    t = np.arange(2 * rate) / rate
    base = 0.5 * np.sin(2 * np.pi * 440.0 * t) + 0.2 * np.sin(
        2 * np.pi * 1200.0 * t
    )
    near = base + 0.01 * rng.randn(len(base))
    far = 0.5 * np.sin(2 * np.pi * 2600.0 * t)

    def ham(x, y):
        return bin((x ^ y) & ((1 << 64) - 1)).count("1")

    h0, h1, h2 = (audio_spectral_hash(x) for x in (base, near, far))
    assert ham(h0, h1) <= 6 < ham(h0, h2)
    assert audio_spectral_hash(0.3 * base) == h0  # scale-invariant

    df = spark.createDataFrame(
        pd.DataFrame({"media_id": [0, 1, 2], "spectral_hash": [h0, h1, h2]})
    )
    pairs = {
        (r.id_a, r.id_b)
        for r in image_neardup_pairs(
            df, max_dist=6, hash_col="spectral_hash"
        ).collect()
    }
    assert pairs == {(0, 1)}


def test_audio_features_spark_matches_driver(spark):
    """Spark-side audio_features equals the driver-side functions on the
    same payloads; junk rows are honestly decode_ok=false."""
    import numpy as np

    from crawl_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        audio_features,
        audio_spectral_hash,
        decode_wav,
        encode_wav,
    )

    rate = 8000
    t = np.arange(rate) / rate
    p0 = encode_wav(0.5 * np.sin(2 * np.pi * 440.0 * t), rate)
    p1 = encode_wav(0.25 * np.sin(2 * np.pi * 900.0 * t), rate, bits=8)
    rows = [
        (0, "audio", p0, "audio/wav", {}),
        (1, "audio", p1, "audio/wav", {}),
        (2, "audio", b"\xff\xd8not-audio", "image/jpeg", {}),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: r for r in audio_features(df).collect()}
    for mid, payload in ((0, p0), (1, p1)):
        r_, a = decode_wav(payload)
        assert got[mid].sample_rate == r_
        assert got[mid].n_samples == len(a)
        assert got[mid].duration_ms == 1000
        assert abs(got[mid].rms - float(np.sqrt(np.mean(a * a)))) < 1e-12
        assert got[mid].spectral_hash == audio_spectral_hash(a)
        assert got[mid].decode_ok
    assert not got[2].decode_ok and got[2].rms is None


# -- real MP4 demux ----------------------------------------------------------


def _build_mp4(sample_bytes_list, chunks, timescale=1000, delta=100,
               handler=b"vide"):
    from crawl_spark.operators.multimodal import encode_mp4

    return encode_mp4(sample_bytes_list, chunks, timescale, delta, handler)


def test_mp4_sample_table_exact():
    """Demux recovers every planted sample's true (ts, offset, size)
    across multi-sample chunks with junk between them."""
    from crawl_spark.operators.multimodal import mp4_sample_table

    samples = [bytes([65 + i]) * (3 + i) for i in range(6)]  # AAA, BBBB, ...
    mp4 = _build_mp4(samples, chunks=[4, 2])
    table = mp4_sample_table(mp4)
    assert len(table) == 6
    assert [t for t, _, _ in table] == [0, 100, 200, 300, 400, 500]
    for i, (ts, off, size) in enumerate(table):
        assert mp4[off : off + size] == samples[i], i


def test_mp4_sample_table_honest_failures():
    import pytest

    from crawl_spark.operators.multimodal import mp4_sample_table

    with pytest.raises(ValueError):
        mp4_sample_table(b"\x00\x00\x00\x10ftypisom" + b"\x00" * 8)  # no moov
    samples = [b"xx"] * 3
    good = _build_mp4(samples, chunks=[3])
    with pytest.raises(ValueError):
        mp4_sample_table(good[: len(good) - 20])  # truncated stbl
    with pytest.raises(ValueError):
        mp4_sample_table(b"")


def test_extract_video_samples_spark(spark):
    """Spark-side demux returns the REAL encoded bytes at real
    timestamps; junk payloads emit demux_ok=false rows."""
    from crawl_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_video_samples,
    )

    samples = [bytes([48 + i]) * 10 for i in range(11)]  # ts 0..1000
    mp4 = _build_mp4(samples, chunks=[5, 6])
    rows = [
        (0, "video", mp4, "video/mp4", {}),
        (1, "video", b"\x00\x00\x00\x10ftypisomJUNK", "video/mp4", {}),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = extract_video_samples(df, n_frames=3).toPandas()
    ok = got[got.media_id == 0].sort_values("frame_idx")
    # duration 1000 ms → wanted ts 0, 500, 1000; stts delta 100 → exact
    assert list(ok.ts_ms) == [0, 500, 1000]
    assert [bytes(b) for b in ok.sample_bytes] == [
        samples[0],
        samples[5],
        samples[10],
    ]
    assert (ok.n_samples == 11).all() and ok.demux_ok.all()
    bad = got[got.media_id == 1]
    assert len(bad) == 1 and not bad.demux_ok.iloc[0]
    assert bad.sample_bytes.iloc[0] is None


def test_resize_images_real_png_pixels(spark):
    """Decodable PNGs resize for REAL: Spark-side buffer equals the
    driver-side decode→luma→area-resize on the same image; junk-body
    rows keep the deterministic tiled fallback."""
    import numpy as np

    from crawl_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        _area_resize,
        _to_gray,
        encode_png,
        resize_images,
    )

    img = _checker(24, 20, 3, seed=9)
    junk = b"\x89PNG\r\n\x1a\njunkjunkjunkjunk"
    rows = [
        (0, "image", encode_png(img), "image/png", {}),
        (1, "image", junk, "image/png", {}),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r.media_id: r for r in resize_images(df, width=8, height=6).collect()}
    exp = bytes(
        np.clip(np.round(_area_resize(_to_gray(img), 8, 6)), 0, 255).astype(
            np.uint8
        )
    )
    assert bytes(out[0].pixels) == exp
    reps = (8 * 6) // len(junk) + 1
    assert bytes(out[1].pixels) == (junk * reps)[: 8 * 6]
