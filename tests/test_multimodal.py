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
    assert sniff_container(png) == ("image/png", 640, 480, None)
    wav = b"RIFF" + b"\x00" * 4 + b"WAVE" + b"fmt " + b"\x00" * 8 + struct.pack("<I", 44100)
    assert sniff_container(wav) == ("audio/wav", None, None, 44100)
    assert sniff_container(b"\x00\x00\x00\x18ftypisom")[0] == "video/mp4"
    assert sniff_container(b"\xff\xd8rest")[0] == "image/jpeg"
    # JPEG SOF scan: dimensions come from the first SOFn segment
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 480, 640, 1) + b"\x01\x11\x00"
    jpg = b"\xff\xd8" + app0 + sof0 + b"\xff\xda\x00\x02junk"
    assert sniff_container(jpg) == ("image/jpeg", 640, 480, None)
    # truncated-before-SOF JPEG: mime detected, dims unknown
    assert sniff_container(b"\xff\xd8" + app0) == ("image/jpeg", None, None, None)
    assert sniff_container(None) == (None, None, None, None)
    assert sniff_container(b"junk")[0] == "application/octet-stream"


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
    # md5 is per-payload deterministic
    meta2 = extract_media_meta(media).toPandas().set_index("media_id")
    assert (meta.payload_md5 == meta2.payload_md5).all()


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
