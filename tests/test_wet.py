"""WET sink: byte-level record contract, deterministic sharded writer,
and the full crawl-format round trip WARC → engine text → WET → read
back byte-identical."""

from __future__ import annotations

import datetime as dt
import gzip
import json
import os

from pyspark.sql import functions as F

from crawl_spark.sources.warc import parse_warc_bytes
from crawl_spark.sources.wet import (
    WET_MANIFEST,
    read_wet,
    wet_records,
    write_wet,
)


def _docs(spark, n=7):
    rows = [
        (
            "http://w%d.example/p/%d" % (i % 2, i),
            dt.datetime(2026, 1, 2, 3, 4, i),
            # multi-line, CRLF-embedded, non-ASCII and empty payloads all
            # survive (records are length-prefixed, not delimiter-framed)
            ["plain doc %d" % i, "two\nlines £%d" % i, "crlf\r\ninside", ""][i % 4],
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "url string, warc_ts timestamp, text string")


def test_wet_record_bytes_exact(spark):
    """The JVM-built record matches the hand-built spec bytes."""
    df = _docs(spark, 1)
    rec = wet_records(df).collect()[0]
    expected = (
        "WARC/1.0\r\n"
        "WARC-Type: conversion\r\n"
        "WARC-Target-URI: http://w0.example/p/0\r\n"
        "WARC-Date: 2026-01-02T03:04:00Z\r\n"
        "Content-Type: text/plain\r\n"
        "Content-Length: 11\r\n"
        "\r\n"
        "plain doc 0\r\n\r\n"
    )
    assert rec["record"] == expected
    assert rec["n_bytes"] == len(expected.encode("utf-8"))


def test_wet_content_length_is_utf8_octets(spark):
    df = spark.createDataFrame(
        [("u", dt.datetime(2026, 1, 1), "héllo £")],
        "url string, warc_ts timestamp, text string",
    )
    rec = wet_records(df).collect()[0]["record"]
    assert "Content-Length: %d\r\n" % len("héllo £".encode("utf-8")) in rec


def test_wet_null_rows_dropped(spark):
    df = spark.createDataFrame(
        [
            ("u1", dt.datetime(2026, 1, 1), "ok"),
            ("u2", dt.datetime(2026, 1, 1), None),
            (None, dt.datetime(2026, 1, 1), "x"),
            ("u3", None, "x"),
        ],
        "url string, warc_ts timestamp, text string",
    )
    assert [r["url"] for r in wet_records(df).collect()] == ["u1"]


def test_write_wet_roundtrip_and_manifest(spark, tmp_path):
    df = _docs(spark)
    path = str(tmp_path / "wet_out")
    manifest = write_wet(df, path, n_shards=4)
    assert manifest["total_records"] == 7
    assert set(os.listdir(path)) == {
        m["file"] for m in manifest["shards"].values()
    } | {WET_MANIFEST}
    with open(os.path.join(path, WET_MANIFEST)) as f:
        assert json.load(f)["total_records"] == 7
    back = read_wet(spark, path).toPandas().sort_values("url").reset_index(drop=True)
    src = df.toPandas().sort_values("url").reset_index(drop=True)
    assert list(back["url"]) == list(src["url"])
    assert list(back["text"]) == list(src["text"])  # byte-identical text
    assert list(back["warc_ts"]) == list(src["warc_ts"])


def test_write_wet_deterministic_bytes(spark, tmp_path):
    """Two runs produce byte-identical files (mtime=0 gzip, md5 order)."""
    df = _docs(spark)
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    m1 = write_wet(df, p1, n_shards=3)
    m2 = write_wet(df, p2, n_shards=3)
    assert m1 == m2
    for info in m1["shards"].values():
        b1 = open(os.path.join(p1, info["file"]), "rb").read()
        b2 = open(os.path.join(p2, info["file"]), "rb").read()
        assert b1 == b2


def test_wet_gzip_members_parse_with_stdlib(spark, tmp_path):
    """Each record is its own gzip member; the shared WARC parser reads
    conversion records from the compressed file."""
    df = _docs(spark, 4)
    path = str(tmp_path / "gz")
    write_wet(df, path, n_shards=1)
    (fname,) = [f for f in os.listdir(path) if f.endswith(".warc.wet.gz")]
    raw = open(os.path.join(path, fname), "rb").read()
    # stdlib multi-member decompress sees the concatenated records
    plain = gzip.decompress(raw)
    assert plain.count(b"WARC-Type: conversion") == 4
    got = parse_warc_bytes(raw, warc_type="conversion")
    assert len(got) == 4
    assert {g["url"] for g in got} == {r["url"] for r in df.collect()}
    # response-typed parse of the same bytes yields nothing
    assert parse_warc_bytes(raw) == []


def test_warc_to_engine_to_wet_full_circle(spark, tmp_path):
    """WARC in → engine text extraction → WET out → read back: the text
    read from WET is byte-identical to the engine's extracted text."""
    from crawl_spark.functions.extract import udf_extract_text
    from crawl_spark.sources.warc import read_warc, write_warc

    d = tmp_path / "warcs"
    d.mkdir()
    recs = [
        {
            "url": "http://w.example/p/%d" % i,
            "warc_ts": dt.datetime(2026, 2, 1, 0, 0, i),
            "html": (
                "<html><body><p>döc &amp; %d  spaced</p></body></html>" % i
            ).encode("utf-8"),
        }
        for i in range(3)
    ]
    write_warc(str(d / "seg.warc.gz"), recs, compress=True)
    pages = read_warc(spark, str(d))
    extracted = pages.select(
        "url",
        "warc_ts",
        udf_extract_text("p")(F.col("html").cast("string")).alias("text"),
    )
    out = str(tmp_path / "wet")
    write_wet(extracted, out, n_shards=2)
    back = read_wet(spark, out).toPandas().sort_values("url")
    want = extracted.toPandas().sort_values("url")
    assert list(back["text"]) == list(want["text"])
    assert list(back["url"]) == list(want["url"])
