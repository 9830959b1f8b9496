"""WARC source: read Common-Crawl-style WARC files into the engine's
pages schema (url, warc_ts, html, text, lang).

Real Common Crawl ships ~1 GB ``.warc.gz`` segments (tens of thousands
per crawl). The Spark-native ingestion shape:

- ``spark.read.format("binaryFile")`` lists the segment files — Spark
  parallelizes at FILE granularity, which matches how WARC must be read
  (records are variable-length and per-record gzip members cannot be
  split mid-file);
- one ``mapInPandas`` pass parses each segment's bytes: WARC/1.0 record
  headers, ``WARC-Type: response`` filter, ``WARC-Target-URI`` +
  ``WARC-Date``, HTTP payload after the header blank line. Gzip
  segments (whole-stream or concatenated per-record members — Common
  Crawl uses the latter) are handled by a zlib loop.

Pure stdlib parsing — no warcio dependency — and a ``write_warc``
helper generates spec-shaped fixtures so the reader is testable
hermetically.
"""

from __future__ import annotations

import datetime as dt
import gzip
import io
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


def _walk_records(
    data: bytes, want_type: bytes
) -> Iterator[tuple[int, int, dict]]:
    """Walk raw (uncompressed) WARC bytes → (offset, length, rec) per
    record of ``want_type``; offset/length locate the record block
    (header through trailing CRLFs) within ``data``. Truncated trailing
    garbage is ignored (a segment is best-effort, like real crawl
    data); non-record bytes resync to the next ``WARC/1.`` marker."""
    pos = 0
    n = len(data)
    while pos < n:
        start = pos
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0:
            break
        header_blob = data[pos:head_end]
        if not header_blob.startswith(b"WARC/"):
            # resync: find the next record marker
            nxt = data.find(b"WARC/1.", pos + 1)
            if nxt < 0:
                break
            pos = nxt
            continue
        headers = {}
        for line in header_blob.split(b"\r\n")[1:]:
            if b":" in line:
                k, v = line.split(b":", 1)
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get(b"content-length", b"0"))
        except ValueError:
            break
        body = data[head_end + 4 : head_end + 4 + length]
        pos = head_end + 4 + length
        # records are separated by two CRLFs
        while data[pos : pos + 2] == b"\r\n":
            pos += 2
        if headers.get(b"warc-type") != want_type:
            continue
        url = headers.get(b"warc-target-uri", b"").decode("utf-8", "replace")
        ts_raw = headers.get(b"warc-date", b"").decode("ascii", "replace")
        try:
            ts = dt.datetime.strptime(ts_raw, "%Y-%m-%dT%H:%M:%SZ")
        except ValueError:
            ts = None
        if want_type == b"response":
            # body = HTTP response: status line + headers, blank, payload
            http_end = body.find(b"\r\n\r\n")
            payload = body[http_end + 4 :] if http_end >= 0 else body
        else:
            # conversion (WET) and other types: the body IS the payload
            payload = body
        yield start, pos - start, {"url": url, "warc_ts": ts, "html": payload}


def parse_warc_records(
    data: bytes, warc_type: str = "response"
) -> Iterator[tuple[int, int, dict]]:
    """Parse WARC bytes → (offset, length, rec) per record of
    ``warc_type``. offset/length are FILE coordinates a reader can
    range-fetch and re-parse: for Common-Crawl-layout gzip (one member
    per record) they locate the compressed member; for whole-stream
    gzip every record reports the one member holding it (documented —
    that layout has no per-record random access); for plain bytes they
    locate the record block. This is the pointer triple real CDX lines
    carry (``filename``/``offset``/``length``)."""
    want_type = warc_type.encode("ascii")
    if data[:2] == b"\x1f\x8b":
        pos = 0
        n = len(data)
        while pos < n and data[pos : pos + 2] == b"\x1f\x8b":
            d = zlib.decompressobj(16 + zlib.MAX_WBITS)
            try:
                raw = d.decompress(data[pos:])
            except zlib.error:
                break
            consumed = (n - pos) - len(d.unused_data)
            if consumed <= 0:
                break
            for _, _, rec in _walk_records(raw, want_type):
                yield pos, consumed, rec
            pos += consumed
    else:
        yield from _walk_records(data, want_type)


def parse_warc_bytes(data: bytes, warc_type: str = "response") -> list[dict]:
    """Parse WARC bytes → list of record dicts (url, warc_ts, html) for
    records of ``warc_type`` (default ``response`` — the fetch-capture
    records; ``conversion`` for WET extracted-text segments, where the
    body IS the payload with no HTTP envelope). Other record types are
    skipped; truncated trailing garbage is ignored (a segment is
    best-effort, like real crawl data)."""
    return [rec for _, _, rec in parse_warc_records(data, warc_type)]


def fetch_warc_record(
    path: str, offset: int, length: int, url: str | None = None
) -> dict | None:
    """The CDX random-access read: range-fetch ``length`` bytes at
    ``offset`` in a WARC file (one seek+read — on object storage this
    is one ranged GET), inflate/parse just that slice, return the
    record dict (or the one matching ``url`` when the slice is a
    multi-record whole-stream member). Returns None when no record
    matches."""
    if path.startswith("file:"):
        path = path[5:]  # binaryFile reports file: URIs
    with open(path, "rb") as f:
        f.seek(offset)
        blob = f.read(length)
    recs = parse_warc_bytes(blob)
    if url is None:
        return recs[0] if recs else None
    for rec in recs:
        if rec["url"] == url:
            return rec
    return None


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC segments under ``path`` → pages DataFrame
    (url, warc_ts, html, text=null, lang=null — text/lang are filled by
    downstream extraction/lang-id operators)."""
    files = spark.read.format("binaryFile").load(path)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                for rec in parse_warc_bytes(bytes(content)):
                    rows.append(
                        {
                            "url": rec["url"],
                            "warc_ts": rec["warc_ts"],
                            "html": rec["html"],
                            "text": None,
                            "lang": None,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in PAGES_SCHEMA.fields]
            )

    return files.select("content").mapInPandas(fn, PAGES_SCHEMA)


PAGES_OFFSETS_SCHEMA = T.StructType(
    list(PAGES_SCHEMA.fields)
    + [
        T.StructField("warc_filename", T.StringType()),
        T.StructField("warc_offset", T.LongType()),
        T.StructField("warc_length", T.LongType()),
    ]
)


def read_warc_with_offsets(spark: SparkSession, path: str) -> DataFrame:
    """`read_warc` plus the record-pointer triple
    (warc_filename, warc_offset, warc_length) — what a CDX index line
    needs so a consumer can range-fetch ONE record out of a petabyte
    archive (`fetch_warc_record`). Same file-granular scan + one
    mapInPandas parse; filenames are the scan's own `path` column."""
    files = spark.read.format("binaryFile").load(path)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fname, content in zip(pdf["path"], pdf["content"]):
                for off, ln, rec in parse_warc_records(bytes(content)):
                    rows.append(
                        {
                            "url": rec["url"],
                            "warc_ts": rec["warc_ts"],
                            "html": rec["html"],
                            "text": None,
                            "lang": None,
                            "warc_filename": fname,
                            "warc_offset": off,
                            "warc_length": ln,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in PAGES_OFFSETS_SCHEMA.fields]
            )

    return files.select("path", "content").mapInPandas(
        fn, PAGES_OFFSETS_SCHEMA
    )


def write_warc(path: str, records: list[dict], compress: bool = False) -> str:
    """Write (url, warc_ts, html[, http_status]) records as a spec-shaped
    WARC file (one gzip member per record when compress=True, like
    Common Crawl)."""
    chunks = []
    for rec in records:
        ts = rec.get("warc_ts") or dt.datetime(2026, 1, 1)
        status = rec.get("http_status", 200)
        http = (
            b"HTTP/1.1 %d OK\r\nContent-Type: text/html\r\n\r\n" % status
            + rec["html"]
        )
        head = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            b"WARC-Target-URI: " + rec["url"].encode() + b"\r\n"
            b"WARC-Date: " + ts.strftime("%Y-%m-%dT%H:%M:%SZ").encode() + b"\r\n"
            b"Content-Length: " + str(len(http)).encode() + b"\r\n"
            b"\r\n"
        )
        record = head + http + b"\r\n\r\n"
        chunks.append(gzip.compress(record) if compress else record)
    with open(path, "wb") as f:
        f.write(b"".join(chunks))
    return path
