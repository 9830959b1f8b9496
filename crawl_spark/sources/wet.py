"""WET sink: export the extracted-text corpus as Common-Crawl-style
WET segments (WARC/1.0 ``conversion`` records) — the inverse of
`sources/warc.py` and the distributed re-expression of the reference's
per-response file sink (`response_utils.go:6-22` ``WriteResponseFile``
writes one extracted payload per fetched URL; a 100 TB crawl ships the
same content as a few thousand WET files instead).

Round-trip contract: ``read_warc`` ingests WARC → the engine extracts
text → :func:`write_wet` ships WET → :func:`read_wet` (or any WET
consumer) reads back byte-identical text per URL. Together with the
WARC source this closes the crawl's I/O loop on the public Common
Crawl formats.

Determinism contract (same rigor as `sources/shards.py`):

- The record STRING is built entirely JVM-side (:func:`wet_record` —
  one ``concat`` projection, no Python) so the DuckDB oracle replays it
  with ``||``/``chr(13)``/``strftime`` and hash-matches bit-for-bit;
- ``Content-Length`` is the UTF-8 octet length of the text (WARC spec:
  payload byte count), via ``octet_length``;
- ``WARC-Date`` is ``yyyy-MM-dd'T'HH:mm:ss'Z'`` of the capture
  timestamp under the session-UTC contract (`session.py`);
- shard assignment/order reuse the `shards.shard_expr` md5 rule —
  same corpus, same ``n_shards`` → the same URL lands in the same WET
  file at the same offset on every run and engine;
- gzip members are written with ``mtime=0`` so re-runs are
  byte-identical (Common Crawl's own per-record-member layout).

Scale shape at 100 TB: ONE shuffle (groupBy shard); each shard is
written by its own task as one ``.warc.wet.gz`` file (per-record gzip
members, so consumers can split on member boundaries); the manifest
aggregate is bounded by ``n_shards``. Size ``n_shards`` so a shard
fits in executor memory (the same rule every file-per-task writer
has); 100 TB / 2^16 shards ≈ 1.5 GB/shard ≈ Common Crawl's segment
size.
"""

from __future__ import annotations

import gzip
import json
import os
import shutil
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .shards import shard_expr
from .warc import parse_warc_bytes

WET_MANIFEST = "_wet_manifest.json"

_CRLF = "\r\n"


def stage_dir(path: str) -> str:
    """Create a fresh ``<path>.tmp`` staging directory — the first half
    of the atomic-publish protocol every WARC-family sink (WET/WAT/CDX)
    shares: write everything into the staging dir, then `publish_dir`
    renames it over the target in one filesystem operation."""
    tmp = path + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)
    return tmp


def publish_dir(tmp: str, path: str) -> None:
    """Atomically publish a `stage_dir` staging directory over ``path``
    (remove any previous output, then one rename)."""
    if os.path.exists(path):
        shutil.rmtree(path)
    os.rename(tmp, path)


def wet_record(
    url: F.Column, ts: F.Column, text: F.Column
) -> F.Column:
    """The WET conversion record as ONE JVM string expression:

    ``WARC/1.0 | WARC-Type: conversion | WARC-Target-URI: <url> |
    WARC-Date: <iso8601Z> | Content-Type: text/plain |
    Content-Length: <utf8 bytes of text>``, CRLF line ends, blank line,
    payload, blank line (ISO 28500 §4: two CRLFs terminate a record).

    SQL twin (DuckDB, session-UTC):
    ``'WARC/1.0' || chr(13)||chr(10) || … || strftime(ts,
    '%Y-%m-%dT%H:%M:%SZ') || … || octet_length(encode(text)) || …``.
    """
    return F.concat(
        F.lit("WARC/1.0" + _CRLF + "WARC-Type: conversion" + _CRLF),
        F.lit("WARC-Target-URI: "),
        url,
        F.lit(_CRLF + "WARC-Date: "),
        F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss'Z'"),
        F.lit(_CRLF + "Content-Type: text/plain" + _CRLF),
        F.lit("Content-Length: "),
        F.octet_length(text).cast("string"),
        F.lit(_CRLF + _CRLF),
        text,
        F.lit(_CRLF + _CRLF),
    )


def wet_records(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    text_col: str = "text",
) -> DataFrame:
    """Pure projection: one formatted WET record per document with text
    — ``(url, record, n_bytes)``, ``n_bytes`` the record's UTF-8 size
    (what the writer will put on disk before gzip). Rows missing url,
    timestamp or text are dropped (a conversion record needs all three;
    the reference's sink likewise writes only fetched responses)."""
    return df.filter(
        F.col(text_col).isNotNull()
        & F.col(url_col).isNotNull()
        & F.col(ts_col).isNotNull()
    ).select(
        F.col(url_col).alias("url"),
        wet_record(
            F.col(url_col), F.col(ts_col), F.col(text_col)
        ).alias("record"),
    ).select(
        "url",
        "record",
        F.octet_length("record").cast("long").alias("n_bytes"),
    )


_WET_WRITE_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType()),
        T.StructField("n_records", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("file", T.StringType()),
    ]
)


def write_wet(
    df: DataFrame,
    path: str,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    text_col: str = "text",
    n_shards: int = 16,
    compress: bool = True,
) -> dict:
    """Write the corpus as ``n_shards`` deterministic WET files +
    manifest; returns the manifest dict.

    Layout: ``path/wet-{shard:05d}.warc.wet[.gz]``, records in
    (md5(url), url) order within a shard (content-defined — layout-
    and engine-independent), one gzip member per record (``mtime=0``)
    when ``compress``. Atomic: staged to ``path.tmp`` then renamed, the
    engine's snapshot-commit rule. The formatting lives ONLY in
    :func:`wet_record` — the writer encodes the already-formatted
    record strings, so the bytes on disk are the oracle-checked ones.
    """
    if n_shards < 1:
        raise ValueError("write_wet: n_shards must be >= 1")
    recs = wet_records(df, url_col, ts_col, text_col)
    return write_segments(
        recs, path, "wet-", ".warc.wet", n_shards, compress, WET_MANIFEST
    )


def write_segments(
    recs: DataFrame,
    path: str,
    file_prefix: str,
    suffix_base: str,
    n_shards: int,
    compress: bool,
    manifest_name: str,
) -> dict:
    """Shared segment writer for the WARC-family sinks (WET/WAT): shard
    the formatted ``(url, record)`` frame by the md5 rule, write each
    shard as ONE file of UTF-8 records (one gzip member per record when
    ``compress``, ``mtime=0``), stage + rename atomically, return the
    manifest dict. One shuffle (groupBy shard); manifest bounded by
    ``n_shards``."""
    if n_shards < 1:
        raise ValueError("write_segments: n_shards must be >= 1")
    tmp = stage_dir(path)
    recs = recs.select(
        "url",
        "record",
        shard_expr("url", n_shards).alias("shard"),
        F.md5(F.col("url").cast("string")).alias("__ord"),
    )
    suffix = suffix_base + (".gz" if compress else "")

    def one_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["shard"].iloc[0])
        pdf = pdf.sort_values(["__ord", "url"], kind="mergesort")
        name = "%s%05d%s" % (file_prefix, shard, suffix)
        out = os.path.join(tmp, name)
        raw_bytes = 0
        with open(out, "wb") as f:
            for rec in pdf["record"]:
                data = rec.encode("utf-8")
                raw_bytes += len(data)
                f.write(
                    gzip.compress(data, mtime=0) if compress else data
                )
        return pd.DataFrame(
            [
                {
                    "shard": shard,
                    "n_records": len(pdf),
                    "n_bytes": raw_bytes,
                    "file": name,
                }
            ]
        )

    stats = (
        recs.groupBy("shard")
        .applyInPandas(one_shard, _WET_WRITE_SCHEMA)
        .collect()
    )
    manifest = {
        "n_shards": n_shards,
        "compress": compress,
        "total_records": int(sum(r["n_records"] for r in stats)),
        "total_bytes": int(sum(r["n_bytes"] for r in stats)),
        "shards": {
            int(r["shard"]): {
                "n_records": int(r["n_records"]),
                "n_bytes": int(r["n_bytes"]),
                "file": r["file"],
            }
            for r in stats
        },
    }
    with open(os.path.join(tmp, manifest_name), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    publish_dir(tmp, path)
    return manifest


_WET_READ_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("text", T.StringType()),
    ]
)


def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """WET segments under ``path`` → ``(url, warc_ts, text)``. Same
    ingestion shape as ``read_warc`` (file-granularity parallelism via
    ``binaryFile`` + one ``mapInPandas`` stdlib parse); ``conversion``
    records only, payload decoded as UTF-8. An empty shard set (a
    corpus where every row was filtered before the sink) reads back as
    an empty typed frame, not an error."""
    import glob as _glob

    if not _glob.glob(os.path.join(path, "*.warc.wet*")):
        return spark.createDataFrame([], _WET_READ_SCHEMA)
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc.wet*")
        .load(path)
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                for rec in parse_warc_bytes(
                    bytes(content), warc_type="conversion"
                ):
                    rows.append(
                        {
                            "url": rec["url"],
                            "warc_ts": rec["warc_ts"],
                            "text": rec["html"].decode("utf-8"),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in _WET_READ_SCHEMA.fields]
            )

    return files.select("content").mapInPandas(fn, _WET_READ_SCHEMA)
