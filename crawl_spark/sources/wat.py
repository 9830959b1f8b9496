"""WAT sink: export per-page link/metadata records as Common-Crawl-style
WAT segments (WARC/1.0 ``metadata`` records with a JSON payload).
Together with `sources/warc.py` (WARC in) and `sources/wet.py` (WET
out) this completes the public Common Crawl artifact triple — the
reference's per-response sink (`response_utils.go:6-22`) ships page
*content*; WAT ships the link graph + head metadata a downstream
ranker/frontier consumes without re-parsing 100 TB of HTML.

Payload (one line of deterministic JSON, key order FIXED by
construction — assembled with ``concat``, never a dict, so the DuckDB
oracle replays it with ``||`` and hash-matches bit-for-bit)::

    {"Envelope":{"WARC-Header-Metadata":{"WARC-Target-URI":"<url>",
    "WARC-Date":"<iso8601Z>"},"Payload-Metadata":{"HTML-Metadata":{
    "Head":{"Title":"<title>"},"Links":[{"url":"<href>","text":
    "<anchor>"},...]}}}}

Determinism/escaping contract:

- JSON string escaping is the five-step JVM ``replace`` chain
  :func:`json_escape` (backslash FIRST, then quote, CR, LF, TAB) —
  exactly replayable in DuckDB. Other C0 controls are not escaped: the
  extraction contract's Fields-collapse (`functions/textnorm.py`) has
  already removed them from any text this sink sees; feeding raw
  un-normalized control characters would produce non-strict JSON (the
  bytes are still deterministic).
- a null title renders ``"Head":{}`` (key omitted, not ``null``);
  a null/empty link array renders ``"Links":[]``.
- ``Content-Length`` is the UTF-8 octet length of the payload;
  ``WARC-Date`` is the session-UTC ISO instant (same rules as
  `wet.py`).
- shard layout/order/atomicity reuse :func:`wet.write_segments`
  (md5-rule sharding, one gzip member per record, ``mtime=0``,
  stage + rename).

Plan shape at 100 TB: the payload is materialized as a real column in
one projection and *referenced* twice (body + Content-Length) in the
next — Catalyst's CollapseProject keeps a twice-referenced non-cheap
expression in its own project, so the link-array transform chain
evaluates ONCE per row (the repo's no-CSE-for-nested-HOF rule).
Writing is one shuffle (groupBy shard).

The HTML side (:func:`wat_from_html`) is the same one-parse-per-row
Arrow path as the engine's extraction (`functions/extract.py`): title
+ anchors come out of a single ``parse_html`` per page, anchor hrefs
resolve with ``NodeResolveURL`` semantics (html_utils.go:93-106 —
absent href / malformed URL silently skipped), text passes the Go
Fields-collapse. It is pytest-verified byte-for-byte; the JSON/WARC
assembly it feeds is the oracle-checked :func:`wat_records`.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .warc import parse_warc_bytes
from .wet import write_segments

WAT_MANIFEST = "_wat_manifest.json"

_CRLF = "\r\n"

LINK_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("text", T.StringType()),
        ]
    )
)


def json_escape(col: Column) -> Column:
    """JSON string escape as a JVM replace chain — backslash first,
    then quote, CR, LF, TAB.

    SQL twin (DuckDB): ``replace(replace(replace(replace(replace(s,
    chr(92), chr(92)||chr(92)), '"', chr(92)||'"'), chr(13),
    chr(92)||'r'), chr(10), chr(92)||'n'), chr(9), chr(92)||'t')``.
    """
    out = F.replace(col, F.lit("\\"), F.lit("\\\\"))
    out = F.replace(out, F.lit('"'), F.lit('\\"'))
    out = F.replace(out, F.lit("\r"), F.lit("\\r"))
    out = F.replace(out, F.lit("\n"), F.lit("\\n"))
    return F.replace(out, F.lit("\t"), F.lit("\\t"))


def wat_payload(
    url: Column, ts: Column, title: Column, links: Column
) -> Column:
    """The JSON payload as ONE JVM string expression (schema above).
    ``links`` is ``array<struct<url,text>>``; each element renders as
    ``{"url":"…","text":"…"}`` inside the lambda (link fields are only
    touched once, so the no-outer-ref HOF rule holds trivially)."""
    link_json = F.coalesce(
        F.array_join(
            F.transform(
                links,
                lambda x: F.concat(
                    F.lit('{"url":"'),
                    json_escape(x["url"]),
                    F.lit('","text":"'),
                    json_escape(x["text"]),
                    F.lit('"}'),
                ),
            ),
            ",",
        ),
        F.lit(""),
    )
    head = F.when(
        title.isNotNull(),
        F.concat(F.lit('"Title":"'), json_escape(title), F.lit('"')),
    ).otherwise(F.lit(""))
    return F.concat(
        F.lit('{"Envelope":{"WARC-Header-Metadata":{"WARC-Target-URI":"'),
        json_escape(url),
        F.lit('","WARC-Date":"'),
        F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss'Z'"),
        F.lit('"},"Payload-Metadata":{"HTML-Metadata":{"Head":{'),
        head,
        F.lit('},"Links":['),
        link_json,
        F.lit("]}}}}"),
    )


def wat_record(url: Column, ts: Column, payload: Column) -> Column:
    """The WARC/1.0 ``metadata`` record around an already-built payload
    column (CRLF framing, two CRLFs terminate — ISO 28500 §4, same
    contract as `wet.wet_record`)."""
    return F.concat(
        F.lit("WARC/1.0" + _CRLF + "WARC-Type: metadata" + _CRLF),
        F.lit("WARC-Target-URI: "),
        url,
        F.lit(_CRLF + "WARC-Date: "),
        F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss'Z'"),
        F.lit(_CRLF + "Content-Type: application/json" + _CRLF),
        F.lit("Content-Length: "),
        F.octet_length(payload).cast("string"),
        F.lit(_CRLF + _CRLF),
        payload,
        F.lit(_CRLF + _CRLF),
    )


def wat_records(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    title_col: str = "title",
    links_col: str = "links",
) -> DataFrame:
    """One formatted WAT record per page → ``(url, record, n_bytes)``.

    Input: pre-extracted ``(url, ts, title, links:array<struct<url,
    text>>)`` (the engine's extraction output, or
    :func:`wat_from_html`). Rows missing url or timestamp are dropped
    (a metadata record is anchored to a capture); null title/links are
    valid and render as the empty Head / empty Links list.

    Two projections on purpose: the payload is a named column in the
    first and referenced twice in the second — CollapseProject keeps
    the expensive transform single-evaluated (see module docstring).
    """
    staged = df.filter(
        F.col(url_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        F.col(url_col).alias("url"),
        F.col(ts_col).alias("__ts"),
        wat_payload(
            F.col(url_col),
            F.col(ts_col),
            F.col(title_col),
            F.col(links_col),
        ).alias("__payload"),
    )
    return staged.select(
        "url",
        wat_record(
            F.col("url"), F.col("__ts"), F.col("__payload")
        ).alias("record"),
    ).select(
        "url",
        "record",
        F.octet_length("record").cast("long").alias("n_bytes"),
    )


_EXTRACT_TYPE = T.StructType(
    [
        T.StructField("title", T.StringType()),
        T.StructField("links", LINK_TYPE),
    ]
)


def _extract_head_links(
    html: bytes | str | None, base_url: str | None, selector: str
) -> dict:
    """One parse → (title, [(href, anchor-text)…]). Title/anchor text
    pass the Go Fields-collapse (`textnorm.normalize_ws`); href
    resolution is ``NodeResolveURL`` (absent/malformed → skip the link,
    html_utils.go:93-106). A page with no <title> yields title=None."""
    from ..functions.htmldom import find, parse_html
    from ..functions.textnorm import normalize_ws
    from ..functions.urlnorm import resolve

    if html is None:
        return {"title": None, "links": None}
    root = parse_html(html)
    titles = find(root, "title")
    title = normalize_ws(titles[0].text()) if titles else None
    links = []
    for n in find(root, selector):
        href = n.attr("href")
        if href is None:
            continue
        u = resolve(base_url, href)
        if u is None or u == "":
            continue
        links.append({"url": u, "text": normalize_ws(n.text())})
    return {"title": title, "links": links}


def udf_extract_head_links(selector: str = "a"):
    """(html, base_url) → struct<title, links> — Arrow-batched, one
    ``parse_html`` per row (the engine's one-parse rule)."""

    @F.pandas_udf(_EXTRACT_TYPE)
    def _f(html: pd.Series, base_url: pd.Series) -> pd.DataFrame:
        rows = [
            _extract_head_links(h, b, selector)
            for h, b in zip(html, base_url)
        ]
        return pd.DataFrame(rows, columns=["title", "links"])

    return _f


def wat_from_html(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    html_col: str = "html",
    selector: str = "a",
) -> DataFrame:
    """Pages with raw HTML → WAT records: one Arrow extraction pass
    (title + anchors per page) feeding :func:`wat_records`. The
    extraction output is localCheckpointed before the record
    projection — the payload concat references title once and links
    once, but the *filter* inside ``wat_records`` would otherwise be
    pushed below the pandas UDF and double-evaluate it (the repo's
    documented pushdown rule)."""
    ex = df.filter(F.col(html_col).isNotNull()).select(
        F.col(url_col).alias("url"),
        F.col(ts_col).alias("warc_ts"),
        udf_extract_head_links(selector)(
            F.col(html_col), F.col(url_col)
        ).alias("__hd"),
    ).select(
        "url",
        "warc_ts",
        F.col("__hd.title").alias("title"),
        F.col("__hd.links").alias("links"),
    ).localCheckpoint(eager=False)
    return wat_records(ex)


def write_wat(
    df: DataFrame,
    path: str,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    title_col: str = "title",
    links_col: str = "links",
    n_shards: int = 16,
    compress: bool = True,
) -> dict:
    """Write ``n_shards`` deterministic WAT files + manifest under
    ``path`` (``wat-{shard:05d}.warc.wat[.gz]``); returns the manifest.
    Same layout/order/atomicity contract as `wet.write_wet` — the
    shared :func:`wet.write_segments` does the sharded write."""
    recs = wat_records(df, url_col, ts_col, title_col, links_col)
    return write_segments(
        recs, path, "wat-", ".warc.wat", n_shards, compress, WAT_MANIFEST
    )


_WAT_READ_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("payload", T.StringType()),
    ]
)

# the payload's JSON shape, for JVM-side from_json on the consumer side
WAT_ENVELOPE_TYPE = T.StructType(
    [
        T.StructField(
            "Envelope",
            T.StructType(
                [
                    T.StructField(
                        "WARC-Header-Metadata",
                        T.StructType(
                            [
                                T.StructField(
                                    "WARC-Target-URI", T.StringType()
                                ),
                                T.StructField("WARC-Date", T.StringType()),
                            ]
                        ),
                    ),
                    T.StructField(
                        "Payload-Metadata",
                        T.StructType(
                            [
                                T.StructField(
                                    "HTML-Metadata",
                                    T.StructType(
                                        [
                                            T.StructField(
                                                "Head",
                                                T.StructType(
                                                    [
                                                        T.StructField(
                                                            "Title",
                                                            T.StringType(),
                                                        )
                                                    ]
                                                ),
                                            ),
                                            T.StructField(
                                                "Links", LINK_TYPE
                                            ),
                                        ]
                                    ),
                                )
                            ]
                        ),
                    ),
                ]
            ),
        )
    ]
)


def wat_links(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """WAT payload JSON → the typed link frame ``(src, dst, anchor)``
    — the edge list `graph.pagerank`/`trustrank`/`anchor_text_topk`
    consume, recovered from shipped WAT segments WITHOUT re-parsing
    HTML and without a byte of Python: ``from_json`` + one ``explode``
    (a Generate, not an Exchange), all JVM-side.

    The parse is the exact inverse of :func:`wat_payload`'s escape
    chain (Jackson unescapes what `json_escape` escaped), so a
    build → ship → read → explode round trip reproduces the original
    hrefs/anchors byte-for-byte — that inverse IS the oracle-checked
    contract (`wat_links` in ``__spark_entry__``). Pages with no links
    (or a corrupt payload, which from_json nulls) contribute no rows.
    The envelope struct is named in its own projection and consumed by
    one Generate, so the JSON parses once per row."""
    env = df.select(
        F.from_json(F.col(payload_col), WAT_ENVELOPE_TYPE).alias("__env")
    ).select(
        F.col("__env")["Envelope"]["WARC-Header-Metadata"][
            "WARC-Target-URI"
        ].alias("src"),
        F.col("__env")["Envelope"]["Payload-Metadata"]["HTML-Metadata"][
            "Links"
        ].alias("__links"),
    )
    return env.select(
        "src", F.explode("__links").alias("__l")
    ).select(
        "src",
        F.col("__l")["url"].alias("dst"),
        F.col("__l")["text"].alias("anchor"),
    )


def read_wat(spark: SparkSession, path: str) -> DataFrame:
    """WAT segments under ``path`` → ``(url, warc_ts, payload)`` with
    the payload as the raw JSON string (consumers pick fields with
    ``get_json_object`` / ``from_json`` — JVM-side, no Python). Same
    file-granularity ingestion as `wet.read_wet`."""
    import glob as _glob
    import os

    if not _glob.glob(os.path.join(path, "*.warc.wat*")):
        return spark.createDataFrame([], _WAT_READ_SCHEMA)
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc.wat*")
        .load(path)
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                for rec in parse_warc_bytes(
                    bytes(content), warc_type="metadata"
                ):
                    rows.append(
                        {
                            "url": rec["url"],
                            "warc_ts": rec["warc_ts"],
                            "payload": rec["html"].decode("utf-8"),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in _WAT_READ_SCHEMA.fields]
            )

    return files.select("content").mapInPandas(fn, _WAT_READ_SCHEMA)
