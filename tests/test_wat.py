"""WAT sink: JSON payload byte contract (escaping, null head, empty
links), the HTML → title/anchors extraction path, and the sharded
write → read round trip."""

from __future__ import annotations

import datetime as dt
import json
import os

from crawl_spark.sources.wat import (
    WAT_MANIFEST,
    read_wat,
    wat_from_html,
    wat_links,
    wat_payload,
    wat_records,
    write_wat,
)

_TS = dt.datetime(2026, 1, 2, 3, 4, 5)
_SCHEMA = (
    "url string, warc_ts timestamp, title string, "
    "links array<struct<url:string,text:string>>"
)


def _pages(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


def test_wat_record_bytes_exact(spark):
    """Hand-built spec bytes for a title + two links page."""
    df = _pages(
        spark,
        [
            (
                "http://w0.example/p/0",
                _TS,
                "Hello",
                [
                    ("http://w0.example/a", "first"),
                    ("http://w1.example/b", "second"),
                ],
            )
        ],
    )
    rec = wat_records(df).collect()[0]
    payload = (
        '{"Envelope":{"WARC-Header-Metadata":'
        '{"WARC-Target-URI":"http://w0.example/p/0",'
        '"WARC-Date":"2026-01-02T03:04:05Z"},'
        '"Payload-Metadata":{"HTML-Metadata":{'
        '"Head":{"Title":"Hello"},'
        '"Links":[{"url":"http://w0.example/a","text":"first"},'
        '{"url":"http://w1.example/b","text":"second"}]}}}}'
    )
    expected = (
        "WARC/1.0\r\n"
        "WARC-Type: metadata\r\n"
        "WARC-Target-URI: http://w0.example/p/0\r\n"
        "WARC-Date: 2026-01-02T03:04:05Z\r\n"
        "Content-Type: application/json\r\n"
        "Content-Length: %d\r\n"
        "\r\n"
        "%s\r\n\r\n" % (len(payload.encode("utf-8")), payload)
    )
    assert rec["record"] == expected
    assert rec["n_bytes"] == len(expected.encode("utf-8"))
    # the payload is strict JSON
    env = json.loads(payload)["Envelope"]
    assert env["WARC-Header-Metadata"]["WARC-Target-URI"] == (
        "http://w0.example/p/0"
    )


def test_wat_escaping_roundtrips_through_json(spark):
    """Backslash/quote/CR/LF/TAB in title and anchor text escape to
    strict JSON that parses back to the original values."""
    title = 'a "q" \\ b\tc\nd\re'
    anchor = 'x\\y"z\t\n\r'
    df = _pages(
        spark,
        [("http://h/p", _TS, title, [("http://h/l", anchor)])],
    )
    rec = wat_records(df).collect()[0]["record"]
    payload = rec.split("\r\n\r\n")[1]
    meta = json.loads(payload)["Envelope"]["Payload-Metadata"]
    html = meta["HTML-Metadata"]
    assert html["Head"]["Title"] == title
    assert html["Links"][0]["text"] == anchor
    # Content-Length counts the escaped payload's UTF-8 octets
    clen = int(rec.split("Content-Length: ")[1].split("\r\n")[0])
    assert clen == len(payload.encode("utf-8"))


def test_wat_null_title_and_empty_links(spark):
    df = _pages(
        spark,
        [
            ("http://h/1", _TS, None, []),
            ("http://h/2", _TS, None, None),
        ],
    )
    recs = {r["url"]: r["record"] for r in wat_records(df).collect()}
    for rec in recs.values():
        payload = rec.split("\r\n\r\n")[1]
        html = json.loads(payload)["Envelope"]["Payload-Metadata"][
            "HTML-Metadata"
        ]
        assert html["Head"] == {}
        assert html["Links"] == []


def test_wat_drops_unanchored_rows(spark):
    df = _pages(
        spark,
        [
            (None, _TS, "t", []),
            ("http://h/ok", None, "t", []),
            ("http://h/keep", _TS, "t", []),
        ],
    )
    assert [r["url"] for r in wat_records(df).collect()] == [
        "http://h/keep"
    ]


def test_wat_from_html_extraction(spark):
    """One-parse extraction: title Fields-collapsed, relative hrefs
    resolved, anchors without href skipped, anchor text collapsed."""
    html = (
        b"<html><head><title>  My \t Page </title></head><body>"
        b'<a href="/rel">go  here</a>'
        b"<a>no href</a>"
        b'<a href="http://other.example/x">abs <b>bold</b></a>'
        b"</body></html>"
    )
    df = spark.createDataFrame(
        [("http://base.example/dir/page", _TS, html)],
        "url string, warc_ts timestamp, html binary",
    )
    rec = wat_from_html(df).collect()[0]["record"]
    payload = rec.split("\r\n\r\n")[1]
    html_meta = json.loads(payload)["Envelope"]["Payload-Metadata"][
        "HTML-Metadata"
    ]
    assert html_meta["Head"]["Title"] == "My Page"
    assert html_meta["Links"] == [
        {"url": "http://base.example/rel", "text": "go here"},
        {"url": "http://other.example/x", "text": "abs bold"},
    ]


def test_wat_links_inverse(spark):
    """build → parse recovers (src, dst, anchor) byte-for-byte through
    the escape chain; no-link pages contribute nothing; a corrupt
    payload nulls out instead of crashing."""
    from pyspark.sql import functions as F

    nasty = 'a"b\\c\td\ne\rf'
    df = _pages(
        spark,
        [
            ("http://h/1", _TS, None, [("http://h/x", nasty)]),
            ("http://h/2", _TS, "t", []),
        ],
    )
    pay = df.select(
        wat_payload(
            F.col("url"), F.col("warc_ts"), F.col("title"), F.col("links")
        ).alias("payload")
    )
    rows = wat_links(pay).collect()
    assert [(r["src"], r["dst"], r["anchor"]) for r in rows] == [
        ("http://h/1", "http://h/x", nasty)
    ]
    corrupt = spark.createDataFrame([("{oops",)], "payload string")
    assert wat_links(corrupt).count() == 0


def test_wat_escape_roundtrip_property(spark):
    """Hypothesis: for arbitrary text (escape-relevant chars weighted
    in), payload is strict JSON and title/anchor round-trip exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    alphabet = st.sampled_from(list('"\\\t\n\r') + list("ab £é{}[]:,"))
    texts = st.text(alphabet=alphabet, max_size=24)

    @settings(max_examples=30, deadline=None)
    @given(title=texts, anchor=texts)
    def check(title, anchor):
        df = _pages(
            spark, [("http://h/p", _TS, title, [("http://h/l", anchor)])]
        )
        rec = wat_records(df).collect()[0]["record"]
        payload = rec.split("\r\n\r\n")[1]
        html = json.loads(payload)["Envelope"]["Payload-Metadata"][
            "HTML-Metadata"
        ]
        assert html["Head"]["Title"] == title
        assert html["Links"][0]["text"] == anchor

    check()


def test_wat_write_read_roundtrip_and_determinism(spark, tmp_path):
    rows = [
        (
            "http://w%d.example/p/%d" % (i % 3, i),
            dt.datetime(2026, 1, 2, 3, 4, i),
            None if i % 3 == 0 else 'T"%d\\' % i,
            [
                ("http://w0.example/l/%d" % j, "anchor %d\n" % j)
                for j in range(i % 4)
            ],
        )
        for i in range(11)
    ]
    df = _pages(spark, rows)
    out = str(tmp_path / "wat")
    man = write_wat(df, out, n_shards=4)
    assert man["total_records"] == 11
    assert sorted(os.listdir(out)) == sorted(
        [s["file"] for s in man["shards"].values()] + [WAT_MANIFEST]
    )
    back = read_wat(spark, out).collect()
    assert len(back) == 11
    by_url = {r["url"]: r for r in back}
    for url, ts, title, links in rows:
        meta = json.loads(by_url[url]["payload"])["Envelope"]
        assert by_url[url]["warc_ts"] == ts
        hm = meta["Payload-Metadata"]["HTML-Metadata"]
        assert hm["Head"] == ({} if title is None else {"Title": title})
        assert hm["Links"] == [
            {"url": u, "text": t} for u, t in links
        ]
    # determinism: a second write produces byte-identical files
    out2 = str(tmp_path / "wat2")
    write_wat(df, out2, n_shards=4)
    for name in os.listdir(out):
        if name == WAT_MANIFEST:
            continue
        with open(os.path.join(out, name), "rb") as a, open(
            os.path.join(out2, name), "rb"
        ) as b:
            assert a.read() == b.read()
