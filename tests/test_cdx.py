"""CDX/CDXJ index: SURT goldens, sink layout (global sortedness, gzip
block offsets, cluster.idx), lookup parity, parse round-trip."""

import gzip
import os

import pytest
from pyspark.sql import functions as F

from crawl_spark.sources.cdx import (
    CDX_MANIFEST,
    CLUSTER_IDX,
    cdx_collapse,
    cdx_lookup,
    cdx_lookup_files,
    cdx_parse,
    cdx_records,
    read_cdx,
    revisit_records,
    surt_key,
    write_cdx,
    write_cdx_table,
)

# hand-computed goldens for every branch of the SURT contract
SURT_GOLDEN = [
    # www-strip + path lowercase + query lowercase-sort
    ("https://www.news.example.com/Sec1/P5?b=2&a=1",
     "com,example,news)/sec1/p5?a=1&b=2"),
    # bare root path renders empty
    ("https://example.com/", "com,example)"),
    # non-default port survives after the reversed host
    ("http://w3.example.com:8080/A/", "com,example,w3:8080)/a/"),
    # single-label host, no query
    ("https://localhost/x", "localhost)/x"),
    # param values lowercased, ASCII sort is on the whole param string
    ("https://a.b/p?Z=9&a=1&B=2", "b,a)/p?a=1&b=2&z=9"),
    # trailing '?' (empty query) == no query
    ("https://a.b/p?", "b,a)/p"),
    # 'www' only strips as a leading label
    ("https://www2.a.b/p", "b,a,www2)/p"),
    ("https://wwwx.example.com/", "com,example,wwwx)"),
]


def _pages(spark, n=300):
    i = F.col("id")
    q = (
        F.when(i % 6 == 0, F.lit(""))
        .when(
            i % 2 == 0,
            F.concat(F.lit("?b="), (i % 9).cast("string"), F.lit("&A=1")),
        )
        .otherwise(F.concat(F.lit("?a="), (i % 5).cast("string")))
    )
    return spark.range(n).select(
        F.concat(
            F.when(i % 3 == 0, F.lit("https://www.w")).otherwise(
                F.lit("https://w")
            ),
            (i % 7).cast("string"),
            F.lit(".example.com"),
            F.when(i % 5 == 0, F.lit(":8080")).otherwise(F.lit("")),
            F.lit("/Sec"),
            (i % 11).cast("string"),
            F.lit("/P"),
            i.cast("string"),
            F.when(i % 4 == 0, F.lit("/")).otherwise(F.lit("")),
            q,
        ).alias("url"),
        F.timestamp_seconds(F.lit(1600000000) + i * 3600).alias("warc_ts"),
        F.when(i % 2 == 0, F.lit("text/html"))
        .otherwise(F.lit("application/json"))
        .alias("mime"),
        F.when(i % 7 == 0, F.lit(404)).otherwise(F.lit(200)).alias("status"),
        F.concat(F.lit("body "), i.cast("string")).alias("html"),
    )


def test_surt_golden(spark):
    df = spark.createDataFrame([(u,) for u, _ in SURT_GOLDEN], "url string")
    got = [r[0] for r in df.select(surt_key(F.col("url"))).collect()]
    for (url, want), g in zip(SURT_GOLDEN, got):
        assert g == want, (url, want, g)


def test_cdx_records_shape_and_drops(spark):
    pages = _pages(spark, 50).unionByName(
        spark.createDataFrame(
            [(None, None, "text/html", 200, "x")],
            "url string, warc_ts timestamp, mime string, status int, "
            "html string",
        )
    )
    recs = cdx_records(pages)
    rows = recs.collect()
    assert len(rows) == 50  # null url/ts dropped
    for r in rows:
        assert r["line"] == "%s %s %s" % (
            r["surt"],
            r["ts14"],
            r["line"].split(" ", 2)[2],
        )
        assert len(r["ts14"]) == 14 and r["ts14"].isdigit()


def test_write_cdx_globally_sorted_with_valid_cluster_idx(spark, tmp_path):
    out = str(tmp_path / "cdx")
    recs = cdx_records(_pages(spark))
    man = write_cdx(recs, out, n_shards=3, block_size=16)
    assert man["n_lines"] == 300
    assert sorted(os.listdir(out)) == sorted(
        man["files"] + [CDX_MANIFEST, CLUSTER_IDX]
    )
    # concatenation of shard files in name order is globally sorted
    lines = []
    for fn in man["files"]:
        with open(os.path.join(out, fn), "rb") as f:
            lines += gzip.decompress(f.read()).decode("utf-8").splitlines()
    assert len(lines) == 300
    assert lines == sorted(lines)
    # every cluster.idx row points at a real gzip member whose first
    # line carries the recorded key and whose line count matches
    with open(os.path.join(out, CLUSTER_IDX), encoding="utf-8") as f:
        idx = [ln.rstrip("\n").split("\t") for ln in f]
    assert sum(int(r[4]) for r in idx) == 300
    keys = [r[0] for r in idx]
    assert keys == sorted(keys)
    for key, name, off, clen, n in idx:
        with open(os.path.join(out, name), "rb") as f:
            f.seek(int(off))
            blob = f.read(int(clen))
        block = gzip.decompress(blob).decode("utf-8").splitlines()
        assert len(block) == int(n) <= 16
        assert block[0].startswith(key + " ")
        first = block[0]
        assert key == first[: first.index(" ", first.index(" ") + 1)]


def test_cdx_lookup_files_matches_full_scan(spark, tmp_path):
    out = str(tmp_path / "cdx")
    recs = cdx_records(_pages(spark))
    write_cdx(recs, out, n_shards=3, block_size=16)
    full = read_cdx(spark, out)
    assert full.count() == 300
    for prefix in ["com,example,w3)/", "com,example,w0:8080)/",
                   "com,example,w1)/sec", "org,nowhere)/"]:
        via_idx = sorted(
            (r["surt"], r["ts14"], r["url"])
            for r in cdx_lookup_files(spark, out, prefix).collect()
        )
        via_scan = sorted(
            (r["surt"], r["ts14"], r["url"])
            for r in full.filter(F.col("surt").startswith(prefix)).collect()
        )
        assert via_idx == via_scan
    assert len(
        cdx_lookup_files(spark, out, "com,example,w3)/").collect()
    ) > 0
    with pytest.raises(ValueError):
        cdx_lookup_files(spark, out, "")


def test_cdx_parse_round_trip(spark):
    pages = _pages(spark, 80)
    recs = cdx_records(pages)
    back = cdx_parse(recs.select("line"))
    orig = sorted(
        (r["url"], r["mime"], str(r["status"]))
        for r in pages.collect()
    )
    got = sorted(
        (r["url"], r["mime"], r["status"]) for r in back.collect()
    )
    assert got == orig
    # digest/length parse back as real values
    one = back.filter(F.col("url").endswith("/P7?a=2")).collect()
    assert len(one) == 1
    import hashlib

    assert one[0]["digest"] == hashlib.md5(b"body 7").hexdigest()
    assert one[0]["length"] == len(b"body 7")


def test_cdx_records_null_and_control_byte_robustness(spark):
    """mime/status/body may be missing or hostile (raw response
    headers): the line must never null out, control bytes must not
    produce invalid JSON, and the payload must still parse back."""
    import hashlib

    pages = spark.createDataFrame(
        [
            ("https://a.b/p1", "2020-09-13 12:26:40", None, None, None),
            ("https://a.b/p2", "2020-09-13 12:26:41",
             "text/\x0bhtml\x00", 200, "x"),
        ],
        "url string, warc_ts string, mime string, status int, html string",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    back = cdx_parse(cdx_records(pages).select("line")).collect()
    assert len(back) == 2
    r1 = next(r for r in back if r["url"].endswith("/p1"))
    assert r1["mime"] == "unk" and r1["status"] == "0"
    assert r1["digest"] == hashlib.md5(b"").hexdigest() and r1["length"] == 0
    r2 = next(r for r in back if r["url"].endswith("/p2"))
    assert r2["mime"] == "text/html"  # control bytes stripped


def test_revisit_null_digest_passes_through_unmarked(spark):
    idx = _typed_index(spark, 60).unionByName(
        spark.createDataFrame(
            [("x)/p", "20200101000000", "https://x/p", "unk", "0",
              None, 0)],
            "surt string, ts14 string, url string, mime string, "
            "status string, digest string, length long",
        )
    )
    out = revisit_records(idx)
    assert out.count() == 61
    nulls = out.filter(F.col("digest").isNull()).collect()
    assert len(nulls) == 1
    assert nulls[0]["revisit"] is False
    assert nulls[0]["orig_surt"] is None and nulls[0]["orig_ts14"] is None


def test_write_cdx_rejects_overflowing_shard_count(spark, tmp_path):
    with pytest.raises(ValueError):
        write_cdx(
            cdx_records(_pages(spark, 5)), str(tmp_path / "o"),
            n_shards=100000,
        )


def _typed_index(spark, n=400):
    """Recapture-shaped typed index: 50 urls each captured ~n/50 times
    at 10-minute steps, 37 distinct payloads shared across urls."""
    pages = spark.range(n).select(
        F.concat(
            F.lit("https://w"),
            (F.col("id") % 5).cast("string"),
            F.lit(".example.com/item/"),
            (F.col("id") % 50).cast("string"),
        ).alias("url"),
        F.timestamp_seconds(F.lit(1600000000) + F.col("id") * 600).alias(
            "warc_ts"
        ),
        F.lit("text/html").alias("mime"),
        F.lit(200).alias("status"),
        F.concat(F.lit("c"), (F.col("id") % 37).cast("string")).alias("html"),
    )
    return cdx_parse(cdx_records(pages).select("line"))


def test_cdx_collapse_one_per_bucket_keeps_earliest(spark):
    idx = _typed_index(spark)
    out = cdx_collapse(idx, digits=8)
    rows = idx.collect()
    # python twin: first (ts14, url, mime, status, digest, length)
    # per (surt, day)
    want = {}
    for r in rows:
        key = (r["surt"], r["ts14"][:8])
        tup = (r["ts14"], r["url"], r["mime"], r["status"], r["digest"],
               r["length"])
        if key not in want or tup < want[key]:
            want[key] = tup
    got = {
        (r["surt"], r["ts14"][:8]): (
            r["ts14"], r["url"], r["mime"], r["status"], r["digest"],
            r["length"],
        )
        for r in out.collect()
    }
    assert got == want
    assert out.count() < idx.count()  # recaptures actually collapsed
    with pytest.raises(ValueError):
        cdx_collapse(idx, digits=0)


def test_cdx_collapse_digits14_is_identity(spark):
    idx = _typed_index(spark, 120)
    assert sorted(map(tuple, cdx_collapse(idx, 14).collect())) == sorted(
        map(tuple, idx.collect())
    )


def test_revisit_records_point_at_earliest_capture(spark):
    idx = _typed_index(spark)
    out = revisit_records(idx).collect()
    by_digest = {}
    for r in idx.collect():
        t = (r["ts14"], r["surt"], r["url"])
        if r["digest"] not in by_digest or t < by_digest[r["digest"]]:
            by_digest[r["digest"]] = t
    n_orig = 0
    for r in out:
        o = by_digest[r["digest"]]
        if (r["ts14"], r["surt"], r["url"]) == o:
            assert not r["revisit"]
            assert r["orig_surt"] is None and r["orig_ts14"] is None
            n_orig += 1
        else:
            assert r["revisit"]
            assert (r["orig_ts14"], r["orig_surt"]) == (o[0], o[1])
            assert r["orig_ts14"] <= r["ts14"]
    assert n_orig == len(by_digest) == 37
    assert len(out) == idx.count()


def test_warc_to_cdx_full_circle(spark, tmp_path):
    """WARC in → CDX index out → cluster.idx lookup finds the capture
    with the digest/length of the archived bytes — the archive-side
    circle (WET/WAT carry content; CDX makes it findable)."""
    import datetime as dt
    import hashlib

    from crawl_spark.sources.warc import read_warc, write_warc

    d = tmp_path / "warcs"
    d.mkdir()
    recs = [
        {
            "url": "http://w%d.example/Page/%d" % (i % 2, i),
            "warc_ts": dt.datetime(2026, 2, 1, 0, 0, i),
            "html": ("<html><body>doc %d</body></html>" % i).encode("utf-8"),
        }
        for i in range(6)
    ]
    write_warc(str(d / "seg.warc.gz"), recs, compress=True)
    pages = read_warc(spark, str(d)).select(
        "url",
        "warc_ts",
        F.lit("text/html").alias("mime"),
        F.lit(200).alias("status"),
        F.col("html").cast("string").alias("html"),
    )
    out = str(tmp_path / "cdx")
    man = write_cdx(cdx_records(pages), out, n_shards=2, block_size=4)
    assert man["n_lines"] == 6
    hit = cdx_lookup_files(spark, out, "example,w1)/page/3").collect()
    assert len(hit) == 1
    body = b"<html><body>doc 3</body></html>"
    assert hit[0]["url"] == "http://w1.example/Page/3"
    assert hit[0]["digest"] == hashlib.md5(body).hexdigest()
    assert hit[0]["length"] == len(body)
    assert hit[0]["ts14"] == "20260201000003"


def test_cdx_pointer_random_access_circle(spark, tmp_path):
    """The complete Common-Crawl access stack: WARC with per-record
    gzip members → offset-aware read → CDX lines carrying the record
    pointer → cluster.idx lookup → ONE range fetch returns the exact
    archived payload."""
    import datetime as dt

    from crawl_spark.sources.warc import (
        fetch_warc_record,
        read_warc_with_offsets,
        write_warc,
    )

    d = tmp_path / "warcs"
    d.mkdir()
    recs = [
        {
            "url": "http://w%d.example/p/%d" % (i % 3, i),
            "warc_ts": dt.datetime(2026, 3, 1, 0, 0, i),
            "html": ("<html>payload %d</html>" % i).encode("utf-8"),
        }
        for i in range(9)
    ]
    write_warc(str(d / "a.warc.gz"), recs[:5], compress=True)
    write_warc(str(d / "b.warc.gz"), recs[5:], compress=True)
    pages = read_warc_with_offsets(spark, str(d)).select(
        "url",
        "warc_ts",
        F.lit("text/html").alias("mime"),
        F.lit(200).alias("status"),
        F.col("html").cast("string").alias("html"),
        "warc_filename",
        "warc_offset",
        "warc_length",
    )
    out = str(tmp_path / "cdx")
    write_cdx(
        cdx_records(
            pages,
            pointer_cols=("warc_filename", "warc_offset", "warc_length"),
        ),
        out,
        n_shards=2,
        block_size=4,
    )
    hits = cdx_lookup_files(
        spark, out, "example,w1)/p/7", with_pointers=True
    ).collect()
    assert len(hits) == 1
    h = hits[0]
    assert h["rlength"] > 0 and h["offset"] >= 0 and h["filename"]
    rec = fetch_warc_record(h["filename"], h["offset"], h["rlength"])
    assert rec is not None
    assert rec["url"] == "http://w1.example/p/7"
    assert rec["html"] == b"<html>payload 7</html>"
    # pointer-less lines parse with NULL pointers under the same schema
    plain = cdx_records(pages.drop("warc_filename", "warc_offset",
                                   "warc_length"))
    row = cdx_parse(plain.select("line"), with_pointers=True).first()
    assert row["offset"] is None and row["filename"] is None


def test_read_warc_with_offsets_matches_plain_read(spark, tmp_path):
    """Offsets point at real members: every (offset, length) slice
    re-parses to exactly its record, and url/ts/html agree with
    read_warc."""
    import datetime as dt

    from crawl_spark.sources.warc import (
        fetch_warc_record,
        read_warc,
        read_warc_with_offsets,
        write_warc,
    )

    d = tmp_path / "w"
    d.mkdir()
    recs = [
        {
            "url": "http://h.example/%d" % i,
            "warc_ts": dt.datetime(2026, 4, 1, 0, 0, i),
            "html": ("b%d" % i).encode(),
        }
        for i in range(7)
    ]
    write_warc(str(d / "s.warc.gz"), recs, compress=True)
    write_warc(str(d / "t.warc"), recs[:3], compress=False)  # plain too
    plain = {
        (r["url"], r["warc_ts"]): bytes(r["html"])
        for r in read_warc(spark, str(d)).collect()
    }
    rows = read_warc_with_offsets(spark, str(d)).collect()
    assert len(rows) == len(plain) + 3  # 3 urls appear in both files
    for r in rows:
        assert plain[(r["url"], r["warc_ts"])] == bytes(r["html"])
        rec = fetch_warc_record(
            r["warc_filename"], r["warc_offset"], r["warc_length"]
        )
        assert rec["url"] == r["url"] and rec["html"] == bytes(r["html"])


def test_cdx_lookup_is_pushed_down(spark, tmp_path):
    """On the parquet twin (`write_cdx_table`) the prefix filter must
    reach the scan as StringStartsWith (the no-full-scan contract),
    and the lookup must agree with the gzip-file path."""
    out = str(tmp_path / "idx.parquet")
    typed = _typed_index(spark, 200)
    write_cdx_table(typed, out, n_shards=3)
    idx = spark.read.parquet(out)
    assert idx.count() == 200
    plan = cdx_lookup(idx, "com,example,w3)/")._jdf.queryExecution().executedPlan().toString()
    assert "StartsWith" in plan, plan
    got = sorted(map(tuple, cdx_lookup(idx, "com,example,w3)/").collect()))
    want = sorted(
        map(tuple, typed.filter(F.col("surt").startswith("com,example,w3)/")).collect())
    )
    assert got == want and len(got) > 0
