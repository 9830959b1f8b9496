"""Sitemap parsing semantics (sources/sitemap.py): protocol shapes,
entity decoding, loc-required drop rule, index recursion rows."""

from pyspark.sql import functions as F


URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc> https://a.example/p?x=1&amp;y=2 </loc>
    <lastmod>2024-05-01</lastmod>
    <changefreq>daily</changefreq>
    <priority>0.8</priority>
  </url>
  <url><loc>https://a.example/bare</loc></url>
  <url><lastmod>2024-06-01</lastmod></url>
  <url><loc></loc></url>
</urlset>"""

INDEX = """<sitemapindex>
  <sitemap><loc>https://b.example/sitemap-1.xml</loc><lastmod>2024-03-05</lastmod></sitemap>
  <sitemap><loc>https://b.example/sitemap-2.xml</loc></sitemap>
</sitemapindex>"""


def _parse(spark, rows):
    from crawl_spark.sources.sitemap import sitemap_entries

    df = spark.createDataFrame(rows, "sitemap_url string, xml string")
    return sitemap_entries(df).collect()


def test_urlset_entries_and_drop_rules(spark):
    out = _parse(spark, [("https://a.example/sitemap.xml", URLSET)])
    # 4 url blocks -> 2 survive (no-loc and empty-loc dropped)
    assert len(out) == 2
    full = next(r for r in out if r["loc"].endswith("y=2"))
    assert full["kind"] == "url"
    # whitespace trimmed, &amp; decoded
    assert full["loc"] == "https://a.example/p?x=1&y=2"
    assert full["lastmod"] == "2024-05-01"
    assert full["changefreq"] == "daily"
    assert full["priority"] == 0.8
    bare = next(r for r in out if r["loc"].endswith("/bare"))
    assert (
        bare["lastmod"] is None
        and bare["changefreq"] is None
        and bare["priority"] is None
    )


def test_sitemapindex_yields_child_sitemap_rows(spark):
    out = _parse(spark, [("https://b.example/sitemap.xml", INDEX)])
    assert {r["kind"] for r in out} == {"sitemap"}
    assert sorted(r["loc"] for r in out) == [
        "https://b.example/sitemap-1.xml",
        "https://b.example/sitemap-2.xml",
    ]
    assert [r["lastmod"] for r in sorted(out, key=lambda r: r["loc"])] == [
        "2024-03-05",
        None,
    ]


def test_entity_decode_order_amp_last(spark):
    from crawl_spark.sources.sitemap import xml_unescape

    df = spark.range(1).select(
        xml_unescape(F.lit("&amp;lt; &lt; &quot;q&quot; &apos;a&apos;")).alias("v")
    )
    # "&amp;lt;" must decode to the literal text "&lt;", not "<"
    assert df.collect()[0]["v"] == "&lt; < \"q\" 'a'"


def test_recrawl_schedule_semantics(spark):
    from crawl_spark.operators.recrawl import recrawl_schedule

    now = 1_700_000_000
    rows = [
        ("a", now - 7_200, "hourly"),    # 2 intervals late
        ("b", now - 3_600, "DAILY"),     # case-insensitive, not yet due
        ("c", now - 100, "never"),       # no schedule
        ("d", now - 100, None),          # missing changefreq
        ("e", now + 500, "hourly"),      # future fetch: floored at 0
        ("f", now - 10**9, "always"),    # ancient: priority capped
    ]
    df = spark.createDataFrame(rows, "url string, last_fetch_ts long, changefreq string")
    out = {r["url"]: r for r in recrawl_schedule(df, now_ts=now).collect()}
    assert out["a"]["interval_s"] == 3600 and out["a"]["overdue_ratio"] == 2.0
    assert out["a"]["recrawl_priority"] == 2
    assert out["a"]["due_ts"] == now - 7_200 + 3_600
    assert out["b"]["interval_s"] == 86_400 and out["b"]["recrawl_priority"] == 0
    assert round(out["b"]["overdue_ratio"], 6) == round(3600 / 86400, 6)
    for u in ("c", "d"):
        r = out[u]
        assert (
            r["interval_s"] is None and r["due_ts"] is None
            and r["overdue_ratio"] is None and r["recrawl_priority"] is None
        )
    assert out["e"]["overdue_ratio"] == 0.0 and out["e"]["recrawl_priority"] == 0
    assert out["f"]["recrawl_priority"] == 10  # capped


def test_recrawl_null_last_fetch_is_null_not_fresh(spark):
    """A never-fetched row with a valid changefreq must come back NULL
    (no schedule basis), not 'maximally fresh' — greatest() skips the
    NULL that (now - NULL)/interval produces, so it needs its own gate."""
    from crawl_spark.operators.recrawl import recrawl_schedule

    df = spark.createDataFrame(
        [("u", None, "daily")], "url string, last_fetch_ts long, changefreq string"
    )
    r = recrawl_schedule(df, now_ts=1_700_000_000).collect()[0]
    assert r["interval_s"] == 86_400
    assert (
        r["due_ts"] is None
        and r["overdue_ratio"] is None
        and r["recrawl_priority"] is None
    )


def test_sitemap_seeds_applies_priority_default(spark):
    from crawl_spark.sources.sitemap import sitemap_entries, sitemap_seeds

    df = spark.createDataFrame(
        [
            ("https://a.example/sitemap.xml", URLSET),
            ("https://b.example/sitemap.xml", INDEX),
        ],
        "sitemap_url string, xml string",
    )
    seeds = {r["url"]: r["priority"] for r in sitemap_seeds(sitemap_entries(df)).collect()}
    # index rows excluded; bare entry gets the protocol default 0.5
    assert seeds == {
        "https://a.example/p?x=1&y=2": 0.8,
        "https://a.example/bare": 0.5,
    }


def test_read_sitemap_files_gzip_and_plain(spark, tmp_path):
    import gzip

    from crawl_spark.sources.sitemap import read_sitemap_files, sitemap_entries

    (tmp_path / "a.xml").write_text(URLSET)
    (tmp_path / "b.xml.gz").write_bytes(gzip.compress(INDEX.encode()))
    df = read_sitemap_files(spark, str(tmp_path))
    rows = {r["sitemap_url"].rsplit("/", 1)[-1]: r["xml"] for r in df.collect()}
    assert rows["a.xml"] == URLSET and rows["b.xml.gz"] == INDEX
    # end-to-end: files -> entries
    kinds = {r["kind"] for r in sitemap_entries(df).collect()}
    assert kinds == {"url", "sitemap"}
