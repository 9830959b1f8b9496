"""Sitemap (sitemaps.org protocol) parsing as JVM column expressions.

The reference crawler takes seed URLs from its callers (crawl.go:
Schedule); a production deployment discovers them from robots.txt
`Sitemap:` lines and the sitemap XML files they point to. This module
turns a table of fetched sitemap payloads into one row per entry —
`<urlset>` URL entries and `<sitemapindex>` child-sitemap entries —
ready to feed the engine as staged seeds or to recurse on
(kind='sitemap' rows are further sitemaps to fetch).

Everything is built-in column functions (regexp over the block, entity
decode via a replace chain) — no Python touches the payload, so the
parse rides whole-stage codegen and scales with the scan. Regex-based
extraction is the deliberate trade for that: it handles the protocol's
canonical shape (one loc per url block, XML-escaped URLs, optional
lastmod/changefreq/priority in any order) but not exotic XML (CDATA
sections, comments splitting a tag, namespaced `<ns:loc>`), which the
docstring calls out rather than hiding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Decode order matters only for &amp; (must be last so "&amp;lt;" is
# not double-decoded to "<"). The five predefined XML entities are
# what the protocol produces for URLs; numeric &#NN; refs are NOT
# decoded (rare in sitemaps, and the oracle twin matches exactly).
_XML_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&apos;", "'"),
    ("&amp;", "&"),
]


def xml_unescape(col: Column) -> Column:
    """Decode the five predefined XML entities (amp last)."""
    out = col
    for ent, ch in _XML_ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return out


def _tag_text(block: Column, tag: str) -> Column:
    """Trimmed text of the first <tag>…</tag> in the block, NULL when
    absent or empty."""
    raw = F.regexp_extract(block, rf"(?s)<{tag}[^>]*>\s*(.*?)\s*</{tag}>", 1)
    return F.when(raw != "", xml_unescape(raw))


def sitemap_entries(
    df: DataFrame,
    xml_col: str = "xml",
    url_col: str = "sitemap_url",
) -> DataFrame:
    """Explode sitemap payloads into one row per entry.

    Output: (sitemap_url, kind, loc, lastmod, changefreq, priority)
    where kind is 'url' for `<urlset>` entries and 'sitemap' for
    `<sitemapindex>` entries; entries with no `<loc>` are dropped
    (the protocol requires loc); optional fields are NULL when absent.
    priority is DOUBLE (protocol range 0.0–1.0, default left NULL —
    the caller applies the 0.5 default if it wants one).
    """
    src = df.select(
        F.col(url_col).alias("sitemap_url"), F.col(xml_col).alias("__xml")
    )
    parts = []
    for kind, block_tag in (("url", "url"), ("sitemap", "sitemap")):
        blocks = F.regexp_extract_all(
            F.col("__xml"), F.lit(rf"(?s)<{block_tag}>(.*?)</{block_tag}>"), 1
        )
        parts.append(
            src.select(
                "sitemap_url",
                F.explode(blocks).alias("__blk"),
            ).select(
                "sitemap_url",
                F.lit(kind).alias("kind"),
                _tag_text(F.col("__blk"), "loc").alias("loc"),
                _tag_text(F.col("__blk"), "lastmod").alias("lastmod"),
                _tag_text(F.col("__blk"), "changefreq").alias("changefreq"),
                _tag_text(F.col("__blk"), "priority")
                .cast("double")
                .alias("priority"),
            )
        )
    out = parts[0].unionByName(parts[1])
    return out.filter(F.col("loc").isNotNull())


def read_sitemap_files(spark, path: str) -> DataFrame:
    """Sitemap files under ``path`` (glob ok) → (sitemap_url, xml) rows
    ready for :func:`sitemap_entries`. Real deployments serve sitemaps
    gzipped (`sitemap.xml.gz`); payloads starting with the gzip magic
    are decompressed, everything else is decoded as UTF-8 (with
    replacement — the downstream regex parse is byte-error tolerant).
    ``sitemap_url`` is the file path (swap in the fetch URL upstream
    when payloads come from a pages table instead of disk).

    binaryFile scan + Arrow-batched mapInPandas, same shape as the WARC
    source — one file never leaves its batch, scan splits are the
    parallelism.
    """
    import gzip
    from collections.abc import Iterator

    import pandas as pd

    files = spark.read.format("binaryFile").load(path)

    def fn(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            paths, xmls = [], []
            for p, content in zip(pdf["path"], pdf["content"]):
                b = bytes(content)
                if b[:2] == b"\x1f\x8b":
                    b = gzip.decompress(b)
                paths.append(p)
                xmls.append(b.decode("utf-8", "replace"))
            yield pd.DataFrame({"sitemap_url": paths, "xml": xmls})

    return files.select("path", "content").mapInPandas(
        fn, "sitemap_url string, xml string"
    )


def sitemap_seeds(entries: DataFrame) -> DataFrame:
    """URL entries of parsed sitemaps as an engine-ready seed frame:
    (url, priority) with the protocol's 0.5 default applied."""
    return entries.filter(F.col("kind") == "url").select(
        F.col("loc").alias("url"),
        F.coalesce(F.col("priority"), F.lit(0.5)).alias("priority"),
    )
