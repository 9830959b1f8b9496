"""Corpus datasheet reporting — the per-stratum accounting table every
released training set ships (Gopher tab. A1, Dolma's source tables,
The Pile §2: docs / tokens / bytes / dup mass / share per (lang,
source) stratum).

The reference crawler records only per-round counters
(``crawler.go:134-136`` error stream); a curation pipeline needs the
corpus-level equivalent: where did the tokens come from, how much of
each stratum is duplicate mass, and what share of the final mix does
each stratum hold. This is the operator that produces the numbers for
a dataset card.

Scale notes (100 TB corpus):
- Text never shuffles. The per-doc projection reduces each document to
  (strata, 16-byte digest, token count, byte count) map-side; the
  first groupBy keys on (strata, digest) so duplicate mass folds
  before the second, dimension-sized groupBy on strata alone.
- The grand totals for the share columns are ONE bounded driver read
  of the dimension-sized level-2 aggregate (the ``mix_rates``
  precedent) — no single-partition window, no cross join of the
  corpus against a scalar.
- Output is dimension-sized: one row per stratum combination.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def corpus_datasheet(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    strata: tuple[str, ...] = ("lang", "source"),
    short_tokens: int = 10,
) -> DataFrame:
    """Per-stratum corpus accounting: one row per ``strata`` value
    combination with

    - ``n_docs`` / ``n_tokens`` / ``n_bytes`` — raw mass (tokens are
      the whitespace contract of :func:`~crawl_spark.operators.textops.
      tokens`; bytes are UTF-8 ``octet_length``);
    - ``dup_ratio`` — 1 − distinct-content/n_docs on the same
      normalized digest :func:`~crawl_spark.operators.dedup.
      exact_dedup` keys on (so "duplicate" means the same thing across
      the pipeline) — round(·,6);
    - ``max_copies`` — the most-duplicated single page's count;
    - ``short_frac`` — fraction of docs under ``short_tokens`` tokens,
      round(·,6);
    - ``mean_tokens`` — round(·,6);
    - ``doc_share`` / ``token_share`` — this stratum's fraction of the
      whole corpus, round(·,6).

    SQL twin: two GROUP BYs + a cross-joined 1-row total — see the
    ``datasheet`` oracle in __spark_entry__.
    """
    from .textops import tokens

    scols = [F.col(s) for s in strata]
    # token array materialized ONCE (lazy checkpoint): digest and count
    # both reference it and Catalyst does not CSE nested HOFs (CLAUDE.md)
    tokd = df.select(
        *scols,
        tokens(F.col(text_col)).alias("__t"),
        F.octet_length(F.col(text_col)).cast("long").alias("__b"),
    ).localCheckpoint(eager=False)
    per_doc = tokd.select(
        *strata,
        F.md5(F.concat_ws(" ", F.col("__t"))).alias("__md5"),
        F.size(F.col("__t")).cast("long").alias("__nt"),
        "__b",
    )
    g1 = per_doc.groupBy(*strata, "__md5").agg(
        F.count("*").alias("cnt"),
        F.sum("__nt").alias("st"),
        F.sum("__b").alias("sb"),
        F.sum((F.col("__nt") < short_tokens).cast("long")).alias("ns"),
    )
    g2 = g1.groupBy(*strata).agg(
        F.sum("cnt").cast("long").alias("n_docs"),
        F.count("*").cast("long").alias("n_distinct"),
        F.max("cnt").cast("long").alias("max_copies"),
        F.sum("st").cast("long").alias("n_tokens"),
        F.sum("sb").cast("long").alias("n_bytes"),
        F.sum("ns").cast("long").alias("n_short"),
    )
    # ONE bounded driver read over the dimension-sized aggregate for the
    # share denominators (mix_rates precedent; exact BIGINT sums)
    g2 = g2.localCheckpoint(eager=False)
    tot = g2.agg(
        F.sum("n_docs").alias("d"), F.sum("n_tokens").alias("t")
    ).collect()[0]
    total_docs, total_tokens = tot["d"], tot["t"]
    if not total_docs:
        return g2.select(
            *strata,
            "n_docs",
            F.lit(0.0).alias("dup_ratio"),
            "max_copies",
            "n_tokens",
            "n_bytes",
            F.lit(0.0).alias("short_frac"),
            F.lit(0.0).alias("mean_tokens"),
            F.lit(0.0).alias("doc_share"),
            F.lit(0.0).alias("token_share"),
        )
    return g2.select(
        *strata,
        "n_docs",
        F.round(1 - F.col("n_distinct") / F.col("n_docs"), 6).alias("dup_ratio"),
        "max_copies",
        "n_tokens",
        "n_bytes",
        F.round(F.col("n_short") / F.col("n_docs"), 6).alias("short_frac"),
        F.round(F.col("n_tokens") / F.col("n_docs"), 6).alias("mean_tokens"),
        F.round(F.col("n_docs") / F.lit(float(total_docs)), 6).alias("doc_share"),
        F.round(
            F.col("n_tokens") / F.lit(float(total_tokens)) if total_tokens else F.lit(0.0),
            6,
        ).alias("token_share"),
    )


def sitemap_coverage(
    declared: DataFrame,
    crawled: DataFrame,
    declared_url: str = "loc",
    crawled_url: str = "url",
) -> DataFrame:
    """Per-host sitemap-vs-crawl coverage audit — the crawl-ops report
    that closes the loop between `sources/sitemap.py` (what the site
    DECLARES) and the engine's extracted table (what the crawl actually
    FETCHED): per host,

    - ``n_declared`` — distinct sitemap URLs;
    - ``n_crawled`` — distinct crawled URLs;
    - ``n_matched`` — declared URLs that were crawled (exact URL match
      — canonicalize both sides upstream with the same
      `functions.urlnorm` contract);
    - ``coverage`` — n_matched / n_declared, 6 dp (how much of the
      declared site the crawl reached);
    - ``n_undeclared`` — crawled-but-not-declared (discovery beyond the
      sitemap, or a stale sitemap).

    Scale shape: two distinct-projections keyed on url (partial-agg),
    ONE url-equality join between them (the only O(pages) shuffle),
    then dimension-sized per-host aggregates merged with full-outer
    joins on host (no broadcast hint — both sides preserved, repo
    rule). Hosts with a sitemap but no crawled pages (and vice versa)
    both appear, zero-filled.
    """
    from .urlfilter import host_expr

    d = (
        declared.select(F.col(declared_url).alias("u"))
        .filter(F.col("u").isNotNull())
        .distinct()
        .select("u", host_expr(F.col("u")).alias("host"))
        .filter(F.col("host") != "")
    )
    c = (
        crawled.select(F.col(crawled_url).alias("u"))
        .filter(F.col("u").isNotNull())
        .distinct()
        .select("u", host_expr(F.col("u")).alias("host"))
        .filter(F.col("host") != "")
    )
    nd = d.groupBy("host").agg(F.count("*").cast("long").alias("n_declared"))
    nc = c.groupBy("host").agg(F.count("*").cast("long").alias("n_crawled"))
    nm = (
        d.join(c.select("u"), "u")
        .groupBy("host")
        .agg(F.count("*").cast("long").alias("n_matched"))
    )
    out = (
        nd.join(nc, "host", "full_outer")
        .join(nm, "host", "full_outer")
        .select(
            "host",
            F.coalesce("n_declared", F.lit(0)).alias("n_declared"),
            F.coalesce("n_crawled", F.lit(0)).alias("n_crawled"),
            F.coalesce("n_matched", F.lit(0)).alias("n_matched"),
        )
    )
    return out.select(
        "host",
        "n_declared",
        "n_crawled",
        "n_matched",
        F.when(
            F.col("n_declared") > 0,
            F.round(F.col("n_matched") / F.col("n_declared"), 6),
        ).alias("coverage"),
        (F.col("n_crawled") - F.col("n_matched")).cast("long").alias("n_undeclared"),
    )
