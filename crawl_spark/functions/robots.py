"""robots.txt parsing → the engine's politeness table.

The reference delegates politeness to its operator (no robots parsing in
crackcomm/crawl); the driver mandate adds robots-rule enforcement, and
this module closes the loop from RAW robots.txt bodies (as a crawler
actually fetches them) to the `(host, disallow, crawl_delay)` table
`CrawlEngine(robots_df=...)` consumes.

Parsing follows the de-facto robots.txt contract (REP, RFC 9309
essentials) for the subset the engine enforces:

- group selection: the group whose ``User-agent`` matches ``agent`` most
  specifically wins (longest matching token; ``*`` matches anything);
  multiple consecutive UA lines share one group;
- ``Disallow``: path prefixes (empty value = allow all — dropped);
  the engine's prefix-match semantics, so no ``$``/``*`` wildcard
  expansion (wildcard rules are kept literally; the stricter RFC 9309
  wildcard matcher is `operators/urlfilter.robots_verdicts`, fed by
  :func:`robots_rules_table` which also carries ``Allow:`` rules);
- ``Crawl-delay``: seconds as float (non-standard but widely used —
  and the engine's budget input);
- comments (``#``), blank lines, unknown directives, and BOM are
  ignored; field names are case-insensitive.

The per-file parse is pure Python over small text bodies, Arrow-batched
via mapInPandas (one robots.txt per host — a bounded dimension table,
never the 100 TB side).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

ROBOTS_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("disallow", T.ArrayType(T.StringType())),
        T.StructField("crawl_delay", T.DoubleType()),
    ]
)


def parse_robots_txt(body: str | bytes | None, agent: str = "crawl-spark") -> dict:
    """Parse one robots.txt body for ``agent``.

    Returns {"disallow": [prefixes...], "allow": [prefixes...],
    "crawl_delay": float_or_0, "sitemaps": [urls...]}. ``allow``
    carries the group's ``Allow:`` rules — the engine's prefix matcher
    ignores them (its pinned semantics are disallow-only), but the
    RFC 9309 wildcard matcher (`operators/urlfilter.robots_verdicts`
    via :func:`robots_rules_table`) needs them for longest-match
    precedence. Per REP, ``Sitemap:`` lines are GLOBAL —
    collected from every line regardless of which user-agent group they
    appear in, and (matching Google's parser) they do NOT terminate a
    user-agent run: consecutive UA lines separated only by a Sitemap
    line still form one group.
    """
    if body is None:
        return {"disallow": [], "allow": [], "crawl_delay": 0.0, "sitemaps": []}
    if isinstance(body, bytes):
        body = body.decode("utf-8", "replace")
    body = body.lstrip("﻿")
    agent_l = agent.lower()

    # collect groups: [(ua_tokens, rules)]
    groups: list[tuple[list[str], list[tuple[str, str]]]] = []
    cur_uas: list[str] = []
    cur_rules: list[tuple[str, str]] = []
    in_ua_run = False
    sitemaps: list[str] = []
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "sitemap":
            # collected globally AND transparent to grouping: Google's
            # REP parser does not treat a Sitemap line as a group
            # separator, so 'UA: a / Sitemap: x / UA: b / Disallow: /p'
            # keeps a and b in ONE group sharing /p — ending the UA run
            # here would silently drop a's disallow rules
            if value:
                sitemaps.append(value)
            continue
        if field == "user-agent":
            if not in_ua_run:
                if cur_uas:
                    groups.append((cur_uas, cur_rules))
                cur_uas, cur_rules = [], []  # also discards pre-UA orphan rules
            cur_uas.append(value.lower())
            in_ua_run = True
        else:
            in_ua_run = False
            cur_rules.append((field, value))
    if cur_uas:
        groups.append((cur_uas, cur_rules))

    # most-specific matching UA token wins ('*' = wildcard, length 0)
    best_len, best_rules = -1, []
    for uas, rules in groups:
        for ua in uas:
            if ua == "*":
                match_len = 0
            elif ua and ua in agent_l:
                match_len = len(ua)
            else:
                continue
            if match_len > best_len:
                best_len, best_rules = match_len, rules

    disallow: list[str] = []
    allow: list[str] = []
    delay = 0.0
    for field, value in best_rules:
        if field == "disallow" and value:
            disallow.append(value)
        elif field == "allow" and value:
            allow.append(value)
        elif field == "crawl-delay":
            try:
                delay = float(value)
            except ValueError:
                pass
    return {
        "disallow": disallow,
        "allow": allow,
        "crawl_delay": delay,
        "sitemaps": sitemaps,
    }


def robots_table(
    df: DataFrame,
    host_col: str = "host",
    body_col: str = "body",
    agent: str = "crawl-spark",
) -> DataFrame:
    """(host, robots.txt body) rows → the engine's robots table
    ``(host, disallow array<string>, crawl_delay double)``.

    Arrow-batched mapInPandas; bodies never leave their batch. Feed the
    result straight to ``CrawlEngine(robots_df=...)`` (it is broadcast —
    one row per host, a dimension table by construction).
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dis, delays = [], []
            for body in pdf[body_col]:
                parsed = parse_robots_txt(body, agent)
                dis.append(parsed["disallow"])
                delays.append(parsed["crawl_delay"])
            yield pd.DataFrame(
                {"host": pdf[host_col], "disallow": dis, "crawl_delay": delays}
            )

    return df.select(host_col, body_col).mapInPandas(fn, ROBOTS_SCHEMA)


def sitemap_urls_table(
    df: DataFrame,
    host_col: str = "host",
    body_col: str = "body",
) -> DataFrame:
    """(host, robots.txt body) rows → exploded (host, sitemap_url) —
    the discovery link into ``sources/sitemap.py``: fetch each
    sitemap_url, then ``sitemap_entries`` → ``sitemap_seeds`` feeds the
    engine's staged-seed path. Kept separate from ``robots_table`` so
    the engine's politeness schema (and the manifest's robots
    fingerprint) is unchanged."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hosts, urls = [], []
            for host, body in zip(pdf[host_col], pdf[body_col]):
                for u in parse_robots_txt(body)["sitemaps"]:
                    hosts.append(host)
                    urls.append(u)
            yield pd.DataFrame({"host": hosts, "sitemap_url": urls})

    return df.select(host_col, body_col).mapInPandas(
        fn, "host string, sitemap_url string"
    )


def robots_rules_table(
    df: DataFrame,
    host_col: str = "host",
    body_col: str = "body",
    agent: str = "crawl-spark",
) -> DataFrame:
    """(host, robots.txt body) rows → the exploded RFC 9309 rule table
    ``(host, pattern string, allow int)`` with BOTH ``Allow:`` and
    ``Disallow:`` rules of the selected group — the input
    `operators/urlfilter.robots_verdicts` matches with wildcard
    longest-match precedence. ``robots_table`` stays the engine's
    (pinned, disallow-prefix) politeness input; this is the stricter
    matcher's feed. Dimension-sized by construction (rules per host)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hosts, pats, allows = [], [], []
            for host, body in zip(pdf[host_col], pdf[body_col]):
                parsed = parse_robots_txt(body, agent)
                for pat in parsed["disallow"]:
                    hosts.append(host); pats.append(pat); allows.append(0)
                for pat in parsed["allow"]:
                    hosts.append(host); pats.append(pat); allows.append(1)
            yield pd.DataFrame(
                {"host": hosts, "pattern": pats, "allow": allows}
            )

    schema = T.StructType(
        [
            T.StructField("host", T.StringType()),
            T.StructField("pattern", T.StringType()),
            T.StructField("allow", T.IntegerType()),
        ]
    )
    return df.select(host_col, body_col).mapInPandas(fn, schema)
