"""URL blocklist filtering (UT1/adult-list style corpus hygiene).

A crawl-scale corpus is filtered against a blocklist of registrable
domains BEFORE any expensive text processing. The rule is the standard
one: a URL is blocked when its host equals a blocked domain OR is any
subdomain of one (``a.b.example.com`` is blocked by ``example.com``).

Spark-first plan (no per-row Python, no O(rows x |blocklist|) scan):

- host extraction is one JVM ``regexp_extract`` (scheme://[user@]HOST);
- each host expands to its DOMAIN-SUFFIX CHAIN (``a.b.example.com`` ->
  ``[a.b.example.com, b.example.com, example.com, com]``), built with
  ``F.aggregate`` over the reversed label array — the accumulator/
  element lambda params are the only references, so the interpreted
  HOF path never re-evaluates an outer column per element (the repo's
  measured O(len^2) trap);
- blocked hosts broadcast (blocklists are millions of rows ~ tens of
  MB — dimension-table sized); the suffix explode feeds a BROADCAST
  left-semi hash join, so the corpus side never shuffles to find its
  matches: matched ids come out of a map-side join + distinct bounded
  by the blocked fraction;
- survivors = corpus anti-join the matched-id set on ``id_col``.

Suffix chains are capped at ``MAX_LABELS`` labels counted FROM THE
APEX END (hosts deeper than that are almost always garbage; the cap
keeps the explode factor a constant while guaranteeing the registrable
apex is always among the generated suffixes — a subdomain-end cap
would be a label-prepending evasion path). Matching is on full label boundaries only — ``notexample.com``
is NOT blocked by ``example.com`` (the suffix chain never contains
partial labels), which is the correctness trap in naive LIKE '%x'
implementations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_LABELS = 10

# scheme://[userinfo@]HOST[:port][/path...] -> HOST (lowercased upstream)
_HOST_RE = r"^[a-z][a-z0-9+.\-]*://(?:[^/@?#]*@)?([^/:?#]+)"


def host_expr(url: F.Column) -> F.Column:
    """Registrable host of a URL, lowercased, with any trailing dot
    stripped (empty string if unparsable). The root-dot FQDN form
    (``http://example.com./x``) names the same host as ``example.com``
    to DNS/HTTP — and is a known blocklist-evasion spelling, so without
    the strip its suffix chain (``['com.', 'example.com.']``) would
    never match a blocked apex.

    SQL twin: regexp_replace(regexp_extract(lower(url), <same pattern>,
    1), '\\.$', '')."""
    return F.regexp_replace(
        F.regexp_extract(F.lower(url), _HOST_RE, 1), r"\.$", ""
    )


def suffix_chain(host: F.Column) -> F.Column:
    """All dot-boundary suffixes of ``host``, shortest last.

    ``a.b.example.com -> [a.b.example.com, b.example.com, example.com,
    com]`` (order not contractual). Built without outer-column refs in
    the lambda: ``F.aggregate`` over the reversed labels grows the
    accumulator ``[com] -> [com, example.com] -> ...`` using only the
    lambda's own (acc, x) parameters.

    The MAX_LABELS cap is taken from the APEX end (labels are reversed
    BEFORE slicing): a host deeper than MAX_LABELS labels keeps its
    shortest MAX_LABELS suffixes, so the registrable apex is always in
    the chain. Capping from the subdomain end instead would let
    ``x1.x2...x10.example.com`` evade a blocklist entry for
    ``example.com`` by prepending labels — the exact evasion the
    module's contract forbids."""
    labels = F.slice(F.reverse(F.split(host, r"\.")), 1, MAX_LABELS)
    return F.aggregate(
        labels,
        F.array().cast("array<string>"),
        lambda acc, x: F.concat(
            acc,
            F.array(
                F.when(F.size(acc) == 0, x).otherwise(
                    F.concat(x, F.lit("."), F.element_at(acc, -1))
                )
            ),
        ),
    )


def url_blocklist_filter(
    df: DataFrame,
    blocked_df: DataFrame,
    id_col: str = "doc_id",
    url_col: str = "url",
    blocked_host_col: str = "host",
) -> DataFrame:
    """Drop rows whose URL host is a blocked domain or any subdomain of
    one; survivors keep all their columns plus the extracted ``host``.

    ``blocked_df`` is broadcast (dimension-table sized); the matched-id
    set is bounded by the blocked fraction of the corpus and is
    broadcast back for the anti-join, so the corpus itself crosses no
    exchange. (For a pathological blocklist matching most of the
    corpus, Spark's broadcast-size guard fails the job rather than
    silently degrading — at that point the filter IS the corpus rewrite
    and a plain shuffled anti-join on ``id_col`` is the right manual
    fallback.)
    """
    blocked = F.broadcast(
        blocked_df.select(F.lower(F.col(blocked_host_col)).alias("__bh")).distinct()
    )
    with_host = df.withColumn("host", host_expr(F.col(url_col)))
    matched = (
        with_host.select(F.col(id_col), F.explode(suffix_chain(F.col("host"))).alias("__sfx"))
        .join(blocked, F.col("__sfx") == F.col("__bh"), "leftsemi")
        .select(id_col)
        .distinct()
    )
    return with_host.join(F.broadcast(matched), id_col, "left_anti")


# --- tracking-parameter stripping (crawl-frontier URL normalization) --------

# The standard public click/campaign identifiers (Google Analytics utm_*,
# Google/Facebook/Microsoft click ids, Mailchimp/Instagram/Yandex): the
# operator contract is the mechanism (key-boundary, case-insensitive,
# order-preserving removal), not this list — extend per deployment.
TRACKING_PARAMS = [
    "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
    "gclid", "fbclid", "msclkid", "mc_eid", "igshid", "yclid",
]


def strip_tracking_params(
    df: DataFrame,
    id_col: str = "doc_id",
    url_col: str = "url",
    params: tuple[str, ...] = tuple(TRACKING_PARAMS),
) -> DataFrame:
    """Remove tracking query parameters from URLs — the frontier-dedup
    normalization every crawl pipeline runs (the same page arrives as
    ``/p?utm_source=feed`` and ``/p``; Heritrix/Common-Crawl-style URL
    canonicalization strips campaign ids so the seen-set sees one URL).

    Deliberately a SEPARATE opt-in operator: ``functions.urlnorm.
    canonicalize`` preserves the query byte-for-byte (the reference
    parity contract, request.go:40-125) — this is the extra,
    dedup-only normalization layered on top.

    Rules (cross-engine exact): split at the FIRST ``?``; a ``&``-pair
    is dropped when its key (text before the first ``=``, lowercased)
    is in ``params``; empty pairs (``a=1&&b=2``) drop; survivor order
    is preserved; a query left empty drops its ``?``. Tracking names
    as VALUES (``q=utm_source``) are untouched — the match is on the
    key only. Canonicalized URLs carry no fragment, so ``#`` needs no
    handling here.

    Map-only projection (no shuffle, no join); the pair arrays are
    per-URL tiny, so the ≤2 extra HOF references cost bytes, not the
    no-CSE pipelines the perf rules target.
    """
    u = F.col(url_col)
    qpos = F.instr(u, "?")
    base = F.substring_index(u, "?", 1)
    query = F.when(qpos > 0, F.substring(u, qpos + 1, F.length(u))).otherwise(
        F.lit("")
    )
    nonempty = F.filter(F.split(query, "&"), lambda p: p != F.lit(""))
    kept = F.filter(
        nonempty,
        lambda p: ~F.lower(F.substring_index(p, "=", 1)).isin(*params),
    )
    stripped = F.when(qpos == 0, u).otherwise(
        F.when(
            F.size(kept) > 0, F.concat(base, F.lit("?"), F.array_join(kept, "&"))
        ).otherwise(base)
    )
    return df.select(
        F.col(id_col),
        u.alias(url_col),
        stripped.alias("url_stripped"),
        (F.size(nonempty) - F.size(kept)).cast("int").alias("n_stripped"),
    )


# path-extension → resource kind (the Heritrix/Nutch default-skip set:
# an HTML crawler fetches pages, not their static assets)
ASSET_KINDS: dict[str, tuple[str, ...]] = {
    "image": ("png", "jpg", "jpeg", "gif", "webp", "svg", "ico", "bmp", "tiff"),
    "style": ("css",),
    "script": ("js", "mjs"),
    "font": ("woff", "woff2", "ttf", "otf", "eot"),
    "media": ("mp3", "mp4", "avi", "mov", "mkv", "webm", "wav", "flac", "ogg"),
    "archive": ("zip", "gz", "tgz", "tar", "rar", "7z", "bz2", "xz"),
    "document": ("pdf", "doc", "docx", "xls", "xlsx", "ppt", "pptx"),
}

# extension of the LAST path segment (before ?/#): the greedy [^?#]*
# backtracks to the last dot, and the [a-z0-9]{1,8} group cannot span
# '/', so a dot in the host or a directory segment never matches.
# Java-regex ∩ RE2 common dialect (the repo's cross-engine contract).
_EXT_RE = r"^[a-z][a-z0-9+.\-]*://[^?#]*\.([a-z0-9]{1,8})(?:[?#]|$)"


def classify_asset_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Fetch-worthiness classification by path extension — the frontier
    gate every HTML crawler applies before enqueueing a discovered link
    (Heritrix's default skip rules; the reference fetches whatever the
    handler glob matched, so this is the operator a production
    deployment puts in front of `Schedule`).

    Adds ``ext`` (lowercased extension of the last path segment, ''
    when none), ``kind`` (image/style/script/font/media/archive/
    document, else 'page'), and ``fetch_html`` (kind == 'page' — the
    enqueue verdict). Pure projection: one JVM regexp per row, no
    shuffle, no Python — the scan is the operator at any scale.
    """
    ext = F.regexp_extract(F.lower(F.col(url_col)), _EXT_RE, 1)
    kind = F.lit("page")
    expr = None
    for k, exts in ASSET_KINDS.items():
        cond = F.col("ext").isin(*exts)
        expr = F.when(cond, k) if expr is None else expr.when(cond, k)
    kind = expr.otherwise(kind)
    return (
        df.withColumn("ext", ext)
        .withColumn("kind", kind)
        .withColumn("fetch_html", F.col("kind") == "page")
    )


def trap_detect(
    df: DataFrame,
    url_col: str = "url",
    min_urls: int = 50,
    path_dup_frac: float = 0.5,
    mean_depth_max: float = 8.0,
) -> DataFrame:
    """Per-host crawl-trap detection — the frontier-hygiene aggregate a
    production crawl runs between rounds (Heritrix "calendar trap" /
    session-id explosion: one path spawning unbounded query variants,
    or unbounded path depth from self-linking directory listings; cf.
    the reference's per-host scheduling surface, crawler.go:119-296,
    which has no defense against either).

    Signals, all from TWO partial-aggregated groupBys (no window, no
    per-row Python, URL strings never shuffle — only (host, path)
    digests and counts):

    - ``n_urls``        — URLs seen for the host;
    - ``n_paths``       — distinct query-stripped paths;
    - ``max_per_path``  — URLs sharing the single hottest path (query/
      session explosion concentrates here);
    - ``query_frac``    — fraction of URLs carrying a query string;
    - ``mean_depth``    — mean path-segment count (depth traps);
    - ``is_trap``       — ``n_urls >= min_urls`` AND (the hottest path
      holds ≥ ``path_dup_frac`` of the host's URLs OR ``mean_depth >=
      mean_depth_max``).

    Level 1 groups by (host, md5(path)) — the 16-byte digest, not the
    path string, is what shuffles; level 2 folds per-path counts into
    the per-host row. Both aggregations map-side combine, so a trap
    host with 10^8 URLs contributes O(distinct paths) rows to the
    first exchange and ONE row to the second — the skew the operator
    exists to find never becomes the operator's own skew problem.
    Ratios are round(·,6) per the module float contract.

    The output is dimension-sized (one row per host): feed
    ``is_trap`` hosts to ``url_blocklist_filter`` or the engine's
    politeness budgets as a broadcast.
    """
    u = F.col(url_col)
    host = host_expr(u)
    # strip scheme://authority -> "/p/x?a=1#f" | "?sid=1" | "" — the
    # authority stops at '?'/'#' too (like _HOST_RE), so a PATH-LESS
    # query URL (https://h.example?sid=N — the root-level session
    # explosion) keeps its query; then drop the fragment BEFORE
    # splitting off the query ('?' inside a fragment is not a query)
    path_q = F.regexp_replace(
        F.lower(u), r"^[a-z][a-z0-9+.\-]*://[^/?#]*", ""
    )
    path_query = F.substring_index(path_q, "#", 1)
    path = F.substring_index(path_query, "?", 1)
    has_q = (F.instr(path_query, "?") > 0).cast("long")
    depth = F.size(F.filter(F.split(path, "/"), lambda s: s != F.lit("")))
    per_url = df.select(
        host.alias("host"),
        F.md5(path).alias("path_md5"),
        has_q.alias("has_q"),
        depth.cast("long").alias("depth"),
    )
    per_path = per_url.groupBy("host", "path_md5").agg(
        F.count("*").alias("cnt"),
        F.sum("has_q").alias("nq"),
        F.sum("depth").alias("sd"),
    )
    per_host = per_path.groupBy("host").agg(
        F.sum("cnt").cast("long").alias("n_urls"),
        F.count("*").cast("long").alias("n_paths"),
        F.max("cnt").cast("long").alias("max_per_path"),
        F.sum("nq").alias("snq"),
        F.sum("sd").alias("ssd"),
    )
    return per_host.select(
        "host",
        "n_urls",
        "n_paths",
        "max_per_path",
        F.round(F.col("snq") / F.col("n_urls"), 6).alias("query_frac"),
        F.round(F.col("ssd") / F.col("n_urls"), 6).alias("mean_depth"),
        (
            (F.col("n_urls") >= min_urls)
            & (
                (F.col("max_per_path") / F.col("n_urls") >= path_dup_frac)
                | (F.col("ssd") / F.col("n_urls") >= mean_depth_max)
            )
        ).alias("is_trap"),
    )


# <meta name="robots" content="..."> — both attribute orders, either
# quote style, case-insensitive (Java ∩ RE2 dialect, shared verbatim
# with the DuckDB twin)
_META_ROBOTS_NAME_FIRST = (
    r"""(?i)<meta[^>]*\bname\s*=\s*["']robots["'][^>]*"""
    r"""\bcontent\s*=\s*["']([^"']*)["']"""
)
_META_ROBOTS_CONTENT_FIRST = (
    r"""(?i)<meta[^>]*\bcontent\s*=\s*["']([^"']*)["'][^>]*"""
    r"""\bname\s*=\s*["']robots["']"""
)
# directive match inside the content list: token boundaries are
# commas/whitespace (per the robots-meta spec, directives are a
# comma-separated list; stray spaces are common in the wild)
_DIRECTIVE = r"(?i)(^|[,\s]){}([,\s]|$)"


def meta_robots_flags(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """Page-level robots meta directives — the indexing gate the REP
    spec puts INSIDE the page (`<meta name="robots"
    content="noindex,nofollow">`), complementing the host-level
    robots.txt rules the engine stamps at add time: a compliant
    pipeline drops ``noindex`` pages from the corpus and skips link
    expansion on ``nofollow`` pages (the reference's extraction surface
    `html_utils.go:12-106` reads attrs by selector but has no
    directive semantics).

    Emits (url, noindex, nofollow). ``content="none"`` implies both
    (per Google's documented REP extension); an absent or
    directive-free tag yields false/false. Pure map-side JVM regexps —
    whole-stage codegen over the scan, html never shuffles; compose as
    ``pages.join(flags.filter(~noindex), url)`` or feed ``nofollow``
    into the link-extraction branch.
    """
    content = F.coalesce(
        F.nullif(
            F.regexp_extract(F.col(html_col), _META_ROBOTS_NAME_FIRST, 1),
            F.lit(""),
        ),
        F.nullif(
            F.regexp_extract(F.col(html_col), _META_ROBOTS_CONTENT_FIRST, 1),
            F.lit(""),
        ),
        F.lit(""),
    )

    def has(directive: str) -> F.Column:
        return content.rlike(_DIRECTIVE.format(directive))

    none = has("none")
    return pages.select(
        F.col(url_col).alias("url"),
        (has("noindex") | none).alias("noindex"),
        (has("nofollow") | none).alias("nofollow"),
    )


# URL-structure mining: the crawl-ops reports that tell an operator
# WHICH dedup/strip/budget rules to configure (Heritrix/Nutch teams
# hand-curate these; mining them from the frontier is the scalable way).

# id-shaped tokens, most specific first: UUID, then long hex runs, then
# any digit run. Java-regex ∩ RE2 common dialect (no lookaround); \b is
# supported by both. Paths are lowercased before matching.
_UUID_RE = (
    r"\b[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}\b"
)
_HEX_RE = r"\b[0-9a-f]{8,}\b"
_NUM_RE = r"[0-9]+"


def path_template(path: F.Column) -> F.Column:
    """Generalize a URL path to its template: UUIDs → ``{uuid}``, hex
    runs of 8+ → ``{hex}``, digit runs → ``{n}`` (in that order — a
    pure digit run of 8+ reads as ``{hex}``, which is fine: both mean
    "an opaque id lived here").

    SQL twin (DuckDB): the same three ``regexp_replace(..., 'g')``
    calls (DuckDB replaces only the first match without the ``'g'``
    flag; Spark's regexp_replace is always global)."""
    t = F.regexp_replace(path, _UUID_RE, "{uuid}")
    t = F.regexp_replace(t, _HEX_RE, "{hex}")
    return F.regexp_replace(t, _NUM_RE, "{n}")


def url_templates(
    df: DataFrame,
    url_col: str = "url",
    k: int = 10,
    min_count: int = 2,
) -> DataFrame:
    """Per-host URL path-template report: generalize every path with
    :func:`path_template`, then emit each host's top-``k`` templates by
    URL count — the pattern inventory that drives crawl-budget rules
    ("/product/{n} is 80% of the host"), dedup-rule discovery and trap
    triage (one template with unbounded ``{hex}`` variants = a session
    trap; cf. ``trap_detect``, which flags the host — this names the
    pattern).

    Emits ``(host, template, n_urls, n_paths, example, rank)`` —
    ``n_paths`` = distinct concrete paths under the template,
    ``example`` = lexicographically-first concrete path (deterministic),
    ``rank`` 1-based by (n_urls desc, template asc) within the host,
    rows with ``n_urls < min_count`` dropped before ranking.

    Scale shape: ONE partial-aggregated groupBy on (host, template,
    path-digest) — the exchange carries the short path string once so
    the report can show a concrete example (drop the column upstream
    for a digest-only shuffle) — a second dimension-sized groupBy on
    (host, template), then per-host ranking through ``grouped_topk``
    (a mega-host's template list never funnels one window task). No
    per-row Python anywhere.
    """
    from .topk import grouped_topk

    u = F.col(url_col)
    path_q = F.regexp_replace(
        F.lower(u), r"^[a-z][a-z0-9+.\-]*://[^/?#]*", ""
    )
    path = F.substring_index(F.substring_index(path_q, "#", 1), "?", 1)
    per_url = df.select(
        host_expr(u).alias("host"),
        path_template(path).alias("template"),
        F.md5(path).alias("__pmd5"),
        path.alias("__path"),
    ).filter(F.col("host") != "")
    per_path = per_url.groupBy("host", "template", "__pmd5").agg(
        F.count("*").alias("cnt"), F.min("__path").alias("ex")
    )
    per_tpl = (
        per_path.groupBy("host", "template")
        .agg(
            F.sum("cnt").cast("long").alias("n_urls"),
            F.count("*").cast("long").alias("n_paths"),
            F.min("ex").alias("example"),
        )
        .filter(F.col("n_urls") >= min_count)
        .withColumn("__neg", -F.col("n_urls"))
    )
    ranked = grouped_topk(
        per_tpl, ["host"], ["__neg", "template"], k,
        rank_col="rank", keep_rank=True,
    )
    return ranked.select(
        "host", "template", "n_urls", "n_paths", "example",
        F.col("rank").cast("int").alias("rank"),
    )


def param_stats(
    df: DataFrame,
    url_col: str = "url",
    min_occ: int = 5,
    id_ratio: float = 0.9,
) -> DataFrame:
    """Per-(host, query-param-key) value-cardinality profile — the
    mining step behind ``strip_tracking_params``' hand-curated list:
    a key whose values are (nearly) all distinct across occurrences is
    id-shaped (session id, click token, cache buster) and belongs in
    the host's strip/dedup rules; a low-cardinality key is a real
    content facet (page=2, lang=fr) and must be kept.

    Emits ``(host, key, n_occ, n_vals, max_per_val, distinct_ratio,
    id_like)``: ``n_occ`` = key occurrences across the host's URLs,
    ``n_vals`` = distinct values, ``max_per_val`` = the hottest single
    value's count, ``distinct_ratio`` = n_vals/n_occ (6 dp),
    ``id_like`` = ``n_occ >= min_occ AND distinct_ratio >= id_ratio``.

    Scale shape: fragment → query split and the pair explode are pure
    JVM projections; ONE partial-aggregated groupBy on (host, key,
    value-digest) — values shuffle as 16-byte md5, never as strings —
    then a dimension-sized groupBy on (host, key). Keys without '='
    count with value '' (their presence is the signal); empty pair
    segments (``a=1&&b=2``) are dropped.
    """
    u = F.col(url_col)
    path_q = F.regexp_replace(
        F.lower(u), r"^[a-z][a-z0-9+.\-]*://[^/?#]*", ""
    )
    no_frag = F.substring_index(path_q, "#", 1)
    qs = F.when(
        F.instr(no_frag, "?") > 0, F.substring_index(no_frag, "?", -1)
    ).otherwise(F.lit(""))
    pairs = df.select(
        host_expr(u).alias("host"),
        F.explode(F.split(qs, "&")).alias("pair"),
    ).filter((F.col("host") != "") & (F.col("pair") != ""))
    key = F.substring_index(F.col("pair"), "=", 1)
    # value = everything after the FIRST '=' (a base64 value's padding
    # '=' must stay inside the value — substring_index(…, -1) would
    # split on the LAST '=' and truncate it)
    val = F.when(
        F.instr(F.col("pair"), "=") > 0,
        F.col("pair").substr(
            F.length(key) + F.lit(2), F.length(F.col("pair"))
        ),
    ).otherwise(F.lit(""))
    per_val = (
        pairs.select("host", key.alias("key"), F.md5(val).alias("__vmd5"))
        .groupBy("host", "key", "__vmd5")
        .agg(F.count("*").alias("cnt"))
    )
    per_key = per_val.groupBy("host", "key").agg(
        F.sum("cnt").cast("long").alias("n_occ"),
        F.count("*").cast("long").alias("n_vals"),
        F.max("cnt").cast("long").alias("max_per_val"),
    )
    ratio = F.round(F.col("n_vals") / F.col("n_occ"), 6)
    return per_key.select(
        "host", "key", "n_occ", "n_vals", "max_per_val",
        ratio.alias("distinct_ratio"),
        (
            (F.col("n_occ") >= min_occ) & (ratio >= id_ratio)
        ).alias("id_like"),
    )


def robots_verdicts(
    urls: DataFrame,
    rules: DataFrame,
    host_col: str = "host",
    path_col: str = "path",
    rules_host_col: str = "host",
    pattern_col: str = "pattern",
    allow_col: str = "allow",
) -> DataFrame:
    """RFC 9309 robots verdicts with FULL wildcard semantics — the
    stricter matcher the engine's pinned prefix semantics deliberately
    leave out (`functions/robots.py` module docstring): ``*`` matches
    any octet sequence, a trailing ``$`` anchors end-of-path, and among
    ALL matching rules the LONGEST pattern wins, an ``Allow`` beating a
    ``Disallow`` of equal length; no match → allowed. This is the
    googlebot/robots.cc precedence contract (cf. RFC 9309 §2.2.2
    "most specific match").

    ``urls`` is the corpus side ``(host, path)`` (path = URL path plus
    optional '?query', the REP match target); ``rules`` is
    `functions/robots.robots_rules_table` output ``(host, pattern,
    allow)`` — dimension-sized. Emits ``(host, path, allowed boolean,
    matched_pattern string)`` (matched_pattern NULL when no rule
    matched; among equal-(length, allow) winners the lexically LEAST
    pattern, so the report column is deterministic).

    Scale shape: rules fold to ONE array per host (a groupBy over the
    dimension table), broadcast-joined onto the corpus — the URL side
    NEVER shuffles, gets no window, and evaluates its rule set as a
    JVM higher-order filter + fold. Wildcard matching is SQL ``LIKE``
    (pattern compiled from the robots pattern with pure string ops —
    no regex dialect in play); the common no-wildcard case short-
    circuits to ``startswith`` so the per-row LIKE compile only runs
    for rules that actually carry ``*``/``$``.
    """
    p = F.col(pattern_col).cast("string")
    esc = F.replace(p, F.lit("\\"), F.lit("\\\\"))
    esc = F.replace(esc, F.lit("%"), F.lit("\\%"))
    esc = F.replace(esc, F.lit("_"), F.lit("\\_"))
    anchored = p.endswith(F.lit("$"))
    body = F.when(
        anchored, F.substring(esc, 1, F.length(esc) - 1)
    ).otherwise(esc)
    like_pat = F.concat(
        F.replace(body, F.lit("*"), F.lit("%")),
        F.when(anchored, F.lit("")).otherwise(F.lit("%")),
    )
    wild = p.contains("*") | anchored
    rule_structs = rules.select(
        F.col(rules_host_col).alias("__rhost"),
        F.struct(
            F.length(p).cast("int").alias("plen"),
            F.col(allow_col).cast("int").alias("allow"),
            wild.alias("wild"),
            p.alias("pat"),
            like_pat.alias("like_pat"),
        ).alias("__rule"),
    ).groupBy("__rhost").agg(F.collect_list("__rule").alias("__rset"))

    joined = urls.select(F.col(host_col), F.col(path_col)).join(
        F.broadcast(rule_structs),
        F.col(host_col) == F.col("__rhost"),
        "left",
    )
    # r/acc lambda params carry all per-element state; the only outer
    # ref is the plain path column (an attribute read, not a pipeline —
    # the HOF re-eval trap needs a computed outer expression)
    matches = F.expr(
        f"filter(__rset, r -> CASE WHEN r.wild"
        f" THEN {path_col} LIKE r.like_pat ESCAPE '\\\\'"
        f" ELSE startswith({path_col}, r.pat) END)"
    )
    best = F.expr(
        "aggregate(__matches, CAST(NULL AS STRUCT<plen: INT, allow: INT,"
        " pat: STRING>),"
        " (acc, r) -> CASE WHEN acc IS NULL"
        "   OR r.plen > acc.plen"
        "   OR (r.plen = acc.plen AND r.allow > acc.allow)"
        "   OR (r.plen = acc.plen AND r.allow = acc.allow"
        "       AND r.pat < acc.pat)"
        "  THEN named_struct('plen', r.plen, 'allow', r.allow,"
        "                    'pat', r.pat)"
        "  ELSE acc END)"
    )
    return (
        joined.withColumn("__matches", matches)
        .withColumn("__best", best)
        .select(
            F.col(host_col),
            F.col(path_col),
            (
                F.col("__best").isNull() | (F.col("__best.allow") == 1)
            ).alias("allowed"),
            F.col("__best.pat").alias("matched_pattern"),
        )
    )


def robots_verdicts_oracle_sql(
    urls_sql: str,
    rules_sql: str,
    host_col: str = "host",
    path_col: str = "path",
) -> str:
    """DuckDB twin of :func:`robots_verdicts`: identical LIKE-pattern
    compilation (same replace chain, same ESCAPE char), a join +
    row_number formulation of the same (plen, allow, pat) precedence,
    no-match rows allowed via the left join."""
    return f"""
WITH u AS ({urls_sql}),
rr AS ({rules_sql}),
pr AS (
  SELECT host, pattern, allow, length(pattern) AS plen,
         (pattern LIKE '%*%') OR ends_with(pattern, '$') AS wild,
         CASE WHEN ends_with(pattern, '$')
              THEN replace(substr(
                     replace(replace(replace(pattern, '\\', '\\\\'),
                             '%', '\\%'), '_', '\\_'),
                     1,
                     length(replace(replace(replace(pattern, '\\', '\\\\'),
                             '%', '\\%'), '_', '\\_')) - 1),
                   '*', '%')
              ELSE replace(
                     replace(replace(replace(pattern, '\\', '\\\\'),
                             '%', '\\%'), '_', '\\_'),
                     '*', '%') || '%' END AS like_pat
  FROM rr
),
cand AS (
  SELECT u.{host_col} AS host, u.{path_col} AS path,
         r.plen, r.allow, r.pattern,
         row_number() OVER (
           PARTITION BY u.{host_col}, u.{path_col}
           ORDER BY r.plen DESC, r.allow DESC, r.pattern
         ) AS rn
  FROM u JOIN pr r ON u.{host_col} = r.host
    AND (CASE WHEN r.wild THEN u.{path_col} LIKE r.like_pat ESCAPE '\\'
              ELSE starts_with(u.{path_col}, r.pattern) END)
),
best AS (SELECT * FROM cand WHERE rn = 1)
SELECT u.{host_col} AS {host_col}, u.{path_col} AS {path_col},
       (b.allow IS NULL OR b.allow = 1) AS allowed,
       b.pattern AS matched_pattern
FROM u LEFT JOIN best b
  ON u.{host_col} = b.host AND u.{path_col} = b.path
"""
