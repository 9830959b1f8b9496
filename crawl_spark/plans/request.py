"""Request-construction pipeline (reference ``ConstructHTTPRequest``,
request.go:40-99, + default-header merge crawler.go:160-165, + proxy
selection crawler.go:167-178) as pure column expressions over a requests
DataFrame — SURVEY.md §2.3.

The reference builds one concrete http.Request per job; here the same
derivations are vectorized columns so Catalyst folds/prunes them and the
whole construction stays in whole-stage codegen:

- method inference: explicit method wins; else POST when a form is
  present, GET otherwise (request.go:120-125 default + setRequestForm
  request.go:83-99 inference);
- query-string encoding: ``query: map<string,array<string>>`` appended
  to the URL in SORTED key order (url.Values.Encode sorts keys — the
  deterministic contract);
- body encoding: form multimap → application/x-www-form-urlencoded body
  string, sorted keys, for POST;
- header merge: request headers take precedence over engine defaults
  (crawler.go:160-165 fills only UNSET headers);
- proxy pick: deterministic element of the proxy list seeded by the
  URL hash (reference picks randomly, crawler.go:167-178; we pin the
  seeded variant so runs are reproducible).

Schema expected (all nullable): url string, method string,
form map<string,array<string>>, query map<string,array<string>>,
header map<string,string>, referer string.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_HEADERS = {
    "User-Agent": "crawl-spark/1.0",
    "Accept": "text/html,*/*",
}


def _urlencode_multimap(m: Column) -> Column:
    """url.Values.Encode(): sorted keys, k=v pairs joined by '&', values
    percent-encoded. Pure column ops: sort keys, explode values in
    order via transform, flatten, join."""
    keys = F.array_sort(F.map_keys(m))
    pairs = F.flatten(
        F.transform(
            keys,
            lambda k: F.transform(
                m[k], lambda v: F.concat(_q(k), F.lit("="), _q(v))
            ),
        )
    )
    return F.array_join(pairs, "&")


def _canon_key(k: Column) -> Column:
    """Go textproto.CanonicalMIMEHeaderKey as a column expression:
    capitalize the first letter of each '-'-separated token, lowercase
    the rest ('user-agent' -> 'User-Agent')."""
    return F.array_join(
        F.transform(
            F.split(k, "-"),
            lambda t: F.concat(
                F.upper(F.substring(t, 1, 1)), F.lower(F.substring(t, 2, 1 << 30))
            ),
        ),
        "-",
    )


def _canon_key_py(k: str) -> str:
    return "-".join(t[:1].upper() + t[1:].lower() for t in k.split("-"))


def _q(c: Column) -> Column:
    """percent-encode (Go url.QueryEscape contract: space→'+', unreserved
    unescaped). Spark's built-in ``url_encode`` (java.net.URLEncoder,
    x-www-form-urlencoded) implements the same core mapping JVM-side —
    a Python UDF is both the slow path and ILLEGAL inside higher-order
    lambdas. Known edge divergence vs Go: '~' (Java escapes, Go doesn't)
    and '*' (Java keeps, Go escapes); no crawler-visible key/value uses
    either."""
    return F.url_encode(c)


def construct_requests(
    df: DataFrame,
    default_headers: dict[str, str] | None = None,
    proxies: list[str] | None = None,
) -> DataFrame:
    """Add derived columns: eff_method, eff_url (query appended), body,
    eff_headers (defaults merged, request-first), proxy."""
    default_headers = DEFAULT_HEADERS if default_headers is None else default_headers
    has_form = F.col("form").isNotNull() & (F.size(F.map_keys(F.col("form"))) > 0)
    eff_method = F.coalesce(
        F.upper(F.col("method")),
        F.when(has_form, F.lit("POST")).otherwise(F.lit("GET")),
    )

    has_query = F.col("query").isNotNull() & (F.size(F.map_keys(F.col("query"))) > 0)
    qs = _urlencode_multimap(F.col("query"))
    eff_url = F.when(
        has_query,
        F.concat(
            F.col("url"),
            F.when(F.col("url").contains("?"), F.lit("&")).otherwise(F.lit("?")),
            qs,
        ),
    ).otherwise(F.col("url"))

    body = F.when(
        has_form & (eff_method == "POST"), _urlencode_multimap(F.col("form"))
    ).otherwise(F.lit(None).cast("string"))

    # defaults fill only UNSET headers, with Go http.Header key
    # canonicalization on BOTH maps (crawler.go:160-165 — Go's Set
    # canonicalizes, so a request 'user-agent' must override the default
    # 'User-Agent', not coexist with it). Merge on canonical keys;
    # request value wins. The inner filter references the outer lambda
    # var (normally banned per the HOF re-eval rule) — header maps are
    # ≤ O(10) entries, so the re-evaluation is bounded and harmless.
    canon_defaults = {_canon_key_py(k): v for k, v in (default_headers or {}).items()}
    dflt = F.create_map(
        *[F.lit(x) for kv in canon_defaults.items() for x in kv]
    ) if canon_defaults else F.create_map().cast("map<string,string>")
    req_hdr = F.coalesce(F.col("header"), F.create_map().cast("map<string,string>"))
    req_keys = F.map_keys(req_hdr)
    merged_keys = F.array_distinct(
        F.concat(F.map_keys(dflt), F.transform(req_keys, _canon_key))
    )

    def _req_val(ck: Column) -> Column:
        # first request key whose canonical form matches (map order);
        # try_element_at: NULL (not an ANSI error) when no key matches
        return req_hdr[
            F.try_element_at(F.filter(req_keys, lambda k: _canon_key(k) == ck), F.lit(1))
        ]

    eff_headers = F.map_from_arrays(
        merged_keys,
        F.transform(merged_keys, lambda ck: F.coalesce(_req_val(ck), dflt[ck])),
    )

    out = df.withColumn("eff_method", eff_method).withColumn(
        "eff_url", eff_url
    ).withColumn("body", body).withColumn("eff_headers", eff_headers)

    if proxies:
        parr = F.array(*[F.lit(p) for p in proxies])
        out = out.withColumn(
            "proxy",
            F.element_at(parr, (F.pmod(F.hash(F.col("url")), F.lit(len(proxies))) + 1).cast("int")),
        )
    else:
        out = out.withColumn("proxy", F.lit(None).cast("string"))
    return out
