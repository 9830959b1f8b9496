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

    # defaults fill only UNSET headers: map_concat(defaults, header) with
    # request-last wins in Spark when duplicate keys are allowed — pin
    # explicitly: start from defaults, overwrite with request entries.
    dflt = F.create_map(
        *[F.lit(x) for kv in default_headers.items() for x in kv]
    ) if default_headers else F.create_map().cast("map<string,string>")
    req_hdr = F.coalesce(F.col("header"), F.create_map().cast("map<string,string>"))
    merged_keys = F.array_distinct(
        F.concat(F.map_keys(dflt), F.map_keys(req_hdr))
    )
    eff_headers = F.map_from_arrays(
        merged_keys,
        F.transform(merged_keys, lambda k: F.coalesce(req_hdr[k], dflt[k])),
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
