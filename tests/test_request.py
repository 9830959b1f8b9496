"""Request-construction column pipeline vs the reference contracts
(request.go:40-125, crawler.go:160-178)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from crawl_spark.plans.request import DEFAULT_HEADERS, construct_requests

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("method", T.StringType()),
        T.StructField("form", T.MapType(T.StringType(), T.ArrayType(T.StringType()))),
        T.StructField("query", T.MapType(T.StringType(), T.ArrayType(T.StringType()))),
        T.StructField("header", T.MapType(T.StringType(), T.StringType())),
        T.StructField("referer", T.StringType()),
    ]
)


@pytest.fixture(scope="module")
def built(spark):
    rows = [
        ("http://h.ex/a", None, None, None, None, None),
        ("http://h.ex/b", None, {"x": ["1"], "a": ["2", "3"]}, None, None, None),
        ("http://h.ex/c", "put", None, None, None, None),
        ("http://h.ex/d", None, None, {"q": ["v w"], "b": ["1"]}, None, None),
        ("http://h.ex/e?x=0", None, None, {"y": ["2"]}, None, None),
        ("http://h.ex/f", None, None, None, {"User-Agent": "custom", "X": "y"}, None),
        ("http://h.ex/g", None, None, None, {"user-agent": "lower", "x-tOKen": "t"}, None),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = construct_requests(df, proxies=["p1:80", "p2:80"]).collect()
    return {r.url: r for r in out}


def test_method_inference(built):
    assert built["http://h.ex/a"].eff_method == "GET"      # default GET
    assert built["http://h.ex/b"].eff_method == "POST"     # form -> POST
    assert built["http://h.ex/c"].eff_method == "PUT"      # explicit wins


def test_form_body_sorted_urlencoded(built):
    # url.Values.Encode(): sorted keys, values in order, percent-encoded
    assert built["http://h.ex/b"].body == "a=2&a=3&x=1"
    assert built["http://h.ex/a"].body is None


def test_query_string_append(built):
    assert built["http://h.ex/d"].eff_url == "http://h.ex/d?b=1&q=v+w"
    # existing query -> '&' separator
    assert built["http://h.ex/e?x=0"].eff_url == "http://h.ex/e?x=0&y=2"
    assert built["http://h.ex/a"].eff_url == "http://h.ex/a"


def test_header_merge_request_wins(built):
    h = dict(built["http://h.ex/f"].eff_headers)
    assert h["User-Agent"] == "custom"          # request overrides default
    assert h["X"] == "y"
    assert h["Accept"] == DEFAULT_HEADERS["Accept"]  # default fills unset
    h0 = dict(built["http://h.ex/a"].eff_headers)
    assert h0 == DEFAULT_HEADERS


def test_header_merge_canonicalizes_keys(built):
    # Go http.Header canonicalizes on Set: 'user-agent' must OVERRIDE the
    # default 'User-Agent' (one canonical key), not coexist with it
    h = dict(built["http://h.ex/g"].eff_headers)
    assert h["User-Agent"] == "lower"
    assert sum(1 for k in h if k.lower() == "user-agent") == 1
    assert h["X-Token"] == "t"  # mixed-case key canonicalized
    assert h["Accept"] == DEFAULT_HEADERS["Accept"]


def test_proxy_pick_deterministic(built, spark):
    p1 = built["http://h.ex/a"].proxy
    assert p1 in ("p1:80", "p2:80")
    # same url -> same proxy on every run (seeded, not random)
    again = construct_requests(
        spark.createDataFrame([("http://h.ex/a", None, None, None, None, None)], SCHEMA),
        proxies=["p1:80", "p2:80"],
    ).collect()[0]
    assert again.proxy == p1
