"""Extraction fidelity vs the reference's exact contracts (SURVEY.md
§2.4 — goquery Text/Attr/FindAny, ParseFloat/ParseUint, forms):

- Text: concat matched nodes joined by " ", then strings.Fields collapse
  (html_utils.go:37-45), entities decoded, byte-identical.
- FindAny: first selector (in order) with ≥1 match wins (html_utils.go:26-34).
- Attr: attribute of FIRST match, TrimSpace'd (html_utils.go:77-80).
- ParseFloat: ','→'.', empty text -> 0.0 not null (html_utils.go:50-56).
- ParseUint: strip ',' and spaces; empty -> 0 (html_utils.go:61-68).
- Forms: skip submit/reset; radio/checkbox only when checked="checked";
  select takes the selected="selected" option else none (forms/forms.go:72-130).
- Link resolution: resolved against the page URL; malformed hrefs
  silently skipped (html_utils.go:93-106).
"""

from __future__ import annotations

import pandas as pd
import pytest

from crawl_spark.functions.htmldom import (
    extract_form,
    extract_links,
    find_any_text,
    parse_html,
    sel_attr,
    sel_text,
)
from crawl_spark.functions.textnorm import parse_float_text, parse_uint_text

HTML = b"""
<html><head><title>  A\tTitle </title></head>
<body>
<h1>alpha   &amp;  <b>beta</b> gamma</h1>
<p>&lt;tag&gt; &quot;q&quot;</p>
<span class="num">1,234,567</span>
<span class="price"> 12,5 </span>
<ul class="nav">
<li><a href="/p/1">one</a></li>
<li><a href="2">two</a></li>
<li><a href="../p/3#frag">three</a></li>
<li><a href="bad\x01url">skip</a></li>
<li><a href="HTTP://OTHER.EXAMPLE:80/x">abs</a></li>
</ul>
<img src="/img/9.jpg" data-photo=" photo-9 ">
<form action="/submit/1" id="f">
<input type="text" name="q" value="hello">
<input type="submit" name="s" value="go">
<input type="reset" name="r0" value="no">
<input type="radio" name="r" value="a">
<input type="radio" name="r" value="b" checked="checked">
<input type="checkbox" name="c1" value="x" checked="checked">
<input type="checkbox" name="c2" value="y">
<select name="sel"><option value="o1">first</option>
<option value="o2" selected="selected">second</option></select>
</form>
</body></html>
"""


@pytest.fixture(scope="module")
def root():
    return parse_html(HTML)


def test_text_whitespace_and_entities(root):
    # Go Text(): node text joined, Fields-collapsed; entities decoded
    assert sel_text(root, "h1") == "alpha & beta gamma"
    assert sel_text(root, "p") == '<tag> "q"'
    assert sel_text(root, "title") == "A Title"


def test_find_any_first_selector_wins(root):
    assert find_any_text(root, "h2", "h1", "p") == "alpha & beta gamma"
    assert find_any_text(root, "p", "h1") == '<tag> "q"'
    assert find_any_text(root, "h4", "h5") == ""


def test_attr_first_match_trimmed(root):
    assert sel_attr(root, "data-photo", "img") == "photo-9"
    assert sel_attr(root, "href", "ul.nav a") == "/p/1"  # first match
    assert sel_attr(root, "nope", "img") == ""


def test_parse_float_and_uint_contracts(root):
    # ParseFloat: ','->'.'; ParseUint: strip ',' and spaces
    assert parse_float_text(sel_text(root, "span.price")) == 12.5
    assert parse_uint_text(sel_text(root, "span.num")) == 1234567
    # empty text -> 0 / 0.0 (NOT null) — exact reference semantics
    assert parse_float_text("") == 0.0
    assert parse_uint_text("") == 0
    # unparseable -> None (reference returns error)
    assert parse_float_text("abc") is None
    assert parse_uint_text("-5") is None


def test_link_resolution_and_silent_skip(root):
    links = extract_links(root, "http://host.example/p/10", "ul.nav a")
    assert links == [
        "http://host.example/p/1",
        "http://host.example/p/2",
        "http://host.example/p/3#frag",
        # "bad\x01url" silently skipped (html_utils.go:100-102);
        # scheme lowercased by resolution (Go url.Parse does the same),
        # host case PRESERVED until canonicalization
        "http://OTHER.EXAMPLE:80/x",
    ]


def test_form_default_values(root):
    form = extract_form(root, "#f")
    assert form["action"] == "/submit/1"
    v = form["values"]
    assert v["q"] == ["hello"]
    assert "s" not in v and "r0" not in v  # submit/reset skipped
    assert v["r"] == ["b"]  # only checked radio
    assert v["c1"] == ["x"] and "c2" not in v  # only checked checkbox
    assert v["sel"] == ["o2"]  # selected option's value


def test_udf_surface_on_spark(spark):
    from pyspark.sql import functions as F

    from crawl_spark.functions.extract import (
        udf_extract_form,
        udf_extract_links,
        udf_extract_text,
        udf_parse_float,
        udf_parse_uint,
    )

    df = spark.createDataFrame(
        pd.DataFrame({"url": ["http://host.example/p/10"], "html": [HTML]})
    )
    row = df.select(
        udf_extract_text("h1")(F.col("html")).alias("t"),
        udf_parse_uint("span.num")(F.col("html")).alias("u"),
        udf_parse_float("span.price")(F.col("html")).alias("f"),
        udf_extract_links("ul.nav a")(F.col("html"), F.col("url")).alias("l"),
        udf_extract_form("#f")(F.col("html")).alias("form"),
    ).collect()[0]
    assert row.t == "alpha & beta gamma"
    assert row.u == 1234567
    assert row.f == 12.5
    assert list(row.l)[0] == "http://host.example/p/1"
    assert row.form.action == "/submit/1"
    assert dict(row.form.values)["sel"] == ["o2"]
