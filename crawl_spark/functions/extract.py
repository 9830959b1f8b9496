"""Vectorized (Arrow-batched) extraction UDFs over ``html: binary``.

Per BASELINE.json input_hint: "vectorized pandas/Arrow UDFs (no per-row
Python)" — all HTML work crosses the JVM↔Python boundary in Arrow batches.
Inside a batch we parse each document ONCE and run every requested
extractor against the parsed tree (the reference parses once per response,
``response.go:23-30``, then handlers run many selector lookups).

Two surfaces:

- scalar pandas UDFs (``udf_extract_text`` etc.) for ad-hoc single-field
  extraction;
- ``extract_batch`` / ``make_extract_iter`` for the engine hot path: one
  ``mapInPandas`` pass computing text + links (+ optional named fields)
  with a single parse per document.

Column pruning note (100 TB scale): callers must ``select`` only the
columns the UDF needs *before* ``mapInPandas`` so Parquet never
materializes ``html`` for rows/columns that don't reach extraction.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .htmldom import (
    extract_form,
    extract_links,
    find_any_text,
    node_attrs,
    node_texts,
    parse_html,
    sel_attr,
    sel_text,
)
from .textnorm import parse_float_text, parse_uint_text


# ---------------------------------------------------------------------------
# scalar pandas UDF factories (selector fixed at plan-build time)


def udf_extract_text(selector: str):
    """Text(html, selector) — goquery Text contract, byte-identical."""

    @F.pandas_udf(T.StringType())
    def _f(html: pd.Series) -> pd.Series:
        return html.map(lambda h: sel_text(parse_html(h), selector) if h is not None else None)

    return _f


def udf_extract_attr(attr: str, selector: str):
    @F.pandas_udf(T.StringType())
    def _f(html: pd.Series) -> pd.Series:
        return html.map(lambda h: sel_attr(parse_html(h), attr, selector) if h is not None else None)

    return _f


def udf_find_any_text(*selectors: str):
    @F.pandas_udf(T.StringType())
    def _f(html: pd.Series) -> pd.Series:
        return html.map(
            lambda h: find_any_text(parse_html(h), *selectors) if h is not None else None
        )

    return _f


def udf_parse_float(selector: str):
    """ParseFloat contract: empty -> 0.0, ',' -> '.', bad parse -> null."""

    @F.pandas_udf(T.DoubleType())
    def _f(html: pd.Series) -> pd.Series:
        return html.map(
            lambda h: parse_float_text(sel_text(parse_html(h), selector)) if h is not None else None
        )

    return _f


def udf_parse_uint(selector: str):
    @F.pandas_udf(T.LongType())
    def _f(html: pd.Series) -> pd.Series:
        return html.map(
            lambda h: parse_uint_text(sel_text(parse_html(h), selector)) if h is not None else None
        )

    return _f


def udf_node_texts(selector: str):
    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _f(html: pd.Series) -> pd.Series:
        return html.map(lambda h: node_texts(parse_html(h), selector) if h is not None else None)

    return _f


def udf_node_attrs(attr: str, selector: str):
    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _f(html: pd.Series) -> pd.Series:
        return html.map(lambda h: node_attrs(parse_html(h), attr, selector) if h is not None else None)

    return _f


def udf_extract_links(selector: str = "a"):
    """(html, base_url) -> array<string> of resolved hrefs (document order,
    malformed silently skipped — html_utils.go:93-106)."""

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _f(html: pd.Series, base_url: pd.Series) -> pd.Series:
        return pd.Series(
            [
                extract_links(parse_html(h), b, selector) if h is not None else None
                for h, b in zip(html, base_url)
            ]
        )

    return _f


_FORM_TYPE = T.StructType(
    [
        T.StructField("action", T.StringType()),
        T.StructField("values", T.MapType(T.StringType(), T.ArrayType(T.StringType()))),
    ]
)


def udf_extract_form(selector: str):
    @F.pandas_udf(_FORM_TYPE)
    def _f(html: pd.Series) -> pd.DataFrame:
        rows = [
            extract_form(parse_html(h), selector) if h is not None else {"action": None, "values": None}
            for h in html
        ]
        return pd.DataFrame(rows)

    return _f


# ---------------------------------------------------------------------------
# engine hot path: one parse -> text + links (+ named fields)


def extract_pdf(
    pdf: pd.DataFrame,
    html_col: str = "html",
    base_col: str = "url",
    raw_col: str | None = "raw",
    text_selector: str = "body",
    link_selector: str = "a",
    fields: dict | None = None,
) -> pd.DataFrame:
    """Parse each html once; add ``text`` and ``links`` columns (plus any
    ``fields`` name->(kind, *args) extras). Rows with raw=True or null html
    get null text/links (crawler.go:191-197: Raw skips HTML parsing)."""
    texts, links = [], []
    extra = {name: [] for name in (fields or {})}
    for i in range(len(pdf)):
        h = pdf[html_col].iat[i]
        raw = bool(raw_col and pdf[raw_col].iat[i])
        if h is None or raw:
            texts.append(None)
            links.append(None)
            for name in extra:
                extra[name].append(None)
            continue
        root = parse_html(h)
        texts.append(sel_text(root, text_selector))
        links.append(extract_links(root, pdf[base_col].iat[i], link_selector))
        for name, spec in (fields or {}).items():
            kind = spec[0]
            if kind == "text":
                extra[name].append(sel_text(root, spec[1]))
            elif kind == "attr":
                extra[name].append(sel_attr(root, spec[1], spec[2]))
            elif kind == "float":
                extra[name].append(parse_float_text(sel_text(root, spec[1])))
            elif kind == "uint":
                extra[name].append(parse_uint_text(sel_text(root, spec[1])))
            else:
                raise ValueError("unknown field kind %r" % kind)
    out = pdf.drop(columns=[html_col])
    out["text"] = pd.Series(texts, dtype=object)
    out["links"] = pd.Series(links, dtype=object)
    for name, vals in extra.items():
        out[name] = pd.Series(vals, dtype=object)
    return out


def make_extract_iter(
    html_col="html",
    base_col="url",
    raw_col="raw",
    text_selector="body",
    link_selector="a",
    fields: dict | None = None,
):
    """mapInPandas function: one parse per doc, all extractors per batch."""

    def _fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield extract_pdf(
                pdf,
                html_col=html_col,
                base_col=base_col,
                raw_col=raw_col,
                text_selector=text_selector,
                link_selector=link_selector,
                fields=fields,
            )

    return _fn
