"""Dev utility parity (reference open/open.go:16-27): page dumps land in
temp .html files; browser launch is best-effort and headless-safe."""

from __future__ import annotations

import os

from crawl_spark.devtools import dump_pages, open_response


def test_open_response_writes_html(tmp_path):
    p = open_response("<h1>hi</h1>", out_dir=str(tmp_path), open_browser=False)
    assert p.endswith(".html") and os.path.dirname(p) == str(tmp_path)
    with open(p, "rb") as f:
        assert f.read() == b"<h1>hi</h1>"
    # bytes and None payloads both work
    p2 = open_response(b"\xff\xfebytes", out_dir=str(tmp_path), open_browser=False)
    with open(p2, "rb") as f:
        assert f.read() == b"\xff\xfebytes"
    p3 = open_response(None, out_dir=str(tmp_path), open_browser=False)
    assert os.path.getsize(p3) == 0
    assert len({p, p2, p3}) == 3  # random names never collide


def test_dump_pages_bounded(spark, tmp_path, tiny_fixture):
    pages = spark.read.parquet(tiny_fixture["pages"])
    out = dump_pages(pages, limit=5, out_dir=str(tmp_path))
    assert len(out) == 5
    for url, path in out.items():
        assert url.startswith("http://")
        with open(path, "rb") as f:
            assert b"<html>" in f.read()
