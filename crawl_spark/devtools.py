"""Dev utilities — the reference's ``open`` package re-expressed for
DataFrame debugging (open/open.go:16-27: write the response body to a
random temp ``.html`` file, open it in a browser).

``open_response`` is the single-page primitive; ``dump_pages`` is the
``open.Handler`` analog for a DataFrame of fetched pages (bounded
collect — this is a human-in-the-loop debug tool, never a pipeline
stage). Browser launch degrades gracefully on headless boxes: the file
is always written, the path always returned.
"""

from __future__ import annotations

import os
import tempfile
import webbrowser

from pyspark.sql import DataFrame


def open_response(
    html: bytes | str | None,
    out_dir: str | None = None,
    open_browser: bool = True,
) -> str:
    """Write one page body to a random temp ``.html`` file and try to
    open it in the default browser. Returns the file path (open/open.go
    ``Open``; random names as in ``randFileName``)."""
    data = html.encode("utf-8") if isinstance(html, str) else (html or b"")
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
    fd, path = tempfile.mkstemp(suffix=".html", prefix="crawl_", dir=out_dir)
    with os.fdopen(fd, "wb") as f:
        f.write(data)
    if open_browser:
        try:
            webbrowser.open("file://" + path)
        except Exception:
            pass  # headless sandbox: the dump on disk is the product
    return path


def dump_pages(
    df: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    limit: int = 20,
    out_dir: str | None = None,
    open_browser: bool = False,
) -> dict[str, str]:
    """``open.Handler`` analog over a pages/extracted DataFrame: dump up
    to ``limit`` rows' bodies to temp files; returns {url: path}.

    The collect is explicitly bounded by ``limit`` — a debug peephole,
    not a sink (use the engine's ``extracted`` snapshot table for bulk
    output)."""
    out: dict[str, str] = {}
    for row in df.select(url_col, html_col).limit(limit).collect():
        out[row[url_col]] = open_response(
            row[html_col], out_dir=out_dir, open_browser=open_browser
        )
    return out
