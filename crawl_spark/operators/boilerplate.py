"""Boilerplate removal / main-content extraction — the trafilatura /
jusText role in a web-text training pipeline (FineWeb's single biggest
measured quality lever was switching WET text for trafilatura-extracted
text; CCNet/C4 inherit the problem this solves: nav menus, footers,
cookie banners and sidebars polluting the training text).

This is a DETERMINISTIC heuristic contract, not a port of either tool
(cf. reference `html_utils.go:12-106`, which extracts by explicit CSS
selector — the reference has no boilerplate classifier; this is a
driver-mandated pipeline extension):

1. parse with the repo's stdlib HTML micro-engine
   (`functions.htmldom.parse_html` — the same tree the byte-identical
   extraction contract uses);
2. PRUNE non-content subtrees outright: ``script style noscript nav
   header footer aside form iframe svg template button select option
   head`` (the jusText/Readability skip set);
3. segment into LEAF BLOCKS: block-level elements (``p h1-h6 li td th
   pre blockquote div article section main``) with no block-level
   descendant — the maximal units that cannot be split further (the
   jusText "paragraph" unit);
4. per block, over Go-Fields-collapsed text (`functions.textnorm.
   normalize_ws` — the SAME whitespace contract as extraction):
   words, chars, and link density (chars under ``<a>`` / chars);
5. keep a block iff ``words >= min_words`` AND ``link_density <=
   max_link_density`` (defaults 5 / 0.33 — menus are short and
   link-dense, prose is neither);
6. the document's main text = kept blocks joined with ``\\n``.

Scale shape: one Arrow-batched ``mapInPandas`` pass (the html column
never rides a shuffle; per-row work is the same C-speed HTMLParser the
fetch pipeline already pays), emitting (id, main_text stats + md5) —
the full-text contract without shipping text. ``main_content_str`` is
the driver-side twin (single point of truth, used by tests and
available for composition)."""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame

from ..functions.htmldom import Node, parse_html
from ..functions.textnorm import fields, normalize_ws

PRUNE_TAGS = frozenset(
    "script style noscript nav header footer aside form iframe svg "
    "template button select option head".split()
)
BLOCK_TAGS = frozenset(
    "p h1 h2 h3 h4 h5 h6 li td th pre blockquote div article section "
    "main".split()
)


def _page_blocks(root: Node) -> list[tuple[str, int]]:
    """(collapsed_text, collapsed_link_chars) of every leaf block —
    block-level elements with no block-level descendant, PRUNE_TAGS
    subtrees never entered — in document order, from ONE post-order
    walk. (The first cut asked has-block-descendant per level and then
    re-walked each kept block twice for text and link text, which
    rescans a depth-d subtree O(d) times on real div-soup pages; this
    pass computes all three together.)

    Text is concatenated (no injected separators) then Fields-collapsed
    — the same contract as the extraction path's ``Node.text()`` +
    collapse, so inline tags never split words."""
    blocks: list[tuple[str, int]] = []

    def visit(n: Node, in_link: bool) -> tuple[bool, list[str], list[str]]:
        # (has_block_descendant, text segments, link-text segments) for
        # n's subtree, pruned subtrees excluded
        has_block = False
        segs: list[str] = []
        lsegs: list[str] = []
        for c in n.children:
            if isinstance(c, str):
                segs.append(c)
                if in_link:
                    lsegs.append(c)
                continue
            if c.tag in PRUNE_TAGS:
                continue
            hb, s, ls = visit(c, in_link or c.tag == "a")
            if c.tag in BLOCK_TAGS and not hb:
                blocks.append(
                    (normalize_ws("".join(s)), len(normalize_ws("".join(ls))))
                )
            has_block = has_block or c.tag in BLOCK_TAGS or hb
            segs.extend(s)
            lsegs.extend(ls)
        return has_block, segs, lsegs

    visit(root, False)
    return blocks


def main_content_str(
    html: str | bytes | None,
    min_words: int = 5,
    max_link_density: float = 0.33,
) -> tuple[str, int, int]:
    """Driver-side twin: (main_text, n_blocks, n_kept) for one page."""
    if html is None:
        return "", 0, 0
    blocks = _page_blocks(parse_html(html))
    kept = [
        t
        for t, link_chars in blocks
        if len(fields(t)) >= min_words
        and not (len(t) > 0 and link_chars / len(t) > max_link_density)
    ]
    return "\n".join(kept), len(blocks), len(kept)


def extract_main_content(
    df: DataFrame,
    id_col: str = "doc_id",
    html_col: str = "html",
    min_words: int = 5,
    max_link_density: float = 0.33,
) -> DataFrame:
    """Spark operator: one mapInPandas pass over (id, html) emitting
    (id, n_blocks, n_kept, main_len, main_md5, boilerplate_ratio) —
    ratio = 1 - kept_chars/total_block_chars, rounded to 6dp (the
    repo's cross-engine float contract), 0.0 for blockless pages."""
    import pandas as pd  # noqa: F401

    src = df.select(id_col, html_col)
    # the id column passes through untouched — mirror its real type in
    # the declared schema (a hardcoded `long` crashes Arrow for string
    # or int keys)
    id_type = dict(src.dtypes)[id_col]

    def run(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for i, h in zip(pdf[id_col], pdf[html_col]):
                blocks = _page_blocks(parse_html(h if h is not None else ""))
                kept_texts = []
                total_chars = 0
                for t, link_chars in blocks:
                    total_chars += len(t)
                    if len(fields(t)) < min_words:
                        continue
                    if len(t) > 0 and link_chars / len(t) > max_link_density:
                        continue
                    kept_texts.append(t)
                main = "\n".join(kept_texts)
                ratio = (
                    round(1.0 - sum(len(t) for t in kept_texts) / total_chars, 6)
                    if total_chars > 0
                    else 0.0
                )
                rows.append(
                    (
                        i,
                        len(blocks),
                        len(kept_texts),
                        len(main),
                        hashlib.md5(main.encode()).hexdigest(),
                        ratio,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "n_blocks", "n_kept", "main_len", "main_md5",
                    "boilerplate_ratio",
                ],
            )

    return src.mapInPandas(
        run,
        f"{id_col} {id_type}, n_blocks int, n_kept int, main_len int, "
        "main_md5 string, boilerplate_ratio double",
    )
