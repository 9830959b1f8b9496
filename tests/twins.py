"""Shared pure-Python twins of cross-engine rule contracts.

One specification per rule family — both the operator tests and the
pipeline-composition tests import from here, so a semantic change (e.g.
the CRLF trailing-whitespace anchor fix) cannot update one pinned twin
and silently leave the other stale."""

from __future__ import annotations

import re

C4_BADWORDS = {"badword1", "badword2", "badword3"}


def py_c4(text: str, min_words: int = 3, min_sent: int = 5):
    """Twin of textops.c4_clean / c4_kept_lines + c4_page_ok.

    Returns (n_lines, n_kept, n_sentences, keep, clean). Trailing
    whitespace is regex-stripped before the terminal-punctuation match
    (the engines' common semantics — bare '$' diverges on \\r)."""
    kept = [
        l
        for l in text.split("\n")
        if re.search(r'[.!?"]$', re.sub(r"\s+$", "", l))
        and len([w for w in l.lower().split() if w]) >= min_words
        and "javascript" not in l.lower()
    ]
    clean = "\n".join(kept)
    n_sent = len(re.findall(r"[.!?]", clean))
    keep = (
        "lorem ipsum" not in text.lower()
        and "{" not in text
        and "}" not in text
        and not C4_BADWORDS & set(text.lower().split())
        and n_sent >= min_sent
    )
    return len(text.split("\n")), len(kept), n_sent, keep, clean
