"""Glob pattern matching for handler dispatch.

The reference uses ryanuber/go-glob (``crawler.go:239-252``): the ONLY
metacharacter is ``*`` which matches any run of characters (including
empty, including separators). No ``?``, no character classes. A pattern
without ``*`` is an exact string equality.
"""

from __future__ import annotations

import re


def glob_to_regex(pattern: str) -> str:
    """go-glob pattern -> anchored regex source ((?s) so * spans newlines)."""
    return "(?s)^" + ".*".join(re.escape(p) for p in pattern.split("*")) + "$"


def glob_match(pattern: str, subject: str) -> bool:
    return re.match(glob_to_regex(pattern), subject) is not None
