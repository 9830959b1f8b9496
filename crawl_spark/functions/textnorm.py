"""Whitespace-normalization contract (byte-identical text extraction).

The reference's ``Text`` helper (``/root/reference/html_utils.go:37-45``)
normalizes extracted text with Go's ``strings.Fields``: split on every rune
with the Unicode White_Space property, drop empties, re-join with a single
ASCII space. Python's ``str.split()`` is *not* identical — it also splits on
U+001C..U+001F (file/group/record/unit separators), which Go does not. We
therefore pin the exact Unicode White_Space set.
"""

from __future__ import annotations

import re

# Unicode White_Space property (= Go unicode.IsSpace), Unicode 15:
# 0009-000D, 0020, 0085, 00A0, 1680, 2000-200A, 2028, 2029, 202F, 205F, 3000.
_WS_CODEPOINTS = (
    list(range(0x09, 0x0E))
    + [0x20, 0x85, 0xA0, 0x1680]
    + list(range(0x2000, 0x200B))
    + [0x2028, 0x2029, 0x202F, 0x205F, 0x3000]
)
_WHITE_SPACE = "".join(chr(c) for c in _WS_CODEPOINTS)
_FIELDS_RE = re.compile("[%s]+" % re.escape(_WHITE_SPACE))


def fields(s: str) -> list[str]:
    """Go ``strings.Fields``: split on Unicode White_Space, drop empties."""
    return [t for t in _FIELDS_RE.split(s) if t]


def normalize_ws(s: str) -> str:
    """``strings.Join(strings.Fields(s), " ")`` — the Text() contract."""
    return " ".join(fields(s))


def trim_space(s: str) -> str:
    """Go ``strings.TrimSpace`` (same White_Space set) — the Attr() contract
    (``/root/reference/html_utils.go:77-80``)."""
    return s.strip(_WHITE_SPACE)


def parse_float_text(text: str) -> float | None:
    """Reference ``ParseFloat`` semantics (html_utils.go:50-56): empty text
    -> 0.0 (not null); ``,`` replaced by ``.``; parse failures -> None."""
    if text is None or text == "":
        return 0.0
    text = text.replace(",", ".")
    try:
        return float(text)
    except ValueError:
        return None


def parse_uint_text(text: str) -> int | None:
    """Reference ``ParseUint`` semantics (html_utils.go:61-68): empty -> 0;
    strips ``,`` and ASCII spaces; non-negative base-10 only; failures ->
    None."""
    if text is None or text == "":
        return 0
    text = text.replace(",", "").replace(" ", "")
    if not text.isdigit():  # rejects signs/decimals, matching ParseUint
        return None
    v = int(text, 10)
    return v if v < (1 << 64) else None
