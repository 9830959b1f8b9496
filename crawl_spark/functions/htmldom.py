"""Minimal HTML DOM + CSS-selector engine (stdlib-only, no bs4/lxml).

Implements the selector subset and extraction semantics the reference uses
through goquery (``/root/reference/html_utils.go``, ``forms/forms.go``):

- ``find(sel)``: all matching elements in document order (goquery Find);
  selector grammar: tag, ``.class``, ``#id``, ``[attr]``, ``[attr=v]``,
  compound simple selectors, descendant combinator (space), child
  combinator (``>``), ``:nth-of-type(n)``, comma groups.
- ``text()``: concatenation of all descendant text nodes in document order
  (goquery ``Selection.Text``), entities already decoded by the parser.
- ``Text(root, sel)`` contract (html_utils.go:37-45): join each match's
  text with " ", then whitespace-fields-normalize (textnorm.normalize_ws).
- form default-value extraction (forms/forms.go:80-130): inputs skip
  submit/reset; radio/checkbox only when ``checked="checked"``; selects
  take the option with ``selected="selected"`` else "".

This is a deliberate micro-engine: parsing happens once per row inside an
Arrow-batched pandas UDF; all selector matching is in-process Python over
the already-built tree. It is NOT a general HTML5 parser — it handles the
fixture grammar plus common real-world laxness (unclosed void elements,
attribute quoting variants, entities).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

from .textnorm import normalize_ws, trim_space

_VOID = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}


class Node:
    __slots__ = ("tag", "attrs", "children", "parent", "_texts")

    def __init__(self, tag: str, attrs: dict | None = None, parent: "Node | None" = None):
        self.tag = tag
        self.attrs = attrs or {}
        self.children: list[Node | str] = []
        self.parent = parent
        self._texts = None

    # -- goquery Selection.Text analog: all text nodes, document order
    def text(self) -> str:
        out: list[str] = []
        stack: list[Node | str] = [self]
        while stack:
            n = stack.pop()
            if isinstance(n, str):
                out.append(n)
            else:
                stack.extend(reversed(n.children))
        return "".join(out)

    def attr(self, name: str) -> str | None:
        return self.attrs.get(name)

    def iter_elements(self):
        """All descendant elements (not self), document order."""
        stack = list(reversed([c for c in self.children if isinstance(c, Node)]))
        while stack:
            n = stack.pop()
            yield n
            stack.extend(reversed([c for c in n.children if isinstance(c, Node)]))

    def __repr__(self):  # pragma: no cover
        return "<%s %r>" % (self.tag, self.attrs)


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("#root")
        self._stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = Node(tag, dict(attrs), self._stack[-1])
        self._stack[-1].children.append(node)
        if tag not in _VOID:
            self._stack.append(node)

    def handle_startendtag(self, tag, attrs):
        node = Node(tag, dict(attrs), self._stack[-1])
        self._stack[-1].children.append(node)

    def handle_endtag(self, tag):
        # pop to the nearest matching open tag (lax recovery)
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i].tag == tag:
                del self._stack[i:]
                return

    def handle_data(self, data):
        if data:
            self._stack[-1].children.append(data)


def parse_html(html: bytes | str) -> Node:
    """Parse HTML into a Node tree. bytes are decoded as UTF-8 (lossy)."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    tb = _TreeBuilder()
    tb.feed(html)
    tb.close()
    return tb.root


# ---------------------------------------------------------------------------
# CSS selector subset

_SIMPLE_RE = re.compile(
    r"""(?P<tag>[a-zA-Z][\w-]*|\*)?
        (?P<quals>(?:[.#][\w-]+
                   |\[[\w-]+(?:=(?:"[^"]*"|'[^']*'|[^\]]*))?\]
                   |:nth-of-type\(\d+\))*)""",
    re.X,
)
_QUAL_RE = re.compile(
    r"""\.(?P<cls>[\w-]+)
       |\#(?P<id>[\w-]+)
       |\[(?P<attr>[\w-]+)(?:=(?P<aval>"[^"]*"|'[^']*'|[^\]]*))?\]
       |:nth-of-type\((?P<nth>\d+)\)""",
    re.X,
)


class _Simple:
    __slots__ = ("tag", "classes", "id", "attrs", "nth")

    def __init__(self, token: str):
        m = _SIMPLE_RE.fullmatch(token)
        if not m:
            raise ValueError("bad selector token: %r" % token)
        self.tag = (m.group("tag") or "*").lower()
        self.classes: list[str] = []
        self.id: str | None = None
        self.attrs: list[tuple[str, str | None]] = []
        self.nth: int | None = None
        for q in _QUAL_RE.finditer(m.group("quals") or ""):
            if q.group("cls"):
                self.classes.append(q.group("cls"))
            elif q.group("id"):
                self.id = q.group("id")
            elif q.group("attr"):
                val = q.group("aval")
                if val is not None and len(val) >= 2 and val[0] in "\"'" and val[-1] == val[0]:
                    val = val[1:-1]
                self.attrs.append((q.group("attr"), val))
            elif q.group("nth"):
                self.nth = int(q.group("nth"))

    def matches(self, node: Node) -> bool:
        if self.tag != "*" and node.tag != self.tag:
            return False
        if self.id is not None and node.attrs.get("id") != self.id:
            return False
        if self.classes:
            cls = (node.attrs.get("class") or "").split()
            if any(c not in cls for c in self.classes):
                return False
        for name, val in self.attrs:
            got = node.attrs.get(name)
            if got is None or (val is not None and got != val):
                return False
        if self.nth is not None:
            parent = node.parent
            if parent is None:
                return False
            same = [c for c in parent.children if isinstance(c, Node) and c.tag == node.tag]
            try:
                if same.index(node) + 1 != self.nth:
                    return False
            except ValueError:
                return False
        return True


def _compile_one(sel: str) -> list[tuple[str, _Simple]]:
    """-> [(combinator, simple)]; combinator ' ' = descendant, '>' = child."""
    tokens = re.split(r"\s*(>)\s*|\s+", sel.strip())
    steps: list[tuple[str, _Simple]] = []
    comb = " "
    for tok in tokens:
        if tok is None or tok == "":
            continue
        if tok == ">":
            comb = ">"
            continue
        steps.append((comb, _Simple(tok)))
        comb = " "
    if not steps:
        raise ValueError("empty selector")
    return steps


_SEL_CACHE: dict[str, list[list[tuple[str, _Simple]]]] = {}


def compile_selector(selector: str) -> list[list[tuple[str, _Simple]]]:
    compiled = _SEL_CACHE.get(selector)
    if compiled is None:
        compiled = [_compile_one(part) for part in selector.split(",") if part.strip()]
        if len(_SEL_CACHE) > 4096:
            _SEL_CACHE.clear()
        _SEL_CACHE[selector] = compiled
    return compiled


def _match_steps(node: Node, steps: list[tuple[str, _Simple]], root: Node) -> bool:
    """Right-to-left match: does `node` satisfy the full compound path?"""
    comb, simple = steps[-1]
    if not simple.matches(node):
        return False
    rest = steps[:-1]
    if not rest:
        return True
    # jQuery/goquery Find evaluates ancestor parts of the selector against
    # the WHOLE document, not just the find-root's subtree; only the final
    # match must be a descendant of root. "#root" is the synthetic document
    # node and never matches a simple selector.
    cur = node.parent
    if comb == ">":
        return cur is not None and cur.tag != "#root" and _match_steps(cur, rest, root)
    while cur is not None and cur.tag != "#root":
        if _match_steps(cur, rest, root):
            return True
        cur = cur.parent
    return False


def find(root: Node, selector: str) -> list[Node]:
    """All elements under root matching selector, document order (goquery
    Find semantics: searches descendants of root only)."""
    compiled = compile_selector(selector)
    out = []
    for node in root.iter_elements():
        for steps in compiled:
            if _match_steps(node, steps, root):
                out.append(node)
                break
    return out


# ---------------------------------------------------------------------------
# Reference extraction surface (html_utils.go / forms/forms.go semantics)


def sel_text(root: Node, selector: str) -> str:
    """``Text`` (html_utils.go:37-45): join matched nodes' text with " ",
    then Fields-normalize."""
    return normalize_ws(" ".join(n.text() for n in find(root, selector)))


def find_any(root: Node, *selectors: str) -> list[Node]:
    """``FindAny`` (html_utils.go:26-34): first selector with >=1 match."""
    nodes: list[Node] = []
    for sel in selectors:
        nodes = find(root, sel)
        if nodes:
            break
    return nodes


def find_any_text(root: Node, *selectors: str) -> str:
    nodes = find_any(root, *selectors)
    return normalize_ws(" ".join(n.text() for n in nodes))


def sel_attr(root: Node, attr: str, selector: str) -> str:
    """``Attr`` (html_utils.go:77-80): attr of FIRST match, TrimSpace'd;
    missing -> ""."""
    nodes = find(root, selector)
    if not nodes:
        return ""
    return trim_space(nodes[0].attr(attr) or "")


def node_texts(root: Node, selector: str) -> list[str]:
    """``NodeText`` per match (html_utils.go:72-74)."""
    return [normalize_ws(n.text()) for n in find(root, selector)]


def node_attrs(root: Node, attr: str, selector: str) -> list[str]:
    """``NodeAttr`` per match (html_utils.go:84-89); missing attr -> ""."""
    return [n.attr(attr) or "" for n in find(root, selector)]


def extract_form(root: Node, selector: str) -> dict:
    """forms/forms.go:72-130 — action attr + default values multimap.

    goquery's ``Find(sel).Attr`` takes the first match; Each() iterates all
    matches' descendants. url.Values.Set replaces (single value).
    """
    forms = find(root, selector)
    action = forms[0].attr("action") if forms else None
    values: dict[str, list[str]] = {}
    for f in forms:
        for inp in find(f, "input"):
            ftype = inp.attr("type") or ""
            if ftype in ("submit", "reset"):
                continue
            if ftype in ("radio", "checkbox") and inp.attr("checked") != "checked":
                continue
            name = inp.attr("name") or ""
            values[name] = [inp.attr("value") or ""]
        for selnode in find(f, "select"):
            name = selnode.attr("name")
            if not name:
                continue
            value = ""
            for opt in find(selnode, "option"):
                if value:
                    continue
                if opt.attr("selected") == "selected":
                    value = opt.attr("value") or ""
            values[name] = [value]
    return {"action": action, "values": values}


def form_select_value(root: Node, form_selector: str, name: str, text: str) -> str | None:
    """forms/forms.go:48-68 ``Select``: option chosen by TrimSpace'd visible
    text; returns its value attr (last visible-text match wins, matching the
    reference's Each loop that keeps Set-ing)."""
    value = None
    for f in find(root, form_selector):
        for selnode in find(f, "select"):
            if selnode.attr("name") != name:
                continue
            for opt in find(selnode, "option"):
                if trim_space(opt.text()) == text:
                    value = opt.attr("value") or ""
    return value


def extract_links(root: Node, base_url: str | None, selector: str = "a") -> list[str]:
    """``NodeResolveURL`` semantics (html_utils.go:93-106): per matched
    node, take href (skip if absent), parse (skip if malformed), resolve
    against the page URL. Document order, duplicates preserved."""
    from .urlnorm import resolve

    out = []
    for n in find(root, selector):
        href = n.attr("href")
        if href is None:
            continue
        u = resolve(base_url, href)
        if u is not None and u != "":
            out.append(u)
    return out
