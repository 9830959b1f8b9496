"""Handler registry dispatch — exact getHandlers contract
(crawler.go:239-252, registration crawler.go:258-263):

1. every registered glob pattern, in REGISTRATION order, contributes its
   handlers if it matches ANY callback (once, even on multiple matches);
2. then every callback name, in CALLBACK order, appends its exact-name
   handlers;
3. a name is recorded as a pattern only when FIRST registered and it
   contains '*'.
"""

from __future__ import annotations

from crawl_spark.functions.globmatch import glob_match
from crawl_spark.plans.handlers import Handler, HandlerRegistry


def h(name: str) -> Handler:
    return Handler(name=name)


def test_exact_name_dispatch_order():
    reg = HandlerRegistry()
    reg.register("a", h("a1"))
    reg.register("b", h("b1"))
    reg.register("a", h("a2"))
    got = [x.name for x in reg.get_handlers(["b", "a"])]
    # callback order, then registration order within a name
    assert got == ["b1", "a1", "a2"]


def test_glob_patterns_fire_before_exact_names():
    reg = HandlerRegistry()
    reg.register("item", h("exact"))
    reg.register("it*", h("glob1"))
    reg.register("*", h("glob_all"))
    got = [x.name for x in reg.get_handlers(["item"])]
    # patterns in registration order first, then exact matches
    assert got == ["glob1", "glob_all", "exact"]


def test_pattern_matches_any_callback_once():
    reg = HandlerRegistry()
    reg.register("li*", h("lister"))
    # two callbacks both match the pattern -> handler contributed ONCE
    got = [x.name for x in reg.get_handlers(["list", "lite"])]
    assert got == ["lister"]


def test_no_callbacks_no_handlers():
    reg = HandlerRegistry()
    reg.register("x", h("x"))
    assert reg.get_handlers([]) == []
    assert reg.get_handlers(None) == []


def test_star_only_on_first_registration():
    reg = HandlerRegistry()
    reg.register("p*", h("first"))
    reg.register("p*", h("second"))
    # one pattern entry, both handlers attached
    assert reg.patterns == ["p*"]
    assert [x.name for x in reg.get_handlers(["page"])] == ["first", "second"]


def test_go_glob_semantics():
    # go-glob: '*' spans any run incl empty; no '?' or classes
    assert glob_match("a*c", "abc")
    assert glob_match("a*c", "ac")
    assert glob_match("*", "anything")
    assert not glob_match("a*c", "abd")
    assert glob_match("a?c", "a?c")  # '?' is literal, not a wildcard
    assert not glob_match("a?c", "abc")
