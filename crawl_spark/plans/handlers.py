"""Handler registry + dispatch (reference ``crawler.go:239-263``).

In the reference a handler is an arbitrary Go callback; in the Spark
engine a handler is a declarative extraction spec — handler dispatch
becomes dataflow routing on the ``callbacks`` array column, and handler
execution is part of the vectorized extraction pass.

Dispatch contract (``getHandlers``, crawler.go:239-252):
1. every registered glob pattern, in registration order, contributes its
   handlers if the pattern glob-matches ANY of the row's callback names;
2. then every callback name, in order, contributes its exact-name
   handlers;
3. a name is recorded as a pattern only when first registered and it
   contains ``*`` (crawler.go:258-263).
Glob semantics are go-glob: ``*`` only (globmatch.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..functions.globmatch import glob_match


@dataclass(frozen=True)
class Handler:
    """Declarative handler: what to extract and whether to follow links."""

    name: str
    text_selector: str = "body"
    link_selector: str = "a"
    follow: bool = True
    out_callbacks: tuple[str, ...] | None = None  # None -> inherit parent's


@dataclass
class HandlerRegistry:
    handlers: dict[str, list[Handler]] = field(default_factory=dict)
    patterns: list[str] = field(default_factory=list)

    def register(self, name: str, handler: Handler) -> None:
        if name not in self.handlers and "*" in name:
            self.patterns.append(name)
        self.handlers.setdefault(name, []).append(handler)

    def get_handlers(self, callbacks: list[str] | None) -> list[Handler]:
        """Exact getHandlers semantics (crawler.go:239-252)."""
        callbacks = callbacks or []
        out: list[Handler] = []
        for pattern in self.patterns:
            for name in callbacks:
                if glob_match(pattern, name):
                    out.extend(self.handlers[pattern])
                    break
        for name in callbacks:
            out.extend(self.handlers.get(name, []))
        return out
