"""URL parsing, resolution and canonicalization.

Semantics pinned against the reference:

- relative URL resolution against a referer/base follows RFC 3986 (Go
  ``(*url.URL).ResolveReference``, used in ``request.go:104-117`` and in
  link extraction ``html_utils.go:93-106``); Python's ``urllib.parse.
  urljoin`` implements the same RFC — property-tested in
  tests/test_urlnorm.py.
- malformed URLs are silently skipped during link extraction (the
  reference returns "" on parse failure, html_utils.go:100-102); Go's
  ``url.Parse`` rejects URLs containing ASCII control characters — we pin
  the same rejection rule.
- canonicalization (engine extension, SURVEY.md §2.8): lowercase scheme and
  host, strip fragment, drop default port (:80 http, :443 https), empty
  path -> "/", query preserved byte-for-byte.

Everything here is plain Python executed inside vectorized pandas UDFs
(see extract.py); there is no per-row Python crossing the JVM boundary.
"""

from __future__ import annotations

from urllib.parse import urljoin, urlsplit, urlunsplit

# Go url.Parse rejects ASCII control characters; spaces are likewise invalid
# in URLs. Pin: strip leading/trailing whitespace first, then reject any
# remaining char <= 0x20 or 0x7F.
_CTRL = set(chr(c) for c in range(0x21)) | {chr(0x7F)}


def parse_ok(u: str) -> bool:
    """Whether the reference's url.Parse would accept the (stripped) URL."""
    return not any(ch in _CTRL for ch in u)


def resolve(base: str | None, href: str) -> str | None:
    """RFC 3986 resolution of href against base; None if malformed.

    Mirrors ``NodeResolveURL`` (html_utils.go:93-106): attribute value is
    parsed and resolved against the page URL; parse failure -> skip.
    """
    href = href.strip(" \t\r\n")
    if not parse_ok(href):
        return None
    try:
        return urljoin(base, href) if base else href
    except ValueError:
        return None


def canonicalize(url: str, referer: str | None = None) -> str | None:
    """Canonical form used for the seen-set and the fetch join key.

    Resolution vs referer mirrors Request.ParseURL (request.go:104-117).
    Returns None for unusable URLs (no host after parsing).
    """
    url = url.strip(" \t\r\n")
    if not parse_ok(url):
        return None
    if referer:
        try:
            url = urljoin(referer, url)
        except ValueError:
            return None
    try:
        parts = urlsplit(url)
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    netloc = parts.netloc
    host = parts.hostname
    if not host:
        return None
    host = host.lower()
    port = None
    try:
        port = parts.port
    except ValueError:
        return None
    if port is not None and not (
        (scheme == "http" and port == 80) or (scheme == "https" and port == 443)
    ):
        host = "%s:%d" % (host, port)
    userinfo = ""
    if "@" in netloc:
        userinfo = netloc.rsplit("@", 1)[0] + "@"
    path = parts.path or "/"
    return urlunsplit((scheme, userinfo + host, path, parts.query, ""))


def host_of(url_canon: str) -> str | None:
    """Registrable host (including non-default port) of a canonical URL."""
    try:
        netloc = urlsplit(url_canon).netloc
    except ValueError:
        return None
    if "@" in netloc:
        netloc = netloc.rsplit("@", 1)[1]
    return netloc or None
