"""URL canonicalization + registered-domain extraction (webtext axis).

Public, deterministic normalization rules (the common subset of the
WHATWG URL spec + crawl-dedup practice — cf. the canonicalization
steps CommonCrawl/ClueWeb-style pipelines apply before URL dedup):

1. scheme and host lowercased
2. default ports dropped (http:80, https:443)
3. fragment dropped
4. tracking query parameters dropped (utm_*, gclid, fbclid, msclkid,
   ref, fb_action_ids)
5. remaining query parameters sorted by (key, value) — order-insensitive
6. empty path -> "/" ; trailing slash kept as-is otherwise (a
   trailing-slash difference CAN be a different page)
7. userinfo preserved (rare, but dropping it changes identity)

``registered_domain`` approximates the public-suffix list with a small
built-in set of common multi-label suffixes — the full PSL is a data
file, not an algorithm; swap `_MULTI_SUFFIX` for the real list in
production.  Everything here is stdlib ``urllib.parse`` — no network,
no third-party deps.
"""

from __future__ import annotations

from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

_TRACKING_PREFIXES = ("utm_",)
_TRACKING_KEYS = {"gclid", "fbclid", "msclkid", "ref", "fb_action_ids"}

_DEFAULT_PORTS = {"http": "80", "https": "443"}

# Common multi-label public suffixes (abridged; the real PSL is a file).
_MULTI_SUFFIX = {
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "co.in", "co.kr", "co.za",
    "github.io", "gitlab.io", "blogspot.com",
}


def canonicalize_url(url: str) -> str:
    """Deterministic canonical form of one URL (rules above).  Returns
    the input unchanged if it does not parse as scheme://netloc..."""
    try:
        parts = urlsplit(url)
    except ValueError:
        return url
    if not parts.scheme or not parts.netloc:
        return url
    scheme = parts.scheme.lower()
    host = (parts.hostname or "").lower()
    netloc = host
    if parts.port is not None and str(parts.port) != _DEFAULT_PORTS.get(scheme):
        netloc = f"{host}:{parts.port}"
    if parts.username:
        cred = parts.username + (f":{parts.password}" if parts.password else "")
        netloc = f"{cred}@{netloc}"
    path = parts.path or "/"
    q = [
        (k, v)
        for k, v in parse_qsl(parts.query, keep_blank_values=True)
        if k not in _TRACKING_KEYS and not k.lower().startswith(_TRACKING_PREFIXES)
    ]
    query = urlencode(sorted(q))
    return urlunsplit((scheme, netloc, path, query, ""))


def host_of(url: str) -> str:
    try:
        return (urlsplit(url).hostname or "").lower()
    except ValueError:
        return ""


def registered_domain(host: str) -> str:
    """eTLD+1 under the abridged suffix set: 'a.b.site.co.uk' ->
    'site.co.uk'; 'x.site.example' -> 'site.example'."""
    labels = host.lower().rstrip(".").split(".")
    if len(labels) <= 2:
        return host.lower().rstrip(".")
    if ".".join(labels[-2:]) in _MULTI_SUFFIX:
        return ".".join(labels[-3:])
    return ".".join(labels[-2:])
