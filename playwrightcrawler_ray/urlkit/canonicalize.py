"""URL canonicalization with behavioral parity to the reference's
``sanitize_url`` (/root/reference/playwrightcrawler.py:2236-2417).

Both URL identity (the SHA1 ``url_id`` every dedup structure keys on) and
crawl ordering depend on this function, so the reference's exact ordered
sequence of repairs is preserved:

1.  strip surrounding whitespace, then unusual quote pairs (:2330-2338);
2.  fix ~35 known scheme typos (``htpps://`` → ``https://`` …, :2341-2358);
3.  drop a single junk leading character before ``http(s)://`` (:2360-2363);
4.  collapse ``http:///...`` scheme slashes to exactly two (:2365);
5.  parse; clean netloc keeping ``user:pass@host:port`` shape — printable
    userinfo, ``[alnum.-]`` host, numeric in-range port, default ports 80/443
    dropped (:2274-2310);
6.  rescue hostless ``scheme:///host.tld/path`` forms by promoting the first
    dotted path segment to netloc (:2377-2391);
7.  collapse repeated path slashes, *preserving embedded full URLs* in the
    path (``/proxy/https://inner.example/a//b``) (:2313-2324);
8.  lowercase scheme+netloc, drop default ports again post-lowering, strip
    the fragment, rebuild with urlunsplit (:2397-2414).

Idempotence (``canonicalize_url(canonicalize_url(u)) == canonicalize_url(u)``)
is load-bearing: the reference's cleanup pass deletes any stored doc whose
URL is not a fixed point (playwrightcrawler.py:3688-3694); our tests assert
it property-based.
"""

from __future__ import annotations

import re
from functools import lru_cache
from urllib.parse import urlsplit, urlunsplit

# Quote-like wrappers stripped from around a URL (reference :2330-2338).
_QUOTE_PAIRS = [
    (re.compile(r'^"(.*)"$'), r"\1"),
    (re.compile(r"^'(.*)'$"), r"\1"),
    (re.compile("^“(.*)”$"), r"\1"),
    (re.compile("^‘(.*)’$"), r"\1"),
    (re.compile('^"(.*)″$'), r"\1"),
]

# Scheme-typo repair table (reference :2341-2358). Order matters: each rule
# is applied in sequence to the current string.
_SCHEME_FIXES = [
    (re.compile(p), r)
    for p, r in [
        (r"^ps://", "https://"),
        (r"^ttps://", "https://"),
        (r"^htpps://", "https://"),
        (r"^httpp://", "https://"),
        (r"^http:s//", "https://"),
        (r"^hthttps://", "https://"),
        (r"^httsp://", "https://"),
        (r"^htts://", "https://"),
        (r"^htttps://", "https://"),
        (r"^https:https://", "https://"),
        (r"^https https://", "https://"),
        (r"^httpshttps://", "https://"),
        (r"^https://https://", "https://"),
        (r'^"https://', "https://"),
        (r"^httpd://", "https://"),
        (r"^htps://", "https://"),
        (r"^https: //", "https://"),
        (r"^https : //", "https://"),
        (r"^http2://", "https://"),
        (r"^https%3A//", "https://"),
        (r"^%20https://", "https://"),
        (r"^htto://", "http://"),
        (r"^htt://", "http://"),
        (r"^htp://http//", "http://"),
        (r"^htp://", "http://"),
        (r"^hhttp://", "http://"),
        (r"^http:/http://", "http://"),
        (r"^http:www", "http://www"),
        (r"^htttp://", "http://"),
        (r"^ttp://", "http://"),
        (r"^%20http://", "http://"),
        (r'^%22mailto:', "mailto:"),
        (r"^httpqs://", "https://www."),
        (r"^://", "https://"),
    ]
]

_JUNK_HTTPS = re.compile(r'^[a-zA-Z."(´]https://')
_JUNK_HTTP = re.compile(r'^[a-zA-Z."(´]http://')
_SCHEME_SLASHES = re.compile(r"^(https?:)/+")
_MULTI_SLASH = re.compile(r"/{2,}")
_EMBEDDED_URL_SPLIT = re.compile(r"(/https?://)")
_FALLBACK_COLLAPSE = re.compile(r"(https?://[^/]+)/{2,}")


def _clean_netloc(netloc: str, scheme: str) -> str:
    """Reference ``clean_hostname_with_userinfo`` (:2274-2310)."""
    userinfo = ""
    host_port = netloc
    if "@" in netloc:
        userinfo, host_port = netloc.split("@", 1)
        userinfo = "".join(c for c in userinfo if c.isprintable())

    if ":" in host_port:
        host, port = host_port.rsplit(":", 1)
        host = "".join(c for c in host if c.isalnum() or c in "-.")
        if port.isdigit():
            port_num = int(port)
            if (scheme == "http" and port == "80") or (
                scheme == "https" and port == "443"
            ):
                port = ""
            elif 1 <= port_num <= 65535:
                pass
            else:
                port = ""
        else:
            port = ""
    else:
        host = "".join(c for c in host_port if c.isalnum() or c in "-.")
        port = ""

    out = host
    if port:
        out += f":{port}"
    if userinfo:
        out = f"{userinfo}@{out}"
    return out


def _collapse_path_slashes_preserving_embedded(path: str) -> str:
    """Reference ``safe_normalize_path_slashes`` (:2313-2324): collapse
    runs of ``/`` except across embedded full-URL boundaries."""
    segments = _EMBEDDED_URL_SPLIT.split(path)
    out: list[str] = []
    for i in range(0, len(segments), 2):
        out.append(_MULTI_SLASH.sub("/", segments[i]))
        if i + 1 < len(segments):
            out.append(segments[i + 1])
    return "".join(out)


def canonicalize_url(url: str | None) -> str:
    """Canonicalize one URL. Returns "" for non-string/empty input.

    Memoized per process: the function is pure and the crawl hot path
    calls it ~30x per page (every href, img src, ancestor directory),
    with heavy repetition across the pages of a host — nav links and
    shared subresources resolve to the same absolute URL on every
    page that carries them."""
    if not url or not isinstance(url, str):
        return ""
    return _canonicalize_cached(url)


@lru_cache(maxsize=1 << 16)
def _canonicalize_cached(url: str) -> str:
    url = url.strip()
    # fast path: a URL already starting with exactly "http(s)://" and
    # not followed by another slash or nested scheme cannot match any
    # of the quote/typo/junk repair patterns (verified pattern by
    # pattern against the tables above) — skip the ~44 regex subs the
    # repair battery costs per call; the parse/normalize passes below
    # still run in full.
    clean_prefix = (
        url.startswith("https://")
        and not url.startswith(("https:///", "https://https://"))
    ) or (
        url.startswith("http://")
        and not url.startswith(("http:///", "http://http://"))
    )
    if not clean_prefix:
        for pat, repl in _QUOTE_PAIRS:
            url = pat.sub(repl, url)
        for pat, repl in _SCHEME_FIXES:
            url = pat.sub(repl, url)
        url = _JUNK_HTTPS.sub("https://", url)
        url = _JUNK_HTTP.sub("http://", url)
        url = _SCHEME_SLASHES.sub(r"\1//", url)

    try:
        parts = urlsplit(url)
        scheme = parts.scheme.lower()
        netloc = _clean_netloc(parts.netloc, scheme)
        if not netloc and parts.path.startswith("/") and scheme:
            # hostless rescue: scheme:///host.tld/path (:2377-2391)
            path_parts = parts.path.lstrip("/").split("/", 1)
            if path_parts and "." in path_parts[0]:
                netloc = _clean_netloc(path_parts[0], scheme)
                path = "/" + (path_parts[1] if len(path_parts) > 1 else "")
                url = urlunsplit((scheme, netloc, path, parts.query, parts.fragment))
        else:
            path = _MULTI_SLASH.sub("/", parts.path)
            url = urlunsplit((scheme, netloc, path, parts.query, parts.fragment))
    except (ValueError, AttributeError):
        url = _FALLBACK_COLLAPSE.sub(r"\1/", url)

    try:
        parts = urlsplit(url)
        scheme = parts.scheme.lower()
        netloc = parts.netloc.lower()
        if ":" in netloc:
            host, port = netloc.split(":", 1)
            if (scheme == "http" and port == "80") or (
                scheme == "https" and port == "443"
            ):
                netloc = host
        path = _collapse_path_slashes_preserving_embedded(parts.path)
        return urlunsplit((scheme, netloc, path, parts.query, "")).strip()
    except (ValueError, AttributeError):
        return url.strip()
