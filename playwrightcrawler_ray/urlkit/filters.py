"""Admission filters for discovered URLs.

The reference applies these at preprocess time
(playwrightcrawler.py:1783-1946) and again in retroactive cleanup
passes (:3558-3730); applying them *once, at frontier admission* makes
the retroactive passes unnecessary (SURVEY.md §4 "dedup maintenance").
"""

from __future__ import annotations

import re
from urllib.parse import urlparse

# Non-navigable schemes (reference is_embedded_url, :1753-1779).
_EMBEDDED_PREFIXES = ("data:", "blob:", "about:", "javascript:")


def is_embedded_url(url: str) -> bool:
    """True for inline/browser-internal schemes a crawler must skip."""
    return url.startswith(_EMBEDDED_PREFIXES)


def has_repeated_segments(url: str, max_pattern: int = 5, min_repeats: int = 3) -> bool:
    """Crawler-trap detector: any path pattern of ≤``max_pattern`` segments
    repeated ≥``min_repeats`` times consecutively (reference
    playwrightcrawler.py:1223-1263; e.g. ``/a/b/a/b/a/b/`` trips, two
    repeats do not)."""
    path = urlparse(url).path.strip("/")
    if not path:
        return False
    segments = path.split("/")
    n = len(segments)
    for plen in range(1, min(max_pattern, n // min_repeats) + 1):
        for i in range(n - plen * min_repeats + 1):
            pattern = segments[i : i + plen]
            repeats = 1
            j = i + plen
            while j + plen <= n and segments[j : j + plen] == pattern:
                repeats += 1
                j += plen
            if repeats >= min_repeats:
                return True
    return False


class UrlPolicy:
    """Compiled allow/block policy — host allow/block regex lists, URL
    block regex list, max length (reference :3992-4071 + config.py:206-220).

    Compile once (per actor / per task closure), evaluate per URL. All
    matching is ``re.search`` with ``re.I | re.U`` like the reference.
    """

    def __init__(
        self,
        host_block: tuple[str, ...] = (r"(^|\.)gstatic\.com$",),
        host_allow: tuple[str, ...] = (r".*",),
        url_block: tuple[str, ...] = (),
        max_url_length: int = 4096,
        trap_max_pattern: int = 5,
        trap_min_repeats: int = 3,
    ):
        flags = re.I | re.U
        self.host_block = [re.compile(p, flags) for p in host_block]
        self.host_allow = [re.compile(p, flags) for p in host_allow]
        self.url_block = [re.compile(p, flags) for p in url_block]
        self.max_url_length = max_url_length
        self.trap_max_pattern = trap_max_pattern
        self.trap_min_repeats = trap_min_repeats

    def host_blocked(self, host: str) -> bool:
        return any(p.search(host) for p in self.host_block)

    def host_allowed(self, host: str) -> bool:
        return any(p.search(host) for p in self.host_allow)

    def url_blocked(self, url: str) -> bool:
        return any(p.search(url) for p in self.url_block)

    def admit(self, url: str, host: str | None) -> bool:
        """Full admission check for a *canonicalized* URL (the filter
        ordering of preprocess_crawler_data, :1853-1869)."""
        if not host:
            return False
        if len(url) > self.max_url_length:
            return False
        if is_embedded_url(url):
            return False
        if self.host_blocked(host) or not self.host_allowed(host):
            return False
        if self.url_blocked(url):
            return False
        if has_repeated_segments(url, self.trap_max_pattern, self.trap_min_repeats):
            return False
        return True
