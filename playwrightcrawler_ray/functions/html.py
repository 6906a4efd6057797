"""Server-side HTML extraction on the stdlib ``html.parser``.

The reference extracts links/words/visible text inside the browser with
JS DOM walks (playwrightcrawler.py:2458-2637, :4109-4181) or via
BeautifulSoup (:3372-3453). Neither Playwright nor bs4 is a dependency
here: one SAX-style pass collects everything the downstream stages need
— href/src attributes from ``<a> <link> <script> <img>`` (the attribute
set of get_links_page, :2458-2517), per-image ``alt`` captions (the
caption source for the images table), and visible text excluding the
reference's ``soup_tag_blocklist`` {script, style, noscript, iframe,
meta, head, title, input} (:162, :4105-4107).

Visible-text semantics match ``get_min_webcontent``
(:3733-3768): every text node is stripped, empties dropped, fragments
joined with single spaces.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from html.parser import HTMLParser

# Reference soup_tag_blocklist (playwrightcrawler.py:162).
TEXT_TAG_BLOCKLIST = {"script", "style", "noscript", "iframe", "meta", "head", "title", "input"}

_LINK_ATTRS = {"a": "href", "link": "href", "script": "src", "img": "src"}


@dataclass
class PageExtract:
    links: list[str] = field(default_factory=list)       # hrefs in document order
    images: list[tuple[str, str]] = field(default_factory=list)  # (src, alt)
    text_parts: list[str] = field(default_factory=list)

    @property
    def min_webcontent(self) -> str:
        return " ".join(self.text_parts)


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.out = PageExtract()
        self._suppress_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag in TEXT_TAG_BLOCKLIST:
            self._suppress_depth += 1
        attr = _LINK_ATTRS.get(tag)
        if attr is not None:
            d = dict(attrs)
            val = d.get(attr)
            if val:
                self.out.links.append(val)
                if tag == "img":
                    self.out.images.append((val, d.get("alt") or ""))

    def handle_startendtag(self, tag, attrs):
        # self-closing tags contribute links but no text scope
        attr = _LINK_ATTRS.get(tag)
        if attr is not None:
            d = dict(attrs)
            val = d.get(attr)
            if val:
                self.out.links.append(val)
                if tag == "img":
                    self.out.images.append((val, d.get("alt") or ""))

    def handle_endtag(self, tag):
        if tag in TEXT_TAG_BLOCKLIST and self._suppress_depth > 0:
            self._suppress_depth -= 1

    def handle_data(self, data):
        if self._suppress_depth == 0:
            t = data.strip()
            if t:
                self.out.text_parts.append(t)


def extract_page(html_text: str) -> PageExtract:
    """One-pass extraction of links, image refs (+alt captions) and
    visible text from an HTML document. Never raises on malformed markup
    (HTMLParser is tolerant); on a hard failure returns an empty extract,
    mirroring the reference's soup-failure fallback doc (:3417-3429)."""
    p = _Extractor()
    try:
        p.feed(html_text)
        p.close()
    except Exception:
        return PageExtract()
    return p.out
