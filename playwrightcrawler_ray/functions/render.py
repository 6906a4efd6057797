"""Deterministic JS-render stand-in for the fetch stage.

The reference's headline capability is Playwright navigation: pages are
rendered, auto-scrolled (triggering lazy-load), and links are extracted
from the LIVE DOM (playwrightcrawler.py:4926-5207, :5174-5185,
:4384-4397). A sealed sandbox has no browser, so the crawl pipeline
exposes a render HOOK with the same contract —

    render_html(html: str) -> str       # (url, html) -> rendered html

— and this module provides the deterministic stand-in implementation
covering the two dynamic behaviors the reference's render pass
observably adds over a static fetch:

1. ``document.write`` / ``document.writeln`` calls with string-literal
   arguments inside inline ``<script>`` blocks contribute their HTML to
   the rendered document (appended — extraction cares about presence,
   not position). No JavaScript is ever evaluated: the literals are
   regex-extracted, so rendering is pure and deterministic.
2. lazy-load promotion: ``data-src`` attributes on ``<img>`` tags become
   ``src`` (what the reference's auto-scroll triggers on real pages).

On a real deployment the hook is replaced by a Playwright page actor
with the same signature; everything downstream (parse, offers, image
refs, the sequential oracle) is renderer-agnostic because engine and
oracle share this function through stages/process.py.
"""

from __future__ import annotations

import re

_SCRIPT_RE = re.compile(r"<script\b[^>]*>(.*?)</script>", re.I | re.S)
_WRITE_RE = re.compile(
    r"""document\.write(?:ln)?\(\s*(['"])(.*?)\1\s*\)""", re.S
)
_DATASRC_RE = re.compile(r"(<img\b[^>]*?)\bdata-src(\s*=)", re.I)


def render_html(text: str) -> str:
    """Render dynamic HTML deterministically (module docstring)."""
    written: list[str] = []
    for m in _SCRIPT_RE.finditer(text):
        for wm in _WRITE_RE.finditer(m.group(1)):
            written.append(wm.group(2))
    out = _DATASRC_RE.sub(r"\1src\2", text)
    if written:
        out = out + "\n" + "\n".join(written)
    return out
