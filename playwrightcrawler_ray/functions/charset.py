"""Charset-tolerant text decoding for fetched text resources.

The reference chardet-detects every text subresource and decodes
tolerantly (playwrightcrawler.py:5091-5099, :2555-2557 — chardet
``detect`` then ``bytes.decode(encoding, errors='replace')``). chardet
is not available in this container, so detection is the deterministic
standards-path instead:

1. BOM sniff (UTF-8 / UTF-16 / UTF-32);
2. ``charset=`` parameter of the HTTP Content-Type header;
3. ``<meta charset=…>`` / http-equiv declaration in the first 4 KiB;
4. strict UTF-8 attempt;
5. Latin-1 fallback (never fails — every byte maps).

A declared-but-wrong codec degrades to ``errors='replace'`` on the
declared codec, mirroring the reference's tolerant decode.
"""

from __future__ import annotations

import codecs
import re

_META_RE = re.compile(
    rb"""<meta[^>]+?(?:charset\s*=\s*["']?\s*([A-Za-z0-9_\-]+)"""
    rb"""|content\s*=\s*["'][^"']*charset=([A-Za-z0-9_\-]+))""",
    re.IGNORECASE,
)
_CT_RE = re.compile(r"charset\s*=\s*\"?\s*([A-Za-z0-9_\-]+)", re.IGNORECASE)

_BOMS: list[tuple[bytes, str]] = [
    (codecs.BOM_UTF32_LE, "utf-32-le"),
    (codecs.BOM_UTF32_BE, "utf-32-be"),
    (codecs.BOM_UTF8, "utf-8-sig"),
    (codecs.BOM_UTF16_LE, "utf-16-le"),
    (codecs.BOM_UTF16_BE, "utf-16-be"),
]


def _valid_codec(name: str | None) -> str | None:
    if not name:
        return None
    try:
        return codecs.lookup(name).name
    except LookupError:
        return None


def detect_charset(body: bytes, content_type_raw: str = "") -> str:
    """Best-effort charset of a text payload (see module docstring)."""
    for bom, enc in _BOMS:
        if body.startswith(bom):
            return enc
    m = _CT_RE.search(content_type_raw or "")
    enc = _valid_codec(m.group(1)) if m else None
    if enc:
        return enc
    m2 = _META_RE.search(body[:4096])
    if m2:
        raw = (m2.group(1) or m2.group(2) or b"").decode("ascii", "ignore")
        enc = _valid_codec(raw)
        if enc:
            return enc
    try:
        body.decode("utf-8")
        return "utf-8"
    except UnicodeDecodeError:
        return "iso8859-1"


def decode_text(body: bytes, content_type_raw: str = "") -> tuple[str, str]:
    """Tolerantly decode ``body`` → (text, encoding_used)."""
    enc = detect_charset(body, content_type_raw)
    try:
        return body.decode(enc, errors="replace"), enc
    except (LookupError, ValueError):  # pragma: no cover - _valid_codec gates
        return body.decode("iso8859-1", errors="replace"), "iso8859-1"
