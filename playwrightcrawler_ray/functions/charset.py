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
5. statistical sniff for undeclared non-UTF-8 bodies (the chardet
   analogue): strict-decode the candidate codecs and score how much of
   the non-ASCII output lands in the codec's native script — kana/CJK
   for Shift-JIS & EUC-JP, Hangul for EUC-KR, CJK for GB18030,
   common-Russian-letter-weighted Cyrillic for KOI8-R vs CP1251 (both
   single-byte codecs decode anything, so letter frequency is the only
   separator — the same signal chardet uses);
6. Latin-1 fallback (never fails — every byte maps).

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


# statistical sniff candidates with per-script weights. The CJK EUC
# family is byte-structurally near-identical (wrong-codec text often
# strict-decodes into plausible-looking native ranges), so raw range
# membership is weighted by script evidence chardet also leans on:
# kana for Japanese (real Japanese is kana-heavy; CJK garble has
# none), Hangul for Korean, plain CJK for Chinese, and
# common-Russian-letter frequency for the single-byte Cyrillic pair
# (KOI8-R vs CP1251 decode anything — letter frequency is the only
# separator). A repetition factor penalizes garble: natural text
# reuses characters, wrong-codec decodes look uniform-random.
_SNIFF_CANDIDATES: list[tuple[str, tuple[tuple[float, int, int], ...]]] = [
    ("shift_jis", ((1.0, 0x3040, 0x30FF), (0.5, 0x4E00, 0x9FFF),
                   (0.5, 0x3000, 0x303F), (0.5, 0xFF00, 0xFFEF))),
    ("euc_jp", ((1.0, 0x3040, 0x30FF), (0.5, 0x4E00, 0x9FFF),
                (0.5, 0x3000, 0x303F), (0.5, 0xFF00, 0xFFEF))),
    ("euc_kr", ((0.8, 0xAC00, 0xD7AF), (0.8, 0x1100, 0x11FF),
                (0.8, 0x3130, 0x318F), (0.3, 0x4E00, 0x9FFF))),
    ("gb18030", ((0.7, 0x4E00, 0x9FFF), (0.5, 0x3000, 0x303F),
                 (0.5, 0xFF00, 0xFFEF))),
    ("koi8-r", ((1.0, 0x0400, 0x04FF),)),
    ("cp1251", ((1.0, 0x0400, 0x04FF),)),
]
# LOWERCASE only: KOI8-R and CP1251 lay the alphabet out roughly
# case-swapped relative to each other, so the wrong codec turns running
# lowercase text into uppercase — counting uppercase as "common" would
# erase exactly the signal that separates them.
_CYRILLIC_COMMON = set("оеаинтсрвлкмдпуяыьгзбчйжхшюцщэфёъ")


def _sniff_statistical(body: bytes) -> str | None:
    """Byte-frequency charset heuristic for undeclared non-UTF-8 text
    (reference decodes these via chardet, playwrightcrawler.py
    :5091-5099). Returns a codec name or None if no candidate scores
    confidently."""
    # strip markup at the byte level first — tags are pure ASCII (no
    # candidate codec uses 0x3C/0x3E as a multibyte trail), and a
    # markup-heavy page would otherwise dilute the high-byte fraction
    # the single-byte gate below depends on
    sample = re.sub(rb"<[^>]*>", b" ", body[:65536])
    if not any(b >= 0x80 for b in sample):
        return None
    best_enc, best_score = None, 0.0
    for enc, ranges in _SNIFF_CANDIDATES:
        try:
            text = sample.decode(enc)
        except (UnicodeDecodeError, LookupError):
            continue
        hi = [c for c in text if ord(c) >= 0x80]
        if not hi:
            continue
        if enc in ("koi8-r", "cp1251") and len(hi) < 0.4 * max(
            1, sum(1 for c in text if not c.isspace())
        ):
            # single-byte Cyrillic decodes ANY byte stream; require the
            # page to actually be dominated by high bytes (Russian text
            # is) so sparse Latin-1 accents don't trip the sniffer
            continue
        weighted = sum(
            next((wt for wt, lo, hi_ in ranges if lo <= ord(c) <= hi_), 0.0)
            for c in hi
        )
        score = weighted / len(hi)
        if enc in ("koi8-r", "cp1251"):
            # both decode every byte to mostly-Cyrillic; the correct one
            # yields common Russian letters, the wrong one rare ones
            common = sum(1 for c in hi if c in _CYRILLIC_COMMON)
            score *= common / len(hi)
        else:
            # repetition evidence: natural text reuses its characters,
            # wrong-codec CJK garble is near-uniform (few repeats)
            rep = 1.0 - len(set(hi)) / len(hi)
            score *= min(1.0, 0.5 + rep)
        if score > best_score:
            best_enc, best_score = enc, score
    return best_enc if best_score >= 0.4 else None


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
        sniffed = _sniff_statistical(body)
        return sniffed if sniffed else "iso8859-1"


def decode_text(body: bytes, content_type_raw: str = "") -> tuple[str, str]:
    """Tolerantly decode ``body`` → (text, encoding_used)."""
    enc = detect_charset(body, content_type_raw)
    try:
        return body.decode(enc, errors="replace"), enc
    except (LookupError, ValueError):  # pragma: no cover - _valid_codec gates
        return body.decode("iso8859-1", errors="replace"), "iso8859-1"
