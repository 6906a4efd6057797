"""Content-type sanitization + routing.

The reference routes every fetched resource through a first-match regex
registry of ~15 category groups totalling ~770 patterns
(playwrightcrawler.py:168-958 for the tables, :2420-2455 for the
registry, :5112-5127 for the dispatch loop). Here the same routing is a
single **vectorized** stage: one precompiled alternation per category,
evaluated in registry order over an Arrow string column; the first
matching category wins. The pattern tables below are a condensed but
functionally representative subset of the reference's groups (the full
770-pattern battery is mostly long-tail typo variants of the same MIME
types); ``CATEGORY_PATTERNS`` is plain data, so widening a group is a
config change, not a code change — the same extension surface the
reference documents in README.md:203-212.

Octet-stream handling follows USE_OCTET_STREAM (config.py:186;
reference :940-958): the octet-stream patterns are appended to every
*binary* category's alternation so an ``application/octet-stream``
response claimed by an extension-mapped category routes there.
"""

from __future__ import annotations

import re

import numpy as np

_SANITIZE_RE = re.compile(r'^\s*(?:content-type:)?\s*"?\'?', re.I)


def sanitize_content_type(raw: str) -> str:
    """MIME cleanup (reference sanitize_content_type, :4073-4103): strip
    quotes, a ``Content-Type:`` prefix, parameters after ``;`` and
    surrounding whitespace."""
    if not raw:
        return ""
    ct = raw.strip().strip("\"'")
    ct = re.sub(r"^content-type:\s*", "", ct, flags=re.I)
    ct = ct.split(";", 1)[0].strip().strip("\"'")
    return ct


# Octet-stream aliases (reference content_type_octetstream, :168-187).
OCTETSTREAM_PATTERNS = [
    r"^text/octet$",
    r"^octet/stream$",
    r"^application/stream$",
    r"^binary/octet-stream$",
    r"^application/download$",
    r"^application/x-download$",
    r"^application/octetstream$",
    r"^application/octet-stream$",
    r"^application/x-octet-stream$",
    r"^x-application/octet-stream$",
    r"^application/force-download$",
]

# Category → representative patterns, in the reference's registration
# order (first match wins). Reference group tables: html :189-203, plain
# :205-348, image :353-494, midi :496-499, audio :501-538, video
# :540-572, pdf :574-585, comic :588-593, doc :596-630, database
# :632-637, font :639-683, torrent :685-687, compressed :689-718,
# catch-all :720-938.
CATEGORY_PATTERNS: list[tuple[str, list[str]]] = [
    (
        "html",
        [
            r"^text/html$",
            r"^application/html$",
            r"^application/x-php$",
            r"^text/html,.*",
            r"^text/x-html-fragment$",
            r"^text/fragment\+html$",
            r"^application/xhtml\+xml$",
            r"^text/htmltext/html.*$",
        ],
    ),
    (
        "plain_text",
        [
            r"^text$",
            r"^json$",
            r"^\.js$",
            r"^text/plain$",
            r"^text/\*$",
            r"^text/js$",
            r"^text/xml$",
            r"^text/css$",
            r"^text/csv$",
            r"^text/srt$",
            r"^text/rtf$",
            r"^text/vtt$",
            r"^text/markdown$",
            r"^text/x-.*$",
            r"^text/javascript$",
            r"^application/json$",
            r"^application/ld\+json$",
            r"^application/xml$",
            r"^application/rss\+xml$",
            r"^application/atom\+xml$",
            r"^application/javascript$",
            r"^application/x-javascript$",
            r"^application/manifest\+json$",
        ],
    ),
    (
        "image",
        [
            r"^image/.*$",
            r"^img/jpeg$",
            r"^image$",
            r"^application/jpg$",
            r"^application/png$",
            r"^application/x-png$",
            r"^application/image.*$",
            r"^text/image/.*$",
        ],
    ),
    ("midi", [r"^audio/midi$", r"^audio/x-midi$", r"^music/crescendo$"]),
    (
        "audio",
        [
            r"^audio/.*$",
            r"^application/ogg$",
            r"^application/x-flac$",
            r"^application/mp3$",
        ],
    ),
    (
        "video",
        [
            r"^video/.*$",
            r"^application/mp4$",
            r"^application/x-mpegurl$",
            r"^application/vnd\.apple\.mpegurl$",
        ],
    ),
    ("pdf", [r"^application/pdf$", r"^application/x-pdf$", r"^adobe/pdf$", r"^pdf$"]),
    (
        "comic",
        [r"^application/x-cbr$", r"^application/x-cbz$", r"^application/x-cb7$"],
    ),
    (
        "doc",
        [
            r"^application/msword$",
            r"^application/vnd\.ms-.*$",
            r"^application/vnd\.openxmlformats-officedocument\..*$",
            r"^application/vnd\.oasis\.opendocument\..*$",
            r"^application/rtf$",
            r"^application/epub\+zip$",
        ],
    ),
    (
        "database",
        [r"^application/x-sqlite3$", r"^application/vnd\.sqlite3$", r"^application/sql$"],
    ),
    (
        "font",
        [
            r"^font/.*$",
            r"^application/font-.*$",
            r"^application/x-font.*$",
            r"^application/vnd\.ms-fontobject$",
        ],
    ),
    ("torrent", [r"^application/x-bittorrent$"]),
    (
        "compressed",
        [
            r"^application/zip$",
            r"^application/gzip$",
            r"^application/x-gzip$",
            r"^application/x-tar$",
            r"^application/x-7z-compressed$",
            r"^application/x-rar-compressed$",
            r"^application/x-bzip2?$",
            r"^application/x-xz$",
            r"^application/x-zip-compressed$",
            r"^application/vnd\.rar$",
        ],
    ),
]

# Binary categories that also claim octet-stream aliases when
# USE_OCTET_STREAM is on (reference :940-958).
_OCTET_CATEGORIES = {
    "image",
    "midi",
    "audio",
    "video",
    "pdf",
    "comic",
    "doc",
    "database",
    "font",
    "torrent",
    "compressed",
}


class ContentTypeRouter:
    """First-match category router, vectorized over a string array.

    ``use_octet_stream`` appends the octet-stream alias patterns to each
    binary category — after that, dispatch for those MIMEs is decided by
    the *extension map* upstream, mirroring the reference's
    HEAD-validate flow (:4794-4829).
    """

    OTHER = "other"

    def __init__(self, use_octet_stream: bool = True, extra: dict | None = None):
        self.categories: list[str] = []
        self._compiled: list[re.Pattern] = []
        tables = list(CATEGORY_PATTERNS)
        if extra:
            tables += list(extra.items())
        for name, pats in tables:
            pats = list(pats)
            if use_octet_stream and name in _OCTET_CATEGORIES:
                pats = pats + OCTETSTREAM_PATTERNS
            self.categories.append(name)
            self._compiled.append(
                re.compile("|".join(f"(?:{p})" for p in pats), re.I)
            )

    def route_one(self, content_type: str) -> str:
        ct = sanitize_content_type(content_type)
        for name, pat in zip(self.categories, self._compiled):
            if pat.match(ct):
                return name
        return self.OTHER

    def route_array(self, content_types) -> np.ndarray:
        """Vectorized routing with a per-batch memo: real batches contain
        a handful of distinct MIME strings, so we match uniques only."""
        arr = np.asarray(content_types, dtype=object)
        uniques, inverse = np.unique(arr.astype(str), return_inverse=True)
        routed = np.array([self.route_one(u) for u in uniques], dtype=object)
        return routed[inverse]


# Extension → expected category (reference EXTENSION_MAP, :969-1080 —
# ~95 entries mapping file extensions to the regex group a HEAD probe
# should confirm; condensed to category names here).
EXTENSION_MAP: dict[str, str] = {
    "html": "html", "htm": "html", "php": "html", "asp": "html", "aspx": "html",
    "txt": "plain_text", "json": "plain_text", "xml": "plain_text",
    "css": "plain_text", "js": "plain_text", "csv": "plain_text", "md": "plain_text",
    "jpg": "image", "jpeg": "image", "png": "image", "gif": "image",
    "webp": "image", "bmp": "image", "ico": "image", "svg": "image", "tiff": "image",
    "mid": "midi", "midi": "midi",
    "mp3": "audio", "ogg": "audio", "wav": "audio", "flac": "audio", "m4a": "audio",
    "mp4": "video", "mkv": "video", "avi": "video", "webm": "video", "mov": "video",
    "pdf": "pdf",
    "cbr": "comic", "cbz": "comic",
    "doc": "doc", "docx": "doc", "xls": "doc", "xlsx": "doc", "ppt": "doc",
    "pptx": "doc", "odt": "doc", "epub": "doc", "rtf": "doc",
    "db": "database", "sqlite": "database", "sql": "database",
    "ttf": "font", "otf": "font", "woff": "font", "woff2": "font", "eot": "font",
    "torrent": "torrent",
    "zip": "compressed", "gz": "compressed", "tar": "compressed", "tgz": "compressed",
    "bz2": "compressed", "xz": "compressed", "7z": "compressed", "rar": "compressed",
}
