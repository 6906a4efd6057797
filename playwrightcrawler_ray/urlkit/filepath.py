"""Traversal-proof file paths from URLs (reference
downloader.py:167-209 ``safe_filepath_from_url``).

Pure function here (no mkdir side effects — the sink creates
directories); semantics match the reference step for step:

1. directories gain ``index.html``;
2. a query string is percent-encoded and folded into the filename
   before the extension (collision avoidance);
3. leading slashes are stripped, Windows-unsafe characters replaced;
4. the joined path is normalized, and anything that still escapes the
   output root is flattened into ``unsafe/<sanitized-name>``.
"""

from __future__ import annotations

import os
import re
from urllib.parse import quote, urlsplit

_UNSAFE_RE = re.compile(r"[<>:\"|?*]")
_FLATTEN_RE = re.compile(r"[^a-zA-Z0-9_.-]")


def safe_filepath_from_url(url: str, output_dir: str) -> str:
    """Safe, normalized, traversal-proof path under ``output_dir``."""
    parsed = urlsplit(url)
    host = parsed.hostname or "unknown"
    path = parsed.path or "/"
    query = parsed.query

    if path.endswith("/"):
        path += "index.html"

    if query:
        safe_query = quote(query, safe="")
        base, ext = os.path.splitext(path)
        path = f"{base}_{safe_query}{ext or '.html'}"

    path = path.lstrip("/")
    safe_path = _UNSAFE_RE.sub("_", path)

    output_dir = os.path.abspath(output_dir)
    normalized = os.path.normpath(os.path.join(output_dir, host, safe_path))
    try:
        inside = os.path.commonpath([normalized, output_dir]) == output_dir
    except ValueError:  # different drives / mixed absolute forms
        inside = False
    if not inside:
        safe_name = _FLATTEN_RE.sub("_", f"{host}_{path}")
        normalized = os.path.join(output_dir, "unsafe", safe_name)
    return normalized
