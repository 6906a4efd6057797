"""Structural decomposition of URLs into indexable fields.

Host levels, directory levels, query decomposition, file extension and
the open-directory ancestor expansion — reference semantics:

- ``get_host_levels``: playwrightcrawler.py:1708-1750 — split on dots,
  port stripped. Field numbering follows preprocess (:1911-1916): the
  parts list is front-padded to ``max_levels`` and reversed so
  ``host_level_1`` is the TLD ("com"), ``host_level_2`` the registered
  domain, etc.
- ``get_directory_levels``: :1949-1995 — path segments end-padded to
  ``max_levels``; ``directory_level_1`` is the first path segment.
- ``decompose_query``: :1896-1908 — ``parse_qs`` keys/values.
- ``file_extension_of``: :1934-1937 — splitext of the unquoted path,
  lowercased, dot stripped.
- ``get_directory_tree``: :3941-3989 — all ancestor directory URLs,
  deepest first, used when hunting open directories.
"""

from __future__ import annotations

import posixpath
from urllib.parse import parse_qs, unquote, urlsplit


def get_host_levels(hostname: str, max_levels: int = 7) -> dict[str, str]:
    """Map ``host_level_1..N`` (1 = TLD) for a hostname; missing levels
    are empty strings. Ports are stripped first."""
    hostname = hostname.split(":")[0]
    parts = hostname.split(".")
    if len(parts) < max_levels:
        parts = [""] * (max_levels - len(parts)) + parts
    out = {}
    for i, part in enumerate(reversed(parts[-max_levels:])):
        out[f"host_level_{i + 1}"] = part
    return out


def get_directory_levels(path: str, max_levels: int = 7) -> dict[str, str]:
    """Map ``directory_level_1..N`` (1 = first path segment); padded with
    empty strings; deeper-than-N segments are dropped."""
    levels = [p for p in path.strip("/").split("/") if p]
    if len(levels) < max_levels:
        levels = levels + [""] * (max_levels - len(levels))
    return {f"directory_level_{i + 1}": levels[i] for i in range(max_levels)}


def decompose_query(query: str) -> tuple[bool, list[str], list[str]]:
    """Return (has_query, variable names, flattened values)."""
    if not query:
        return False, [], []
    qs = parse_qs(query)
    variables = list(qs.keys())
    values = [v for vals in qs.values() for v in vals]
    return True, variables, values


def file_extension_of(path: str) -> str:
    """Lowercased, dotless file extension of a URL path ("" if none)."""
    _, ext = posixpath.splitext(unquote(path))
    return ext.lower().lstrip(".") if ext else ""


def get_directory_tree(url: str) -> list[str]:
    """All ancestor directory URLs of ``url``, deepest → shallowest,
    excluding the URL itself and the bare host root. Query/fragment are
    dropped; the scheme+host prefix is preserved at every level."""
    try:
        parts = urlsplit(url)
        host = f"{parts.scheme}://{parts.netloc}"
        segs = [s for s in unquote(parts.path).split("/") if s]
        # reference builds from PurePosixPath.parts whose first element is
        # "/" for absolute paths; levels run over 1..len(parts)-1
        out = []
        for idx in range(1, len(segs) + 1):
            kept = segs[: len(segs) - idx]
            out.append(host + "/" + "/".join(kept) if kept else host + "/")
        # reference range stops before producing the bare root twice;
        # match its exact output: it yields len(parts)-1 entries where
        # parts includes the leading "/", i.e. len(segs) entries ending at
        # host + "/".
        return out
    except (ValueError, AttributeError):
        return []
