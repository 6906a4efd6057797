"""Fast extension pass (reference run_fast_extension_pass,
playwrightcrawler.py:4597-4902, §3.3): the browserless high-throughput
path — candidates whose URL *looks* like a file with a known extension
get a cheap HEAD probe; if the served content-type matches the
extension's expected category the resource is handled metadata-only
(body fetched only when that category's download flag is on);
mismatch/unknown falls back to the full fetch path.

Ray mapping: this is a scheduler-side fetch *plan* — a vectorized
splitter over frontier pops. ``plan_fast_pass`` partitions a wave into
(fast candidates, full-path URLs); ``head_validate`` is the per-batch
probe + validation (against the corpus index here; an async HEAD pool
on a real deployment).

The reference's save-batch bug at :4766 (passes a list where a dict is
expected, so the aggregate save is dead code and results persist only
per-URL inside the worker) is documented-and-diverged: our results
flow through the normal wave sink (SURVEY.md §7.4 item 6).
"""

from __future__ import annotations

from urllib.parse import urlsplit

from ..functions.content_types import (
    EXTENSION_MAP,
    ContentTypeRouter,
    sanitize_content_type,
)
from ..urlkit.levels import file_extension_of


def plan_fast_pass(urls: list[str]) -> tuple[list[tuple[str, str]], list[str]]:
    """Split URLs into ([(url, expected_category)], [full-path urls])
    by extension lookup (reference candidate validation, :4709-4719)."""
    fast: list[tuple[str, str]] = []
    full: list[str] = []
    for u in urls:
        ext = file_extension_of(urlsplit(u).path)
        cat = EXTENSION_MAP.get(ext)
        if cat is not None:
            fast.append((u, cat))
        else:
            full.append(u)
    return fast, full


def head_validate(
    candidates: list[tuple[str, str]],
    content_type_of,  # url -> served content-type string (HEAD probe)
    router: ContentTypeRouter | None = None,
) -> tuple[list[tuple[str, str, str]], list[str]]:
    """Validate each candidate's served MIME against its expected
    category (reference :4803-4829). Returns
    (validated [(url, content_type, category)], fallback urls)."""
    router = router or ContentTypeRouter()
    validated: list[tuple[str, str, str]] = []
    fallback: list[str] = []
    for url, expected in candidates:
        raw = content_type_of(url)
        if not raw:
            fallback.append(url)
            continue
        ct = sanitize_content_type(raw)
        if router.route_one(ct) == expected:
            validated.append((url, ct, expected))
        else:
            fallback.append(url)
    return validated, fallback
