"""Seed-list file source (reference process_input_url_files, S6:
playwrightcrawler.py:3456-3554).

The reference picks a random file from INPUT_FOLDER, crawls its first
``MAX_URLS_FROM_FILE=100`` lines with tolerant decoding, and rewrites
the remainder. Ray-natively the whole folder is one
``ray.data.read_text`` → canonicalize/filter → frontier bootstrap; the
"remainder rewriting" bookkeeping disappears because the frontier's
seen-set makes re-offering idempotent.
"""

from __future__ import annotations

from urllib.parse import urlsplit

import ray.data

from ..config import CrawlConfig
from ..stages.process import ProcessContext
from ..urlkit.canonicalize import canonicalize_url


def seeds_from_files(
    input_dir: str,
    cfg: CrawlConfig | None = None,
    max_urls: int | None = None,
) -> list[str]:
    """Read seed URLs from text files (one URL per line, # comments and
    blanks skipped), canonicalize, admission-filter, and return the
    unique seed list in file order. ``max_urls`` mirrors
    MAX_URLS_FROM_FILE (None = no cap)."""
    ctx = ProcessContext(cfg or CrawlConfig())
    ds = ray.data.read_text(input_dir)
    seen: set[str] = set()
    out: list[str] = []
    for batch in ds.iter_batches(batch_size=4096, batch_format="pandas"):
        for line in batch["text"]:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            cu = canonicalize_url(line)
            host = urlsplit(cu).hostname
            if not host or not ctx.policy.admit(cu, host):
                continue
            if cu in seen:
                continue
            seen.add(cu)
            out.append(cu)
            if max_urls is not None and len(out) >= max_urls:
                return out
    return out
