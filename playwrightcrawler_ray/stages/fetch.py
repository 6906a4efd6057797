"""Fetch stage: resolve URLs against the broadcast synthetic corpus.

Replaces the reference's Playwright page fetch + httpx fallback
(playwrightcrawler.py:4926-5207). In this sealed sandbox "the network"
is the corpus dict, ``ray.put`` once by the driver and ``ray.get`` once
per actor in ``__init__`` — the broadcast-small-side pattern; the
object-store copy is shared per node, never re-shipped per batch. On a
real deployment this class holds a persistent async HTTP client instead
(same signature), with per-request timeouts; politeness is already
enforced upstream at frontier pop time, so fetch needs no cross-task
coordination (SURVEY.md §2.9).
"""

from __future__ import annotations

import pyarrow as pa

import ray


class CorpusFetcher:
    """``map_batches`` callable: input batch needs a ``url`` column;
    appends status/content_type/body/redirect_to.

    Requests carry a rotated User-Agent (reference T2: ``ua.random``
    per context/request, playwrightcrawler.py:4996/:4785/:5063) chosen
    deterministically per URL — ``functions/uapool.pick_user_agent`` —
    so reruns are reproducible. The corpus "server" ignores the header;
    ``ua_counts`` exposes the rotation for observability/tests."""

    def __init__(self, corpus_ref):
        from collections import Counter

        # one object-store read per actor, zero-copy shared on the node
        self.pages: dict[str, dict] = ray.get(corpus_ref)
        self.ua_counts: Counter[str] = Counter()

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.uapool import pick_user_agent

        urls = batch.column("url").to_pylist()
        status, ctype, body, redirect = [], [], [], []
        for u in urls:
            self.ua_counts[pick_user_agent(u)] += 1  # request header
            rec = self.pages.get(u)
            if rec is None:
                status.append(404)
                ctype.append("")
                body.append(b"")
                redirect.append("")
            else:
                status.append(rec["status"])
                ctype.append(rec["content_type"])
                body.append(rec["body"] if rec["status"] == 200 else b"")
                redirect.append(rec.get("redirect_to") or "")
        return (
            batch.append_column("status", pa.array(status, pa.int32()))
            .append_column("content_type_raw", pa.array(ctype, pa.string()))
            .append_column("body", pa.array(body, pa.binary()))
            .append_column("redirect_to", pa.array(redirect, pa.string()))
        )
