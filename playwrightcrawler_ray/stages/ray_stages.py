"""Ray Data ``map_batches`` stage functions for the crawl wave.

Stages are *stateless task* functions (not actor pools) built by
factories that close over broadcast object refs and actor handles.
Rationale: a crawl runs many short waves; per-wave actor-pool startup
(~0.5 s × pool × stage × wave) would dominate. Worker *processes*
persist across tasks, so per-process state (corpus dict, compiled regex
tables) lives in module-level caches — same amortization as an actor
``__init__``, without pool churn. The NSFW-style scorer stage
(stages/nsfw.py) shows the true actor-pool pattern where per-worker
state is a loaded model.

Batch format is pyarrow end-to-end; per-row Python runs only where the
work is inherently per-document (HTML parse, image decode) — the
reference's hot path is the same shape (SURVEY.md §2.2 M15-M23).
"""

from __future__ import annotations

from collections import defaultdict

import pyarrow as pa
import pyarrow.compute as pc

import ray

from ..config import CrawlConfig
from ..core.schemas import UNIFIED_SCHEMA
from ..state.frontier import shard_of
from .process import ProcessContext, process_fetched, process_image_payload

TRANSIT_SCHEMA = UNIFIED_SCHEMA.append(pa.field("body", pa.binary()))

_OBJ_CACHE: dict[str, object] = {}
_CTX_CACHE: dict[str, ProcessContext] = {}


def _cached_get(ref):
    key = ref.hex()
    if key not in _OBJ_CACHE:
        _OBJ_CACHE[key] = ray.get(ref)
    return _OBJ_CACHE[key]


def _ctx_for(cfg: CrawlConfig) -> ProcessContext:
    key = repr(cfg)
    if key not in _CTX_CACHE:
        _CTX_CACHE[key] = ProcessContext(cfg)
    return _CTX_CACHE[key]


def make_fetch_fn(corpus_ref):
    """Wave-input batch (url, host, wave) → + status/content_type_raw/
    body/redirect_to, resolved against the broadcast corpus."""

    def fetch(batch: pa.Table) -> pa.Table:
        pages: dict[str, dict] = _cached_get(corpus_ref)
        status, ctype, body, redirect = [], [], [], []
        for u in batch.column("url").to_pylist():
            rec = pages.get(u)
            if rec is None:
                status.append(404); ctype.append(""); body.append(b""); redirect.append("")
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

    return fetch


def make_parse_fn(cfg: CrawlConfig, frontier_handles: list):
    """Fetched batch → unified page/imgref rows; discovered links are
    offered to the frontier shards from inside the task (one RPC per
    shard per batch, awaited → the wave barrier is exact when the
    pipeline completes)."""
    num_shards = len(frontier_handles)

    def parse(batch: pa.Table) -> pa.Table:
        ctx = _ctx_for(cfg)
        rows_out: list[dict] = []
        offers_by_shard: dict[int, list] = defaultdict(list)
        cols = batch.select(
            ["url", "host", "wave", "status", "content_type_raw", "body",
             "redirect_to"]
        ).to_pylist()
        for r in cols:
            content_rows, offers, imgrefs = process_fetched(
                r["url"], r["host"], int(r["wave"]), int(r["status"]),
                r["content_type_raw"], r["body"] or b"", r["redirect_to"], ctx,
            )
            rows_out.extend(content_rows)
            rows_out.extend(imgrefs)
            for off in offers:
                offers_by_shard[shard_of(off[2], num_shards)].append(off)
        if offers_by_shard:
            ray.get(
                [
                    frontier_handles[s].offer.remote(items)
                    for s, items in offers_by_shard.items()
                ]
            )
        return pa.Table.from_pylist(rows_out, schema=TRANSIT_SCHEMA)

    return parse


def make_imgfetch_fn(corpus_ref):
    """Fill missing bodies of imgref rows from the corpus (subresource
    fetch; the reference's response-listener path, :5174-5185)."""

    def imgfetch(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        pages: dict[str, dict] = _cached_get(corpus_ref)
        kinds = batch.column("kind").to_pylist()
        urls = batch.column("url").to_pylist()
        bodies = batch.column("body").to_pylist()
        changed = False
        for i, (k, u, b) in enumerate(zip(kinds, urls, bodies)):
            if k == "imgref" and b is None:
                rec = pages.get(u)
                bodies[i] = (
                    rec["body"] if rec is not None and rec["status"] == 200 else b""
                )
                changed = True
        if not changed:
            return batch
        idx = batch.schema.get_field_index("body")
        return batch.set_column(idx, "body", pa.array(bodies, pa.binary()))

    return imgfetch


def make_decode_fn(cfg: CrawlConfig, dedup_handles: list):
    """imgref rows → decoded content doc + (if first sighting of the
    pixel hash, per the global DedupShard service) the image row; page
    rows pass through untouched. Output schema: UNIFIED (transit body
    dropped)."""
    num_shards = len(dedup_handles)

    def decode(batch: pa.Table) -> pa.Table:
        ctx = _ctx_for(cfg)
        page_mask = pc.equal(batch.column("kind"), "page")
        passthrough = batch.filter(page_mask).drop_columns(["body"])
        img_part = batch.filter(pc.invert(page_mask))
        if img_part.num_rows == 0:
            return passthrough
        docs: list[dict] = []
        image_rows: list[dict] = []
        for r in img_part.select(
            ["url", "host", "parent_host", "wave", "caption", "body"]
        ).to_pylist():
            doc, img = process_image_payload(
                r["url"], r["host"], r["parent_host"] or r["host"],
                int(r["wave"]), r["caption"] or "", r["body"] or b"", ctx,
            )
            if doc:
                docs.append(doc)
            if img:
                image_rows.append(img)
        if image_rows:
            by_shard: dict[int, list[int]] = defaultdict(list)
            row_pos: dict[int, list[int]] = defaultdict(list)
            for i, row in enumerate(image_rows):
                h64 = int(row["pixel_sha1"][:16], 16)
                s = h64 % num_shards
                by_shard[s].append(h64)
                row_pos[s].append(i)
            masks = ray.get(
                [dedup_handles[s].add_many.remote(hs) for s, hs in by_shard.items()]
            )
            keep = set()
            for (s, _), mask in zip(by_shard.items(), masks):
                for pos, is_new in zip(row_pos[s], mask):
                    if is_new:
                        keep.add(pos)
            image_rows = [r for i, r in enumerate(image_rows) if i in keep]
        new_tbl = pa.Table.from_pylist(docs + image_rows, schema=UNIFIED_SCHEMA)
        return pa.concat_tables([passthrough, new_tbl])

    return decode
