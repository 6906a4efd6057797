"""Crawl output → training-ready image+caption table.

The north star's end product: the crawl's images table filtered and
deduplicated into what a multimodal training pipeline actually
consumes. Composes the engine's own operators over the wave partitions
— every stage a streaming ``map_batches``/groupby over the unified
Dataset, no driver materialization of row data:

1. **caption quality gate** — token-count bounds, language-ID match,
   alphanumeric ratio (functions/text heuristics, vectorized per
   batch);
2. **pixel-exact dedup** — already guaranteed upstream by the
   DedupShard claims (asserted here per batch, cheap);
3. **near-dup collapse** — dHash band buckets + Hamming radius
   (the phash_buckets kernel), keeping the minimum ``(wave, ord)``
   representative per near-dup cluster — the same deterministic
   winner rule the crawl itself uses;
4. **partitioned write** — one parquet directory per phash band
   bucket, so a failed export resumes per partition and a trainer
   shards reads without a shuffle.

Returns summary stats; the table lands under ``dest``.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .crawl import load_unified
from .export import _POPCNT8


def build_trainset(
    output_dir: str,
    dest: str,
    min_caption_tokens: int = 1,
    max_caption_tokens: int = 64,
    lang: str | None = None,
    near_dup_hamming: int = 4,
    band_bits: int = 16,
) -> dict:
    """Build the training table (see module docstring)."""
    from ..functions.text import detect_language

    ds = load_unified(
        output_dir,
        columns=["kind", "image_id", "bytes", "w", "h", "fmt", "caption",
                 "phash", "pixel_sha1", "wave", "ord"],
    )

    def gate(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("kind"), "image"))
        if t.num_rows == 0:
            return pa.table({c: [] for c in _TRAIN_COLS})
        # vectorized token count with str.split() semantics, Unicode
        # whitespace included (NBSP etc.): utf8_split_whitespace keeps
        # boundary empty parts, so count the NON-empty parts per row
        # via the list offsets (cumsum difference)
        caps_col = pc.fill_null(t.column("caption"), "")
        parts = pa.chunked_array(
            [pc.utf8_split_whitespace(caps_col)]
        ).combine_chunks()
        offs = parts.offsets.to_numpy()
        nonempty = pc.not_equal(parts.values, "").to_numpy(
            zero_copy_only=False).astype(np.int64)
        cs = np.r_[0, np.cumsum(nonempty)]
        n_tok = cs[offs[1:]] - cs[offs[:-1]]
        keep = (n_tok >= min_caption_tokens) & (n_tok <= max_caption_tokens)
        if lang is not None:
            caps = caps_col.to_pylist()
            keep &= np.array([detect_language(c) == lang for c in caps])
        t = t.filter(pa.array(keep))
        band = pc.bit_wise_and(
            pc.shift_right(t.column("phash"), 64 - band_bits),
            (1 << band_bits) - 1,
        )
        return pa.table(
            {
                "image_id": t.column("image_id"),
                "bytes": t.column("bytes"),
                "w": t.column("w"),
                "h": t.column("h"),
                "fmt": t.column("fmt"),
                "caption": t.column("caption"),
                "phash": t.column("phash"),
                "pixel_sha1": t.column("pixel_sha1"),
                "wave": t.column("wave"),
                "ord": t.column("ord"),
                "band": band,
            }
        )

    _TRAIN_COLS = ["image_id", "bytes", "w", "h", "fmt", "caption",
                   "phash", "pixel_sha1", "wave", "ord", "band"]

    def collapse_band(g: pd.DataFrame) -> pd.DataFrame:
        """Near-dup collapse inside one phash band: connected components
        under Hamming ≤ radius, keep min (wave, ord) per component —
        the crawl's deterministic winner rule."""
        # upstream pixel-exact dedup invariant: unique pixel hashes
        assert g["pixel_sha1"].is_unique, "pixel-exact dedup violated"
        if len(g) == 1:
            return g.drop(columns=["pixel_sha1"])
        ph = g["phash"].to_numpy().astype(np.int64).view(np.uint64)
        xor = ph[:, None] ^ ph[None, :]
        dist = np.zeros(xor.shape, dtype=np.int64)
        for _ in range(8):
            dist += _POPCNT8[(xor & np.uint64(0xFF)).astype(np.uint8)]
            xor = xor >> np.uint64(8)
        adj = dist <= near_dup_hamming
        # tiny union-find over the band group (bands are small)
        parent = list(range(len(g)))

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        ii, jj = np.nonzero(np.triu(adj, k=1))
        for a, b in zip(ii, jj):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        roots = np.array([find(i) for i in range(len(g))])
        order = np.lexsort((g["ord"].to_numpy(), g["wave"].to_numpy()))
        keep_idx = {}
        for i in order:
            keep_idx.setdefault(roots[i], i)
        return g.iloc[sorted(keep_idx.values())].drop(columns=["pixel_sha1"])

    shutil.rmtree(dest, ignore_errors=True)
    final = (
        ds.map_batches(gate, batch_format="pyarrow")
        .groupby("band")
        .map_groups(collapse_band, batch_format="pandas")
    )
    # partitioned resumable layout: one directory per band bucket
    final.write_parquet(dest, partition_cols=["band"])
    out = pa.parquet.read_table(dest, columns=["image_id", "w", "h"])
    return {
        "rows": out.num_rows,
        "dest": dest,
        "partitions": len(
            [d for d in os.listdir(dest) if d.startswith("band=")]
        ),
    }
