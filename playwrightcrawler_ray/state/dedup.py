"""Sharded exact-dedup service (pixel-hash seen set).

The reference collapses identical images by writing them to one
pixel-hash-named file (playwrightcrawler.py:3858). Here the decode
stage asks a pool of ``DedupShard`` actors "insert-if-absent" per
batch of 64-bit pixel hashes — one RPC per shard per batch, global
across waves, no shuffle in the image hot path (SURVEY.md §2.7 D4).
Shard routing is ``hash % num_shards`` on the pixel hash itself.
"""

from __future__ import annotations

import pickle

from .approxset import make_seen_set, restore_seen_set


class DedupShard:
    def __init__(self, shard_id: int = 0, mode: str = "exact",
                 capacity: int = 1 << 16):
        self.shard_id = shard_id
        self.seen = make_seen_set(mode, capacity)

    def add_many(self, hashes: list[int]) -> list[bool]:
        """True per item ⇔ first sighting (caller keeps those rows)."""
        return self.seen.add_many(hashes)

    def __len__(self) -> int:  # pragma: no cover - debugging aid
        return len(self.seen)

    def checkpoint(self) -> bytes:
        return pickle.dumps(
            {"shard_id": self.shard_id, "seen": self.seen.state()},
            protocol=pickle.HIGHEST_PROTOCOL,
        )

    def restore(self, blob: bytes) -> None:
        st = pickle.loads(blob)
        self.shard_id = st["shard_id"]
        self.seen = restore_seen_set(st["seen"])
