"""Sharded exact-dedup service (pixel-hash + subresource-URL seen set).

The reference collapses identical images by writing them to one
pixel-hash-named file (playwrightcrawler.py:3858). Here the decode
stage asks a pool of ``DedupShard`` actors per batch of 64-bit hashes —
one RPC per shard per batch, global across waves, no shuffle in the
image hot path (SURVEY.md §2.7 D4). Shard routing is
``hash % num_shards`` on the hash itself.

Two-phase wave protocol (deterministic winners): within a wave, tasks
call ``stage_many`` which answers "was this hash seen in any PRIOR
wave?" and records the claim — every in-wave claimant of a new hash is
kept provisionally, so parallel-batch RPC arrival order never decides
the surviving row. At the wave's write barrier the driver calls
``commit_wave``, which folds the claims into the persistent set and
returns the hashes claimed more than once this wave; the driver then
resolves those few conflicts deterministically by the rows' ``ord``
lineage key (pipelines/crawl.py). ``add_many`` (claim-wins-immediately)
remains for callers that only need the hash set, not row attributes.
"""

from __future__ import annotations

import pickle

from .approxset import make_seen_set, restore_seen_set


class DedupShard:
    def __init__(self, shard_id: int = 0, mode: str = "exact",
                 capacity: int = 1 << 16):
        self.shard_id = shard_id
        self.seen = make_seen_set(mode, capacity)
        self.pending: dict[int, int] = {}  # in-wave claims: hash -> count

    def add_many(self, hashes: list[int]) -> list[bool]:
        """True per item ⇔ first sighting (caller keeps those rows)."""
        return self.seen.add_many(hashes)

    def stage_many(self, hashes: list[int]) -> list[bool]:
        """Wave-scoped claim: True ⇔ not seen in any PRIOR wave. All
        in-wave claimants of a new hash get True; duplicates are
        resolved at commit_wave by the driver."""
        out = []
        for h in hashes:
            h = int(h)
            self.pending[h] = self.pending.get(h, 0) + 1
            out.append(h not in self.seen)
        return out

    def commit_wave(self) -> list[int]:
        """Fold this wave's claims into the persistent set; return the
        hashes that were claimed ≥2 times AND were new this wave (the
        only ones whose surviving row is ambiguous)."""
        conflicts = [
            h for h, c in self.pending.items() if c >= 2 and h not in self.seen
        ]
        for h in self.pending:
            self.seen.add_if_absent(h)
        self.pending.clear()
        return conflicts

    def __len__(self) -> int:  # pragma: no cover - debugging aid
        return len(self.seen)

    def checkpoint(self) -> bytes:
        # called at the wave barrier, after commit_wave → pending empty
        return pickle.dumps(
            {"shard_id": self.shard_id, "seen": self.seen.state()},
            protocol=pickle.HIGHEST_PROTOCOL,
        )

    def restore(self, blob: bytes) -> None:
        st = pickle.loads(blob)
        self.shard_id = st["shard_id"]
        self.seen = restore_seen_set(st["seen"])
        self.pending = {}
