"""Mutable crawl state, held in Ray actors: the sharded URL frontier
(per-host priority queues + politeness budgets + robots rules + the
URL-seen filter) and generic dedup shards (pixel-hash seen set).

Datasets stay immutable; every mutation lives here (SURVEY.md §7.0).
"""

from .approxset import BloomFilter, CuckooFilter, ExactSet, make_seen_set
from .robots import RobotsRules

__all__ = ["BloomFilter", "CuckooFilter", "ExactSet", "make_seen_set", "RobotsRules"]
