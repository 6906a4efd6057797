"""Wave scheduling strategies — seeded, shared verbatim by the Ray
engine and the oracle simulator so both make identical draws.

Reproduces the reference's weighted frontier-poll strategy chooser
(``get_random_unvisited_domains``, playwrightcrawler.py:4427-4503) with
its METHOD_WEIGHTS (config.py:154-159):

- ``oldest``       — created_at-asc order (here: (wave, url) asc, :1360-1428)
- ``random``       — uniform sample of candidates (:1265-1357)
- ``host_prefix``  — random [a-z0-9] host prefix filter, ≤20 attempts
  (:1119-1220; the random-timestamp pivot is dropped — candidates here
  are already one-per-host heap heads)
- ``fewest_urls``  — a *ghost* strategy: the reference registers its
  weight but no function, so choosing it raises KeyError into a broad
  except and yields an empty round (:4482-4503). With
  ``reproduce_reference_bugs`` we reproduce that effective behavior;
  otherwise it degrades to ``oldest``.

All candidates are ``(wave_discovered, url, host)`` triples, already
merged across frontier shards and sorted ascending.
"""

from __future__ import annotations

import random

_PREFIX_ALPHABET = "abcdefghijklmnopqrstuvwxyz0123456789"
_MAX_PREFIX_ATTEMPTS = 20  # reference max_attempts (:1136)

Candidate = tuple[int, str, str]


def wave_rng(seed: int, wave: int) -> random.Random:
    """Deterministic per-wave RNG, identical in engine and oracle."""
    return random.Random((seed * 1_000_003 + wave) & 0x7FFFFFFFFFFF)


def choose_strategy(rng: random.Random, weights: dict[str, int]) -> str:
    names = list(weights.keys())
    return rng.choices(names, weights=[weights[n] for n in names], k=1)[0]


def apply_strategy(
    strategy: str,
    candidates: list[Candidate],
    size: int,
    rng: random.Random,
    reproduce_reference_bugs: bool = True,
) -> tuple[list[Candidate], list[Candidate]]:
    """Return (selected, leftover). ``candidates`` must be sorted asc."""
    if strategy == "fewest_urls":
        if reproduce_reference_bugs:
            return [], list(candidates)  # ghost strategy → empty round
        strategy = "oldest"
    if strategy == "oldest":
        return list(candidates[:size]), list(candidates[size:])
    if strategy == "random":
        pool = list(candidates)
        rng.shuffle(pool)
        selected = sorted(pool[:size])  # wave itself is processed in frontier order
        leftover = pool[size:]
        return selected, leftover
    if strategy == "host_prefix":
        for _ in range(_MAX_PREFIX_ATTEMPTS):
            c = rng.choice(_PREFIX_ALPHABET)
            matches = [cand for cand in candidates if cand[2].startswith(c)]
            if matches:
                selected = matches[:size]
                chosen = {cand[1] for cand in selected}  # urls are unique
                leftover = [cand for cand in candidates if cand[1] not in chosen]
                return selected, leftover
        return [], list(candidates)
    raise ValueError(f"unknown strategy {strategy!r}")
