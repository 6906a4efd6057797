"""Wave strategies + frontier sharding invariance (SURVEY.md §5.2)."""

from __future__ import annotations

from urllib.parse import urlsplit

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from playwrightcrawler_ray.pipelines.strategy import (
    apply_strategy,
    choose_strategy,
    wave_rng,
)
from playwrightcrawler_ray.state.frontier import FrontierShard, shard_of
from playwrightcrawler_ray.urlkit.ids import url_id_64

CANDS = [
    (0, "https://a.test/1", "a.test"),
    (0, "https://b.test/1", "b.test"),
    (1, "https://a.test/2", "a.test"),
    (1, "https://c.test/1", "c.test"),
    (2, "https://d.test/1", "d.test"),
]


def test_wave_rng_deterministic():
    assert wave_rng(42, 3).random() == wave_rng(42, 3).random()
    assert wave_rng(42, 3).random() != wave_rng(42, 4).random()


def test_choose_strategy_weighted_deterministic():
    weights = {"oldest": 1, "random": 5, "host_prefix": 10, "fewest_urls": 1}
    picks = [choose_strategy(wave_rng(1, w), weights) for w in range(200)]
    assert picks == [choose_strategy(wave_rng(1, w), weights) for w in range(200)]
    # all strategies get chosen over enough waves
    assert set(picks) == set(weights)


def test_oldest_strategy():
    sel, left = apply_strategy("oldest", CANDS, 3, wave_rng(1, 0))
    assert sel == CANDS[:3] and left == CANDS[3:]


def test_random_strategy_seeded():
    a = apply_strategy("random", CANDS, 3, wave_rng(9, 5))
    b = apply_strategy("random", CANDS, 3, wave_rng(9, 5))
    assert a == b
    assert len(a[0]) == 3 and len(a[1]) == 2
    assert a[0] == sorted(a[0])  # wave processed in frontier order


def test_host_prefix_strategy():
    # all hosts start with a-d; a seeded rng eventually picks one
    sel, left = apply_strategy("host_prefix", CANDS, 10, wave_rng(3, 7))
    if sel:  # a matching prefix was drawn within 20 attempts
        prefix = sel[0][2][0]
        assert all(c[2].startswith(prefix) for c in sel)
        assert len(sel) + len(left) == len(CANDS)
    else:
        assert left == CANDS


def test_fewest_urls_ghost_strategy():
    # reproduce_reference_bugs=True → empty round (the reference's
    # unregistered-strategy KeyError path, playwrightcrawler.py:4482-4503)
    sel, left = apply_strategy("fewest_urls", CANDS, 3, wave_rng(1, 0), True)
    assert sel == [] and left == CANDS
    # bug-fix mode degrades to oldest
    sel2, _ = apply_strategy("fewest_urls", CANDS, 3, wave_rng(1, 0), False)
    assert sel2 == CANDS[:3]


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from([f"host{i:02d}.test" for i in range(12)]),
            st.integers(min_value=0, max_value=999),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_pop_order_invariant_under_shard_count(items):
    """Merged frontier pops must be identical for any shard count —
    the determinism the oracle comparison relies on."""

    def run(num_shards: int):
        shards = [FrontierShard(i) for i in range(num_shards)]
        for host, n in items:
            url = f"https://{host}/p{n}"
            shards[shard_of(host, num_shards)].offer(
                [(url, url_id_64(url), host, urlsplit(url).path, 0)]
            )
        out = []
        wave = 0
        while True:
            cands = sorted(
                c for s in shards for c in s.pop_candidates(wave, per_host=1)
            )
            if not cands:
                break
            out.extend(cands)
            wave += 1
        return out

    assert run(1) == run(3) == run(8)
