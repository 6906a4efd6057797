"""Property fuzz for the mergeable-sketch kernels (ops/sketch.py):
the guarantees must hold on ADVERSARIAL streams, not just the test
corpus — duplicates, constant runs, tiny/huge magnitudes, many or few
merge boundaries."""

from __future__ import annotations

import collections

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from playwrightcrawler_ray.ops.sketch import (
    HLL_M,
    QuantileSketch,
    hll_estimate,
    hll_merge,
    hll_update,
    mg_reduce,
)


@settings(max_examples=60, deadline=None)
@given(
    vals=st.lists(
        st.floats(allow_nan=False, allow_infinity=False, width=32),
        min_size=1, max_size=1500,
    ),
    k=st.sampled_from([4, 16, 64]),
    splits=st.integers(1, 6),
)
def test_quantile_sketch_certificate_fuzz(vals, k, splits):
    data = np.asarray(vals, dtype=np.float64)
    chunks = np.array_split(data, min(splits, len(data)))
    sketches = []
    for c in chunks:
        sk = QuantileSketch(k)
        sk.add(c)
        sketches.append(sk)
    m = sketches[0]
    for s in sketches[1:]:
        m.merge(s)
    assert m.n == len(data)
    total_w = sum(len(v) * (1 << lvl) for lvl, v in enumerate(m.levels))
    assert total_w == len(data)  # exact weight conservation, always
    srt = np.sort(data)
    bound = m.err + m.max_weight()
    for q in (0.0, 0.1, 0.5, 0.9, 1.0):
        est = m.quantile(q)
        assert est in data  # percentile_disc: a stored input value
        lo = np.searchsorted(srt, est, side="left")
        hi = np.searchsorted(srt, est, side="right")
        target = q * len(data)
        assert lo - bound <= target <= hi + bound


@settings(max_examples=60, deadline=None)
@given(
    words=st.lists(st.integers(0, 200), min_size=1, max_size=3000),
    k=st.sampled_from([2, 8, 32]),
    splits=st.integers(1, 5),
)
def test_misra_gries_guarantee_fuzz(words, k, splits):
    """MG invariants on arbitrary integer streams: cumulative
    decrement D <= N/(k+1); estimates in [true-D, true]; any item
    with true count > D survives the merge."""
    arr = np.asarray(words, dtype=np.int64)
    truth = collections.Counter(arr.tolist())
    merged: collections.Counter = collections.Counter()
    delta = 0
    for chunk in np.array_split(arr, min(splits, len(arr))):
        if not len(chunk):
            continue
        v, c = np.unique(chunk, return_counts=True)
        w, cc, d = mg_reduce(v.astype(object), c.astype(np.int64), k)
        delta += d
        for wi, ci in zip(w, cc):
            merged[wi] += int(ci)
    w, cc, d = mg_reduce(np.array(list(merged), dtype=object),
                         np.array(list(merged.values()), dtype=np.int64), k)
    delta += d
    assert delta <= len(arr) // (k + 1)
    est = dict(zip(w, cc))
    assert len(est) <= k
    for wi, ci in est.items():
        assert ci <= truth[wi] <= ci + delta
    for wi, ti in truth.items():
        if ti > delta:
            assert wi in est


@settings(max_examples=20, deadline=None)
@given(
    n=st.integers(1, 5000),
    seed=st.integers(0, 2**31),
    splits=st.integers(1, 4),
)
def test_hll_merge_equals_single_stream_fuzz(n, seed, splits):
    """Merging per-chunk sketches must give the IDENTICAL registers
    (hence identical estimate) as one sketch over the whole stream —
    the mergeability property itself, not just accuracy."""
    rng = np.random.default_rng(seed)
    keys = rng.integers(0, 2**62, size=n, dtype=np.int64)
    whole = np.zeros(HLL_M, dtype=np.uint8)
    hll_update(whole, keys)
    merged = np.zeros(HLL_M, dtype=np.uint8)
    for chunk in np.array_split(keys, splits):
        part = np.zeros(HLL_M, dtype=np.uint8)
        if len(chunk):
            hll_update(part, chunk)
        merged = hll_merge(merged, part)
    assert np.array_equal(whole, merged)
    n_distinct = len(np.unique(keys))
    est = hll_estimate(merged)
    tol = 6 * 1.04 / np.sqrt(HLL_M)
    assert abs(est - n_distinct) <= max(tol * n_distinct, 3)


@settings(max_examples=60, deadline=None)
@given(
    stream=st.lists(
        st.tuples(st.integers(0, 40), st.integers(1, 1000)),
        min_size=1, max_size=800,
    ),
    splits=st.integers(1, 6),
)
def test_cms_overestimate_and_linear_merge_fuzz(stream, splits):
    """Count-min guarantees on adversarial streams: (a) estimates
    NEVER undercount, (b) merging shard sketches by addition is
    bit-identical to sketching the whole stream (linearity)."""
    from playwrightcrawler_ray.ops.sketch import (
        CMS_D, CMS_W, cms_estimate, cms_update,
    )

    words = np.array([f"w{i}" for i, _ in stream], dtype=object)
    counts = np.array([c for _, c in stream], dtype=np.int64)
    keys = np.array(
        [int.from_bytes(__import__("hashlib").blake2b(
            w.encode(), digest_size=8).digest(), "big") for w in words],
        dtype=np.uint64)

    single = np.zeros((CMS_D, CMS_W), dtype=np.int64)
    cms_update(single, keys, counts)

    merged = np.zeros((CMS_D, CMS_W), dtype=np.int64)
    for idx in np.array_split(np.arange(len(words)), splits):
        shard = np.zeros((CMS_D, CMS_W), dtype=np.int64)
        cms_update(shard, keys[idx], counts[idx])
        merged += shard
    assert np.array_equal(merged, single)

    true = collections.Counter()
    for (i, _), c in zip(stream, counts):
        true[f"w{i}"] += int(c)
    uniq = np.array(sorted(true), dtype=object)
    uk = np.array(
        [int.from_bytes(__import__("hashlib").blake2b(
            w.encode(), digest_size=8).digest(), "big") for w in uniq],
        dtype=np.uint64)
    est = cms_estimate(single, uk)
    for w, e in zip(uniq, est):
        assert int(e) >= true[w]


def test_words_topk_cms_vs_exact(ray_session):
    """Driver-shaped check on the corpus: every CMS estimate bounds
    its true count from above, and at sf0.001 (token count << CMS_W
    collision regime) the sketch ranking reproduces the exact top-k."""
    import pandas as pd

    from playwrightcrawler_ray.ops.sketch import q_words_topk_cms
    from playwrightcrawler_ray.ops.textstats import q_words_topk

    sf = "/root/testdata/sf0.001"
    got = q_words_topk_cms(sf, k=10)
    exact = q_words_topk(sf, k=10)

    true = (
        pd.read_parquet(f"{sf}/documents.parquet", columns=["text"])["text"]
        .str.split().explode().dropna().value_counts()
    )
    for w, e in zip(got["word"], got["est"]):
        assert int(e) >= int(true.get(w, 0))
    assert list(got["word"]) == list(exact["word"])
    assert (got["est"].to_numpy() >= exact["cnt"].to_numpy()).all()
