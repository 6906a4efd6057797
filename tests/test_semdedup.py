"""SemDeDup (cluster-bucketed semantic dedup, ops/ann.py): the
approximation contract is (a) every within-cluster drop is a TRUE
global near-duplicate (drop-subset invariant — a theorem of the
construction, since a same-cluster witness is also a global witness),
(b) planted exact duplicates always collapse to the lowest vec_id
(identical vectors can never straddle clusters), and (c) recall of
the global drop set stays high when near-dup groups are tight."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from playwrightcrawler_ray.ops.ann import q_docs_semdedup

THRESH = 0.999
DUP_GROUPS = {0: [0, 31, 62], 7: [7, 44], 20: [20, 55, 71, 88]}


def _global_drops(mat: np.ndarray, ids: np.ndarray,
                  threshold: float) -> set[int]:
    """The exact (un-clustered) rule: drop i when any lower-id j has
    cosine >= threshold."""
    m = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    cos = m @ m.T
    order = np.argsort(ids, kind="stable")
    cos = cos[np.ix_(order, order)]
    drop = np.tril(cos >= threshold, -1).any(axis=1)
    return set(ids[order][drop].tolist())


@pytest.fixture(scope="module")
def planted_sf(tmp_path_factory):
    """Three well-separated clusters of noisy points + planted EXACT
    duplicate groups (ids in DUP_GROUPS share one identical vector)."""
    rng = np.random.default_rng(77)
    dim, per = 16, 32
    centers = np.zeros((3, dim))
    centers[0, 0] = centers[1, 1] = centers[2, 2] = 1.0
    vecs = np.empty((3 * per, dim))
    for i in range(3 * per):
        c = centers[i // per]
        vecs[i] = c + 0.12 * rng.standard_normal(dim)
    for base, members in DUP_GROUPS.items():
        for m in members:
            vecs[m] = vecs[base]
    d = tmp_path_factory.mktemp("semdedup")
    pq.write_table(
        pa.table({
            "vec_id": pa.array(range(3 * per), pa.int64()),
            "embedding": [v.tolist() for v in vecs],
        }),
        d / "embeddings.parquet",
    )
    return str(d), vecs


def test_semdedup_planted_duplicates_collapse(ray_session, planted_sf):
    sf, vecs = planted_sf
    out = q_docs_semdedup(sf, k=3, threshold=THRESH, seed=5)
    keep = dict(zip(out["vec_id"].astype(int), out["keep"]))
    for base, members in DUP_GROUPS.items():
        assert keep[min(members)], members
        for m in members:
            if m != min(members):
                assert not keep[m], (base, m)


def test_semdedup_drops_are_subset_of_global(ray_session, planted_sf):
    sf, vecs = planted_sf
    out = q_docs_semdedup(sf, k=3, threshold=THRESH, seed=5)
    ids = out["vec_id"].to_numpy().astype(int)
    got_drops = set(ids[~out["keep"].to_numpy()].tolist())
    glob = _global_drops(vecs, np.arange(len(vecs)), THRESH)
    assert got_drops <= glob, got_drops - glob
    # tight planted groups: the bucketed pass recovers the global set
    assert len(got_drops) >= int(0.9 * len(glob)) > 0


def test_semdedup_deterministic_and_partitions_rows(ray_session, planted_sf):
    sf, _ = planted_sf
    a = q_docs_semdedup(sf, k=3, threshold=THRESH, seed=5)
    b = q_docs_semdedup(sf, k=3, threshold=THRESH, seed=5)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) == 96                      # every vector exactly once
    assert a["vec_id"].is_unique
    # exact duplicates land in the same cluster by construction
    cl = dict(zip(a["vec_id"].astype(int), a["cluster"].astype(int)))
    for members in DUP_GROUPS.values():
        assert len({cl[m] for m in members}) == 1


def test_semdedup_runs_on_driver_tables(ray_session):
    out = q_docs_semdedup("/root/testdata/sf0.001", k=8, threshold=0.95)
    assert len(out) == 500
    assert set(out.columns) == {"vec_id", "cluster", "keep"}
    assert out["keep"].any()


def test_thumb_embedding_tiny_images_no_nan():
    """Images narrower/shorter than the 8-bucket thumbnail grid
    (1x1 tracking pixels are ubiquitous on the web) must embed to
    finite unit vectors — zero-sum buckets used to produce NaN and
    poison every k-means centroid they touched."""
    from playwrightcrawler_ray.pipelines.export import thumb_embedding

    rng = np.random.default_rng(7)
    for h, w in [(1, 1), (4, 16), (16, 4), (7, 7), (8, 8), (3, 40)]:
        v = thumb_embedding(rng.integers(0, 256, (h, w, 3), dtype=np.uint8))
        assert v.shape == (64,) and np.isfinite(v).all()
    # constant image: zero vector (norm guard), still finite
    v = thumb_embedding(np.full((2, 2, 3), 9, np.uint8))
    assert np.isfinite(v).all() and abs(float(np.linalg.norm(v))) < 1e-9
