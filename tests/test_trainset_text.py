"""Text training-set builder (pipelines/trainset_text.py): determinism,
stage invariants on the written shards, and minhash-vs-exact agreement.
The full pipeline's value-level correctness is pinned by the
``docs_trainset_exact`` DuckDB oracle in test_queries_vs_duckdb.py."""

from __future__ import annotations

import os
import sys

import pandas as pd
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("PWC_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def built(ray_session):
    from playwrightcrawler_ray.pipelines.trainset_text import (
        build_text_trainset,
    )

    dest = "/tmp/pwc_tt_test"
    stats = build_text_trainset(SF_DIR, dest)
    return dest, stats


def test_determinism(ray_session, built):
    """Same input → byte-identical manifest on a re-run (LSH banding,
    contraction, and the sharded write are all seeded/deterministic)."""
    from playwrightcrawler_ray.pipelines.trainset_text import (
        build_text_trainset,
    )

    dest, stats = built
    dest2 = "/tmp/pwc_tt_test2"
    stats2 = build_text_trainset(SF_DIR, dest2)
    assert stats["rows"] == stats2["rows"]
    a = pq.read_table(dest).to_pandas().sort_values("doc_id").reset_index(
        drop=True
    )
    b = pq.read_table(dest2).to_pandas().sort_values("doc_id").reset_index(
        drop=True
    )
    pd.testing.assert_frame_equal(a, b)


def test_shard_layout_and_invariants(built):
    dest, stats = built
    # resumable layout: one directory per shard
    shards = [d for d in os.listdir(dest) if d.startswith("shard=")]
    assert stats["partitions"] == len(shards) > 1
    t = pq.read_table(dest).to_pandas()
    assert stats["rows"] == len(t) > 0
    # exact-dedup invariant: no two kept docs share identical text
    assert t["text"].is_unique
    # gate invariant: token bounds hold on every kept doc (the gate's
    # space-split convention)
    n_tok = t["text"].str.split(" ").map(len)
    assert (n_tok == t["n_tokens"]).all()
    assert ((t["n_tokens"] >= 5) & (t["n_tokens"] <= 10_000)).all()
    # quota invariant: no source exceeds the cap
    assert t.groupby("source").size().max() <= 20
    # shard stamp is doc_id % n_shards
    assert (t["shard"].astype(int) == t["doc_id"] % 8).all()


def test_minhash_refines_exact(ray_session, built):
    """MinHash-LSH edges are exact-verified (⊆ exact edges), so the
    minhash build's pre-cap keep set is a superset of the exact
    build's: every doc the exact pipeline keeps and caps in, the
    minhash pipeline may only drop via its own (smaller) edge set —
    no doc kept by minhash was dropped by exact without an edge."""
    from playwrightcrawler_ray.pipelines.trainset_text import (
        build_text_trainset,
    )

    dest, _ = built
    dest_e = "/tmp/pwc_tt_exact"
    build_text_trainset(SF_DIR, dest_e, edge_mode="exact")
    mh = set(pq.read_table(dest, columns=["doc_id"])["doc_id"].to_pylist())
    ex = set(pq.read_table(dest_e, columns=["doc_id"])["doc_id"].to_pylist())
    # minhash drops ⊆ exact drops pre-cap; after the per-source cap the
    # two manifests can differ only where minhash kept MORE docs of a
    # source — any doc in the exact manifest but missing from minhash's
    # must have been displaced by a smaller-id minhash-kept doc, not
    # near-dup-dropped
    only_exact = ex - mh
    if only_exact:
        t_mh = pq.read_table(dest, columns=["doc_id", "source"]).to_pandas()
        t_ex = pq.read_table(
            dest_e, columns=["doc_id", "source"]
        ).to_pandas()
        src_of = dict(zip(t_ex["doc_id"], t_ex["source"]))
        for d in only_exact:
            src = src_of[d]
            assert (
                (t_mh["source"] == src) & (t_mh["doc_id"] < d)
            ).sum() >= 20, f"doc {d} missing from minhash build uncapped"
