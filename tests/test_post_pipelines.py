"""Post-crawl pipelines: NSFW scorer actor pool, downloader filters,
phash buckets, analytics, admission verifier."""

from __future__ import annotations

import shutil

import pytest

from playwrightcrawler_ray.config import CrawlConfig
from playwrightcrawler_ray.corpus import build_corpus

OUT = "/tmp/pwc_post_out"


@pytest.fixture(scope="module")
def crawl_out(ray_session):
    from playwrightcrawler_ray.pipelines.crawl import run_crawl

    corpus = build_corpus(seed=43, n_hosts=8, pages_per_host=6)
    cfg = CrawlConfig(output_dir=OUT, max_waves=30)
    shutil.rmtree(OUT, ignore_errors=True)
    run_crawl(corpus, cfg)
    return OUT


def test_nsfw_scorer_actor_pool(crawl_out):
    from playwrightcrawler_ray.pipelines.crawl import load_images
    from playwrightcrawler_ray.stages.nsfw import NsfwScorer

    ds = load_images(crawl_out)
    scored = ds.map_batches(
        NsfwScorer, batch_format="pyarrow", batch_size=16,
        concurrency=2, num_cpus=1,
        fn_constructor_kwargs={"min_resolution": 16 * 16},
    ).to_pandas()
    assert "isnsfw" in scored.columns and "nsfw_flag" in scored.columns
    big = scored[scored["w"] * scored["h"] > 16 * 16]
    assert big["isnsfw"].notna().all()
    assert ((big["isnsfw"] >= 0) & (big["isnsfw"] <= 1)).all()
    # determinism: same rows → same scores
    again = (
        load_images(crawl_out)
        .map_batches(
            NsfwScorer, batch_format="pyarrow", batch_size=16,
            concurrency=2, num_cpus=1,
            fn_constructor_kwargs={"min_resolution": 16 * 16},
        )
        .to_pandas()
    )
    a = dict(zip(scored["image_id"], scored["isnsfw"].fillna(-1.0)))
    b = dict(zip(again["image_id"], again["isnsfw"].fillna(-1.0)))
    assert a == b


def test_filtered_urls(crawl_out):
    from playwrightcrawler_ray.pipelines.export import filtered_urls

    out = filtered_urls(crawl_out, include_ext=["^html$"], limit=10).to_pandas()
    assert 0 < len(out) <= 10
    assert (out["file_extension"] == "html").all()
    none = filtered_urls(crawl_out, include_host=["nonexistent\\.example"]).to_pandas()
    assert len(none) == 0


def test_phash_buckets(crawl_out):
    from playwrightcrawler_ray.pipelines.export import phash_buckets

    buckets = phash_buckets(crawl_out)
    # the corpus contains near-dup pairs (same pixels re-encoded / 1-bit
    # perturbed) whose dHashes share the top band
    assert (buckets["n_members"] >= 2).all()
    assert len(buckets) >= 1


def test_analytics_distributions(crawl_out):
    from playwrightcrawler_ray.pipelines.export import (
        dir_depth_histogram,
        host_level_counts,
    )

    hosts = host_level_counts(crawl_out, level=1)
    assert hosts["n_pages"].sum() > 0
    assert set(hosts[hosts["n_pages"] > 0][f"host_level_1"]) == {"test"}
    depths = dir_depth_histogram(crawl_out)
    assert depths["n"].sum() > 0


def test_consolidate_images(crawl_out, ray_session):
    import pyarrow.parquet as pq

    from playwrightcrawler_ray.core.schemas import IMAGES_COLUMNS
    from playwrightcrawler_ray.pipelines.crawl import consolidate_images, load_images

    dest = consolidate_images(crawl_out)
    tbl = pq.read_table(dest)
    assert tbl.schema.names == IMAGES_COLUMNS
    assert tbl.num_rows == load_images(crawl_out).count()
    assert tbl.num_rows > 0


def test_admission_verifier_empty(crawl_out):
    from playwrightcrawler_ray.pipelines.export import verify_admission_invariants

    violations = verify_admission_invariants(crawl_out)
    assert len(violations) == 0, violations.head()


def test_build_trainset(crawl_out, tmp_path):
    """End-to-end: crawl output → quality-gated, near-dup-collapsed,
    band-partitioned training table."""
    from playwrightcrawler_ray.pipelines.crawl import load_images
    from playwrightcrawler_ray.pipelines.trainset import build_trainset

    dest = str(tmp_path / "trainset")
    stats = build_trainset(crawl_out, dest, near_dup_hamming=4)
    assert stats["rows"] > 0 and stats["partitions"] >= 1
    import pyarrow.parquet as pq

    t = pq.read_table(dest)
    df = t.to_pandas()
    # schema: training columns + the band partition key
    assert {"image_id", "bytes", "w", "h", "fmt", "caption", "phash",
            "wave", "ord", "band"} <= set(df.columns)
    # strictly fewer-or-equal rows than the raw images table (near-dup
    # collapse: the corpus ships phash-close perturbed/alt-format pairs)
    raw = load_images(crawl_out).to_pandas()
    assert len(df) <= len(raw)
    # captions all pass the token gate
    assert df["caption"].str.split().str.len().between(1, 64).all()
    # determinism: rebuilding produces the identical id set
    dest2 = str(tmp_path / "trainset2")
    build_trainset(crawl_out, dest2, near_dup_hamming=4)
    df2 = pq.read_table(dest2).to_pandas()
    assert sorted(df["image_id"]) == sorted(df2["image_id"])


def test_bpe_learn_merges_matches_naive_reference(ray_session, tmp_path):
    """Distributed BPE merge learning must equal an independent naive
    implementation (per-word char loop, dict counting) on the same
    corpus — merge order, symbols, and pair counts exactly."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from playwrightcrawler_ray.ops.textstats import q_bpe_learn_merges

    texts = [
        "low low lower lowest",
        "new newer newest low",
        "wide wider widest new new",
    ]
    pq.write_table(
        pa.table({"doc_id": list(range(len(texts))), "text": texts}),
        tmp_path / "documents.parquet",
    )

    def naive(texts, n_merges):
        from collections import Counter

        wc = Counter(w for t in texts for w in t.split(" "))
        words = {w: list(w) + ["</w>"] for w in wc}
        out = []
        for _ in range(n_merges):
            pairs = Counter()
            for w, sym in words.items():
                for a, b in zip(sym, sym[1:]):
                    pairs[(a, b)] += wc[w]
            if not pairs:
                break
            (la, rb), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
            out.append((la, rb, la + rb, cnt))
            for sym in words.values():
                i = 0
                while i < len(sym) - 1:
                    if sym[i] == la and sym[i + 1] == rb:
                        sym[i:i + 2] = [la + rb]
                    else:
                        i += 1
        return out

    got = q_bpe_learn_merges(str(tmp_path), n_merges=8)
    want = naive(texts, 8)
    assert len(got) == len(want)
    for i, (la, rb, merged, cnt) in enumerate(want):
        row = got.iloc[i]
        assert (row["left"], row["right"], row["merged"],
                int(row["pair_count"])) == (la, rb, merged, cnt)
    # determinism across runs
    again = q_bpe_learn_merges(str(tmp_path), n_merges=8)
    assert got.equals(again)


def test_cli_query_subcommand_runs():
    """`cli query` lists names and runs a named driver query in its
    own process (the CLI owns its Ray session — driver contract)."""
    import json
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "-m", "playwrightcrawler_ray.cli", "query",
         "--name", "bloom_semijoin", "--sf", "/root/testdata/sf0.001",
         "--limit", "2"],
        capture_output=True, text=True, cwd="/root/repo", timeout=180,
    )
    assert r.returncode == 0, r.stderr[-800:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["query"] == "bloom_semijoin"
    assert summary["rows"] > 0
    assert summary["columns"] == ["orderkey", "n_items", "sum_qty"]


def test_image_semdedup_over_crawl(crawl_out):
    """Image-side SemDeDup (pipelines/export.image_semdedup): one row
    per stored image, the corpus's perturbed near-duplicate renders
    collapse (cos ≈ 1 thumbnails in one cluster), deterministic."""
    from playwrightcrawler_ray.pipelines.crawl import load_images
    from playwrightcrawler_ray.pipelines.export import image_semdedup

    out = image_semdedup(crawl_out, k=4, threshold=0.92)
    n_images = load_images(crawl_out).count()
    assert len(out) == n_images
    assert list(out.columns) == ["image_id", "cluster", "keep"]
    assert out["image_id"].is_unique
    # the corpus plants near-duplicate images whose pixel hashes
    # differ (so crawl-time exact dedup keeps both) but whose
    # thumbnails are semantically identical — at least one collapses
    assert (~out["keep"]).sum() >= 1
    assert out["keep"].sum() >= 1
    again = image_semdedup(crawl_out, k=4, threshold=0.92)
    assert out.equals(again)


def test_cli_exif_scan_and_scrub(crawl_out, tmp_path):
    """`cli exif` scans the crawl's images in its own process and
    writes byte-level-scrubbed copies; the standard corpus carries no
    EXIF, so every copy must be byte-identical to its stored
    original and the tagged/GPS counters zero."""
    import json
    import os
    import subprocess
    import sys

    dest = str(tmp_path / "scrub")
    # generous timeout: the CLI boots its own Ray session beside the
    # test session's, and this box's noisy-neighbor regime can stretch
    # that 10-s run severalfold (BASELINE.md "hardware ceiling")
    r = subprocess.run(
        [sys.executable, "-m", "playwrightcrawler_ray.cli", "exif",
         "--out", crawl_out, "--scrub-dest", dest],
        capture_output=True, text=True, cwd="/root/repo", timeout=600,
    )
    assert r.returncode == 0, (r.stdout[-400:], r.stderr[-800:])
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["images"] > 0
    assert summary["exif_tagged"] == 0 and summary["with_gps"] == 0
    n_files = sum(len(fs) for _, _, fs in os.walk(dest))
    assert n_files == summary["images"]
