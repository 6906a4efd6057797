"""Fetch retry/backoff semantics (reference downloader S10)."""

from __future__ import annotations

import shutil

from playwrightcrawler_ray.config import CrawlConfig
from playwrightcrawler_ray.corpus import build_corpus


def test_fetch_retry_and_terminal_failure(ray_session):
    from playwrightcrawler_ray.pipelines.crawl import load_unified, run_crawl

    corpus = build_corpus(seed=44, n_hosts=4, pages_per_host=4)
    seed_url = corpus.seeds[0]
    # transient: fewer failures than retries → succeeds after backoff
    corpus.flaky[seed_url] = 2
    # terminal: a page that keeps failing → fetch_error_599 doc
    dead = [u for u in corpus.pages if u.endswith("page1.html")][0]
    corpus.flaky[dead] = 99

    cfg = CrawlConfig(output_dir="/tmp/pwc_retry_out", max_waves=30,
                      fetch_retries=3, fetch_backoff_base_s=0.001)
    shutil.rmtree(cfg.output_dir, ignore_errors=True)
    res = run_crawl(corpus, cfg)
    pages = load_unified(cfg.output_dir).to_pandas()
    pages = pages[pages["kind"] == "page"]
    by_url = dict(zip(pages["url"], pages["source"]))
    assert by_url[seed_url] == "content_type_download"  # retried OK
    assert by_url[dead] == "fetch_error_599"            # exhausted


def test_range_resume_reassembles_truncated_downloads(ray_session):
    """A payload the server only serves in chunks must arrive complete
    through the Range-resume loop (reference downloader.py:212-302);
    with resume disabled the truncated body surfaces as a decode-error
    doc — proving the resume path is load-bearing, not a no-op."""
    from playwrightcrawler_ray.pipelines.crawl import load_unified, run_crawl

    corpus = build_corpus(seed=45, n_hosts=4, pages_per_host=4)
    # the corpus ships a built-in ranged fixture; make ALL images ranged
    # to exercise the loop broadly (served in ~4 chunks)
    for u, rec in corpus.pages.items():
        if "/img/" in u and rec["status"] == 200 and len(rec["body"]) > 64:
            corpus.partial[u] = max(16, len(rec["body"]) // 4 + 1)

    cfg = CrawlConfig(output_dir="/tmp/pwc_range_out", max_waves=30)
    shutil.rmtree(cfg.output_dir, ignore_errors=True)
    run_crawl(corpus, cfg)
    rows = load_unified(cfg.output_dir).to_pandas()
    ranged = rows[rows["url"].str.contains("ranged.png", na=False)]
    assert (ranged[ranged["kind"] == "image"]["bytes"].str.len() > 0).all()
    # all well-formed ranged images decoded fine (no truncation errors)
    ok_srcs = set(rows[rows["kind"] == "page"]["source"].dropna())
    assert "content_type_images_download" in ok_srcs

    # now WITHOUT resume: the same corpus yields truncated bodies and
    # decode-error docs for the ranged payloads
    cfg2 = CrawlConfig(output_dir="/tmp/pwc_range_off", max_waves=30,
                       range_resume=False)
    shutil.rmtree(cfg2.output_dir, ignore_errors=True)
    run_crawl(corpus, cfg2)
    rows2 = load_unified(cfg2.output_dir).to_pandas()

    def n_decode_errors(df):
        src = df[df["kind"] == "page"]["source"].fillna("")
        return (src.str.startswith("content_type_images_")
                & (src != "content_type_images_download")).sum()

    assert n_decode_errors(rows2) > n_decode_errors(rows)
