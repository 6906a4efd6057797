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
