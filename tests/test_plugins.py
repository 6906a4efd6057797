"""User-extension surface (§2.10): content-handler plugin registry."""

from __future__ import annotations

import shutil

from playwrightcrawler_ray.config import CrawlConfig
from playwrightcrawler_ray.corpus import build_corpus


def test_plugin_handler_in_oracle_and_engine(ray_session):
    from playwrightcrawler_ray.pipelines.crawl import load_unified, run_crawl
    from playwrightcrawler_ray.pipelines.oracle import run_oracle

    corpus = build_corpus(seed=45, n_hosts=4, pages_per_host=4)
    # add a zip resource linked from a page
    host = "host00.test"
    zip_url = f"https://{host}/files/archive.zip"
    corpus.pages[zip_url] = {
        "status": 200, "content_type": "application/zip",
        "body": b"PK\x03\x04" + b"\x00" * 64, "redirect_to": "",
    }
    root = f"https://{host}/"
    rec = corpus.pages[root]
    rec["body"] = rec["body"].replace(
        b"</body>", b'<a href="/files/archive.zip">z</a></body>'
    )

    cfg = CrawlConfig(
        output_dir="/tmp/pwc_plugin_out", max_waves=30,
        plugin_modules=("tests.plugin_example",),
    )
    shutil.rmtree(cfg.output_dir, ignore_errors=True)
    oracle = run_oracle(corpus, cfg)
    ora_by_url = {r["url"]: r for r in oracle.content_rows}
    assert ora_by_url[zip_url]["source"] == "content_type_compressed_plugin"
    assert ora_by_url[zip_url]["min_webcontent"].startswith("archive:zip:")

    res = run_crawl(corpus, cfg)
    assert res.order == oracle.order
    pages = load_unified(cfg.output_dir).to_pandas()
    pages = pages[pages["kind"] == "page"]
    row = pages[pages["url"] == zip_url].iloc[0]
    assert row["source"] == "content_type_compressed_plugin"
    assert row["min_webcontent"] == ora_by_url[zip_url]["min_webcontent"]
