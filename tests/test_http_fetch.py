"""Real-socket fetch path (VERDICT r3 item 1): the loopback HTTP vhost
server + stdlib client behind make_fetch_fn's stage signature.

The golden test crawls the SAME corpus twice — once resolving against
the broadcast corpus index, once over real TCP (retries, 503 backoff,
Range-resume against genuine mid-body connection cuts) — and asserts
byte-identical output tables, ordering and seen set."""

from __future__ import annotations

import shutil

import pandas as pd
import pytest

from playwrightcrawler_ray.config import CrawlConfig
from playwrightcrawler_ray.corpus import build_corpus
from playwrightcrawler_ray.corpus.generate import CorpusData
from playwrightcrawler_ray.corpus.httpserve import (
    CorpusHTTPServer,
    HttpFetchClient,
)


@pytest.fixture(scope="module")
def small_corpus():
    c = CorpusData()
    body = bytes(range(256)) * 40  # 10,240 B → 11 ranged requests
    c.pages = {
        "http://a.test/": {
            "status": 200, "content_type": "text/html; charset=utf-8",
            "body": b"<html>hi</html>", "redirect_to": "",
        },
        "http://a.test/big.bin": {
            "status": 200, "content_type": "application/octet-stream",
            "body": body, "redirect_to": "",
        },
        "http://a.test/redir": {
            "status": 301, "content_type": "", "body": b"",
            "redirect_to": "http://a.test/",
        },
        "http://a.test/flaky": {
            "status": 200, "content_type": "text/plain",
            "body": b"finally", "redirect_to": "",
        },
        "http://a.test/dead": {
            "status": 200, "content_type": "text/plain",
            "body": b"never", "redirect_to": "",
        },
    }
    c.partial["http://a.test/big.bin"] = 1000
    c.flaky["http://a.test/flaky"] = 2
    c.flaky["http://a.test/dead"] = 99
    return c, body


def test_http_client_semantics(small_corpus):
    """Each failure mode crosses a real socket: 503-retry-success,
    retry-exhaustion → 599, genuine truncation + Range reassembly,
    redirect Location passthrough, 404 miss."""
    c, body = small_corpus
    with CorpusHTTPServer(c) as srv:
        cl = HttpFetchClient(srv.addr, retries=3, backoff_base_s=0.001)
        st, ct, bo, rd = cl.lookup([
            "http://a.test/", "http://a.test/big.bin", "http://a.test/redir",
            "http://a.test/flaky", "http://a.test/dead", "http://a.test/miss",
        ])
        assert (st[0], ct[0], bo[0]) == (
            200, "text/html; charset=utf-8", b"<html>hi</html>")
        assert (st[1], bo[1]) == (200, body)  # reassembled over Range
        assert (st[2], bo[2], rd[2]) == (301, b"", "http://a.test/")
        assert (st[3], bo[3]) == (200, b"finally")  # 2×503 then success
        assert st[4] == 599  # retries exhausted, terminal
        assert (st[5], ct[5], bo[5]) == (404, "", b"")
        # the Range loop really issued one request per chunk
        assert srv.request_count >= 6 + (len(body) // 1000)


def test_http_naive_client_keeps_truncated_body(small_corpus):
    c, body = small_corpus
    with CorpusHTTPServer(c) as srv:
        cl = HttpFetchClient(srv.addr, retries=3, range_resume=False)
        st, _, bo, _ = cl.lookup(["http://a.test/big.bin"])
        assert st[0] == 200 and bo[0] == body[:1000]


@pytest.fixture(scope="module")
def corpus():
    return build_corpus(seed=42, n_hosts=8, pages_per_host=6)


def _crawl_tables(output_dir: str) -> pd.DataFrame:
    from playwrightcrawler_ray.pipelines.crawl import load_unified

    df = load_unified(output_dir).to_pandas()
    # list columns aren't hashable sort keys — stringify for comparison
    for col in ("words", "emails", "query_variables", "query_values"):
        df[col] = df[col].map(
            lambda v: "|".join(v) if v is not None else None
        )
    return df.sort_values(
        ["wave", "kind", "url", "ord"], na_position="first"
    ).reset_index(drop=True)


def test_http_crawl_byte_identical_to_corpus_mode(ray_session, corpus):
    """The same crawl over localhost HTTP produces byte-identical
    tables to corpus mode — the 'done' criterion of VERDICT r3 item 1.
    The golden corpus includes the ranged (truncated) payload, so the
    real Range-resume loop is on the crawl path."""
    from playwrightcrawler_ray.pipelines.crawl import run_crawl

    cfg_c = CrawlConfig(output_dir="/tmp/pwc_http_corpus", max_waves=100)
    shutil.rmtree(cfg_c.output_dir, ignore_errors=True)
    res_c = run_crawl(corpus, cfg_c, collect_seen_ids=True)

    with CorpusHTTPServer(corpus) as srv:
        cfg_h = CrawlConfig(
            output_dir="/tmp/pwc_http_socket", max_waves=100,
            fetch_backend="http", http_addr=srv.addr,
        )
        shutil.rmtree(cfg_h.output_dir, ignore_errors=True)
        res_h = run_crawl(corpus, cfg_h, collect_seen_ids=True)
        assert srv.request_count > 100  # the crawl really hit the socket

    assert res_h.order == res_c.order
    assert res_h.seen_ids() == res_c.seen_ids()
    t_c, t_h = _crawl_tables(cfg_c.output_dir), _crawl_tables(cfg_h.output_dir)
    assert len(t_c) == len(t_h)
    pd.testing.assert_frame_equal(t_c, t_h)  # bytes column included
