"""Direct unit tests of the shared per-resource processing semantics."""

from __future__ import annotations

from playwrightcrawler_ray.config import CrawlConfig
from playwrightcrawler_ray.stages.process import (
    ProcessContext,
    process_fetched,
    process_image_payload,
)


def _ctx(**kw):
    return ProcessContext(CrawlConfig(**kw))


def test_memory_guard_oversized_body():
    ctx = _ctx(max_body_mb=1)  # 1 MB ceiling
    rows, offers, imgs = process_fetched(
        "https://h.test/big", "h.test", 0, 200, "text/html",
        b"x" * 2_000_000, "", ctx,
    )
    assert len(rows) == 1 and rows[0]["source"] == "get_page_outofmemory"
    assert offers == [] and imgs == []


def test_404_row():
    ctx = _ctx()
    rows, offers, imgs = process_fetched(
        "https://h.test/missing", "h.test", 2, 404, "", b"", "", ctx
    )
    assert rows[0]["source"] == "fetch_error_404"
    assert rows[0]["visited"] is True and rows[0]["wave"] == 2


def test_redirect_offers_target():
    ctx = _ctx(hunt_open_directories=False)
    rows, offers, _ = process_fetched(
        "https://h.test/old", "h.test", 1, 301, "", b"", "/new-location", ctx
    )
    assert rows[0]["source"] == "redirect"
    assert [o[0] for o in offers] == ["https://h.test/new-location"]


def test_html_page_full_flow():
    ctx = _ctx(hunt_open_directories=False)
    html = (
        b'<html><body><a href="/next.html">n</a>'
        b'<a href="mailto:a@b.test">m</a>'
        b'<img src="/img/x.png" alt="cap">'
        b'<a href="/img/x.png">direct link to subresource</a>'
        b"<p>hello world words here</p></body></html>"
    )
    rows, offers, imgs = process_fetched(
        "https://h.test/page.html", "h.test", 0, 200,
        "text/html; charset=utf-8", html, "", ctx,
    )
    sources = [r["source"] for r in rows]
    assert "content_type_download" in sources and "email_url" in sources
    # subresource suppressed from offers (J3) even though <a> links it
    assert [o[0] for o in offers] == ["https://h.test/next.html"]
    assert len(imgs) == 1 and imgs[0]["caption"] == "cap"
    page = rows[sources.index("content_type_download")]
    assert page["file_extension"] == "html"
    assert page["host_level_1"] == "test"
    assert "hello" in page["words"]


def test_non_html_category_doc():
    ctx = _ctx()
    rows, offers, imgs = process_fetched(
        "https://h.test/data.json", "h.test", 0, 200, "application/json",
        b'{"k": 1}', "", ctx,
    )
    assert rows[0]["source"] == "content_type_plain_text"
    assert rows[0]["category"] == "plain_text"
    assert offers == [] and imgs == []


def test_direct_image_fetch_path():
    from playwrightcrawler_ray.imaging.codec import encode_image
    import numpy as np

    ctx = _ctx()
    px = np.zeros((8, 8, 3), np.uint8)
    body = encode_image(px, "png")
    rows, offers, imgs = process_fetched(
        "https://h.test/img/y.png", "h.test", 3, 200, "image/png", body, "", ctx
    )
    assert rows == [] and len(imgs) == 1
    assert imgs[0]["body"] == body  # carried to the decode stage
    doc, img_row = process_image_payload(
        "https://h.test/img/y.png", "h.test", "h.test", 3, "", body, ctx
    )
    assert doc["source"] == "content_type_images_download"
    assert doc["resolution"] == 64
    assert img_row["w"] == 8 and img_row["fmt"] == "png"
