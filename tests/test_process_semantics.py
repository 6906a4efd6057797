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


def test_charset_detection_unit():
    from playwrightcrawler_ray.functions.charset import decode_text, detect_charset

    # header charset wins over fallback
    body = "café".encode("iso8859-1")
    assert detect_charset(body, "text/html; charset=ISO-8859-1") == "iso8859-1"
    assert decode_text(body, "text/html; charset=ISO-8859-1")[0] == "café"
    # meta tag declaration
    sjis = '<meta charset="shift_jis"><p>日本</p>'.encode("shift_jis")
    assert detect_charset(sjis, "text/html") == "shift_jis"
    assert "日本" in decode_text(sjis, "")[0]
    # http-equiv form
    he = ('<meta http-equiv="Content-Type" content="text/html; '
          'charset=windows-1252"><p>“quoted”</p>').encode("cp1252")
    assert detect_charset(he, "") == "cp1252"
    # BOM beats everything
    bom = "﻿hello".encode("utf-8")
    assert detect_charset(bom, "text/html; charset=latin-1") == "utf-8-sig"
    assert decode_text(bom, "")[0] == "hello"
    # plain utf-8 without declaration
    assert detect_charset("héllo".encode("utf-8"), "") == "utf-8"
    # undecodable garbage under a bogus codec name → latin-1 fallback
    assert detect_charset(b"\xff\xfe\x00\x01garbage" + bytes(range(128, 256)),
                          "text/html; charset=not-a-codec") in (
        "utf-16-le", "iso8859-1")  # \xff\xfe is a utf-16 BOM — sniffed first
    raw = bytes(range(160, 200))
    text, enc = decode_text(raw, "text/html; charset=bogus-name")
    assert enc == "iso8859-1" and len(text) == len(raw)


def test_latin1_page_words_decoded():
    """Differential: a Latin-1 page with declared header charset must
    produce correctly-decoded words/min_webcontent (no mojibake)."""
    from playwrightcrawler_ray.stages.process import process_fetched

    ctx = _ctx()
    body = ("<html><body><p>café façade naïve entrée</p>"
            "</body></html>").encode("iso8859-1")
    rows, _, _ = process_fetched(
        "https://h.test/l.html", "h.test", 0, 200,
        "text/html; charset=ISO-8859-1", body, "", ctx,
    )
    page = rows[0]
    assert "café" in page["min_webcontent"]
    assert "café" in page["words"]
    assert "caf�" not in page["min_webcontent"]


def test_render_js_hook():
    from playwrightcrawler_ray.functions.render import render_html

    html = (
        "<html><body><p>shell</p>"
        "<script>var x = 1; document.write('<a href=\"/late.html\">L</a>');"
        "document.writeln(\"<img src='/w.png'>\");</script>"
        '<img data-src="/lazy.png" alt="z">'
        "</body></html>"
    )
    out = render_html(html)
    assert '<a href="/late.html">' in out
    assert "<img src='/w.png'>" in out
    assert '<img src="/lazy.png"' in out          # data-src promoted
    # static content untouched; idempotent on static pages
    static = "<html><body><a href='/x'>x</a></body></html>"
    assert render_html(static) == static
    # a script referencing an undefined global crashes (browser
    # semantics) and degrades to the literal scan — the computed URL
    # never materializes
    evil = "<script>document.write('<a href=\"/'+secret+'\">x</a>')</script>"
    assert "/secret" not in render_html(evil)
    # computed URLs from VALID scripts DO materialize now (jsinterp)
    good = ("<script>var p='/com';document.write("
            "'<a href=\"'+p+'puted.html\">c</a>');</script>")
    assert "/computed.html" in render_html(good)


def test_render_hook_reaches_parse():
    """process_fetched with render_js on discovers document.write links
    and lazy-load images; with it off, neither exists (static fetch)."""
    from playwrightcrawler_ray.config import CrawlConfig
    from playwrightcrawler_ray.stages.process import (
        ProcessContext, process_fetched,
    )

    body = (
        b"<html><body>"
        b"<script>document.write('<a href=\"/late.html\">l</a>');</script>"
        b'<img data-src="/lazy.png" alt="zz">'
        b"</body></html>"
    )
    on = ProcessContext(CrawlConfig(render_js=True,
                                    hunt_open_directories=False))
    rows, offers, imgs = process_fetched(
        "https://h.test/", "h.test", 0, 200, "text/html", body, "", on)
    assert any(u.endswith("/late.html") for u, *_ in offers)
    assert any(i["url"].endswith("/lazy.png") for i in imgs)
    off = ProcessContext(CrawlConfig(render_js=False,
                                     hunt_open_directories=False))
    rows, offers, imgs = process_fetched(
        "https://h.test/", "h.test", 0, 200, "text/html", body, "", off)
    assert not offers and not imgs


def test_charset_statistical_sniff_undeclared():
    """Undeclared non-UTF-8 bodies (no BOM, no header, no meta) are
    sniffed statistically — the chardet analogue the reference relies
    on (playwrightcrawler.py:5091-5099). Differential: each fixture
    round-trips to its original text through decode_text."""
    from playwrightcrawler_ray.functions.charset import (
        decode_text, detect_charset,
    )

    jp = ("これは日本語のテストページです。猫と犬が好きです。"
          "今日は天気がいいですね。東京の電車はとても便利です。")
    kr = ("한국어 테스트 페이지입니다. 고양이와 강아지가 있습니다. "
          "오늘은 날씨가 좋습니다. 서울의 지하철은 매우 편리합니다.")
    zh = ("这是一个中文测试页面。猫和狗都很好。今天天气很好。"
          "北京的地铁非常方便。我们在这里学习和工作。")
    ru = ("Это тестовая страница на русском языке. Кошки и собаки "
          "живут здесь. Сегодня хорошая погода. Московское метро "
          "очень удобное.")
    wrap = ("<!DOCTYPE html><html><head><title>t</title></head><body>"
            "<div class=\"content\"><p>{}</p></div></body></html>")
    for text, enc in [(jp, "shift_jis"), (jp, "euc_jp"), (kr, "euc_kr"),
                      (zh, "gb18030"), (ru, "koi8-r"), (ru, "cp1251")]:
        body = wrap.format(text).encode(enc)
        assert detect_charset(body, "text/html") == enc, enc
        decoded, used = decode_text(body, "text/html")
        assert text in decoded and used == enc
    # sparse Latin-1 accents must NOT trip the Cyrillic sniffers
    lat = wrap.format("café naïve résumé straße à côté").encode("latin-1")
    assert detect_charset(lat, "text/html") == "iso8859-1"
    # a declared charset always wins over sniffing
    dec = ('<meta charset="shift_jis"><p>日本</p>').encode("shift_jis")
    assert detect_charset(dec, "") == "shift_jis"
