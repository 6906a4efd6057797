"""Corpus generator: determinism, structure, payload validity."""

from __future__ import annotations

import numpy as np

from playwrightcrawler_ray.corpus import build_corpus
from playwrightcrawler_ray.imaging import decode_image


def test_corpus_deterministic():
    a, b = build_corpus(seed=42, n_hosts=6, pages_per_host=5), build_corpus(
        seed=42, n_hosts=6, pages_per_host=5
    )
    assert a.pages.keys() == b.pages.keys()
    assert all(a.pages[k]["body"] == b.pages[k]["body"] for k in a.pages)
    assert a.seeds == b.seeds and a.robots == b.robots
    assert a.latency_ms == b.latency_ms
    c = build_corpus(seed=43, n_hosts=6, pages_per_host=5)
    assert any(a.pages[k]["body"] != c.pages[k]["body"]
               for k in a.pages.keys() & c.pages.keys()
               if a.pages[k]["content_type"].startswith("text/html"))


def test_corpus_structure():
    c = build_corpus(seed=42, n_hosts=16, pages_per_host=10)
    # Zipf skew: host00 holds ~30% of html pages
    html = [u for u, v in c.pages.items() if "text/html" in v["content_type"]]
    h0 = [u for u in html if "host00" in u]
    assert len(h0) / len(html) > 0.2
    # robots exist for every host; some disallow /private/
    assert len(c.robots) == 16
    assert any("Disallow: /private/" in r for r in c.robots.values())
    # malformed seed present
    assert any(s.startswith("htpps://") for s in c.seeds)


def test_corpus_image_payloads_decode():
    c = build_corpus(seed=42, n_hosts=8, pages_per_host=4)
    decoded = failed = 0
    for u, v in c.pages.items():
        if "/img/" not in u:
            continue
        try:
            px, fmt = decode_image(v["body"])
            assert px.dtype == np.uint8 and px.shape[2] == 3
            decoded += 1
        except Exception:
            failed += 1
    assert decoded > 10
    # truncated png + non-image + truncated jpeg + webp stub + hierarchical stub
    # (progressive JPEG now DECODES — it is in the decoded count)
    assert failed == 5


def test_corpus_serves_arithmetic_jpeg_in_golden_path():
    """The pic-rotation slot rotates progressive, arithmetic and
    lossless JPEG; a big-enough corpus must serve at least one SOF9
    and one SOF3 stream and both must decode through the real paths
    (not stub rows)."""
    c = build_corpus(seed=42, n_hosts=16, pages_per_host=4)
    for marker, name in ((b"\xff\xc9", "SOF9"), (b"\xff\xc3", "SOF3")):
        streams = [
            v["body"] for u, v in c.pages.items()
            if "/img/" in u and marker in v["body"][:256]
        ]
        assert streams, f"no {name} JPEG in the corpus rotation"
        for body in streams:
            px, fmt = decode_image(body)
            assert fmt == "jpeg" and px.dtype == np.uint8
