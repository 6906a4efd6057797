"""Lossy VP8 (WebP ``VP8 `` chunk) codec tests.

Correctness is differential where the oracle exists: the system
libwebp (ctypes, tests/_libwebp_ref.py) encodes → our decoder must be
**bit-identical** to libwebp's decoder on the YUV planes (the
normative decoder output; RGB differs only by chroma upsampler
choice).  Our encoder's streams must decode bit-identically in BOTH
decoders.  Everything else (round-trip PSNR, error taxonomy, fuzz
robustness) runs without libwebp.

Reference behavior: the playwrightcrawler reference decodes lossy WebP
via PIL (playwrightcrawler.py:3844-3858); this suite pins the same
observable capability onto the pure-Python RFC 6386 codec.
"""

from __future__ import annotations

import numpy as np
import pytest

from playwrightcrawler_ray.imaging.codec import (
    CodecUnavailable,
    decode_image,
    encode_image,
    sniff_format,
)
from playwrightcrawler_ray.imaging.vp8 import (
    vp8_decode,
    vp8_decode_yuv,
    vp8_encode,
    vp8_encode_webp,
)

from _libwebp_ref import HAVE_LIBWEBP

if HAVE_LIBWEBP:
    import _libwebp_ref as lw

needs_libwebp = pytest.mark.skipif(not HAVE_LIBWEBP,
                                   reason="system libwebp not present")


def _gradient(h, w, a=3, b=2):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([(yy * a + xx * b) % 256, (xx * 5) % 256,
                     (yy * 7) % 256], axis=-1).astype(np.uint8)


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return np.inf if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


# ------------------------------------------------ decoder vs libwebp


@needs_libwebp
@pytest.mark.parametrize("size", [(16, 16), (17, 23), (1, 1), (7, 120),
                                  (64, 64), (129, 65), (48, 160)])
@pytest.mark.parametrize("quality", [0, 25, 60, 90, 100])
def test_decode_bit_exact_vs_libwebp(size, quality):
    """libwebp-encoded stream → our YUV == libwebp's YUV, bitwise.

    libwebp's encoder at these qualities emits B_PRED 4x4 modes,
    segmentation, per-MB skip, loop-filter levels and multi-partition
    streams — so this matrix exercises every decoder path on
    real-encoder output, not just our own encoder's subset."""
    h, w = size
    rng = np.random.default_rng(h * 1000 + w * 10 + quality)
    for kind in range(3):
        if kind == 0:
            rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        elif kind == 1:
            rgb = _gradient(h, w)
        else:
            rgb = np.full((h, w, 3), 77, np.uint8)
            rgb[h // 2:, w // 2:] = 200
        webp = lw.encode_rgb(rgb, quality=float(quality))
        payload = _vp8_payload(webp)
        Y1, U1, V1 = vp8_decode_yuv(payload)
        Y2, U2, V2 = lw.decode_yuv(webp)
        assert np.array_equal(Y1, Y2)
        assert np.array_equal(U1, U2)
        assert np.array_equal(V1, V2)


def _vp8_payload(webp: bytes) -> bytes:
    import struct
    pos = 12
    while pos + 8 <= len(webp):
        tag = webp[pos:pos + 4]
        (size,) = struct.unpack_from("<I", webp, pos + 4)
        if tag == b"VP8 ":
            return webp[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)
    raise AssertionError("no VP8 chunk")


# ------------------------------------------------ encoder vs libwebp


@needs_libwebp
@pytest.mark.parametrize("kwargs", [
    {},
    {"filter_level": 25},
    {"filter_level": 40, "filter_simple": True},
    {"n_parts": 4},
    {"seg_qis": [5, 40, 80, 120]},
    {"seg_qis": [0, 127, 63, 31], "filter_level": 30, "n_parts": 2},
])
def test_encode_decodes_identically_in_libwebp(kwargs):
    """Our encoder's streams are spec-conforming: libwebp's decoder
    and ours produce bit-identical YUV for every header layout we can
    emit (loop filter normal+simple, multi-partition, segmentation)."""
    rng = np.random.default_rng(5)
    for (h, w, qi) in [(32, 48, 10), (17, 23, 40), (64, 64, 90)]:
        rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        data = vp8_encode(rgb, qi=qi, **kwargs)
        webp = vp8_encode_webp(rgb, qi=qi, **kwargs)
        Y1, U1, V1 = vp8_decode_yuv(data)
        Y2, U2, V2 = lw.decode_yuv(webp)
        assert np.array_equal(Y1, Y2)
        assert np.array_equal(U1, U2)
        assert np.array_equal(V1, V2)


# ------------------------------------------------ self-contained round trip


def test_roundtrip_psnr_bound():
    """Encode→decode at a high-quality quantizer keeps PSNR ≥ 40 dB on
    smooth content (the north-rule lossy bound).  The image must be
    genuinely smooth — `_gradient`'s mod-256 wraps create chroma step
    edges whose 4:2:0 subsampling loss alone caps PSNR near 28 dB for
    ANY codec, so a non-wrapping ramp is used here."""
    yy, xx = np.mgrid[0:48, 0:64]
    rgb = np.stack([yy * 2 + xx, xx * 3, yy * 4], axis=-1).astype(np.uint8)
    out = vp8_decode(vp8_encode(rgb, qi=8))
    assert out.shape == rgb.shape
    assert _psnr(rgb, out) >= 40.0


def test_roundtrip_every_header_layout():
    """Each optional header feature decodes through our own decoder
    (libwebp-independent): filters, partitions, segmentation."""
    rgb = _gradient(48, 33)
    base = vp8_decode(vp8_encode(rgb, qi=12))
    for kw in ({"filter_level": 30}, {"filter_simple": True,
                                      "filter_level": 20},
               {"n_parts": 8}, {"seg_qis": [12, 12, 12, 12]}):
        out = vp8_decode(vp8_encode(rgb, qi=12, **kw))
        assert out.shape == rgb.shape
        # same quantizer → only the loop filter may move pixels a little
        assert _psnr(base, out) >= 30.0


def test_odd_sizes_crop_correctly():
    for (h, w) in [(1, 1), (15, 17), (16, 1), (1, 16), (31, 33)]:
        rgb = _gradient(h, w)
        out = vp8_decode(vp8_encode(rgb, qi=10))
        assert out.shape == (h, w, 3)


# ------------------------------------------------ container integration


def test_webp_container_dispatch_and_sniff():
    rgb = _gradient(24, 36)
    body = encode_image(rgb, "webp_lossy")
    assert sniff_format(body) == "webp"
    out, fmt = decode_image(body)
    assert fmt == "webp"
    assert out.shape == rgb.shape
    assert _psnr(rgb, out) >= 28.0


def test_interframe_is_codec_unavailable():
    payload = b"\x01\x00\x00" + b"\x00" * 53  # frame-tag bit0=1: interframe
    body = (b"RIFF" + (4 + 8 + len(payload)).to_bytes(4, "little") + b"WEBP"
            + b"VP8 " + len(payload).to_bytes(4, "little") + payload)
    with pytest.raises(CodecUnavailable):
        decode_image(body)


# ------------------------------------------------ error taxonomy + fuzz


def test_malformed_headers_raise_typed_errors():
    with pytest.raises(ValueError):
        vp8_decode(b"\x00" * 4)  # truncated
    with pytest.raises(ValueError):
        vp8_decode(b"\x00" * 10)  # bad start code
    with pytest.raises(NotImplementedError):
        vp8_decode(b"\x01\x00\x00" + b"\x00" * 10)  # interframe
    good = vp8_encode(_gradient(16, 16), qi=10)
    with pytest.raises(ValueError):
        vp8_decode(good[:8])  # truncated first partition


def test_fuzz_truncation_and_bitflips_never_crash():
    """Web payloads are hostile: every truncation and bit-flip of a
    valid stream must either decode or raise the typed taxonomy errors
    (ValueError / NotImplementedError) — never IndexError or friends."""
    rng = np.random.default_rng(99)
    good = vp8_encode(rng.integers(0, 256, (32, 32, 3), dtype=np.uint8),
                      qi=40, n_parts=2, filter_level=15)
    for cut in range(0, len(good), max(1, len(good) // 23)):
        try:
            vp8_decode(good[:cut])
        except (ValueError, NotImplementedError):
            pass
    for _ in range(60):
        bad = bytearray(good)
        for _ in range(rng.integers(1, 6)):
            bad[rng.integers(0, len(bad))] ^= 1 << rng.integers(0, 8)
        try:
            vp8_decode(bytes(bad))
        except (ValueError, NotImplementedError):
            pass


def test_max_pixels_guard():
    # a header claiming huge dimensions must be rejected before any
    # allocation proportional to the claimed size
    hdr = bytearray(vp8_encode(_gradient(16, 16), qi=10))
    import struct
    hdr[6:10] = struct.pack("<HH", 8000, 8001)
    with pytest.raises(ValueError):
        vp8_decode(bytes(hdr), max_pixels=1_000_000)
