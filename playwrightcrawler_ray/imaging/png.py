"""Pure-Python PNG codec.

Implements the public PNG spec (RFC 2083): IHDR/PLTE/tRNS/IDAT/IEND
chunks, zlib-compressed scanlines with per-row filter bytes. The
encoder writes 8-bit RGB/RGBA with filter 0 (None), optionally Adam7
interlaced; the decoder reads EVERY variant — grayscale, RGB, palette
(with tRNS transparency), gray+alpha, RGBA at depths 1/2/4/8/16,
filters 0–4, both progressive orders: sequential scanlines and Adam7
interlace (each of the 7 passes defiltered as its own sub-image, then
scattered into the full grid by the pass strides). numpy for the pixel
math, zlib from the stdlib — no third-party imaging dependency.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def png_encode(pixels: np.ndarray, interlace: bool = False) -> bytes:
    """Encode an (h, w, 3|4) uint8 array as a PNG byte string —
    sequential by default, Adam7 interlaced when ``interlace``."""
    if pixels.ndim != 3 or pixels.shape[2] not in (3, 4) or pixels.dtype != np.uint8:
        raise ValueError("expected (h, w, 3|4) uint8 array")
    h, w, ch = pixels.shape
    color_type = 2 if ch == 3 else 6
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0,
                       1 if interlace else 0)
    if not interlace:
        # filter byte 0 per scanline
        raw = np.empty((h, w * ch + 1), dtype=np.uint8)
        raw[:, 0] = 0
        raw[:, 1:] = pixels.reshape(h, w * ch)
        body = raw.tobytes()
    else:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = pixels[y0::dy, x0::dx]
            if sub.size == 0:
                continue
            ph, pw = sub.shape[:2]
            raw = np.empty((ph, pw * ch + 1), dtype=np.uint8)
            raw[:, 0] = 0
            raw[:, 1:] = sub.reshape(ph, pw * ch)
            parts.append(raw.tobytes())
        body = b"".join(parts)
    idat = zlib.compress(body, 6)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# Adam7 pass grid: (x0, y0, dx, dy)
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _defilter(rows: np.ndarray, row_bytes: int, bpp: int) -> np.ndarray:
    """Reconstruct filtered scanlines (filter byte + data per row) →
    raw bytes, filters 0-4."""
    h = rows.shape[0]
    filters = rows[:, 0]
    out = np.zeros((h, row_bytes), dtype=np.uint8)
    if not filters.any():
        out[:] = rows[:, 1:]
        return out
    for y in range(h):
        f = filters[y]
        cur = rows[y, 1:].astype(np.int32)
        prev = (
            out[y - 1].astype(np.int32) if y > 0
            else np.zeros(row_bytes, np.int32)
        )
        if f == 0:
            rec = cur
        elif f == 2:  # Up
            rec = (cur + prev) & 0xFF
        elif f in (1, 3, 4):  # Sub / Average / Paeth: sequential
            rec = np.zeros(row_bytes, np.int32)
            for i in range(row_bytes):
                a = rec[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                if f == 1:
                    rec[i] = (cur[i] + a) & 0xFF
                elif f == 3:
                    rec[i] = (cur[i] + ((a + b) >> 1)) & 0xFF
                else:
                    rec[i] = (cur[i] + _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"bad filter type {f}")
        out[y] = rec.astype(np.uint8)
    return out


def _extract_samples(rows: np.ndarray, pw: int, ph: int, depth: int,
                     nch: int) -> np.ndarray:
    """Defiltered scanline bytes → (ph, pw, nch) uint8 RAW samples
    (16-bit reduced to the high byte; sub-byte depths unpacked but NOT
    range-scaled — color mapping does that once)."""
    if depth == 16:
        sam = rows.reshape(ph, -1)[:, 0::2][:, : pw * nch]
    elif depth == 8:
        sam = rows[:, : pw * nch]
    else:
        bits = np.unpackbits(rows, axis=1)
        per = bits.shape[1] // depth
        weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint16)
        packed = bits.reshape(ph, per, depth) @ weights
        sam = packed[:, : pw * nch].astype(np.uint8)
    return sam.reshape(ph, pw, nch)


def png_decode(data: bytes, max_pixels: int = 64_000_000) -> np.ndarray:
    """Decode a PNG byte string to an (h, w, 3|4) uint8 array.

    Supports every PNG color type: grayscale (0), RGB (2), palette
    (3, with tRNS transparency), gray+alpha (4), RGBA (6), at bit
    depths 1/2/4/8/16 (16-bit samples are reduced to their high byte,
    like PIL's default I;16→L path), sequential or Adam7 interlaced.
    Raises ValueError for malformed streams and MemoryError when w*h
    exceeds ``max_pixels`` (the decompression-bomb guard mirroring
    PIL's, used for the reference's
    ``content_type_images_decompression_bomb_error`` taxonomy)."""
    if not data.startswith(_SIG):
        raise ValueError("not a PNG stream")
    pos = len(_SIG)
    w = h = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    plte: bytes | None = None
    trns: bytes | None = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if len(payload) != length:
            raise ValueError("truncated chunk")
        pos += 12 + length
        if tag == b"IHDR":
            w, h, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
        elif tag == b"PLTE":
            plte = payload
        elif tag == b"tRNS":
            trns = payload
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    if interlace not in (0, 1):
        raise ValueError(f"bad interlace method {interlace}")
    if color_type not in _CHANNELS:
        raise ValueError(f"bad PNG color type {color_type}")
    valid_depths = {
        0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
        4: (8, 16), 6: (8, 16),
    }[color_type]
    if bit_depth not in valid_depths:
        raise ValueError(f"bad depth {bit_depth} for color type {color_type}")
    if color_type == 3 and plte is None:
        raise ValueError("palette PNG without PLTE")
    if w * h > max_pixels:
        raise MemoryError(f"decompression bomb: {w}x{h}")
    nch = _CHANNELS[color_type]
    bpp = max(1, (nch * bit_depth) // 8)  # filter distance, in bytes
    if interlace == 0:
        passes = [(0, 0, 1, 1)]
    else:
        passes = _ADAM7
    # per-pass scanline geometry (skip empty passes)
    geo = []
    expected = 0
    for x0, y0, dx, dy in passes:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        rb = (pw * nch * bit_depth + 7) // 8
        geo.append((x0, y0, dx, dy, pw, ph, rb))
        expected += ph * (rb + 1)
    # bounded inflate: a bomb with small declared w/h can still carry IDAT
    # that inflates to GiB — never decompress more than the scanlines need
    dec = zlib.decompressobj()
    inflated = dec.decompress(bytes(idat), expected + 1)
    if len(inflated) > expected or (
        dec.unconsumed_tail and dec.decompress(dec.unconsumed_tail, 1)
    ):
        raise MemoryError(f"decompression bomb: IDAT inflates past {expected}")
    raw = np.frombuffer(inflated, dtype=np.uint8)
    if raw.size != expected:
        raise ValueError("bad scanline data size")
    samples = np.zeros((h, w, nch), dtype=np.uint8)
    off = 0
    for x0, y0, dx, dy, pw, ph, rb in geo:
        rows = raw[off : off + ph * (rb + 1)].reshape(ph, rb + 1)
        off += ph * (rb + 1)
        out = _defilter(rows, rb, bpp)
        samples[y0::dy, x0::dx] = _extract_samples(out, pw, ph,
                                                   bit_depth, nch)
    return _samples_to_pixels(samples, w, h, bit_depth, color_type,
                              nch, plte, trns)


def _samples_to_pixels(
    sam: np.ndarray, w: int, h: int, depth: int, color_type: int,
    nch: int, plte: bytes | None, trns: bytes | None,
) -> np.ndarray:
    """(h, w, nch) raw uint8 samples → (h, w, 3|4) uint8 pixels."""
    if color_type == 2:
        return sam.reshape(h, w, 3)
    if color_type == 6:
        return sam.reshape(h, w, 4)
    if color_type == 0:
        g = sam.reshape(h, w)
        if depth < 8:  # scale to full range (e.g. 1-bit: 0/1 → 0/255)
            g = (g.astype(np.uint16) * 255 // ((1 << depth) - 1)).astype(np.uint8)
        return np.stack([g, g, g], axis=2)
    if color_type == 4:
        ga = sam.reshape(h, w, 2)
        g, a = ga[:, :, 0], ga[:, :, 1]
        return np.stack([g, g, g, a], axis=2)
    # palette
    pal = np.frombuffer(plte, dtype=np.uint8)
    if pal.size % 3:
        raise ValueError("bad PLTE size")
    pal = pal.reshape(-1, 3)
    idx = sam.reshape(h, w)
    if idx.max(initial=0) >= len(pal):
        raise ValueError("palette index out of range")
    rgb = pal[idx]
    if trns is None:
        return rgb
    alpha_tab = np.full(len(pal), 255, dtype=np.uint8)
    tr = np.frombuffer(trns, dtype=np.uint8)[: len(pal)]
    alpha_tab[: len(tr)] = tr
    return np.dstack([rgb, alpha_tab[idx]])
