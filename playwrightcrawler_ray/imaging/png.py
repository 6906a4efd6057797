"""Minimal pure-Python PNG codec (RGB/RGBA, 8-bit, non-interlaced).

Implements the public PNG spec (RFC 2083): IHDR/IDAT/IEND chunks,
zlib-compressed scanlines with per-row filter bytes. The encoder always
writes filter 0 (None); the decoder reconstructs filters 0–4 so it can
also read PNGs produced elsewhere. numpy for the pixel math, zlib from
the stdlib — no third-party imaging dependency.
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


def png_encode(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3|4) uint8 array as a PNG byte string."""
    if pixels.ndim != 3 or pixels.shape[2] not in (3, 4) or pixels.dtype != np.uint8:
        raise ValueError("expected (h, w, 3|4) uint8 array")
    h, w, ch = pixels.shape
    color_type = 2 if ch == 3 else 6
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # filter byte 0 per scanline
    raw = np.empty((h, w * ch + 1), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = pixels.reshape(h, w * ch)
    idat = zlib.compress(raw.tobytes(), 6)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def png_decode(data: bytes, max_pixels: int = 64_000_000) -> np.ndarray:
    """Decode a PNG byte string to an (h, w, 3|4) uint8 array.

    Raises ValueError for malformed streams, NotImplementedError for
    unsupported PNG variants (palette, 16-bit, interlace), and
    MemoryError when w*h exceeds ``max_pixels`` (the decompression-bomb
    guard mirroring PIL's, used for the reference's
    ``content_type_images_decompression_bomb_error`` taxonomy)."""
    if not data.startswith(_SIG):
        raise ValueError("not a PNG stream")
    pos = len(_SIG)
    w = h = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
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
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    if bit_depth != 8 or color_type not in (2, 6) or interlace != 0:
        raise NotImplementedError(
            f"unsupported PNG: depth={bit_depth} color={color_type} interlace={interlace}"
        )
    if w * h > max_pixels:
        raise MemoryError(f"decompression bomb: {w}x{h}")
    ch = 3 if color_type == 2 else 4
    stride = w * ch + 1
    # bounded inflate: a bomb with small declared w/h can still carry IDAT
    # that inflates to GiB — never decompress more than the scanlines need
    dec = zlib.decompressobj()
    inflated = dec.decompress(bytes(idat), h * stride + 1)
    if len(inflated) > h * stride or (
        dec.unconsumed_tail and dec.decompress(dec.unconsumed_tail, 1)
    ):
        raise MemoryError(f"decompression bomb: IDAT inflates past {h}x{stride}")
    raw = np.frombuffer(inflated, dtype=np.uint8)
    if raw.size != h * stride:
        raise ValueError("bad scanline data size")
    rows = raw.reshape(h, stride)
    filters = rows[:, 0]
    out = np.zeros((h, w * ch), dtype=np.uint8)
    if not filters.any():
        out[:] = rows[:, 1:]
        return out.reshape(h, w, ch)
    bpp = ch
    for y in range(h):
        f = filters[y]
        cur = rows[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(w * ch, np.int32)
        if f == 0:
            rec = cur
        elif f == 2:  # Up
            rec = (cur + prev) & 0xFF
        elif f in (1, 3, 4):  # Sub / Average / Paeth: sequential along the row
            rec = np.zeros(w * ch, np.int32)
            for i in range(w * ch):
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
    return out.reshape(h, w, ch)
