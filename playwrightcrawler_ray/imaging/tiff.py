"""Pure-Python baseline TIFF decoder (TIFF 6.0).

Covers the uncompressed and PackBits-compressed baseline profiles —
grayscale (bilevel/8-bit), RGB and RGBA, strip-organized, both byte
orders, depths 1 and 8 per sample. LZW/JPEG-in-TIFF, tiles, planar
configuration 2 and 16-bit samples raise ``NotImplementedError``
(→ ``CodecUnavailable`` through the codec facade, like the other
genuinely-undecodable variants). An encoder (uncompressed RGB) exists
so the corpus can serve real TIFF payloads through the golden path.
"""

from __future__ import annotations

import struct

import numpy as np

_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SPP = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279
_TAG_PLANAR = 284

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8, 11: 4, 12: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i"}


def _read_ifd(data: bytes, endian: str, off: int) -> dict[int, list[int]]:
    (n,) = struct.unpack_from(endian + "H", data, off)
    out: dict[int, list[int]] = {}
    for i in range(n):
        base = off + 2 + 12 * i
        tag, typ, count = struct.unpack_from(endian + "HHI", data, base)
        if typ not in _TYPE_SIZES:
            continue
        size = _TYPE_SIZES[typ] * count
        if size <= 4:
            raw = data[base + 8 : base + 8 + size]
        else:
            (voff,) = struct.unpack_from(endian + "I", data, base + 8)
            raw = data[voff : voff + size]
        fmt = _TYPE_FMT.get(typ)
        if fmt is None:
            continue
        out[tag] = list(struct.unpack(endian + fmt * count, raw))
    return out


def _unpackbits(src: bytes, expected: int) -> bytes:
    """PackBits (Apple RLE) decompression."""
    out = bytearray()
    i = 0
    while i < len(src) and len(out) < expected:
        n = src[i]
        i += 1
        if n < 128:
            out += src[i : i + n + 1]
            i += n + 1
        elif n > 128:
            if i >= len(src):
                break
            out += bytes([src[i]]) * (257 - n)
            i += 1
        # n == 128: no-op
    if len(out) < expected:
        raise ValueError("truncated PackBits data")
    return bytes(out[:expected])


def tiff_decode(data: bytes, max_pixels: int = 64_000_000) -> np.ndarray:
    """Decode baseline TIFF bytes → (h, w, 3|4) uint8."""
    if data[:4] not in (b"II*\x00", b"MM\x00*"):
        raise ValueError("not a TIFF stream")
    endian = "<" if data[:2] == b"II" else ">"
    (ifd_off,) = struct.unpack_from(endian + "I", data, 4)
    ifd = _read_ifd(data, endian, ifd_off)
    try:
        w = ifd[_TAG_WIDTH][0]
        h = ifd[_TAG_HEIGHT][0]
        offsets = ifd[_TAG_STRIP_OFFSETS]
        counts = ifd[_TAG_STRIP_COUNTS]
    except KeyError as e:
        raise ValueError(f"missing required TIFF tag: {e}") from e
    if w * h > max_pixels:
        raise MemoryError(f"decompression bomb: {w}x{h}")
    compression = ifd.get(_TAG_COMPRESSION, [1])[0]
    photometric = ifd.get(_TAG_PHOTOMETRIC, [1])[0]
    spp = ifd.get(_TAG_SPP, [1])[0]
    bits = ifd.get(_TAG_BITS, [1] * spp)
    rows_per_strip = ifd.get(_TAG_ROWS_PER_STRIP, [h])[0] or h
    planar = ifd.get(_TAG_PLANAR, [1])[0]
    if planar != 1:
        raise NotImplementedError("planar configuration 2")
    if compression not in (1, 32773):
        raise NotImplementedError(f"TIFF compression {compression}")
    if photometric not in (0, 1, 2):
        raise NotImplementedError(f"TIFF photometric {photometric}")
    if any(b not in (1, 8) for b in bits) or len(set(bits)) != 1:
        raise NotImplementedError(f"TIFF bits per sample {bits}")
    depth = bits[0]
    if depth == 1 and spp != 1:
        raise NotImplementedError("multi-sample bilevel")

    row_bytes = (w * spp * depth + 7) // 8
    raw = bytearray()
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        strip = data[off : off + cnt]
        if len(strip) != cnt:
            raise ValueError("truncated strip")
        nrows = min(rows_per_strip, h - si * rows_per_strip)
        if compression == 32773:
            strip = _unpackbits(strip, nrows * row_bytes)
        raw += strip[: nrows * row_bytes]
    if len(raw) < h * row_bytes:
        raise ValueError("short TIFF pixel data")
    arr = np.frombuffer(bytes(raw[: h * row_bytes]), dtype=np.uint8)
    rows = arr.reshape(h, row_bytes)
    if depth == 1:
        sam = np.unpackbits(rows, axis=1)[:, :w].astype(np.uint8) * 255
        if photometric == 0:  # WhiteIsZero
            sam = 255 - sam
        return np.stack([sam, sam, sam], axis=2)
    px = rows[:, : w * spp].reshape(h, w, spp)
    if spp == 1:
        g = px[:, :, 0]
        if photometric == 0:
            g = 255 - g
        return np.stack([g, g, g], axis=2)
    if spp in (3, 4):
        return px.copy()
    raise NotImplementedError(f"{spp} samples per pixel")


def tiff_encode(pixels: np.ndarray) -> bytes:
    """Encode (h, w, 3) uint8 RGB as uncompressed little-endian TIFF."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("expected (h, w, 3) uint8 array")
    h, w, _ = pixels.shape
    pixel_data = pixels.tobytes()
    # layout: header(8) | pixel data | IFD
    data_off = 8
    ifd_off = data_off + len(pixel_data)
    entries = [
        (_TAG_WIDTH, 3, 1, w),
        (_TAG_HEIGHT, 3, 1, h),
        (_TAG_BITS, 3, 3, None),       # needs external value block
        (_TAG_COMPRESSION, 3, 1, 1),
        (_TAG_PHOTOMETRIC, 3, 1, 2),   # RGB
        (_TAG_STRIP_OFFSETS, 4, 1, data_off),
        (_TAG_SPP, 3, 1, 3),
        (_TAG_ROWS_PER_STRIP, 3, 1, h),
        (_TAG_STRIP_COUNTS, 4, 1, len(pixel_data)),
    ]
    bits_off = ifd_off + 2 + 12 * len(entries) + 4
    out = bytearray(b"II*\x00")
    out += struct.pack("<I", ifd_off)
    out += pixel_data
    out += struct.pack("<H", len(entries))
    for tag, typ, count, val in entries:
        if tag == _TAG_BITS:
            out += struct.pack("<HHII", tag, typ, count, bits_off)
        else:
            out += struct.pack("<HHII", tag, typ, count, val)
    out += struct.pack("<I", 0)  # next IFD
    out += struct.pack("<HHH", 8, 8, 8)  # bits-per-sample value block
    return bytes(out)
