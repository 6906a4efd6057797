"""Pure-Python BMP codec (Windows BITMAPINFOHEADER, uncompressed
BI_RGB 24/32-bit, bottom-up or top-down). Public spec; rounds out the
real-decoder set (PNG, GIF, BMP) so only the DCT/VP8 formats remain
stubbed."""

from __future__ import annotations

import struct

import numpy as np


def bmp_encode(pixels: np.ndarray) -> bytes:
    """Encode (h, w, 3) uint8 RGB as a 24-bit bottom-up BMP."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("expected (h, w, 3) uint8 array")
    h, w, _ = pixels.shape
    row_bytes = (w * 3 + 3) & ~3
    img_size = row_bytes * h
    # BGR, bottom-up, rows padded to 4 bytes
    rows = np.zeros((h, row_bytes), np.uint8)
    rows[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835,
                       2835, 0, 0)
    return header + info + rows.tobytes()


def bmp_decode(data: bytes, max_pixels: int = 64_000_000) -> np.ndarray:
    """Decode BI_RGB 24/32-bit BMP to (h, w, 3) uint8 RGB."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP stream")
    (data_offset,) = struct.unpack_from("<I", data, 10)
    (hdr_size,) = struct.unpack_from("<I", data, 14)
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER not supported")
    w, h_signed = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    (compression,) = struct.unpack_from("<I", data, 30)
    if compression != 0 or bpp not in (24, 32):
        raise NotImplementedError(f"unsupported BMP: bpp={bpp} comp={compression}")
    top_down = h_signed < 0
    h = abs(h_signed)
    if w * h > max_pixels:
        raise MemoryError(f"decompression bomb: {w}x{h}")
    ch = bpp // 8
    row_bytes = (w * ch + 3) & ~3
    need = data_offset + row_bytes * h
    if len(data) < need:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(data[data_offset:need], np.uint8).reshape(h, row_bytes)
    px = rows[:, : w * ch].reshape(h, w, ch)
    rgb = px[:, :, 2::-1]  # BGR(A) → RGB
    if not top_down:
        rgb = rgb[::-1]
    return np.ascontiguousarray(rgb)
