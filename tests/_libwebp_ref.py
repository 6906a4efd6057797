"""Test-only ctypes bindings to the system libwebp shared object.

Used exclusively as a DIFFERENTIAL ORACLE for the pure-Python VP8/VP8L
codecs in ``playwrightcrawler_ray.imaging`` — the production code never
imports this.  Gated: tests that need it skip when the library is
absent (``HAVE_LIBWEBP``).
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np

_lib = None
for _cand in ("libwebp.so.7", "libwebp.so", ctypes.util.find_library("webp")):
    if not _cand:
        continue
    try:
        _lib = ctypes.CDLL(_cand)
        break
    except OSError:
        continue

HAVE_LIBWEBP = _lib is not None

if HAVE_LIBWEBP:
    _lib.WebPEncodeRGB.restype = ctypes.c_size_t
    _lib.WebPEncodeRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
    _lib.WebPDecodeRGB.restype = ctypes.POINTER(ctypes.c_uint8)
    _lib.WebPDecodeRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    _lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
    _lib.WebPDecodeYUV.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    try:
        _free = _lib.WebPFree
    except AttributeError:  # pragma: no cover - very old libwebp
        _free = ctypes.CDLL(None).free
    _free.restype = None
    _free.argtypes = [ctypes.c_void_p]


def encode_rgb(arr: np.ndarray, quality: float = 75.0) -> bytes:
    """libwebp lossy encode of an (h, w, 3) uint8 RGB array."""
    h, w, _ = arr.shape
    buf = np.ascontiguousarray(arr).tobytes()
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = _lib.WebPEncodeRGB(buf, w, h, w * 3, quality, ctypes.byref(out))
    if n == 0:
        raise RuntimeError("WebPEncodeRGB failed")
    data = ctypes.string_at(out, n)
    _free(out)
    return data


def decode_rgb(data: bytes) -> np.ndarray:
    w = ctypes.c_int()
    h = ctypes.c_int()
    ptr = _lib.WebPDecodeRGB(data, len(data), ctypes.byref(w), ctypes.byref(h))
    if not ptr:
        raise RuntimeError("WebPDecodeRGB failed")
    arr = np.frombuffer(ctypes.string_at(ptr, w.value * h.value * 3),
                        dtype=np.uint8).reshape(h.value, w.value, 3).copy()
    _free(ptr)
    return arr


def decode_yuv(data: bytes):
    """libwebp decode → (Y, U, V) uint8 planes (the normative output)."""
    w = ctypes.c_int()
    h = ctypes.c_int()
    u = ctypes.POINTER(ctypes.c_uint8)()
    v = ctypes.POINTER(ctypes.c_uint8)()
    stride = ctypes.c_int()
    uv_stride = ctypes.c_int()
    ptr = _lib.WebPDecodeYUV(data, len(data), ctypes.byref(w), ctypes.byref(h),
                             ctypes.byref(u), ctypes.byref(v),
                             ctypes.byref(stride), ctypes.byref(uv_stride))
    if not ptr:
        raise RuntimeError("WebPDecodeYUV failed")
    W, H = w.value, h.value
    cw, ch = (W + 1) // 2, (H + 1) // 2
    Y = np.frombuffer(ctypes.string_at(ptr, stride.value * H),
                      dtype=np.uint8).reshape(H, stride.value)[:, :W].copy()
    U = np.frombuffer(ctypes.string_at(u, uv_stride.value * ch),
                      dtype=np.uint8).reshape(ch, uv_stride.value)[:, :cw].copy()
    V = np.frombuffer(ctypes.string_at(v, uv_stride.value * ch),
                      dtype=np.uint8).reshape(ch, uv_stride.value)[:, :cw].copy()
    _free(ptr)
    return Y, U, V
