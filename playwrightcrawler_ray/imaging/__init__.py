"""Imaging: encode/decode/hash for the ``images`` table payloads.

This container has no PIL/OpenCV, so the codec layer is self-contained:
real PNG and GIF codecs (zlib/LZW + numpy, lossless) and a deterministic
quantized lossy format ("qimg") standing in for JPEG. JPEG/WebP decode is
STUBBED behind ``CodecUnavailable`` (NotImplementedError) — the Ray-side
plumbing (schemas, batch sizes, actor signatures, error taxonomy rows)
is real and tested either way.
"""

from .codec import (
    CodecUnavailable,
    DecompressionBombError,
    UnidentifiedImageError,
    decode_image,
    encode_image,
    dhash64,
    pixel_hash,
    psnr,
)

__all__ = [
    "CodecUnavailable",
    "DecompressionBombError",
    "UnidentifiedImageError",
    "decode_image",
    "encode_image",
    "dhash64",
    "pixel_hash",
    "psnr",
]
