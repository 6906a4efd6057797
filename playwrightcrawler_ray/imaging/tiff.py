"""Pure-Python baseline TIFF decoder (TIFF 6.0).

Covers the uncompressed, PackBits and **LZW**-compressed profiles
(TIFF 6.0 §13: MSB-first variable-width codes with early change, plus
the horizontal-differencing predictor, tag 317) — grayscale
(bilevel/8-bit), RGB and RGBA, strip-organized, both byte orders,
depths 1 and 8 per sample. JPEG-in-TIFF, tiles, planar configuration 2
and 16-bit samples raise ``NotImplementedError`` (→
``CodecUnavailable`` through the codec facade, like the other
genuinely-undecodable variants). Encoders (uncompressed and LZW RGB)
exist so the corpus can serve real TIFF payloads through the golden
path.
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
_TAG_PREDICTOR = 317

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


def _lzw_decode(src: bytes, expected: int) -> bytes:
    """TIFF 6.0 §13 LZW: MSB-first bit packing, 9→12-bit codes with
    EARLY CHANGE (the width bumps one code sooner than GIF's LZW),
    ClearCode 256 / EOI 257."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    bitpos = 0
    total_bits = len(src) * 8
    width = 9
    table: list[bytes] = []
    old: bytes | None = None

    def read_code() -> int:
        nonlocal bitpos
        if bitpos + width > total_bits:
            return EOI
        byte0 = bitpos >> 3
        chunk = int.from_bytes(src[byte0 : byte0 + 4].ljust(4, b"\0"), "big")
        code = (chunk >> (32 - (bitpos - (byte0 << 3)) - width)) & (
            (1 << width) - 1
        )
        bitpos += width
        return code

    while len(out) < expected:
        code = read_code()
        if code == EOI:
            break
        if code == CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            code = read_code()
            if code == EOI:
                break
            if code >= 256:
                raise ValueError("bad LZW start code")
            out += table[code]
            old = table[code]
            continue
        if old is None:
            raise ValueError("LZW stream must start with Clear")
        if code < len(table):
            entry = table[code]
            table.append(old + entry[:1])
        elif code == len(table):
            entry = old + old[:1]
            table.append(entry)
        else:
            raise ValueError("bad LZW code")
        out += entry
        old = entry
        # early change, decoder side: the decoder's table lags the
        # encoder's by ONE entry (the encoder registers a string at
        # emit time; the decoder learns it from the next code), so the
        # width switches one entry before the nominal 2^width-1 — the
        # libtiff-compatible convention
        if len(table) >= (1 << width) - 2 and width < 12:
            width += 1
    if len(out) < expected:
        raise ValueError("truncated LZW data")
    return bytes(out[:expected])


def _lzw_encode(src: bytes) -> bytes:
    """TIFF LZW encoder (early-change, MSB-first) — round-trip twin."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    emit(CLEAR, width)
    run = b""
    for b in src:
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        emit(table[run], width)
        table[cand] = next_code
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        elif next_code == 4094:  # table nearly full: reset
            emit(CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        run = bytes([b])
    if run:
        emit(table[run], width)
    emit(EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


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
    predictor = ifd.get(_TAG_PREDICTOR, [1])[0]
    if planar != 1:
        raise NotImplementedError("planar configuration 2")
    if compression not in (1, 5, 32773):
        raise NotImplementedError(f"TIFF compression {compression}")
    if predictor not in (1, 2):
        raise NotImplementedError(f"TIFF predictor {predictor}")
    if photometric not in (0, 1, 2):
        raise NotImplementedError(f"TIFF photometric {photometric}")
    if any(b not in (1, 8, 16) for b in bits) or len(set(bits)) != 1:
        raise NotImplementedError(f"TIFF bits per sample {bits}")
    depth = bits[0]
    if depth == 16 and predictor == 2:
        raise NotImplementedError("predictor 2 at 16-bit samples")
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
        elif compression == 5:
            strip = _lzw_decode(strip, nrows * row_bytes)
        raw += strip[: nrows * row_bytes]
    if len(raw) < h * row_bytes:
        raise ValueError("short TIFF pixel data")
    arr = np.frombuffer(bytes(raw[: h * row_bytes]), dtype=np.uint8)
    rows = arr.reshape(h, row_bytes)
    if predictor == 2:
        if depth != 8:
            raise NotImplementedError("predictor 2 at depth != 8")
        # horizontal differencing: cumulative sum per sample channel
        px = rows[:, : w * spp].reshape(h, w, spp).astype(np.int64)
        px = np.cumsum(px, axis=1) & 0xFF
        rows = px.astype(np.uint8).reshape(h, w * spp)
    if depth == 1:
        sam = np.unpackbits(rows, axis=1)[:, :w].astype(np.uint8) * 255
        if photometric == 0:  # WhiteIsZero
            sam = 255 - sam
        return np.stack([sam, sam, sam], axis=2)
    if depth == 16:
        # 16-bit samples in file byte order, reduced to the high byte
        # (PIL's I;16→L convention, matching the PNG decoder)
        wide = np.frombuffer(bytes(raw[: h * row_bytes]),
                             dtype=endian + "u2").reshape(h, -1)
        rows = (wide >> 8).astype(np.uint8)
    px = rows[:, : w * spp].reshape(h, w, spp)
    if spp == 1:
        g = px[:, :, 0]
        if photometric == 0:
            g = 255 - g
        return np.stack([g, g, g], axis=2)
    if spp in (3, 4):
        return px.copy()
    raise NotImplementedError(f"{spp} samples per pixel")


def tiff_encode(pixels: np.ndarray, compression: str = "none",
                predictor: bool = False) -> bytes:
    """Encode (h, w, 3) uint8 RGB as little-endian TIFF — uncompressed
    by default, ``compression="lzw"`` (optionally with the horizontal
    predictor) for the compressed profile."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("expected (h, w, 3) uint8 array")
    if compression not in ("none", "lzw"):
        raise ValueError("compression must be 'none' or 'lzw'")
    if predictor and compression != "lzw":
        raise ValueError("predictor requires lzw")
    h, w, _ = pixels.shape
    body = pixels
    if predictor:
        diff = pixels.astype(np.int16)
        diff[:, 1:, :] = diff[:, 1:, :] - pixels[:, :-1, :].astype(np.int16)
        body = (diff & 0xFF).astype(np.uint8)
    pixel_data = body.tobytes()
    if compression == "lzw":
        pixel_data = _lzw_encode(pixel_data)
    comp_tag = 5 if compression == "lzw" else 1
    # layout: header(8) | pixel data | IFD
    data_off = 8
    ifd_off = data_off + len(pixel_data)
    entries = [
        (_TAG_WIDTH, 3, 1, w),
        (_TAG_HEIGHT, 3, 1, h),
        (_TAG_BITS, 3, 3, None),       # needs external value block
        (_TAG_COMPRESSION, 3, 1, comp_tag),
        (_TAG_PHOTOMETRIC, 3, 1, 2),   # RGB
        (_TAG_STRIP_OFFSETS, 4, 1, data_off),
        (_TAG_SPP, 3, 1, 3),
        (_TAG_ROWS_PER_STRIP, 3, 1, h),
        (_TAG_STRIP_COUNTS, 4, 1, len(pixel_data)),
    ]
    if predictor:
        entries.append((_TAG_PREDICTOR, 3, 1, 2))
    entries.sort()
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
