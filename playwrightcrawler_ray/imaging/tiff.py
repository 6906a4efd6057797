"""Pure-Python baseline TIFF decoder (TIFF 6.0).

Covers the uncompressed, PackBits and **LZW**-compressed profiles
(TIFF 6.0 §13: MSB-first variable-width codes with early change, plus
the horizontal-differencing predictor, tag 317) — grayscale
(bilevel/8-bit), RGB and RGBA, 16-bit samples in both byte orders,
**strip- AND tile-organized** (§15: TileWidth/TileLength/TileOffsets,
right/bottom tiles padded to full size) in **both chunky and planar
(PlanarConfiguration=2, §12) sample layouts**, plus **new-style
JPEG-in-TIFF** (compression 7, TTN2: shared ``JPEGTables`` DQT/DHT +
abbreviated per-segment streams, decoded by composing the in-repo
T.81 codec).  Exotic photometrics raise ``NotImplementedError`` (→
``CodecUnavailable`` through the codec facade).  Encoders
(uncompressed, LZW and JPEG; strips or tiles; chunky or planar) exist
so the corpus can serve real TIFF payloads through the golden path
and every decode path has a round-trip twin.
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
_TAG_TILE_WIDTH = 322
_TAG_TILE_LENGTH = 323
_TAG_TILE_OFFSETS = 324
_TAG_TILE_COUNTS = 325
_TAG_JPEG_TABLES = 347

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8, 11: 4, 12: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 6: "b", 7: "B", 8: "h", 9: "i"}


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


def _decompress(seg: bytes, expected: int, compression: int) -> bytes:
    if compression == 32773:
        return _unpackbits(seg, expected)
    if compression == 5:
        return _lzw_decode(seg, expected)
    if len(seg) < expected:
        raise ValueError("short TIFF pixel data")
    return seg[:expected]


def _undo_predictor(px: np.ndarray) -> np.ndarray:
    """Horizontal differencing (tag 317 = 2) over an (h, w, c) uint8
    block: cumulative sum per sample channel along the row.  Applies
    per strip/tile — the predictor resets at every row start, so
    block-local application is exact."""
    out = np.cumsum(px.astype(np.int64), axis=1) & 0xFF
    return out.astype(np.uint8)


def tiff_decode(data: bytes, max_pixels: int = 64_000_000) -> np.ndarray:
    """Decode baseline TIFF bytes → (h, w, 3|4) uint8 (module
    docstring: strips or tiles, chunky or planar, both byte orders)."""
    if data[:4] not in (b"II*\x00", b"MM\x00*"):
        raise ValueError("not a TIFF stream")
    endian = "<" if data[:2] == b"II" else ">"
    (ifd_off,) = struct.unpack_from(endian + "I", data, 4)
    ifd = _read_ifd(data, endian, ifd_off)
    try:
        w = ifd[_TAG_WIDTH][0]
        h = ifd[_TAG_HEIGHT][0]
    except KeyError as e:
        raise ValueError(f"missing required TIFF tag: {e}") from e
    if w * h > max_pixels:
        raise MemoryError(f"decompression bomb: {w}x{h}")
    tiled = _TAG_TILE_OFFSETS in ifd
    if tiled:
        offsets = ifd[_TAG_TILE_OFFSETS]
        counts = ifd.get(_TAG_TILE_COUNTS, [])
    else:
        try:
            offsets = ifd[_TAG_STRIP_OFFSETS]
            counts = ifd[_TAG_STRIP_COUNTS]
        except KeyError as e:
            raise ValueError(f"missing required TIFF tag: {e}") from e
    compression = ifd.get(_TAG_COMPRESSION, [1])[0]
    photometric = ifd.get(_TAG_PHOTOMETRIC, [1])[0]
    spp = ifd.get(_TAG_SPP, [1])[0]
    bits = ifd.get(_TAG_BITS, [1] * spp)
    rows_per_strip = ifd.get(_TAG_ROWS_PER_STRIP, [h])[0] or h
    planar = ifd.get(_TAG_PLANAR, [1])[0]
    predictor = ifd.get(_TAG_PREDICTOR, [1])[0]
    if planar not in (1, 2):
        raise NotImplementedError(f"planar configuration {planar}")
    if compression not in (1, 5, 32773, 7):
        raise NotImplementedError(f"TIFF compression {compression}")
    if compression == 7:
        # new-style JPEG-in-TIFF (TTN2): segments are abbreviated JPEG
        # streams sharing the JPEGTables (tag 347) DQT/DHT state —
        # decoded by composing the in-repo T.81 decoder
        if planar != 1 or photometric != 6 or spp != 3:
            raise NotImplementedError(
                "JPEG-in-TIFF: only chunky YCbCr (photometric 6) RGB")
        jpeg_prefix = b""
        if _TAG_JPEG_TABLES in ifd:
            tb = bytes(ifd[_TAG_JPEG_TABLES])
            if tb[-2:] == b"\xff\xd9":
                tb = tb[:-2]  # strip EOI: segments append their own SOI
            jpeg_prefix = tb
    if predictor not in (1, 2):
        raise NotImplementedError(f"TIFF predictor {predictor}")
    if photometric not in (0, 1, 2) and not (
            photometric == 6 and compression == 7):
        raise NotImplementedError(f"TIFF photometric {photometric}")
    if any(b not in (1, 8, 16) for b in bits) or len(set(bits)) != 1:
        raise NotImplementedError(f"TIFF bits per sample {bits}")
    depth = bits[0]
    if depth == 16 and predictor == 2:
        raise NotImplementedError("predictor 2 at 16-bit samples")
    if depth == 1 and (spp != 1 or tiled or planar != 1):
        raise NotImplementedError("non-baseline bilevel layout")
    if spp not in (1, 3, 4):
        raise NotImplementedError(f"{spp} samples per pixel")

    # ---- bilevel strips (chunky only): original compact path
    if depth == 1:
        row_bytes = (w + 7) // 8
        raw = bytearray()
        for si, (off, cnt) in enumerate(zip(offsets, counts)):
            seg = data[off : off + cnt]
            if len(seg) != cnt:
                raise ValueError("truncated strip")
            nrows = min(rows_per_strip, h - si * rows_per_strip)
            raw += _decompress(seg, nrows * row_bytes, compression)
        if len(raw) < h * row_bytes:
            raise ValueError("short TIFF pixel data")
        rows = np.frombuffer(bytes(raw[: h * row_bytes]),
                             dtype=np.uint8).reshape(h, row_bytes)
        sam = np.unpackbits(rows, axis=1)[:, :w].astype(np.uint8) * 255
        if photometric == 0:  # WhiteIsZero
            sam = 255 - sam
        return np.stack([sam, sam, sam], axis=2)

    bps = depth // 8
    u8 = np.uint8 if depth == 8 else np.dtype(endian + "u2")
    n_planes = 1 if planar == 1 else spp
    cpp = spp if planar == 1 else 1  # channels per segment
    sam = np.zeros((h, w, spp), dtype=np.uint8 if depth == 8 else np.uint16)

    def place(block: np.ndarray, y0: int, x0: int, plane: int) -> None:
        bh = min(block.shape[0], h - y0)
        bw = min(block.shape[1], w - x0)
        if planar == 1:
            sam[y0:y0 + bh, x0:x0 + bw, :] = block[:bh, :bw, :]
        else:
            sam[y0:y0 + bh, x0:x0 + bw, plane] = block[:bh, :bw, 0]

    if tiled:
        try:
            tw = ifd[_TAG_TILE_WIDTH][0]
            th = ifd[_TAG_TILE_LENGTH][0]
        except KeyError as e:
            raise ValueError(f"missing tile tag: {e}") from e
        if tw <= 0 or th <= 0:
            raise ValueError("bad tile dimensions")
        across = -(-w // tw)
        down = -(-h // th)
        if len(offsets) < across * down * n_planes:
            raise ValueError("too few tiles")
        seg_bytes = th * tw * cpp * bps
        i = 0
        for plane in range(n_planes):
            for ty in range(down):
                for tx in range(across):
                    off, cnt = offsets[i], counts[i]
                    i += 1
                    seg = data[off : off + cnt]
                    if len(seg) != cnt:
                        raise ValueError("truncated tile")
                    if compression == 7:
                        from .jpeg import jpeg_decode

                        block = jpeg_decode(jpeg_prefix + bytes(seg),
                                            max_pixels=max_pixels)
                    else:
                        raw = _decompress(seg, seg_bytes, compression)
                        block = np.frombuffer(raw, dtype=u8).reshape(
                            th, tw, cpp)
                        if predictor == 2:
                            block = _undo_predictor(block)
                    place(block, ty * th, tx * tw, plane)
    else:
        strips_per_plane = -(-h // rows_per_strip)
        if len(offsets) < strips_per_plane * n_planes:
            raise ValueError("too few strips")
        i = 0
        for plane in range(n_planes):
            for si in range(strips_per_plane):
                off, cnt = offsets[i], counts[i]
                i += 1
                seg = data[off : off + cnt]
                if len(seg) != cnt:
                    raise ValueError("truncated strip")
                nrows = min(rows_per_strip, h - si * rows_per_strip)
                if compression == 7:
                    from .jpeg import jpeg_decode

                    block = jpeg_decode(jpeg_prefix + bytes(seg),
                                        max_pixels=max_pixels)
                else:
                    raw = _decompress(seg, nrows * w * cpp * bps,
                                      compression)
                    block = np.frombuffer(raw, dtype=u8).reshape(
                        nrows, w, cpp)
                    if predictor == 2:
                        block = _undo_predictor(block)
                place(block, si * rows_per_strip, 0, plane)

    if depth == 16:
        # reduce to the high byte (PIL's I;16→L convention, matching
        # the PNG decoder); `sam` holds native-order u16 already
        sam = (sam >> 8).astype(np.uint8)
    if spp == 1:
        g = sam[:, :, 0]
        if photometric == 0:
            g = 255 - g
        return np.stack([g, g, g], axis=2)
    return sam.copy()


def _hdiff(block: np.ndarray) -> np.ndarray:
    diff = block.astype(np.int16)
    diff[:, 1:, :] = diff[:, 1:, :] - block[:, :-1, :].astype(np.int16)
    return (diff & 0xFF).astype(np.uint8)


def tiff_encode(pixels: np.ndarray, compression: str = "none",
                predictor: bool = False, layout: str = "strips",
                planar: bool = False, tile: int = 16) -> bytes:
    """Encode (h, w, 3) uint8 RGB as little-endian TIFF — uncompressed
    by default, ``compression="lzw"`` (optionally with the horizontal
    predictor) for the compressed profile; ``layout="tiles"`` emits a
    tiled file (§15, ``tile``×``tile``, multiples of 16 per spec) and
    ``planar=True`` the PlanarConfiguration=2 sample layout — every
    variant the decoder accepts has a round-trip twin here."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("expected (h, w, 3) uint8 array")
    if compression not in ("none", "lzw"):
        raise ValueError("compression must be 'none' or 'lzw'")
    if predictor and compression != "lzw":
        raise ValueError("predictor requires lzw")
    if layout not in ("strips", "tiles"):
        raise ValueError("layout must be 'strips' or 'tiles'")
    if layout == "tiles" and tile % 16:
        raise ValueError("tile dimensions must be multiples of 16")
    h, w, _ = pixels.shape
    comp_tag = 5 if compression == "lzw" else 1

    def pack(seg: np.ndarray) -> bytes:
        if predictor:
            seg = _hdiff(seg)
        raw = seg.tobytes()
        return _lzw_encode(raw) if compression == "lzw" else raw

    planes = ([pixels[:, :, c:c + 1] for c in range(3)] if planar
              else [pixels])
    segments: list[bytes] = []
    if layout == "tiles":
        across, down = -(-w // tile), -(-h // tile)
        for pl in planes:
            padded = np.zeros((down * tile, across * tile, pl.shape[2]),
                              np.uint8)
            padded[:h, :w] = pl
            for ty in range(down):
                for tx in range(across):
                    segments.append(pack(
                        padded[ty * tile:(ty + 1) * tile,
                               tx * tile:(tx + 1) * tile]))
    else:
        for pl in planes:
            segments.append(pack(pl))

    seg_off: list[int] = []
    data = bytearray()
    for s in segments:
        seg_off.append(8 + len(data))
        data += s
    ifd_off = 8 + len(data)
    n_seg = len(segments)

    entries = [
        (_TAG_WIDTH, 3, 1, w),
        (_TAG_HEIGHT, 3, 1, h),
        (_TAG_BITS, 3, 3, None),       # external value block
        (_TAG_COMPRESSION, 3, 1, comp_tag),
        (_TAG_PHOTOMETRIC, 3, 1, 2),   # RGB
        (_TAG_SPP, 3, 1, 3),
    ]
    if layout == "tiles":
        entries += [(_TAG_TILE_WIDTH, 3, 1, tile),
                    (_TAG_TILE_LENGTH, 3, 1, tile),
                    (_TAG_TILE_OFFSETS, 4, n_seg, None),
                    (_TAG_TILE_COUNTS, 4, n_seg, None)]
    else:
        entries += [(_TAG_STRIP_OFFSETS, 4, n_seg, None),
                    (_TAG_ROWS_PER_STRIP, 3, 1, h),
                    (_TAG_STRIP_COUNTS, 4, n_seg, None)]
    if planar:
        entries.append((_TAG_PLANAR, 3, 1, 2))
    if predictor:
        entries.append((_TAG_PREDICTOR, 3, 1, 2))
    entries.sort()

    # external value blocks after the IFD: bits(6B) then offset/count
    # arrays when n_seg > 1
    ext_off = ifd_off + 2 + 12 * len(entries) + 4
    bits_off = ext_off
    ext_off += 6
    arr_offs: dict[int, int] = {}
    off_tag = _TAG_TILE_OFFSETS if layout == "tiles" else _TAG_STRIP_OFFSETS
    cnt_tag = _TAG_TILE_COUNTS if layout == "tiles" else _TAG_STRIP_COUNTS
    if n_seg > 1:
        arr_offs[off_tag] = ext_off
        ext_off += 4 * n_seg
        arr_offs[cnt_tag] = ext_off
        ext_off += 4 * n_seg

    out = bytearray(b"II*\x00")
    out += struct.pack("<I", ifd_off)
    out += data
    out += struct.pack("<H", len(entries))
    for tag, typ, count, val in entries:
        if tag == _TAG_BITS:
            out += struct.pack("<HHII", tag, typ, count, bits_off)
        elif tag == off_tag:
            out += struct.pack("<HHII", tag, typ, count,
                               arr_offs[tag] if n_seg > 1 else seg_off[0])
        elif tag == cnt_tag:
            out += struct.pack("<HHII", tag, typ, count,
                               arr_offs[tag] if n_seg > 1
                               else len(segments[0]))
        else:
            out += struct.pack("<HHII", tag, typ, count, val)
    out += struct.pack("<I", 0)  # next IFD
    out += struct.pack("<HHH", 8, 8, 8)  # bits-per-sample value block
    if n_seg > 1:
        out += struct.pack(f"<{n_seg}I", *seg_off)
        out += struct.pack(f"<{n_seg}I", *[len(s) for s in segments])
    return bytes(out)


def _split_jpeg_tables(stream: bytes) -> tuple[bytes, bytes]:
    """Split a full JPEG into (tables stream: SOI+DQT/DHT+EOI, the
    abbreviated image stream without its DQT/DHT) — the TTN2
    JPEGTables layout for compression-7 TIFF."""
    if stream[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream")
    pos = 2
    tables = bytearray(b"\xff\xd8")
    body = bytearray(b"\xff\xd8")
    while pos + 4 <= len(stream):
        if stream[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        marker = stream[pos + 1]
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack_from(">H", stream, pos + 2)
        segment = stream[pos : pos + 2 + seglen]
        if marker in (0xDB, 0xC4):  # DQT / DHT → shared tables
            tables += segment
        else:
            body += segment
            if marker == 0xDA:  # SOS: the rest is entropy data + EOI
                body += stream[pos + 2 + seglen :]
                break
        pos += 2 + seglen
    tables += b"\xff\xd9"
    return bytes(tables), bytes(body)


def tiff_encode_jpeg(pixels: np.ndarray, quality: int = 95,
                     layout: str = "strips", tile: int = 16) -> bytes:
    """Encode (h, w, 3) uint8 RGB as a compression-7 (new-style
    JPEG-in-TIFF) file: shared JPEGTables (tag 347) + abbreviated
    per-segment streams, strips or tiles — the round-trip twin of the
    decoder's compression-7 path."""
    from .jpeg import jpeg_encode

    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("expected (h, w, 3) uint8 array")
    if layout not in ("strips", "tiles"):
        raise ValueError("layout must be 'strips' or 'tiles'")
    if layout == "tiles" and tile % 16:
        raise ValueError("tile dimensions must be multiples of 16")
    h, w, _ = pixels.shape

    blocks: list[np.ndarray] = []
    if layout == "tiles":
        across, down = -(-w // tile), -(-h // tile)
        padded = np.pad(pixels,
                        ((0, down * tile - h), (0, across * tile - w),
                         (0, 0)), mode="edge")
        for ty in range(down):
            for tx in range(across):
                blocks.append(padded[ty * tile:(ty + 1) * tile,
                                     tx * tile:(tx + 1) * tile])
    else:
        blocks.append(pixels)

    tables: bytes | None = None
    segments: list[bytes] = []
    for b in blocks:
        full = jpeg_encode(b, quality=quality, subsampling="444")
        t, body = _split_jpeg_tables(full)
        if tables is None:
            tables = t  # identical for every block (fixed quality)
        segments.append(body)
    assert tables is not None

    seg_off: list[int] = []
    data = bytearray()
    for s in segments:
        seg_off.append(8 + len(data))
        data += s
    ifd_off = 8 + len(data)
    n_seg = len(segments)

    entries = [
        (_TAG_WIDTH, 3, 1), (_TAG_HEIGHT, 3, 1), (_TAG_BITS, 3, 3),
        (_TAG_COMPRESSION, 3, 1), (_TAG_PHOTOMETRIC, 3, 1),
        (_TAG_SPP, 3, 1), (_TAG_JPEG_TABLES, 7, len(tables)),
    ]
    if layout == "tiles":
        entries += [(_TAG_TILE_WIDTH, 3, 1), (_TAG_TILE_LENGTH, 3, 1),
                    (_TAG_TILE_OFFSETS, 4, n_seg),
                    (_TAG_TILE_COUNTS, 4, n_seg)]
    else:
        entries += [(_TAG_STRIP_OFFSETS, 4, n_seg),
                    (_TAG_ROWS_PER_STRIP, 3, 1),
                    (_TAG_STRIP_COUNTS, 4, n_seg)]
    entries.sort()

    ext_off = ifd_off + 2 + 12 * len(entries) + 4
    ext = bytearray()

    def external(blob: bytes) -> int:
        nonlocal ext_off
        at = ext_off
        ext.extend(blob)
        ext_off += len(blob)
        return at

    off_tag = _TAG_TILE_OFFSETS if layout == "tiles" else _TAG_STRIP_OFFSETS
    cnt_tag = _TAG_TILE_COUNTS if layout == "tiles" else _TAG_STRIP_COUNTS
    inline = {
        _TAG_WIDTH: w, _TAG_HEIGHT: h, _TAG_COMPRESSION: 7,
        _TAG_PHOTOMETRIC: 6, _TAG_SPP: 3,
        _TAG_TILE_WIDTH: tile, _TAG_TILE_LENGTH: tile,
        _TAG_ROWS_PER_STRIP: h,
    }
    ifd = bytearray(struct.pack("<H", len(entries)))
    for tag, typ, count in entries:
        if tag == _TAG_BITS:
            val = external(struct.pack("<HHH", 8, 8, 8))
        elif tag == _TAG_JPEG_TABLES:
            val = external(tables)
        elif tag == off_tag:
            val = (seg_off[0] if n_seg == 1
                   else external(struct.pack(f"<{n_seg}I", *seg_off)))
        elif tag == cnt_tag:
            val = (len(segments[0]) if n_seg == 1
                   else external(struct.pack(
                       f"<{n_seg}I", *[len(s) for s in segments])))
        else:
            val = inline[tag]
        ifd += struct.pack("<HHII", tag, typ, count, val)
    ifd += struct.pack("<I", 0)

    return bytes(b"II*\x00" + struct.pack("<I", ifd_off) + data + ifd + ext)
