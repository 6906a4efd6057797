"""Pure-Python/numpy baseline JPEG (ITU-T T.81) codec.

Closes the round-1 capability gap: the reference decodes every format
PIL can (playwrightcrawler.py:3844-3858), and most real web images are
JPEG. No imaging libraries exist in this container, so this is a
from-scratch implementation of the baseline DCT process:

- **Decoder**: SOI/APPn/COM/DQT/DHT/DRI/SOF0/SOF1/SOS marker parsing,
  canonical Huffman decoding (mincode/maxcode/valptr per T.81 F.2.2),
  0xFF00 byte-unstuffing, restart markers, dequantization, batched
  vectorized IDCT (8×8 DCT-II basis matmuls over all blocks at once),
  chroma upsampling for 4:4:4 / 4:2:2 / 4:2:0 / arbitrary integer
  factors, YCbCr→RGB (BT.601 full range, JFIF), grayscale and 3-
  component scans. Progressive (SOF2) and arithmetic variants raise
  ``NotImplementedError`` (→ the oserror taxonomy, like PIL raising on
  unsupported member formats).
- **Encoder**: baseline JFIF — 4:4:4, Annex-K quantization tables
  scaled by ``quality``, Annex-K standard Huffman tables, single
  interleaved scan. Used by the synthetic corpus to serve REAL JPEG
  payloads through the crawl golden path.

Round-trip invariant: encode(quality=92) → decode achieves PSNR ≥ 40 dB
on natural-statistics test images (the north-rule lossy bound).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

# T.81 Annex K.1 — luminance / chrominance quantization tables
_QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
_QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# T.81 Annex K.3 — standard Huffman tables: (bits[1..16], huffval)
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# orthonormal 8×8 DCT-II basis: row k = c(k)·cos((2n+1)kπ/16)
_N = np.arange(8)
_DCT = np.cos((2 * _N[None, :] + 1) * _N[:, None] * np.pi / 16) * np.sqrt(0.25)
_DCT[0] *= 1 / np.sqrt(2)


def _idct_blocks(blocks: np.ndarray) -> np.ndarray:
    """(n, 8, 8) coefficient blocks → (n, 8, 8) samples (batched
    matmuls — BLAS path, unlike a 3-operand einsum)."""
    return (_DCT.T @ blocks) @ _DCT


def _fdct_blocks(blocks: np.ndarray) -> np.ndarray:
    return (_DCT @ blocks) @ _DCT.T


# ---------------------------------------------------------------- huffman

class _HuffTable:
    """Canonical Huffman table with a 16-bit prefix lookup: decoding
    peeks 16 bits and resolves (symbol, code length) in one table hit
    instead of the bit-serial T.81 F.2.2.3 walk (≈4× faster decode)."""

    def __init__(self, bits: list[int], vals: list[int]):
        self.vals = vals
        # 2^16-entry LUT: every 16-bit window starting with a code maps
        # to that code's packed (length << 8) | symbol. Python-list
        # storage: scalar list indexing is ~5× faster than numpy scalar
        # indexing in the per-symbol hot loop.
        lut = np.zeros(1 << 16, dtype=np.int32)
        code, k = 0, 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                base = code << (16 - length)
                span = 1 << (16 - length)
                lut[base : base + span] = (length << 8) | vals[k]
                code += 1
                k += 1
            code <<= 1
        self.lut = lut.tolist()
        # encoder side: symbol → (code, length)
        self.enc: dict[int, tuple[int, int]] = {}
        code, k = 0, 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.enc[vals[k]] = (code, length)
                code += 1
                k += 1
            code <<= 1


_HUFF_CACHE: dict[tuple[bytes, bytes], _HuffTable] = {}


def _huff_table(bits: list[int], vals: list[int]) -> _HuffTable:
    """Per-process cache: most JPEGs reuse the Annex-K standard tables,
    so the LUT build cost is paid once, not per image."""
    key = (bytes(bits), bytes(vals))
    t = _HUFF_CACHE.get(key)
    if t is None:
        t = _HUFF_CACHE[key] = _HuffTable(bits, vals)
    return t


class _BitReader:
    """MSB-first reader over entropy-coded data with FF00 unstuffing
    and restart-marker awareness."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None  # pending marker (RSTn/EOI/...)

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.marker is not None:
                # past a marker: T.81 pads with 1-bits
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                continue
            if self.pos >= len(self.data):
                raise ValueError("truncated entropy data")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 1
                else:  # a real marker terminates the entropy segment
                    self.marker = nxt
                    self.pos += 1
                    self.acc = (self.acc << 8) | 0xFF
                    self.nbits += 8
                    continue
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def decode(self, table: _HuffTable) -> int:
        if self.nbits < 16:
            self._fill()
        ent = table.lut[(self.acc >> (self.nbits - 16)) & 0xFFFF]
        if ent == 0:
            raise ValueError("bad huffman code")
        self.nbits -= ent >> 8
        self.acc &= (1 << self.nbits) - 1
        return ent & 0xFF

    def restart(self) -> None:
        """Byte-align and consume an RSTn marker."""
        self.acc = 0
        self.nbits = 0
        if self.marker is None:
            # marker not yet reached: scan forward for it
            while self.pos < len(self.data):
                if (
                    self.data[self.pos] == 0xFF
                    and self.pos + 1 < len(self.data)
                    and self.data[self.pos + 1] != 0x00
                ):
                    self.marker = self.data[self.pos + 1]
                    self.pos += 2
                    break
                self.pos += 1
        if self.marker is None or not (0xD0 <= self.marker <= 0xD7):
            raise ValueError("expected restart marker")
        self.marker = None


def _extend(v: int, size: int) -> int:
    return v - (1 << size) + 1 if size and v < (1 << (size - 1)) else v


# ---------------------------------------------------------------- decoder

def jpeg_decode(data: bytes, max_pixels: int = 64_000_000) -> np.ndarray:
    """Decode baseline JPEG bytes → (h, w, 3) uint8 RGB."""
    if not data.startswith(b"\xff\xd8"):
        raise ValueError("not a JPEG stream")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _HuffTable] = {}  # (class, id)
    frame = None
    restart_interval = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI before SOS
            break
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        seg = data[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                i += 1
                if pq:
                    tbl = np.frombuffer(seg[i : i + 128], dtype=">u2").astype(np.int32)
                    i += 128
                else:
                    tbl = np.frombuffer(seg[i : i + 64], dtype=np.uint8).astype(np.int32)
                    i += 64
                qtables[tq] = tbl
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = list(seg[i + 17 : i + 17 + n])
                htables[(tc, th)] = _huff_table(bits, vals)
                i += 17 + n
        elif marker in (0xC0, 0xC1):  # SOF0 / SOF1
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            if h * w > max_pixels:
                raise MemoryError(f"decompression bomb: {w}x{h}")
            comps = []
            for c in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * c)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"unsupported JPEG process (marker 0xFF{marker:02X})"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scomp = []
            for c in range(ns):
                cs, tda = seg[1 + 2 * c], seg[2 + 2 * c]
                scomp.append((cs, tda >> 4, tda & 0xF))
            return _decode_scan(
                data, pos, frame, scomp, qtables, htables, restart_interval
            )
        # else: APPn/COM skipped
    raise ValueError("no SOS segment")


def _decode_scan(data, pos, frame, scomp, qtables, htables, restart_interval):
    comps = frame["comps"]
    by_id = {c["id"]: c for c in comps}
    order = [by_id[cs] for cs, _, _ in scomp]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    h, w = frame["h"], frame["w"]
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    reader = _BitReader(data, pos)
    # per-component coefficient block grids
    for c in comps:
        c["bx"] = mcus_x * c["h"]
        c["by"] = mcus_y * c["v"]
        c["blocks"] = np.zeros((c["by"] * c["bx"], 8, 8), dtype=np.float64)
        c["pred"] = 0
    tdta = {cs: (td, ta) for cs, td, ta in scomp}
    zz = ZIGZAG
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.restart()
                for c in comps:
                    c["pred"] = 0
            for c in order:
                td, ta = tdta[c["id"]]
                dc_t = htables.get((0, td))
                ac_t = htables.get((1, ta))
                if dc_t is None or ac_t is None:
                    raise ValueError("missing huffman table")
                q = qtables.get(c["tq"])
                if q is None:
                    raise ValueError("missing quant table")
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = np.zeros(64, dtype=np.int32)
                        t = reader.decode(dc_t)
                        diff = _extend(reader.read(t), t)
                        c["pred"] += diff
                        coef[0] = c["pred"]
                        k = 1
                        while k < 64:
                            rs = reader.decode(ac_t)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            coef[k] = _extend(reader.read(s), s)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[zz] = coef * q
                        row = my * c["v"] + by
                        col = mx * c["h"] + bx
                        c["blocks"][row * c["bx"] + col] = block.reshape(8, 8)
            mcu_count += 1
    # batched IDCT + plane assembly + upsampling
    planes = []
    for c in comps:
        sam = _idct_blocks(c["blocks"]) + 128.0
        grid = sam.reshape(c["by"], c["bx"], 8, 8).transpose(0, 2, 1, 3)
        plane = grid.reshape(c["by"] * 8, c["bx"] * 8)
        if c["h"] != hmax or c["v"] != vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1
            )
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        y = np.clip(planes[0], 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=2)
    if len(planes) != 3:
        raise NotImplementedError(f"{len(planes)}-component JPEG")
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=2).round(), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------- encoder

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _scale_quant(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * s + 50) // 100, 1, 255).astype(np.int32)


def _encode_block(bw, coef, dc_t, ac_t, pred):
    zz = coef.flatten()[ZIGZAG]
    diff = int(zz[0]) - pred
    size = int(diff).bit_length() if diff else 0
    code, length = dc_t.enc[size]
    bw.write(code, length)
    if size:
        v = diff if diff > 0 else diff + (1 << size) - 1
        bw.write(v, size)
    run = 0
    last_nz = np.nonzero(zz[1:])[0]
    last = last_nz[-1] + 1 if len(last_nz) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_t.enc[0xF0]
            bw.write(c, ln)
            run -= 16
        size = abs(v).bit_length()
        c, ln = ac_t.enc[(run << 4) | size]
        bw.write(c, ln)
        bw.write(v if v > 0 else v + (1 << size) - 1, size)
        run = 0
    if last < 63:
        c, ln = ac_t.enc[0x00]
        bw.write(c, ln)
    return int(zz[0])


def _plane_blocks(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Pad to 8-multiples, batched FDCT, quantize → (by, bx, 8, 8)."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    plane = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge") - 128.0
    blocks = (
        plane.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )
    co = _fdct_blocks(blocks)
    # q is in natural raster order (Annex K layout) — use it directly;
    # the DQT segment serializes it zigzag-ordered per the spec
    qm = q.reshape(8, 8)
    return np.round(co / qm).astype(np.int32).reshape(ph // 8, pw // 8, 8, 8)


def jpeg_encode(pixels: np.ndarray, quality: int = 92,
                subsampling: str = "444") -> bytes:
    """Encode (h, w, 3) uint8 RGB → baseline JFIF.

    ``subsampling``: "444" (no chroma subsampling) or "420" (2×2 luma
    sampling, chroma box-averaged to half resolution — the dominant
    real-world layout; exercises the decoder's MCU/upsampling path)."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("expected (h, w, 3) uint8 array")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    h, w, _ = pixels.shape
    ql = _scale_quant(_QUANT_LUMA, quality)
    qc = _scale_quant(_QUANT_CHROMA, quality)
    p = pixels.astype(np.float64)
    y = 0.299 * p[:, :, 0] + 0.587 * p[:, :, 1] + 0.114 * p[:, :, 2]
    cb = -0.168736 * p[:, :, 0] - 0.331264 * p[:, :, 1] + 0.5 * p[:, :, 2] + 128
    cr = 0.5 * p[:, :, 0] - 0.418688 * p[:, :, 1] - 0.081312 * p[:, :, 2] + 128
    if subsampling == "420":
        hs = vs = 2
        # box-average chroma over 2×2 (pad odd dims by edge replication)
        ch, cw = -(-h // 2) * 2, -(-w // 2) * 2
        cb = np.pad(cb, ((0, ch - h), (0, cw - w)), mode="edge")
        cr = np.pad(cr, ((0, ch - h), (0, cw - w)), mode="edge")
        cb = cb.reshape(ch // 2, 2, cw // 2, 2).mean(axis=(1, 3))
        cr = cr.reshape(ch // 2, 2, cw // 2, 2).mean(axis=(1, 3))
    else:
        hs = vs = 1

    qy = _plane_blocks(y, ql)
    qcb = _plane_blocks(cb, qc)
    qcr = _plane_blocks(cr, qc)
    # luma grid padded to MCU multiples (420: even block counts)
    if subsampling == "420":
        eby, ebx = -(-qy.shape[0] // vs) * vs, -(-qy.shape[1] // hs) * hs
        qy = np.pad(qy, ((0, eby - qy.shape[0]), (0, ebx - qy.shape[1]),
                         (0, 0), (0, 0)), mode="edge")
        # chroma grid must match MCU count
        mby, mbx = eby // vs, ebx // hs
        qcb = np.pad(qcb, ((0, mby - qcb.shape[0]), (0, mbx - qcb.shape[1]),
                           (0, 0), (0, 0)), mode="edge")
        qcr = np.pad(qcr, ((0, mby - qcr.shape[0]), (0, mbx - qcr.shape[1]),
                           (0, 0), (0, 0)), mode="edge")

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tq, q in ((0, ql), (1, qc)):
        # DQT stores the table in zigzag scan order (T.81 B.2.4.1):
        # entry k describes the coefficient at natural index ZIGZAG[k]
        out += b"\xff\xdb" + struct.pack(">HB", 67, tq) + bytes(
            int(v) for v in q[ZIGZAG]
        )
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    for cid, hv, tq in ((1, (hs << 4) | vs, 0), (2, 0x11, 1), (3, 0x11, 1)):
        out += struct.pack(">BBB", cid, hv, tq)
    dc_l, ac_l = _huff_table(_DC_LUMA_BITS, _DC_LUMA_VALS), _huff_table(_AC_LUMA_BITS, _AC_LUMA_VALS)
    dc_c, ac_c = _huff_table(_DC_CHROMA_BITS, _DC_CHROMA_VALS), _huff_table(_AC_CHROMA_BITS, _AC_CHROMA_VALS)
    for tc, th, bits, vals in (
        (0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS),
        (1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS),
        (0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS),
        (1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS),
    ):
        out += b"\xff\xc4" + struct.pack(">HB", 19 + sum(bits), (tc << 4) | th)
        out += bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    for cid, tdta in ((1, 0x00), (2, 0x11), (3, 0x11)):
        out += struct.pack(">BB", cid, tdta)
    out += b"\x00\x3f\x00"  # Ss/Se/AhAl

    bw = _BitWriter()
    preds = [0, 0, 0]
    if subsampling == "444":
        n_by, n_bx = qy.shape[0], qy.shape[1]
        for by in range(n_by):
            for bx in range(n_bx):
                for ci, grid in enumerate((qy, qcb, qcr)):
                    tabs = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
                    preds[ci] = _encode_block(
                        bw, grid[by, bx], tabs[0], tabs[1], preds[ci]
                    )
    else:  # 420: MCU = 4 Y blocks + 1 Cb + 1 Cr
        mby, mbx = qcb.shape[0], qcb.shape[1]
        for my in range(mby):
            for mx in range(mbx):
                for dy in range(2):
                    for dx in range(2):
                        preds[0] = _encode_block(
                            bw, qy[my * 2 + dy, mx * 2 + dx], dc_l, ac_l, preds[0]
                        )
                preds[1] = _encode_block(bw, qcb[my, mx], dc_c, ac_c, preds[1])
                preds[2] = _encode_block(bw, qcr[my, mx], dc_c, ac_c, preds[2])
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
