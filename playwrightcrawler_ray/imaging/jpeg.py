"""Pure-Python/numpy baseline JPEG (ITU-T T.81) codec.

Closes the round-1 capability gap: the reference decodes every format
PIL can (playwrightcrawler.py:3844-3858), and most real web images are
JPEG. No imaging libraries exist in this container, so this is a
from-scratch implementation of the baseline DCT process:

- **Decoder**: SOI/APPn/COM/DQT/DHT/DRI/SOF0/SOF1/SOF2/SOS marker
  parsing, canonical Huffman decoding (16-bit LUT over the T.81 F.2.2
  canonical code), 0xFF00 byte-unstuffing, restart markers,
  dequantization, batched vectorized IDCT (8×8 DCT-II basis matmuls
  over all blocks at once), chroma upsampling for 4:4:4 / 4:2:2 /
  4:2:0 / arbitrary integer factors, YCbCr→RGB (BT.601 full range,
  JFIF), grayscale and 3-component scans. **Progressive (SOF2)** is
  fully decoded (T.81 Annex G): multi-scan coefficient accumulation
  with spectral selection (Ss/Se bands, non-interleaved AC scans over
  true component block dims), successive approximation (DC and AC
  first + refinement passes, EOB-run decoding, libjpeg-compatible
  correction-bit semantics), restart markers inside progressive
  scans. **Arithmetic-coded (SOF9/SOF10)** decodes for real via the
  T.81 Annex D QM coder (see the arithmetic section below).
  **Lossless (SOF3)** decodes for real: T.81 Annex H spatial DPCM —
  the 7 H.1.2.1 predictors, SSSS=0..16 difference categories (16 →
  diff 32768, no extra bits), modulo-2^16 reconstruction, point
  transform (Al=Pt, output shifted left), first-line/first-column
  fallback predictors, restart-interval prediction reset, interleaved
  and per-component scans (1×1 sampling; lossless subsampling and
  precisions other than 8 raise ``NotImplementedError``). Components
  are emitted as-is — lossless JPEG defines no color transform, so a
  3-component frame is RGB (the mainstream libjpeg-turbo/PVRG
  convention). **Hierarchical (Annex J)** decodes for real: DHP
  frame sequencing, EXP reference expansion (the J.1.1.2 filter),
  SOF5 differential sequential DCT frames (PRED=0, no level shift)
  and SOF7 differential lossless correction frames (modulo-2^16) —
  see the hierarchical section at the end of this module. Only the
  progressive/arithmetic differential processes (SOF6, SOF13-15)
  and subsampled hierarchical frames raise ``NotImplementedError``.
- **Encoder**: baseline JFIF — 4:4:4 / 4:2:0, Annex-K quantization
  tables scaled by ``quality``, Annex-K standard Huffman tables,
  single interleaved scan — plus a progressive (SOF2) encoder
  (interleaved DC scan with successive approximation, per-component
  spectral-selection AC band scans with an AC successive-approximation
  first + refinement pair, EOB-run emission) so the synthetic corpus
  serves REAL progressive payloads through the crawl golden path.
  A lossless (SOF3) encoder twin (``jpeg_encode_lossless``) emits
  spec-shaped streams — per-image optimal Huffman table over the
  SSSS categories (libjpeg K.2 phantom-symbol trick keeps the
  all-ones code unused), any predictor 1-7, point transform,
  interleaved or per-component scans, restart markers — so the
  decoder is exercised by bit-exact round-trips across the whole
  parameter matrix. A hierarchical (Annex J) encoder twin
  (``jpeg_encode_hierarchical``) emits a full DHP/EXP/SOF5/SOF7
  pyramid whose final lossless correction frame makes the round
  trip bit-exact.

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

def _parse_dqt(seg: bytes, qtables: dict[int, np.ndarray]) -> None:
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


def _parse_dht(seg: bytes, htables: dict[tuple[int, int], "_HuffTable"]) -> None:
    i = 0
    while i < len(seg):
        tc, th = seg[i] >> 4, seg[i] & 0xF
        bits = list(seg[i + 1 : i + 17])
        n = sum(bits)
        vals = list(seg[i + 17 : i + 17 + n])
        htables[(tc, th)] = _huff_table(bits, vals)
        i += 17 + n


def jpeg_decode(data: bytes, max_pixels: int = 64_000_000) -> np.ndarray:
    """Decode baseline (SOF0/SOF1), progressive (SOF2), arithmetic
    (SOF9/SOF10), lossless (SOF3) or hierarchical (DHP + SOF5/SOF7
    differential frames, Annex J) JPEG bytes → (h, w, 3) uint8
    RGB."""
    if not data.startswith(b"\xff\xd8"):
        raise ValueError("not a JPEG stream")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _HuffTable] = {}  # (class, id)
    frame = None
    progressive = False
    arithmetic = False
    lossless = False
    arith_cond: dict[tuple[int, int], object] = {}
    any_scan = False
    restart_interval = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        seg = data[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT
            _parse_dqt(seg, qtables)
        elif marker == 0xC4:  # DHT
            _parse_dht(seg, htables)
        elif marker == 0xDE:  # DHP: a hierarchical (Annex J) sequence
            return _decode_hierarchical(data, pos, seg, max_pixels)
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC9, 0xCA):
            # SOF0/1 baseline · SOF2 progressive · SOF9/SOF10 their
            # arithmetic-coded (QM) twins · SOF3 lossless (Annex H)
            progressive = marker in (0xC2, 0xCA)
            arithmetic = marker in (0xC9, 0xCA)
            lossless = marker == 0xC3
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
            if progressive:
                _init_progressive(frame)
        elif marker in (0xC5, 0xC7):
            # differential frames are only defined inside a hierarchical
            # sequence (they'd have been routed through the DHP branch)
            raise ValueError(
                f"differential frame (0xFF{marker:02X}) without DHP"
            )
        elif marker in (0xC6, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"unsupported JPEG process (marker 0xFF{marker:02X})"
            )
        elif marker == 0xCC:  # DAC: arithmetic conditioning (§B.2.4.3)
            i = 0
            while i + 1 < len(seg):
                tc, tb = seg[i] >> 4, seg[i] & 0xF
                cs = seg[i + 1]
                if tc == 0:
                    lo, hi = cs & 0x0F, cs >> 4
                    if not (hi >= lo):
                        raise ValueError("bad DAC DC conditioning")
                    arith_cond[(0, tb)] = (lo, hi)
                else:
                    if not (1 <= cs <= 63):
                        raise ValueError("bad DAC AC conditioning")
                    arith_cond[(1, tb)] = cs
                i += 2
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scomp = []
            frame_ids = {c["id"] for c in frame["comps"]}
            for c in range(ns):
                cs, tda = seg[1 + 2 * c], seg[2 + 2 * c]
                if cs not in frame_ids:
                    raise ValueError(f"scan references unknown component {cs}")
                scomp.append((cs, tda >> 4, tda & 0xF))
            if lossless:
                ss = seg[1 + 2 * ns]       # predictor selector
                ahal = seg[3 + 2 * ns]
                pos = _decode_lossless_scan(
                    data, pos, frame, scomp, htables, restart_interval,
                    ss, ahal & 0xF,
                )
                any_scan = True
                continue
            if arithmetic and not progressive:
                return _decode_arith_scan(
                    data, pos, frame, scomp, qtables, arith_cond,
                    restart_interval
                )
            if arithmetic:
                ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
                ahal = seg[3 + 2 * ns]
                pos = _decode_arith_progressive_scan(
                    data, pos, frame, scomp, arith_cond,
                    restart_interval, ss, se, ahal >> 4, ahal & 0xF,
                )
                any_scan = True
                continue
            if not progressive:
                return _decode_scan(
                    data, pos, frame, scomp, qtables, htables,
                    restart_interval
                )
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            pos = _decode_progressive_scan(
                data, pos, frame, scomp, htables, restart_interval,
                ss, se, ahal >> 4, ahal & 0xF,
            )
            any_scan = True
        # else: APPn/COM skipped
    if progressive and any_scan:
        return _finish_progressive(frame, qtables)
    if lossless and any_scan:
        return _finish_lossless(frame)
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
    return _assemble(frame, comps, hmax, vmax)


def _assemble(frame, comps, hmax, vmax) -> np.ndarray:
    """Dequantized coefficient grids → RGB: batched IDCT, plane
    assembly, chroma upsampling, color conversion."""
    h, w = frame["h"], frame["w"]
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


# ------------------------------------------------ lossless (Annex H)
#
# T.81 Annex H spatial DPCM: no DCT, no quantization — each sample is
# predicted from its decoded neighbours (Ra left, Rb above, Rc
# above-left) with one of 7 selectable predictors, and the prediction
# difference is Huffman-coded with a DC-style SSSS category table
# extended to 16 (SSSS=16 ⇒ diff = 32768, no magnitude bits).
# Reconstruction is modulo 2^16 (H.1.2.1); the point transform Pt
# drops Pt low bits before coding and the decoder shifts the output
# left by Pt. Restart semantics per H.1.2.2: the first sample after a
# restart is predicted with the default 2^(P-Pt-1), and the remainder
# of that line reverts to the one-dimensional Ra predictor (the
# "first line" rule re-applies at each restart interval); later lines
# resume the selected predictor with the usual first-column Rb
# fallback. No color transform is defined for the lossless process —
# 3-component frames are component-literal RGB (the libjpeg-turbo /
# PVRG convention). Supported subset: 8-bit precision, 1×1 sampling
# (the dominant real-world lossless layout — DNG/DICOM tiles are
# single-component or 1×1); subsampled lossless raises
# NotImplementedError into the oserror taxonomy.


def _decode_lossless_scan(data, pos, frame, scomp, htables,
                          restart_interval, predictor, pt):
    """One lossless SOS (interleaved or single-component): decodes
    every sample of the scan's components into ``c["plane"]`` and
    returns the stream position of the terminating marker."""
    if not 1 <= predictor <= 7:
        raise ValueError(f"bad lossless predictor {predictor}")
    h, w = frame["h"], frame["w"]
    by_id = {c["id"]: c for c in frame["comps"]}
    order: list[tuple[dict, _HuffTable, list[int]]] = []
    for cs, td, _ta in scomp:
        c = by_id[cs]
        if c["h"] != 1 or c["v"] != 1:
            raise NotImplementedError("subsampled lossless JPEG")
        t = htables.get((0, td))
        if t is None:
            raise ValueError("missing huffman table")
        order.append((c, t, [0] * (h * w)))
    reader = _BitReader(data, pos)
    decode, read = reader.decode, reader.read
    default = 1 << (7 - pt)  # 2^(P-Pt-1), P=8
    n = h * w  # MCUs: one sample per component each (1×1 sampling)
    origin = 0  # scan-order index where the current restart interval began
    origin_row = 0
    for idx in range(n):
        if restart_interval and idx and idx % restart_interval == 0:
            reader.restart()
            origin = idx
            origin_row = idx // w
        row = idx // w
        col = idx - row * w
        for _c, t, p in order:
            ssss = decode(t)
            if ssss == 0:
                diff = 0
            elif ssss == 16:
                diff = 32768
            else:
                v = read(ssss)
                diff = v - (1 << ssss) + 1 if v < (1 << (ssss - 1)) else v
            if idx == origin:
                px = default
            elif row == origin_row:
                px = p[idx - 1]  # first line (of scan / of interval): Ra
            elif col == 0:
                px = p[idx - w]  # first column: Rb
            elif predictor == 1:
                px = p[idx - 1]
            elif predictor == 2:
                px = p[idx - w]
            elif predictor == 3:
                px = p[idx - w - 1]
            elif predictor == 4:
                px = p[idx - 1] + p[idx - w] - p[idx - w - 1]
            elif predictor == 5:
                px = p[idx - 1] + ((p[idx - w] - p[idx - w - 1]) >> 1)
            elif predictor == 6:
                px = p[idx - w] + ((p[idx - 1] - p[idx - w - 1]) >> 1)
            else:
                px = (p[idx - 1] + p[idx - w]) >> 1
            p[idx] = (px + diff) & 0xFFFF
    for c, _t, p in order:
        c["plane"] = np.array(p, dtype=np.uint16).reshape(h, w)
        c["pt"] = pt
    return _scan_end(reader)


def _finish_lossless(frame) -> np.ndarray:
    """Decoded sample planes → (h, w, 3) uint8 RGB. Lossless JPEG has
    no color transform: 3 components are R, G, B literally."""
    planes = []
    for c in frame["comps"]:
        if "plane" not in c:
            raise ValueError("lossless scan missing for a component")
        p = c["plane"].astype(np.int32) << c["pt"]
        planes.append(np.clip(p, 0, 255).astype(np.uint8))
    if len(planes) == 1:
        g = planes[0]
        return np.stack([g, g, g], axis=2)
    if len(planes) != 3:
        raise NotImplementedError(
            f"{len(planes)}-component lossless JPEG"
        )
    return np.stack(planes, axis=2)


def _lossless_diffs(x: np.ndarray, predictor: int, pt: int,
                    restart_interval: int) -> np.ndarray:
    """(h, w) uint8 plane → flat int32 modulo-2^16 DPCM differences in
    scan order. Vectorized when no restart intervals split the scan
    (the reconstruction equals the source exactly, so predictions can
    be computed from the original plane); restart runs fall back to a
    scalar walk that mirrors the decoder's interval-origin rules."""
    xs = (x.astype(np.int64) >> pt)
    h, w = xs.shape
    default = 1 << (7 - pt)
    if restart_interval == 0:
        px = np.empty((h, w), dtype=np.int64)
        px[0, 0] = default
        px[0, 1:] = xs[0, :-1]
        if h > 1:
            px[1:, 0] = xs[:-1, 0]
            if w > 1:
                ra, rb, rc = xs[1:, :-1], xs[:-1, 1:], xs[:-1, :-1]
                if predictor == 1:
                    e = ra
                elif predictor == 2:
                    e = rb
                elif predictor == 3:
                    e = rc
                elif predictor == 4:
                    e = ra + rb - rc
                elif predictor == 5:
                    e = ra + ((rb - rc) >> 1)
                elif predictor == 6:
                    e = rb + ((ra - rc) >> 1)
                elif predictor == 7:
                    e = (ra + rb) >> 1
                else:
                    raise ValueError(f"bad lossless predictor {predictor}")
                px[1:, 1:] = e
        d = xs - px
    else:
        p = xs.reshape(-1).tolist()
        d = np.empty(h * w, dtype=np.int64)
        origin = origin_row = 0
        for idx in range(h * w):
            if idx and idx % restart_interval == 0:
                origin = idx
                origin_row = idx // w
            row = idx // w
            col = idx - row * w
            if idx == origin:
                e = default
            elif row == origin_row:
                e = p[idx - 1]
            elif col == 0:
                e = p[idx - w]
            elif predictor == 1:
                e = p[idx - 1]
            elif predictor == 2:
                e = p[idx - w]
            elif predictor == 3:
                e = p[idx - w - 1]
            elif predictor == 4:
                e = p[idx - 1] + p[idx - w] - p[idx - w - 1]
            elif predictor == 5:
                e = p[idx - 1] + ((p[idx - w] - p[idx - w - 1]) >> 1)
            elif predictor == 6:
                e = p[idx - w] + ((p[idx - 1] - p[idx - w - 1]) >> 1)
            else:
                e = (p[idx - 1] + p[idx - w]) >> 1
            d[idx] = p[idx] - e
    # modulo-2^16 difference folded to signed 16-bit (H.1.2.1)
    return (((d.reshape(-1) + 32768) & 0xFFFF) - 32768).astype(np.int32)


_SSSS_BOUNDS = (2 ** np.arange(16)).astype(np.int64)  # 1, 2, 4, … 32768


def _lossless_categories(d: np.ndarray) -> np.ndarray:
    """Signed diffs → SSSS categories (0..16). Pure-integer
    ``searchsorted`` against the power-of-two boundaries — no float
    log2 edge cases; diff −32768 (≡ +32768 mod 2^16) is category 16."""
    a = np.abs(d.astype(np.int64))
    return np.searchsorted(_SSSS_BOUNDS, a, side="right").astype(np.int32)


def _optimal_dc_bits_vals(freqs: np.ndarray) -> tuple[list[int], list[int]]:
    """Per-image optimal DC-style Huffman table over SSSS categories:
    lengths from the shared cap-limited builder (webp.py), then the
    canonical-last deepest code is lengthened one bit so the Kraft sum
    drops below 1 and the all-ones code stays unused, as T.81 C.2's
    canonical construction expects (libjpeg achieves the same with the
    K.2 phantom-256 symbol)."""
    from .webp import _huff_lengths

    fd = {int(s): int(f) for s, f in enumerate(freqs) if f > 0}
    lengths = _huff_lengths(fd, len(freqs), cap=15)
    syms = [s for s, ln in enumerate(lengths) if ln > 0]
    if len(syms) > 1:
        deepest = max(lengths[s] for s in syms)
        s_star = max(s for s in syms if lengths[s] == deepest)
        lengths[s_star] += 1
    bits = [0] * 16
    for s in syms:
        bits[lengths[s] - 1] += 1
    vals = sorted(syms, key=lambda s: (lengths[s], s))
    return bits, vals


def jpeg_encode_lossless(pixels: np.ndarray, predictor: int = 4,
                         pt: int = 0, interleaved: bool = True,
                         restart_interval: int = 0) -> bytes:
    """Encode (h, w, 3) RGB or (h, w) grayscale uint8 → lossless
    (SOF3) JPEG. Bit-exact round trip with :func:`jpeg_decode` when
    ``pt == 0`` (with ``pt > 0`` the decoder recovers
    ``(x >> pt) << pt``). One shared per-image optimal Huffman table;
    ``interleaved=False`` emits one SOS per component instead of a
    single sample-interleaved scan."""
    if pixels.dtype != np.uint8 or pixels.ndim not in (2, 3):
        raise ValueError("expected (h, w[, 3]) uint8 array")
    if pixels.ndim == 3 and pixels.shape[2] != 3:
        raise ValueError("expected 3 channels")
    if not 1 <= predictor <= 7:
        raise ValueError(f"bad lossless predictor {predictor}")
    if not 0 <= pt <= 7:
        raise ValueError("point transform out of range")
    h, w = pixels.shape[:2]
    planes = ([pixels] if pixels.ndim == 2
              else [pixels[:, :, i] for i in range(3)])
    nc = len(planes)
    diffs = [_lossless_diffs(p, predictor, pt, restart_interval)
             for p in planes]
    cats = [_lossless_categories(d) for d in diffs]
    freqs = np.zeros(17, dtype=np.int64)
    for c in cats:
        freqs += np.bincount(c, minlength=17)
    bits, vals = _optimal_dc_bits_vals(freqs)
    table = _huff_table(bits, vals)
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xc4" + struct.pack(">HB", 2 + 1 + 16 + len(vals), 0x00)
    out += bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xc3" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for ci in range(nc):
        out += bytes((ci + 1, 0x11, 0))  # Tq must be 0 in lossless
    enc = table.enc

    def emit_scan(comp_ids: list[int], comp_diffs: list[np.ndarray],
                  comp_cats: list[np.ndarray]) -> None:
        out.extend(b"\xff\xda")
        out.extend(struct.pack(">HB", 6 + 2 * len(comp_ids), len(comp_ids)))
        for cid in comp_ids:
            out.extend(bytes((cid, 0x00)))  # Td=0, Ta unused
        out.extend(bytes((predictor, 0, pt)))  # Ss, Se=0, Ah<<4|Al
        bw = _BitWriter()
        dl = [d.tolist() for d in comp_diffs]
        cl = [c.tolist() for c in comp_cats]
        n = h * w
        write = bw.write
        for idx in range(n):
            if restart_interval and idx and idx % restart_interval == 0:
                bw.flush()
                out.extend(bw.out)
                bw.out = bytearray()
                out.extend(bytes(
                    (0xFF, 0xD0 + ((idx // restart_interval - 1) & 7))
                ))
            for d, c in zip(dl, cl):
                ssss = c[idx]
                code, length = enc[ssss]
                write(code, length)
                if 0 < ssss < 16:
                    v = d[idx]
                    write(v if v > 0 else v + (1 << ssss) - 1, ssss)
        bw.flush()
        out.extend(bw.out)

    if interleaved or nc == 1:
        emit_scan(list(range(1, nc + 1)), diffs, cats)
    else:
        for ci in range(nc):
            emit_scan([ci + 1], [diffs[ci]], [cats[ci]])
    out += b"\xff\xd9"
    return bytes(out)


# --------------------------------------------- arithmetic (QM) decoding
#
# T.81 Annex D QM-coder + §F.2 statistical models (SOF9 sequential /
# SOF10 progressive). The reference decodes these via PIL/libjpeg
# (playwrightcrawler.py:3844-3858). State table: jpeg_aritab.QM_STATES
# (Table D.3, recovered from the system libjpeg and anchor-validated).
# Correctness is pinned two ways (tests/test_imaging.py): (1) decode
# of an arithmetic stream must be BIT-IDENTICAL to decode of the
# Huffman twin of the same pixels/quality (identical quantized
# coefficients, entropy layer the only difference), including for
# streams from a FOREIGN encoder (committed libjpeg arith_code=TRUE
# fixtures, scripts/gen_jpeg_arith_fixtures.py); (2) our own SOF9
# encoder's streams decode identically in libjpeg (checked at fixture
# generation time).

from .jpeg_aritab import QM_STATES as _QM_STATES

_QM_QE = tuple(r[0] for r in _QM_STATES)
_QM_NLPS = tuple(r[1] for r in _QM_STATES)
_QM_NMPS = tuple(r[2] for r in _QM_STATES)
_QM_SW = tuple(r[3] for r in _QM_STATES)

_DC_STAT_BINS = 64
_AC_STAT_BINS = 256


class _QMDecoder:
    """QM-coder decoder, T.81 Annex D in the *lazy-renormalization*
    software form (the one interoperable JPEG decoders converge on):
    the code register C accumulates raw input bytes un-shifted; the
    interval register A is renormalized into [0x8000, 0x10000) at the
    TOP of each decision (deferred from the previous one); CT tracks
    the bit-scale offset between A and C, so A-scale quantities are
    compared against C as ``x << CT``. The MPS subinterval is the
    bottom ``[0, A-Qe)``, the LPS subinterval the top ``[A-Qe, A)``.
    Byte stuffing per §B.1.1.5: 0xFF 0x00 is a literal 0xFF data
    byte; 0xFF fill bytes then a marker end the segment — the decoder
    stops consuming and feeds zero bytes from there on (the
    arithmetic-coding convention for hitting a marker mid-scan)."""

    __slots__ = ("data", "pos", "c", "a", "ct", "end")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.end = False
        # first decision's renorm loop pulls the two initial bytes and
        # re-inits A to 0x10000 (CT = -16 counts the startup deficit)
        self.c = 0
        self.a = 0
        self.ct = -16

    def _byte(self) -> int:
        if self.end:
            return 0
        d, p = self.data, self.pos
        n = len(d)
        if p >= n:
            self.end = True
            return 0
        b = d[p]
        p += 1
        if b != 0xFF:
            self.pos = p
            return b
        while p < n and d[p] == 0xFF:  # swallow 0xFF fill bytes
            p += 1
        if p < n and d[p] == 0x00:
            self.pos = p + 1
            return 0xFF
        self.end = True  # marker (self.pos left at the first 0xFF)
        return 0

    def decode(self, st: bytearray, i: int) -> int:
        """Decode one binary decision in context ``st[i]`` (low 7 bits
        = Table D.3 state index, bit 7 = current MPS sense)."""
        a = self.a
        c = self.c
        ct = self.ct
        # deferred renormalization + BYTEIN (§D.2.6)
        while a < 0x8000:
            ct -= 1
            if ct < 0:
                c = (c << 8) | self._byte()
                ct += 8
                if ct < 0:
                    ct += 1
                    if ct == 0:
                        a = 0x8000  # 2 startup bytes in: A -> 0x10000
            a <<= 1
        sv = st[i]
        state = sv & 0x7F
        qe = _QM_QE[state]
        a -= qe
        temp = a << ct
        if c < temp:
            # MPS subinterval (bottom)
            if a < 0x8000:
                # MPS_EXCHANGE (renorm pending)
                if a < qe:
                    d = (sv >> 7) ^ 1
                    if _QM_SW[state]:
                        sv ^= 0x80
                    st[i] = (sv & 0x80) | _QM_NLPS[state]
                else:
                    d = sv >> 7
                    st[i] = (sv & 0x80) | _QM_NMPS[state]
            else:
                d = sv >> 7  # no renorm -> no state change
        else:
            c -= temp
            # LPS_EXCHANGE (renorm always)
            if a < qe:
                d = sv >> 7
                st[i] = (sv & 0x80) | _QM_NMPS[state]
            else:
                d = (sv >> 7) ^ 1
                if _QM_SW[state]:
                    sv ^= 0x80
                st[i] = (sv & 0x80) | _QM_NLPS[state]
            a = qe
        self.a = a
        self.c = c
        self.ct = ct
        return d


class _QMEncoder:
    """QM-coder encoder (T.81 §D.1) in the convention matching
    :class:`_QMDecoder` / libjpeg: MPS subinterval at the bottom, C
    tracks the interval base, bytes leave from bits 19..26 of C.
    Carry propagation is handled with a one-byte output buffer plus
    stacked-0xFF / deferred-zero accounting (a carry turns stacked
    0xFFs into 0x00s; trailing zero bytes are only emitted when a
    later nonzero byte needs them). 0xFF data bytes are stuffed with
    0x00 per §B.1.1.5."""

    __slots__ = ("c", "a", "ct", "buffer", "sc", "zc", "out")

    def __init__(self):
        self.c = 0
        self.a = 0x10000
        self.ct = 11
        self.buffer = -1  # pending output byte (-1 = none yet)
        self.sc = 0  # stacked 0xFF bytes (may still carry)
        self.zc = 0  # deferred 0x00 bytes (dropped if trailing)
        self.out = bytearray()

    def _drain_zeros(self):
        if self.zc:
            self.out.extend(b"\x00" * self.zc)
            self.zc = 0

    def encode(self, st: bytearray, i: int, val: int) -> None:
        """Encode one binary decision in context ``st[i]``."""
        sv = st[i]
        state = sv & 0x7F
        qe = _QM_QE[state]
        a = self.a - qe
        if val != (sv >> 7):
            # LPS: top subinterval (conditional exchange if Qe > A-Qe)
            if a >= qe:
                self.c += a
                a = qe
            if _QM_SW[state]:
                sv ^= 0x80
            st[i] = (sv & 0x80) | _QM_NLPS[state]
        else:
            # MPS: bottom subinterval
            if a >= 0x8000:
                self.a = a
                return  # no renorm -> no state change
            if a < qe:
                self.c += a
                a = qe
            st[i] = (sv & 0x80) | _QM_NMPS[state]
        # RENORME + BYTEOUT (§D.1.6)
        c = self.c
        ct = self.ct
        out = self.out
        while True:
            a <<= 1
            c <<= 1
            ct -= 1
            if ct == 0:
                temp = c >> 19
                if temp > 0xFF:
                    # carry: propagate into the buffered byte, stacked
                    # 0xFFs roll over to 0x00
                    if self.buffer >= 0:
                        self._drain_zeros()
                        b = self.buffer + 1
                        out.append(b)
                        if b == 0xFF:
                            out.append(0x00)
                    self.zc += self.sc
                    self.sc = 0
                    self.buffer = temp & 0xFF
                elif temp == 0xFF:
                    self.sc += 1
                else:
                    if self.buffer == 0:
                        self.zc += 1
                    elif self.buffer >= 0:
                        self._drain_zeros()
                        out.append(self.buffer)
                    if self.sc:
                        self._drain_zeros()
                        out.extend(b"\xff\x00" * self.sc)
                        self.sc = 0
                    self.buffer = temp
                c &= 0x7FFFF
                ct += 8
            if a >= 0x8000:
                break
        self.a = a
        self.c = c
        self.ct = ct

    def flush(self) -> bytes:
        """§D.1.8 termination: pick the code point in [C, C+A) with the
        most trailing zero bits, emit the remaining significant bytes
        (trailing zero bytes dropped — the decoder zero-fills past the
        marker), and return the finished segment."""
        out = self.out
        temp = (self.a - 1 + self.c) & 0xFFFF0000
        self.c = temp + 0x8000 if temp < self.c else temp
        c = self.c << self.ct
        if c & 0xF8000000:
            # final carry into the buffered byte
            if self.buffer >= 0:
                self._drain_zeros()
                b = self.buffer + 1
                out.append(b)
                if b == 0xFF:
                    out.append(0x00)
            self.zc += self.sc
            self.sc = 0
        else:
            if self.buffer == 0:
                self.zc += 1
            elif self.buffer >= 0:
                self._drain_zeros()
                out.append(self.buffer)
            if self.sc:
                self._drain_zeros()
                out.extend(b"\xff\x00" * self.sc)
                self.sc = 0
        self.buffer = -1
        if c & 0x7FFF800:  # any significant bits left?
            self._drain_zeros()
            b = (c >> 19) & 0xFF
            out.append(b)
            if b == 0xFF:
                out.append(0x00)
            if c & 0x7F800:
                b = (c >> 11) & 0xFF
                out.append(b)
                if b == 0xFF:
                    out.append(0x00)
        return bytes(out)


def _arith_encode_dc(enc, st, dc_context, ci, cond, diff) -> None:
    """Encode one DC difference — inverse of :func:`_arith_decode_dc`."""
    s0 = dc_context[ci]
    if diff == 0:
        enc.encode(st, s0, 0)
        dc_context[ci] = 0
        return
    enc.encode(st, s0, 1)
    sign = 1 if diff < 0 else 0
    v2 = (-diff if sign else diff) - 1
    enc.encode(st, s0 + 1, sign)
    pos = s0 + 2 + sign
    if v2 == 0:
        enc.encode(st, pos, 0)
        m = 0
    else:
        enc.encode(st, pos, 1)
        pos = 20  # X1
        m = 1
        while (m << 1) <= v2:
            enc.encode(st, pos, 1)
            m <<= 1
            pos += 1
        enc.encode(st, pos, 0)
    low, high = cond
    if m < ((1 << low) >> 1):
        dc_context[ci] = 0
    elif m > ((1 << high) >> 1):
        dc_context[ci] = 12 + sign * 4
    else:
        dc_context[ci] = 4 + sign * 4
    pos += 14
    mm = m
    while mm := mm >> 1:
        enc.encode(st, pos, 1 if v2 & mm else 0)


def _arith_encode_ac(enc, st, fixed, coef, kx, k_start, k_end) -> None:
    """Encode AC coefficients k_start..k_end of one block (zigzag
    order) — inverse of :func:`_arith_decode_ac_coefs`."""
    kend = k_end
    while kend >= k_start and coef[kend] == 0:
        kend -= 1
    k = k_start
    while k <= kend:
        base = 3 * (k - 1)
        enc.encode(st, base, 0)  # not EOB
        while coef[k] == 0:
            enc.encode(st, base + 1, 0)
            base += 3
            k += 1
        enc.encode(st, base + 1, 1)
        v = int(coef[k])
        sign = 1 if v < 0 else 0
        v2 = (-v if sign else v) - 1
        enc.encode(fixed, 0, sign)
        pos = base + 2
        if v2 == 0:
            enc.encode(st, pos, 0)
            m = 0
        elif v2 == 1:
            enc.encode(st, pos, 1)
            enc.encode(st, pos, 0)
            m = 1
        else:
            enc.encode(st, pos, 1)
            enc.encode(st, pos, 1)
            m = 2
            pos = 189 if k <= kx else 217  # X2 band split
            while (m << 1) <= v2:
                enc.encode(st, pos, 1)
                m <<= 1
                pos += 1
            enc.encode(st, pos, 0)
        pos += 14
        mm = m
        while mm := mm >> 1:
            enc.encode(st, pos, 1 if v2 & mm else 0)
        k += 1
    if k <= k_end:
        enc.encode(st, 3 * (k - 1), 1)  # EOB


def _arith_decode_dc(dec, st, dc_context, ci, cond) -> int:
    """One DC difference, §F.2.4.1 (contexts S0/SS/SP/SN, magnitude
    categories at X1=20, magnitude bits at X+14)."""
    s0 = dc_context[ci]
    if dec.decode(st, s0) == 0:
        dc_context[ci] = 0
        return 0
    sign = dec.decode(st, s0 + 1)
    m = dec.decode(st, s0 + 2 + sign)
    pos = s0 + 2 + sign
    if m:
        pos = 20  # X1
        m = 1
        while dec.decode(st, pos):
            m <<= 1
            if m == 0x8000:
                raise ValueError("bad arithmetic DC magnitude")
            pos += 1
    low, high = cond
    if m < ((1 << low) >> 1):
        dc_context[ci] = 0
    elif m > ((1 << high) >> 1):
        dc_context[ci] = 12 + sign * 4
    else:
        dc_context[ci] = 4 + sign * 4
    v = m
    pos += 14  # magnitude bits
    while m := m >> 1:
        if dec.decode(st, pos):
            v |= m
    v += 1
    return -v if sign else v


def _arith_decode_ac_coefs(dec, st, fixed, coef, kx, k_start, k_end,
                           al: int = 0):
    """AC coefficients k_start..k_end into ``coef`` (zigzag order),
    §F.2.4.2: per-k EOB decision at 3(k-1), zero-run walk, sign via
    the fixed bin, magnitude categories at X2=189/217 by the Kx band
    split, magnitude bits at +14. ``al`` is the successive-
    approximation shift (progressive AC-first scans, G.2); 0 for
    sequential."""
    k = k_start
    while k <= k_end:
        base = 3 * (k - 1)
        if dec.decode(st, base):
            break  # EOB
        while dec.decode(st, base + 1) == 0:
            base += 3
            k += 1
            if k > k_end:
                raise ValueError("bad arithmetic AC run")
        sign = dec.decode(fixed, 0)
        pos = base + 2
        m = dec.decode(st, pos)
        if m and dec.decode(st, pos):
            m = 2
            pos = 189 if k <= kx else 217
            while dec.decode(st, pos):
                m <<= 1
                if m == 0x8000:
                    raise ValueError("bad arithmetic AC magnitude")
                pos += 1
        v = m
        pos += 14
        while m := m >> 1:
            if dec.decode(st, pos):
                v |= m
        v += 1
        coef[k] = (-v if sign else v) << al
        k += 1


def _decode_arith_scan(data, pos, frame, scomp, qtables, arith_cond,
                       restart_interval):
    """Sequential arithmetic-coded scan (SOF9) — the QM twin of
    :func:`_decode_scan`; same MCU walk, coefficient grids and final
    assembly."""
    comps = frame["comps"]
    by_id = {c["id"]: c for c in comps}
    order = [by_id[cs] for cs, _, _ in scomp]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    h, w = frame["h"], frame["w"]
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    for c in comps:
        c["bx"] = mcus_x * c["h"]
        c["by"] = mcus_y * c["v"]
        c["blocks"] = np.zeros((c["by"] * c["bx"], 8, 8), dtype=np.float64)
        c["pred"] = 0
    tdta = {cs: (td, ta) for cs, td, ta in scomp}
    zz = ZIGZAG
    dc_stats: dict[int, bytearray] = {}
    ac_stats: dict[int, bytearray] = {}
    fixed = bytearray([113])
    dc_context = [0] * len(comps)
    ci_of = {id(c): i for i, c in enumerate(comps)}

    def fresh():
        dc_stats.clear()
        ac_stats.clear()
        for cs, td, ta in scomp:
            dc_stats.setdefault(td, bytearray(_DC_STAT_BINS))
            ac_stats.setdefault(ta, bytearray(_AC_STAT_BINS))
        for i in range(len(dc_context)):
            dc_context[i] = 0
        for c in comps:
            c["pred"] = 0

    fresh()
    dec = _QMDecoder(data, pos)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if (restart_interval and mcu_count
                    and mcu_count % restart_interval == 0):
                # skip to past the RSTn marker, reset all adaptive state
                p = dec.pos
                while p + 1 < len(data) and not (
                        data[p] == 0xFF and 0xD0 <= data[p + 1] <= 0xD7):
                    p += 1
                fresh()
                dec = _QMDecoder(data, p + 2)
            for c in order:
                td, ta = tdta[c["id"]]
                q = qtables.get(c["tq"])
                if q is None:
                    raise ValueError("missing quant table")
                dst = dc_stats[td]
                ast = ac_stats[ta]
                dc_cond = arith_cond.get((0, td), (0, 1))
                kx = arith_cond.get((1, ta), 5)
                ci = ci_of[id(c)]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = np.zeros(64, dtype=np.int32)
                        c["pred"] += _arith_decode_dc(
                            dec, dst, dc_context, ci, dc_cond)
                        coef[0] = c["pred"]
                        _arith_decode_ac_coefs(
                            dec, ast, fixed, coef, kx, 1, 63)
                        block = np.zeros(64, dtype=np.float64)
                        block[zz] = coef * q
                        row = my * c["v"] + by
                        col = mx * c["h"] + bx
                        c["blocks"][row * c["bx"] + col] = block.reshape(8, 8)
            mcu_count += 1
    return _assemble(frame, comps, hmax, vmax)


def _arith_scan_end(data: bytes, pos: int) -> int:
    """Position of the marker terminating the current arithmetic
    entropy segment (first 0xFF not followed by a stuffed 0x00 or an
    RSTn) — the progressive main loop resumes marker parsing there."""
    p = pos
    n = len(data)
    while p + 1 < n:
        if (data[p] == 0xFF and data[p + 1] != 0x00
                and not (0xD0 <= data[p + 1] <= 0xD7)):
            return p
        p += 1
    return n


def _decode_arith_progressive_scan(data, pos, frame, scomp, arith_cond,
                                   restart_interval, ss, se, ah, al):
    """One progressive arithmetic SOS (T.81 G.2, SOF10): updates the
    per-component coefficient accumulators, returns the scan-end byte
    position. Mirrors :func:`_decode_progressive_scan`'s traversal
    (interleaved DC scans over the padded MCU grid; non-interleaved
    AC scans over the component's true block dims) with the QM-coded
    decision models. Adaptive statistics reset at every scan start
    and restart marker."""
    comps = frame["comps"]
    by_id = {c["id"]: c for c in comps}
    order = [by_id[cs] for cs, _, _ in scomp]
    tdta = {cs: (td, ta) for cs, td, ta in scomp}
    ci_of = {id(c): i for i, c in enumerate(comps)}
    dc_stats: dict[int, bytearray] = {}
    ac_stats: dict[int, bytearray] = {}
    fixed = bytearray([113])
    dc_context = [0] * len(comps)

    def fresh():
        dc_stats.clear()
        ac_stats.clear()
        for cs, td, ta in scomp:
            dc_stats.setdefault(td, bytearray(_DC_STAT_BINS))
            ac_stats.setdefault(ta, bytearray(_AC_STAT_BINS))
        for i in range(len(dc_context)):
            dc_context[i] = 0
        for c in comps:
            c["pred"] = 0

    fresh()
    dec = _QMDecoder(data, pos)

    def dc_block(c, idx):
        cf = _coef_of(c, idx)
        if ah == 0:
            td = tdta[c["id"]][0]
            diff = _arith_decode_dc(
                dec, dc_stats[td], dc_context, ci_of[id(c)],
                arith_cond.get((0, td), (0, 1)))
            c["pred"] += diff
            cf[0] = c["pred"] << al
        elif dec.decode(fixed, 0):
            # DC refinement: one fixed-bin decision per block
            cf[0] |= 1 << al
        return cf

    def ac_first(c, idx):
        cf = _coef_of(c, idx)
        ta = tdta[c["id"]][1]
        _arith_decode_ac_coefs(
            dec, ac_stats[ta], fixed, cf,
            arith_cond.get((1, ta), 5), ss, se, al)

    def ac_refine(c, idx):
        cf = _coef_of(c, idx)
        ast = ac_stats[tdta[c["id"]][1]]
        p1, m1 = 1 << al, -1 << al
        # highest nonzero position from prior scans bounds the EOB
        # decisions (jdarith decode_mcu_AC_refine's kex)
        kex = se
        while kex > 0 and cf[kex] == 0:
            kex -= 1
        k = ss
        while k <= se:
            base = 3 * (k - 1)
            if k > kex and dec.decode(ast, base):
                break  # EOB
            while True:
                v = cf[k]
                if v != 0:
                    # previously-nonzero coefficient: one correction bit
                    if dec.decode(ast, base + 2):
                        cf[k] = v + (p1 if v >= 0 else m1)
                    break
                if dec.decode(ast, base + 1):
                    # newly nonzero: sign via the fixed bin
                    cf[k] = m1 if dec.decode(fixed, 0) else p1
                    break
                base += 3
                k += 1
                if k > se:
                    raise ValueError("bad arithmetic AC refine run")
            k += 1

    def do_restart():
        nonlocal dec
        p = dec.pos
        while p + 1 < len(data) and not (
                data[p] == 0xFF and 0xD0 <= data[p + 1] <= 0xD7):
            p += 1
        fresh()
        dec = _QMDecoder(data, p + 2)

    unit = 0
    if ss == 0 and len(order) > 1:
        # interleaved DC scan
        for my in range(frame["mcus_y"]):
            for mx in range(frame["mcus_x"]):
                if restart_interval and unit and unit % restart_interval == 0:
                    do_restart()
                for c in order:
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            row = my * c["v"] + by
                            col = mx * c["h"] + bx
                            dc_block(c, row * c["bx"] + col)
                unit += 1
    else:
        c = order[0]
        fn = dc_block if ss == 0 else (ac_first if ah == 0 else ac_refine)
        for row in range(c["h2"]):
            for col in range(c["w2"]):
                if restart_interval and unit and unit % restart_interval == 0:
                    do_restart()
                fn(c, row * c["bx"] + col)
                unit += 1
    return _arith_scan_end(data, dec.pos)


# ------------------------------------------------- progressive decoding

def _init_progressive(frame) -> None:
    """Allocate per-component zigzag-order coefficient accumulators
    (lazy per-block lists — Python-list scalar access is ~5× faster
    than numpy in the per-symbol hot loops) sized to the padded MCU
    grid, plus the TRUE block dims non-interleaved scans traverse."""
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    h, w = frame["h"], frame["w"]
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    for c in comps:
        c["bx"] = mcus_x * c["h"]
        c["by"] = mcus_y * c["v"]
        # true (unpadded-to-MCU) block dims, T.81 A.1.1/A.2.2: a
        # non-interleaved scan covers ceil(comp_px / 8) blocks only
        px_w = -(-w * c["h"] // hmax)
        px_h = -(-h * c["v"] // vmax)
        c["w2"] = -(-px_w // 8)
        c["h2"] = -(-px_h // 8)
        c["coef"] = [None] * (c["by"] * c["bx"])
        c["pred"] = 0
    frame["hmax"], frame["vmax"] = hmax, vmax
    frame["mcus_x"], frame["mcus_y"] = mcus_x, mcus_y


def _coef_of(c, idx: int) -> list[int]:
    cf = c["coef"][idx]
    if cf is None:
        cf = c["coef"][idx] = [0] * 64
    return cf


def _scan_end(reader: _BitReader) -> int:
    """Position of the marker terminating the current entropy segment
    (the progressive main loop resumes marker parsing there)."""
    data = reader.data
    if reader.marker is not None and not (0xD0 <= reader.marker <= 0xD7):
        return reader.pos - 2
    p = reader.pos
    while p + 1 < len(data):
        if (data[p] == 0xFF and data[p + 1] != 0x00
                and not (0xD0 <= data[p + 1] <= 0xD7)):
            return p
        p += 1
    return len(data)


def _decode_progressive_scan(data, pos, frame, scomp, htables,
                             restart_interval, ss, se, ah, al) -> int:
    """One progressive SOS (T.81 G.2): updates the per-component
    coefficient accumulators, returns the scan-end byte position.

    DC scans (ss == 0) may be interleaved; AC scans are one-component
    by construction and traverse the component's true block grid.
    ``ah == 0`` is a first pass at approximation level ``al``;
    ``ah > 0`` refines one magnitude bit (libjpeg-compatible
    correction-bit semantics)."""
    comps = frame["comps"]
    by_id = {c["id"]: c for c in comps}
    order = [by_id[cs] for cs, _, _ in scomp]
    tdta = {cs: (td, ta) for cs, td, ta in scomp}
    reader = _BitReader(data, pos)
    eobrun = 0

    def dc_block(c, idx):
        cf = _coef_of(c, idx)
        if ah == 0:
            td = tdta[c["id"]][0]
            dc_t = htables.get((0, td))
            if dc_t is None:
                raise ValueError("missing huffman table")
            t = reader.decode(dc_t)
            diff = _extend(reader.read(t), t)
            c["pred"] += diff
            cf[0] = c["pred"] << al
        elif reader.read(1):
            cf[0] |= 1 << al

    def ac_first(c, idx):
        nonlocal eobrun
        cf = _coef_of(c, idx)
        if eobrun > 0:
            eobrun -= 1
            return
        ac_t = htables.get((1, tdta[c["id"]][1]))
        if ac_t is None:
            raise ValueError("missing huffman table")
        k = ss
        while k <= se:
            rs = reader.decode(ac_t)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r < 15:
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += reader.read(r)
                    break
                k += 16  # ZRL
                continue
            k += r
            if k > se:
                raise ValueError("AC index overflow")
            cf[k] = _extend(reader.read(s), s) << al
            k += 1

    def ac_refine(c, idx):
        nonlocal eobrun
        cf = _coef_of(c, idx)
        p1, m1 = 1 << al, -1 << al
        ac_t = htables.get((1, tdta[c["id"]][1]))
        if ac_t is None:
            raise ValueError("missing huffman table")
        k = ss
        if eobrun == 0:
            while k <= se:
                rs = reader.decode(ac_t)
                r, s = rs >> 4, rs & 0xF
                new = 0
                if s == 0:
                    if r < 15:
                        # refinement EOBn counts the CURRENT block too
                        # (its tail correction bits are consumed by the
                        # eobrun clause below, which then decrements) —
                        # libjpeg decode_mcu_AC_refine semantics
                        eobrun = 1 << r
                        if r:
                            eobrun += reader.read(r)
                        break
                    # r == 15: pass over 16 zero-history coefficients
                else:
                    if s != 1:
                        raise ValueError("bad AC refinement symbol")
                    new = p1 if reader.read(1) else m1
                # advance over r zero-history positions, applying
                # correction bits to nonzero-history ones in between
                while k <= se:
                    v = cf[k]
                    if v != 0:
                        if reader.read(1) and (v & p1) == 0:
                            cf[k] = v + (p1 if v >= 0 else m1)
                    else:
                        if r == 0:
                            if new:
                                cf[k] = new
                            k += 1
                            break
                        r -= 1
                    k += 1
        if eobrun > 0:
            # EOB region: only correction bits for nonzero history
            while k <= se:
                v = cf[k]
                if v != 0:
                    if reader.read(1) and (v & p1) == 0:
                        cf[k] = v + (p1 if v >= 0 else m1)
                k += 1
            eobrun -= 1

    def do_restart():
        nonlocal eobrun
        reader.restart()
        eobrun = 0
        for c in comps:
            c["pred"] = 0

    unit = 0  # MCUs (interleaved) or blocks (single-component scan)
    if ss == 0 and len(order) > 1:
        # interleaved DC scan: MCU traversal over the padded grid
        for my in range(frame["mcus_y"]):
            for mx in range(frame["mcus_x"]):
                if restart_interval and unit and unit % restart_interval == 0:
                    do_restart()
                for c in order:
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            row = my * c["v"] + by
                            col = mx * c["h"] + bx
                            dc_block(c, row * c["bx"] + col)
                unit += 1
    else:
        # non-interleaved scan (all AC scans; single-component DC):
        # row-major over the component's TRUE block dims
        c = order[0]
        fn = dc_block if ss == 0 else (ac_first if ah == 0 else ac_refine)
        for row in range(c["h2"]):
            for col in range(c["w2"]):
                if restart_interval and unit and unit % restart_interval == 0:
                    do_restart()
                fn(c, row * c["bx"] + col)
                unit += 1
    return _scan_end(reader)


def _finish_progressive(frame, qtables) -> np.ndarray:
    """All scans consumed: dequantize the accumulated zigzag
    coefficients (vectorized over every block at once) and assemble."""
    comps = frame["comps"]
    zz = ZIGZAG
    for c in comps:
        q = qtables.get(c["tq"])
        if q is None:
            raise ValueError("missing quant table")
        n = c["by"] * c["bx"]
        arr = np.zeros((n, 64), dtype=np.int64)
        for i, cf in enumerate(c["coef"]):
            if cf is not None:
                arr[i] = cf
        deq = arr * q[None, :].astype(np.int64)
        blocks = np.zeros((n, 64), dtype=np.float64)
        blocks[:, zz] = deq
        c["blocks"] = blocks.reshape(n, 8, 8)
    return _assemble(frame, comps, frame["hmax"], frame["vmax"])


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


def jpeg_encode_arithmetic(pixels: np.ndarray, quality: int = 92,
                           subsampling: str = "444",
                           restart_interval: int = 0) -> bytes:
    """Encode (h, w, 3) uint8 RGB → sequential arithmetic-coded JFIF
    (SOF9): the QM-coded twin of :func:`jpeg_encode` — identical
    quantized coefficients, entropy layer swapped for the Annex D
    coder with the §F.1.4 statistical models (default conditioning:
    L=0/U=1 DC, Kx=5 AC, so no DAC marker is needed). With
    ``restart_interval`` > 0, RSTn markers split the scan into
    independently decodable chunks (all adaptive state resets)."""
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
    if subsampling == "420":
        eby, ebx = -(-qy.shape[0] // vs) * vs, -(-qy.shape[1] // hs) * hs
        qy = np.pad(qy, ((0, eby - qy.shape[0]), (0, ebx - qy.shape[1]),
                         (0, 0), (0, 0)), mode="edge")
        mby, mbx = eby // vs, ebx // hs
        qcb = np.pad(qcb, ((0, mby - qcb.shape[0]), (0, mbx - qcb.shape[1]),
                           (0, 0), (0, 0)), mode="edge")
        qcr = np.pad(qcr, ((0, mby - qcr.shape[0]), (0, mbx - qcr.shape[1]),
                           (0, 0), (0, 0)), mode="edge")

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tq, q in ((0, ql), (1, qc)):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tq) + bytes(
            int(v) for v in q[ZIGZAG]
        )
    out += b"\xff\xc9" + struct.pack(">HBHHB", 17, 8, h, w, 3)  # SOF9
    for cid, hv, tq in ((1, (hs << 4) | vs, 0), (2, 0x11, 1), (3, 0x11, 1)):
        out += struct.pack(">BBB", cid, hv, tq)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    for cid, tdta in ((1, 0x00), (2, 0x11), (3, 0x11)):
        out += struct.pack(">BB", cid, tdta)
    out += b"\x00\x3f\x00"  # Ss/Se/AhAl

    dc_stats = {0: bytearray(_DC_STAT_BINS), 1: bytearray(_DC_STAT_BINS)}
    ac_stats = {0: bytearray(_AC_STAT_BINS), 1: bytearray(_AC_STAT_BINS)}
    fixed = bytearray([113])
    dc_context = [0, 0, 0]
    preds = [0, 0, 0]
    enc = _QMEncoder()
    dc_cond = (0, 1)
    kx = 5

    def fresh():
        nonlocal enc
        for st in (*dc_stats.values(), *ac_stats.values()):
            for i in range(len(st)):
                st[i] = 0
        fixed[0] = 113
        dc_context[:] = [0, 0, 0]
        preds[:] = [0, 0, 0]
        enc = _QMEncoder()

    def encode_block(ci, coef):
        zzc = coef.flatten()[ZIGZAG].astype(np.int64)
        t = ci if ci == 0 else 1
        diff = int(zzc[0]) - preds[ci]
        preds[ci] = int(zzc[0])
        _arith_encode_dc(enc, dc_stats[t], dc_context, ci, dc_cond, diff)
        _arith_encode_ac(enc, ac_stats[t], fixed, zzc.tolist(), kx, 1, 63)

    mcu = 0
    rst = 0

    def maybe_restart():
        nonlocal rst
        if restart_interval and mcu and mcu % restart_interval == 0:
            out.extend(enc.flush())
            out.extend(bytes((0xFF, 0xD0 + rst)))
            rst = (rst + 1) & 7
            fresh()

    if subsampling == "444":
        for by in range(qy.shape[0]):
            for bx in range(qy.shape[1]):
                maybe_restart()
                for ci, grid in enumerate((qy, qcb, qcr)):
                    encode_block(ci, grid[by, bx])
                mcu += 1
    else:  # 420: MCU = 4 Y blocks + 1 Cb + 1 Cr
        for my in range(qcb.shape[0]):
            for mx in range(qcb.shape[1]):
                maybe_restart()
                for dy in range(2):
                    for dx in range(2):
                        encode_block(0, qy[my * 2 + dy, mx * 2 + dx])
                encode_block(1, qcb[my, mx])
                encode_block(2, qcr[my, mx])
                mcu += 1
    out += enc.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ------------------------------------------------- progressive encoder

def _fixed_table(symbols: set[int]) -> tuple[list[int], list[int]]:
    """Fixed-length canonical Huffman table over exactly the symbols a
    scan emits (Annex-K AC tables have no spare code space for the EOBn
    symbols progressive scans need — kraft sum leaves one 16-bit slot).
    All codes get length L with 2^L > n, so the all-ones code stays
    unused as T.81 canonical construction expects."""
    vals = sorted(symbols)
    n = max(1, len(vals))
    length = max(2, (n + 1).bit_length())  # 2^L - 1 >= n
    bits = [0] * 16
    bits[length - 1] = n
    return bits, vals


def _zz_grid(q_natural: np.ndarray) -> np.ndarray:
    """(by, bx, 8, 8) natural-order quantized blocks → (by, bx, 64)
    zigzag vectors."""
    by, bx = q_natural.shape[:2]
    return q_natural.reshape(by, bx, 64)[:, :, ZIGZAG]


def _enc_ac_first_events(zzc: np.ndarray, h2: int, w2: int, ss: int,
                         se: int, al: int) -> list[tuple]:
    """AC first-pass (Ah=0) symbol stream for one component band:
    [('sym', rs), ('bits', value, nbits), ...] with EOB-run folding."""
    events: list[tuple] = []
    eobrun = 0

    def flush():
        nonlocal eobrun
        while eobrun > 0:
            r = min(14, eobrun.bit_length() - 1)
            run = min(eobrun, (1 << r) * 2 - 1)
            extra = run - (1 << r)
            events.append(("sym", r << 4))
            if r:
                events.append(("bits", extra, r))
            eobrun -= run

    # point transform truncates toward zero (T.81 G.1.2.1) — done for
    # the whole component at once; per-block work is plain-list only
    bm = zzc[:, :, ss : se + 1].astype(np.int64)
    if al:
        bm = np.sign(bm) * (np.abs(bm) >> al)
    for row in range(h2):
        for col in range(w2):
            band = bm[row, col].tolist()
            nz = [i for i, x in enumerate(band) if x]
            if not nz:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush()
                continue
            flush()
            r = 0
            for i in range(nz[-1] + 1):
                x = band[i]
                if x == 0:
                    r += 1
                    continue
                while r > 15:
                    events.append(("sym", 0xF0))
                    r -= 16
                s = abs(x).bit_length()
                events.append(("sym", (r << 4) | s))
                events.append(("bits", x if x > 0 else x + (1 << s) - 1, s))
                r = 0
            if nz[-1] < se - ss:
                eobrun += 1
    flush()
    return events


def _enc_ac_refine_events(zzc: np.ndarray, h2: int, w2: int, ss: int,
                          se: int, al: int) -> list[tuple]:
    """AC refinement (Ah = al+1 → Al = al) symbol stream, walk-accurate:
    correction bits are interleaved exactly where the decoder's
    position walk reads them (after the ZRL or run-length symbol whose
    walk passes over the coefficient)."""
    events: list[tuple] = []
    eobrun = 0
    eob_bits: list[int] = []  # corrections owed by EOB-covered blocks

    def flush():
        nonlocal eobrun
        while eobrun > 0:
            r = min(14, eobrun.bit_length() - 1)
            run = min(eobrun, (1 << r) * 2 - 1)
            extra = run - (1 << r)
            events.append(("sym", r << 4))
            if r:
                events.append(("bits", extra, r))
            # refinement EOBn carries the covered blocks' correction
            # bits (in block order) right after the run length
            for b in eob_bits:
                events.append(("bits", b, 1))
            eob_bits.clear()
            eobrun -= run

    full_mat = zzc[:, :, ss : se + 1].astype(np.int64)
    absv_mat = np.abs(full_mat) >> al
    for row in range(h2):
        for col in range(w2):
            full = full_mat[row, col].tolist()
            absv = absv_mat[row, col].tolist()
            newsig = [i for i, a in enumerate(absv) if a == 1]
            if not newsig:
                # fully EOB-covered block: queue corrections for every
                # already-significant coefficient
                eobrun += 1
                eob_bits.extend((a & 1) for a in absv if a > 1)
                if eobrun == 0x7FFF:
                    flush()
                continue
            flush()
            idx = 0
            for n in newsig:
                zeros = sum(1 for j in range(idx, n) if absv[j] == 0)
                while zeros > 15:
                    events.append(("sym", 0xF0))
                    # walk: consume positions up to & incl. the 16th
                    # zero-history, emitting corrections in between
                    zc = 0
                    while zc < 16:
                        if absv[idx] == 0:
                            zc += 1
                        else:
                            events.append(("bits", absv[idx] & 1, 1))
                        idx += 1
                    zeros -= 16
                events.append(("sym", (zeros << 4) | 1))
                events.append(("bits", 1 if full[n] > 0 else 0, 1))
                # walk from idx to the new coefficient at n
                while idx < n:
                    if absv[idx] > 1:
                        events.append(("bits", absv[idx] & 1, 1))
                    idx += 1
                idx = n + 1
            # tail: corrections after the last newly-significant
            # position belong to this block's EOB region
            tail = [(absv[j] & 1) for j in range(idx, se - ss + 1)
                    if absv[j] > 1]
            if tail or idx <= se - ss:
                eobrun += 1
                eob_bits.extend(tail)
    flush()
    return events


def jpeg_encode_progressive(pixels: np.ndarray, quality: int = 92,
                            subsampling: str = "444") -> bytes:
    """Encode (h, w, 3) uint8 RGB → progressive (SOF2) JFIF with the
    classic simple progression: interleaved DC first pass at Al=1 plus
    a DC refinement scan, then per-component AC band scans — a low band
    with a successive-approximation first/refine pair and the high band
    plain — so decoding exercises spectral selection, EOB runs and
    both approximation paths."""
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
    if subsampling == "420":
        eby, ebx = -(-qy.shape[0] // vs) * vs, -(-qy.shape[1] // hs) * hs
        qy = np.pad(qy, ((0, eby - qy.shape[0]), (0, ebx - qy.shape[1]),
                         (0, 0), (0, 0)), mode="edge")
        mby, mbx = eby // vs, ebx // hs
        qcb = np.pad(qcb, ((0, mby - qcb.shape[0]), (0, mbx - qcb.shape[1]),
                           (0, 0), (0, 0)), mode="edge")
        qcr = np.pad(qcr, ((0, mby - qcr.shape[0]), (0, mbx - qcr.shape[1]),
                           (0, 0), (0, 0)), mode="edge")
    # true block dims (what non-interleaved AC scans traverse):
    # ceil(ceil(px / sampling) / 8) per T.81 A.1.1
    cw2 = -(-(-(-w // hs)) // 8)
    ch2 = -(-(-(-h // vs)) // 8)
    comps = [
        {"id": 1, "h": hs, "v": vs, "tq": 0, "zz": _zz_grid(qy),
         "w2": -(-w // 8), "h2": -(-h // 8)},
        {"id": 2, "h": 1, "v": 1, "tq": 1, "zz": _zz_grid(qcb),
         "w2": cw2, "h2": ch2},
        {"id": 3, "h": 1, "v": 1, "tq": 1, "zz": _zz_grid(qcr),
         "w2": cw2, "h2": ch2},
    ]

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tq, q in ((0, ql), (1, qc)):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tq) + bytes(
            int(v) for v in q[ZIGZAG]
        )
    out += b"\xff\xc2" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    for c in comps:
        out += struct.pack(">BBB", c["id"], (c["h"] << 4) | c["v"], c["tq"])

    def emit_dht(tc: int, th: int, bits: list[int], vals: list[int]) -> None:
        out.extend(b"\xff\xc4" + struct.pack(">HB", 19 + sum(bits),
                                             (tc << 4) | th))
        out.extend(bytes(bits) + bytes(vals))

    def emit_sos(scomps: list[tuple[int, int, int]], ss: int, se: int,
                 ah: int, al: int, payload: bytes) -> None:
        out.extend(b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(scomps),
                                             len(scomps)))
        for cid, td, ta in scomps:
            out.extend(struct.pack(">BB", cid, (td << 4) | ta))
        out.extend(struct.pack(">BBB", ss, se, (ah << 4) | al))
        out.extend(payload)

    # ---- scan 1: interleaved DC first pass, Al=1 ----
    dc_l = _huff_table(_DC_LUMA_BITS, _DC_LUMA_VALS)
    dc_c = _huff_table(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
    emit_dht(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS)
    emit_dht(0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS)
    bw = _BitWriter()
    preds = {c["id"]: 0 for c in comps}
    mby, mbx = comps[1]["zz"].shape[0], comps[1]["zz"].shape[1]
    if subsampling == "444":
        mby, mbx = comps[0]["zz"].shape[0], comps[0]["zz"].shape[1]
    for my in range(mby):
        for mx in range(mbx):
            for c in comps:
                tab = dc_l if c["id"] == 1 else dc_c
                for dy in range(c["v"]):
                    for dx in range(c["h"]):
                        dc = int(c["zz"][my * c["v"] + dy,
                                         mx * c["h"] + dx, 0]) >> 1  # Al=1
                        diff = dc - preds[c["id"]]
                        preds[c["id"]] = dc
                        size = abs(diff).bit_length()
                        code, ln = tab.enc[size]
                        bw.write(code, ln)
                        if size:
                            bw.write(diff if diff > 0 else
                                     diff + (1 << size) - 1, size)
    bw.flush()
    emit_sos([(1, 0, 0), (2, 1, 0), (3, 1, 0)], 0, 0, 0, 1, bytes(bw.out))

    # ---- scan 2: DC refinement, Ah=1 Al=0 (raw bits, no tables) ----
    bw = _BitWriter()
    for my in range(mby):
        for mx in range(mbx):
            for c in comps:
                for dy in range(c["v"]):
                    for dx in range(c["h"]):
                        bw.write(int(c["zz"][my * c["v"] + dy,
                                             mx * c["h"] + dx, 0]) & 1, 1)
    bw.flush()
    emit_sos([(1, 0, 0), (2, 0, 0), (3, 0, 0)], 0, 0, 1, 0, bytes(bw.out))

    # ---- per-component AC scans ----
    def write_events(events: list[tuple], table: _HuffTable) -> bytes:
        bw = _BitWriter()
        for ev in events:
            if ev[0] == "sym":
                code, ln = table.enc[ev[1]]
                bw.write(code, ln)
            else:
                bw.write(ev[1], ev[2])
        bw.flush()
        return bytes(bw.out)

    def ac_scan(c: dict, ss: int, se: int, ah: int, al: int) -> None:
        if ah == 0:
            events = _enc_ac_first_events(c["zz"], c["h2"], c["w2"],
                                          ss, se, al)
        else:
            events = _enc_ac_refine_events(c["zz"], c["h2"], c["w2"],
                                           ss, se, al)
        syms = {ev[1] for ev in events if ev[0] == "sym"} or {0x00}
        bits, vals = _fixed_table(syms)
        table = _huff_table(bits, vals)
        emit_dht(1, 0, bits, vals)
        emit_sos([(c["id"], 0, 0)], ss, se, ah, al,
                 write_events(events, table))

    for c in comps:
        ac_scan(c, 1, 5, 0, 1)    # low band, first pass at Al=1
    for c in comps:
        ac_scan(c, 1, 5, 1, 0)    # low band, refinement to full precision
    for c in comps:
        ac_scan(c, 6, 63, 0, 0)   # high band, plain spectral selection
    out += b"\xff\xd9"
    return bytes(out)


# ----------------------------------------- hierarchical (Annex J)
#
# T.81 Annex J hierarchical process: a DHP segment (0xFFDE, same
# syntax as a frame header) announces the full-resolution dimensions,
# then a SEQUENCE of frames refines per-component reference planes —
# a non-differential first frame (here SOF0/SOF1 sequential or SOF3
# lossless) followed by differential frames (SOF5 sequential DCT /
# SOF7 lossless) that code the difference between the source and the
# reference, optionally doubled first by an EXP segment (0xFFDF)
# using the J.1.1.2 interpolation filter. In differential DCT frames
# the DC coefficient has no DPCM prediction (PRED = 0, F.1.1.5.1)
# and the IDCT output carries no +128 level shift (A.3.1 applies to
# non-differential frames only); the reconstruction adds the decoded
# difference to the reference and clamps to [0, 255]. Differential
# lossless scans code per-sample differences directly (Ss = 0 — the
# predictor is the reference plane, not a neighbour) with modulo-2^16
# arithmetic, which is what makes a final SOF7 correction frame
# bit-exact. The reference crawler decodes hierarchical streams via
# PIL/libjpeg (playwrightcrawler.py:3844-3858) — though stock libjpeg
# never implemented Annex J, so this pure-Python path actually
# exceeds it; correctness is pinned by encoder/decoder round trips
# (bit-exact with a lossless final frame), a hand-built spec vector
# for the EXP filter, and the mutation-fuzz taxonomy suite.
#
# Supported subset (documented, typed errors otherwise): 8-bit
# precision, 1x1 sampling within every frame (the pyramid itself
# carries the multi-resolution structure), Huffman entropy coding
# (progressive/arithmetic differential frames -> NotImplementedError),
# point transform 0 in differential lossless scans. Color convention
# follows the non-hierarchical processes: any lossless frame in the
# sequence => component-literal RGB (the SOF3/PVRG convention),
# all-DCT sequence => YCbCr.


def _hier_expand(plane: np.ndarray, eh: int, ev: int) -> np.ndarray:
    """J.1.1.2 reference expansion: output(2i) = input(i),
    output(2i+1) = (input(i) + input(i+1) + 1) >> 1 with the last
    sample replicated at the edge; per axis."""
    p = plane.astype(np.int64)
    if ev:
        nxt = np.vstack([p[1:], p[-1:]])
        out = np.empty((p.shape[0] * 2, p.shape[1]), np.int64)
        out[0::2] = p
        out[1::2] = (p + nxt + 1) >> 1
        p = out
    if eh:
        nxt = np.hstack([p[:, 1:], p[:, -1:]])
        out = np.empty((p.shape[0], p.shape[1] * 2), np.int64)
        out[:, 0::2] = p
        out[:, 1::2] = (p + nxt + 1) >> 1
        p = out
    return p.astype(np.int32)


def _hier_recon(spatial: np.ndarray, ref: np.ndarray | None = None) -> np.ndarray:
    """Frame reconstruction shared by decoder AND encoder mirror:
    clamp(round(ref + spatial)) — both sides run the identical float
    pipeline, so reference planes match bit-for-bit."""
    x = spatial if ref is None else ref + spatial
    return np.clip(np.round(x), 0, 255).astype(np.int32)


def _grid_to_spatial(qgrid: np.ndarray, q: np.ndarray, h: int, w: int,
                     level_shift: bool) -> np.ndarray:
    """(by, bx, 8, 8) quantized natural-order coefficients → cropped
    float spatial plane (the encoder's decoder-mirror)."""
    by, bx = qgrid.shape[:2]
    co = qgrid.reshape(-1, 8, 8).astype(np.float64) * q.reshape(8, 8)
    sam = _idct_blocks(co) + (128.0 if level_shift else 0.0)
    plane = sam.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
    return plane[:h, :w]


def _hier_dct_scan(data, pos, frame, scomp, qtables, htables,
                   restart_interval, refs, differential):
    """One sequential-DCT SOS inside a hierarchical sequence (1x1
    sampling: MCU = one block per scan component). Updates ``refs``
    in place with the reconstructed planes."""
    by_id = {c["id"]: c for c in frame["comps"]}
    h, w = frame["h"], frame["w"]
    bx_n, by_n = -(-w // 8), -(-h // 8)
    order = []
    for cs, td, ta in scomp:
        c = by_id[cs]
        dc_t, ac_t = htables.get((0, td)), htables.get((1, ta))
        if dc_t is None or ac_t is None:
            raise ValueError("missing huffman table")
        q = qtables.get(c["tq"])
        if q is None:
            raise ValueError("missing quant table")
        blocks = np.zeros((by_n * bx_n, 8, 8), dtype=np.float64)
        order.append([c, dc_t, ac_t, q, blocks, 0])  # [-1] = DC pred
    reader = _BitReader(data, pos)
    zz = ZIGZAG
    for idx in range(by_n * bx_n):
        if restart_interval and idx and idx % restart_interval == 0:
            reader.restart()
            for ent in order:
                ent[5] = 0
        for ent in order:
            _c, dc_t, ac_t, q, blocks, pred = ent
            coef = np.zeros(64, dtype=np.int32)
            t = reader.decode(dc_t)
            diff = _extend(reader.read(t), t)
            if differential:
                coef[0] = diff          # F.1.1.5.1: PRED = 0
            else:
                ent[5] = pred = pred + diff
                coef[0] = pred
            k = 1
            while k < 64:
                rs = reader.decode(ac_t)
                r, s = rs >> 4, rs & 0xF
                if s == 0:
                    if r == 15:
                        k += 16
                        continue
                    break
                k += r
                if k > 63:
                    raise ValueError("AC index overflow")
                coef[k] = _extend(reader.read(s), s)
                k += 1
            block = np.zeros(64, dtype=np.float64)
            block[zz] = coef * q
            blocks[idx] = block.reshape(8, 8)
        # (idx walks the shared 1x1 block grid in raster order)
    for c, _dc, _ac, _q, blocks, _p in order:
        plane = (_idct_blocks(blocks) + (0.0 if differential else 128.0))
        plane = (plane.reshape(by_n, bx_n, 8, 8).transpose(0, 2, 1, 3)
                 .reshape(by_n * 8, bx_n * 8))[:h, :w]
        refs[c["id"]] = _hier_recon(
            plane, refs[c["id"]] if differential else None
        )
    return _scan_end(reader)


def _hier_lossless_diff_scan(data, pos, frame, scomp, htables,
                             restart_interval, refs, pt):
    """Differential lossless SOS: each sample's difference to the
    reference plane is SSSS-category Huffman coded (no spatial
    predictor); reconstruction is modulo 2^16 (H.1.2.1)."""
    if pt != 0:
        raise NotImplementedError(
            "point transform in differential lossless hierarchical scan"
        )
    h, w = frame["h"], frame["w"]
    by_id = {c["id"]: c for c in frame["comps"]}
    order = []
    for cs, td, _ta in scomp:
        c = by_id[cs]
        t = htables.get((0, td))
        if t is None:
            raise ValueError("missing huffman table")
        ref = refs[c["id"]]
        if ref.shape != (h, w):
            raise ValueError("reference resolution mismatch in scan")
        order.append((c, t, ref.reshape(-1).tolist(), [0] * (h * w)))
    reader = _BitReader(data, pos)
    decode, read = reader.decode, reader.read
    n = h * w
    for idx in range(n):
        if restart_interval and idx and idx % restart_interval == 0:
            reader.restart()
        for _c, t, ref, out in order:
            ssss = decode(t)
            if ssss == 0:
                diff = 0
            elif ssss == 16:
                diff = 32768
            else:
                v = read(ssss)
                diff = v - (1 << ssss) + 1 if v < (1 << (ssss - 1)) else v
            out[idx] = (ref[idx] + diff) & 0xFFFF
    for c, _t, _ref, out in order:
        refs[c["id"]] = np.clip(
            np.array(out, dtype=np.int32).reshape(h, w), 0, 255
        )
    return _scan_end(reader)


def _ycc_to_rgb(planes: list[np.ndarray]) -> np.ndarray:
    y = planes[0].astype(np.float64)
    cb = planes[1].astype(np.float64) - 128.0
    cr = planes[2].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=2).round(), 0, 255).astype(np.uint8)


def _decode_hierarchical(data: bytes, pos: int, dhp_seg: bytes,
                         max_pixels: int) -> np.ndarray:
    """Marker loop for the frames following a DHP segment."""
    prec, fy, fx, nf = struct.unpack_from(">BHHB", dhp_seg, 0)
    if prec != 8:
        raise NotImplementedError("only 8-bit precision")
    if fy * fx > max_pixels:
        raise MemoryError(f"decompression bomb: {fx}x{fy}")
    if not 1 <= nf <= 4 or len(dhp_seg) < 6 + 3 * nf:
        raise ValueError("bad DHP segment")
    dhp_ids = [dhp_seg[6 + 3 * c] for c in range(nf)]
    if len(set(dhp_ids)) != nf:
        raise ValueError("duplicate DHP component id")
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _HuffTable] = {}
    refs: dict[int, np.ndarray] = {}
    restart_interval = 0
    pending_exp: tuple[int, int] | None = None
    frame = None
    saw_lossless = False
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        seg = data[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:
            _parse_dqt(seg, qtables)
        elif marker == 0xC4:
            _parse_dht(seg, htables)
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDE:
            raise ValueError("nested DHP segment")
        elif marker == 0xDF:  # EXP
            if not seg:
                raise ValueError("empty EXP segment")
            eh, ev = seg[0] >> 4, seg[0] & 0xF
            if eh not in (0, 1) or ev not in (0, 1) or not (eh or ev):
                raise ValueError(f"bad EXP expansion {eh},{ev}")
            pending_exp = (eh, ev)
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC7):
            differential = marker in (0xC5, 0xC7)
            lossless = marker in (0xC3, 0xC7)
            p2, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if p2 != 8:
                raise NotImplementedError("only 8-bit precision")
            if h * w > max_pixels or h > fy or w > fx:
                raise ValueError("hierarchical frame exceeds DHP dims")
            comps = []
            for c in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * c)
                if cid not in dhp_ids:
                    raise ValueError(f"frame component {cid} not in DHP")
                if hv != 0x11:
                    raise NotImplementedError(
                        "subsampled hierarchical frame"
                    )
                comps.append({"id": cid, "h": 1, "v": 1, "tq": tq})
            if differential:
                for c in comps:
                    if c["id"] not in refs:
                        raise ValueError(
                            "differential frame before its reference"
                        )
                if pending_exp:
                    eh, ev = pending_exp
                    for c in comps:
                        refs[c["id"]] = _hier_expand(refs[c["id"]], eh, ev)
                    pending_exp = None
                for c in comps:
                    r = refs[c["id"]]
                    if r.shape[0] < h or r.shape[1] < w:
                        raise ValueError(
                            "reference smaller than differential frame"
                        )
                    refs[c["id"]] = r[:h, :w]
            elif pending_exp:
                raise ValueError("EXP before a non-differential frame")
            frame = {"h": h, "w": w, "comps": comps,
                     "differential": differential, "lossless": lossless}
        elif marker in (0xC2, 0xC6, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"hierarchical progressive/arithmetic frame "
                f"(marker 0xFF{marker:02X})"
            )
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("SOS before any hierarchical frame")
            ns = seg[0]
            frame_ids = {c["id"] for c in frame["comps"]}
            scomp = []
            for c in range(ns):
                cs, tda = seg[1 + 2 * c], seg[2 + 2 * c]
                if cs not in frame_ids:
                    raise ValueError(f"scan references unknown component {cs}")
                scomp.append((cs, tda >> 4, tda & 0xF))
            ss = seg[1 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            if frame["lossless"]:
                saw_lossless = True
                if frame["differential"]:
                    if ss != 0:
                        raise ValueError(
                            "differential lossless scan must have Ss=0"
                        )
                    pos = _hier_lossless_diff_scan(
                        data, pos, frame, scomp, htables,
                        restart_interval, refs, ahal & 0xF,
                    )
                else:
                    pos = _decode_lossless_scan(
                        data, pos, frame, scomp, htables,
                        restart_interval, ss, ahal & 0xF,
                    )
                    by_id = {c["id"]: c for c in frame["comps"]}
                    for cs, _td, _ta in scomp:
                        c = by_id[cs]
                        refs[cs] = np.clip(
                            c["plane"].astype(np.int32) << c["pt"], 0, 255
                        )
            else:
                pos = _hier_dct_scan(
                    data, pos, frame, scomp, qtables, htables,
                    restart_interval, refs, frame["differential"],
                )
        # else: APPn/COM skipped
    planes = []
    for cid in dhp_ids:
        if cid not in refs:
            raise ValueError(f"hierarchical sequence missing component {cid}")
        r = refs[cid]
        if r.shape != (fy, fx):
            raise ValueError(
                f"component {cid} final resolution {r.shape} != DHP {(fy, fx)}"
            )
        planes.append(np.clip(r, 0, 255).astype(np.uint8))
    if nf == 1:
        g = planes[0]
        return np.stack([g, g, g], axis=2)
    if nf != 3:
        raise NotImplementedError(f"{nf}-component hierarchical JPEG")
    if saw_lossless:
        return np.stack(planes, axis=2)  # component-literal RGB
    return _ycc_to_rgb([p.astype(np.float64) for p in planes])


def jpeg_encode_hierarchical(pixels: np.ndarray, levels: int = 3,
                             quality: int = 90,
                             lossless_final: bool = True) -> bytes:
    """Encode (h, w, 3) RGB or (h, w) grayscale uint8 → hierarchical
    (Annex J) JPEG: DHP, a sequential base frame at 1/2^(levels-1)
    resolution, EXP + SOF5 differential DCT frames back up the
    pyramid, and (``lossless_final``) a SOF7 differential lossless
    correction frame that makes ``jpeg_decode`` bit-exact.

    Color convention mirrors the decoder's: with a lossless frame in
    the sequence the components are literal RGB, otherwise YCbCr.
    The encoder runs the decoder's own reconstruction pipeline
    (``_grid_to_spatial`` / ``_hier_recon``) between frames, so its
    reference planes match the decoder's bit-for-bit."""
    if pixels.dtype != np.uint8 or pixels.ndim not in (2, 3):
        raise ValueError("expected (h, w[, 3]) uint8 array")
    if pixels.ndim == 3 and pixels.shape[2] != 3:
        raise ValueError("expected 3 channels")
    if not 1 <= levels <= 8:
        raise ValueError("levels out of range")
    h, w = pixels.shape[:2]
    if min(h, w) >> (levels - 1) < 1:
        raise ValueError("too many pyramid levels for image size")
    if pixels.ndim == 2:
        comps = [pixels.astype(np.float64)]
    elif lossless_final:
        comps = [pixels[:, :, i].astype(np.float64) for i in range(3)]
    else:
        p = pixels.astype(np.float64)
        comps = [
            0.299 * p[:, :, 0] + 0.587 * p[:, :, 1] + 0.114 * p[:, :, 2],
            -0.168736 * p[:, :, 0] - 0.331264 * p[:, :, 1]
            + 0.5 * p[:, :, 2] + 128,
            0.5 * p[:, :, 0] - 0.418688 * p[:, :, 1]
            - 0.081312 * p[:, :, 2] + 128,
        ]
    nc = len(comps)

    # dyadic pyramid; the downsampling filter is the encoder's choice
    # (J.1.1.1 leaves it free) — 2x2 box mean with edge padding
    pyr = [comps]
    for _ in range(1, levels):
        ds = []
        for pl in pyr[-1]:
            hh, ww = pl.shape
            eh, ew = -(-hh // 2) * 2, -(-ww // 2) * 2
            pd = np.pad(pl, ((0, eh - hh), (0, ew - ww)), mode="edge")
            ds.append(pd.reshape(eh // 2, 2, ew // 2, 2).mean(axis=(1, 3)))
        pyr.append(ds)

    q = _scale_quant(_QUANT_LUMA, quality)
    dc_t = _huff_table(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_t = _huff_table(_AC_LUMA_BITS, _AC_LUMA_VALS)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xde" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for ci in range(nc):
        out += bytes((ci + 1, 0x11, 0))
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0) + bytes(
        int(v) for v in q[ZIGZAG]
    )
    for tc, bits, vals in ((0, _DC_LUMA_BITS, _DC_LUMA_VALS),
                           (1, _AC_LUMA_BITS, _AC_LUMA_VALS)):
        out += b"\xff\xc4" + struct.pack(">HB", 19 + sum(bits), tc << 4)
        out += bytes(bits) + bytes(vals)

    def emit_dct_frame(sof_marker: int, planes: list[np.ndarray],
                       ups: list[np.ndarray] | None) -> list[np.ndarray]:
        fh, fw = planes[0].shape
        out.extend(bytes((0xFF, sof_marker)))
        out.extend(struct.pack(">HBHHB", 8 + 3 * nc, 8, fh, fw, nc))
        for ci in range(nc):
            out.extend(bytes((ci + 1, 0x11, 0)))
        out.extend(b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc))
        for ci in range(nc):
            out.extend(bytes((ci + 1, 0x00)))
        out.extend(bytes((0, 63, 0)))  # Ss/Se/AhAl
        qgrids = []
        for ci, pl in enumerate(planes):
            # _plane_blocks applies the -128 level shift; differential
            # frames have none (A.3.1), so feed diff+128
            src = pl if ups is None else (pl - ups[ci]) + 128.0
            g = _plane_blocks(src, q)
            # keep magnitudes inside the standard tables' categories
            # (diffs span ±255, twice the non-differential range)
            dc = np.clip(g[:, :, 0, 0], -2047, 2047)
            g = np.clip(g, -1023, 1023)
            g[:, :, 0, 0] = dc
            qgrids.append(g)
        bw = _BitWriter()
        by_n, bx_n = qgrids[0].shape[:2]
        preds = [0] * nc
        for by in range(by_n):
            for bx in range(bx_n):
                for ci in range(nc):
                    if ups is None:
                        preds[ci] = _encode_block(
                            bw, qgrids[ci][by, bx], dc_t, ac_t, preds[ci]
                        )
                    else:  # differential: PRED = 0 every block
                        _encode_block(bw, qgrids[ci][by, bx], dc_t, ac_t, 0)
        bw.flush()
        out.extend(bw.out)
        return [
            _hier_recon(
                _grid_to_spatial(qgrids[ci], q, fh, fw, ups is None),
                None if ups is None else ups[ci],
            )
            for ci in range(nc)
        ]

    recon = emit_dct_frame(0xC0, pyr[-1], None)
    for k in range(levels - 2, -1, -1):
        out += b"\xff\xdf" + struct.pack(">HB", 3, 0x11)  # EXP both axes
        th, tw = pyr[k][0].shape
        ups = [_hier_expand(r, 1, 1)[:th, :tw] for r in recon]
        recon = emit_dct_frame(0xC5, pyr[k], ups)

    if lossless_final:
        diffs = [
            (o.astype(np.int32) - r).reshape(-1)
            for o, r in zip(comps, recon)
        ]
        cats = [_lossless_categories(d) for d in diffs]
        freqs = np.zeros(17, dtype=np.int64)
        for c in cats:
            freqs += np.bincount(c, minlength=17)
        bits, vals = _optimal_dc_bits_vals(freqs)
        table = _huff_table(bits, vals)
        out += b"\xff\xc4" + struct.pack(">HB", 2 + 1 + 16 + len(vals), 0x01)
        out += bytes(bits) + bytes(vals)
        out += b"\xff\xc7" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
        for ci in range(nc):
            out += bytes((ci + 1, 0x11, 0))
        out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
        for ci in range(nc):
            out += bytes((ci + 1, 0x10))  # Td=1
        out += bytes((0, 0, 0))  # Ss=0: difference to the reference
        bw = _BitWriter()
        enc = table.enc
        write = bw.write
        dl = [d.tolist() for d in diffs]
        cl = [c.tolist() for c in cats]
        for idx in range(h * w):
            for d, c in zip(dl, cl):
                ssss = c[idx]
                code, length = enc[ssss]
                write(code, length)
                if 0 < ssss < 16:
                    v = d[idx]
                    write(v if v > 0 else v + (1 << ssss) - 1, ssss)
        bw.flush()
        out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
