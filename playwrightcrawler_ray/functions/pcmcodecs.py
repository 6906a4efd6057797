"""G.711 (mu-law / A-law) companding and IMA/DVI ADPCM — the three
telephony-era WAV codecs that are exactly specified by public spec
(ITU-T G.711 segment layout; IMA ADPCM reference step tables) and so
need no external library to implement OR to verify.

These close the "non-PCM WAV" slice of the compressed-audio stub in
stages/multimodal.py: WAVE format tags 6 (A-law), 7 (mu-law) and
0x11 (IMA ADPCM) now decode for real; only the ffmpeg-class formats
(mp3/ogg/aac) remain stubbed. Reference stores audio blobs via its
content-type router (playwrightcrawler.py handle_content_type) and
leaves decoding to downstream tooling; here the featurizer stage
consumes the PCM directly.

Verification strategy (tests/test_multimodal_and_sources.py):
- G.711: encode(decode(c)) == c for all 256 codes (the coder pair is
  mutually consistent and the decode table is injective), known
  anchor values from the spec (mu-law 0xFF -> 0, max magnitude
  32124; A-law max 32256), and decode->encode monotonicity.
- IMA ADPCM: production (vectorized-ish) decoder vs a straight-line
  transliteration of the reference algorithm in the test, plus a
  round-trip SNR bound on smooth signals.

Scale note: G.711 is a pure 256-entry LUT gather (vectorized); IMA
ADPCM is sequential WITHIN a block but blocks carry their own
(predictor, step-index) header so decode parallelises per block —
the per-row cost lives inside the actor-pool featurizer stage.
"""

from __future__ import annotations

import struct

import numpy as np

_BIAS = 0x84  # mu-law bias (132)
_CLIP = 32635


def _build_ulaw_dec() -> np.ndarray:
    codes = np.arange(256, dtype=np.uint8)
    u = (~codes) & 0xFF
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    mag = (((mant.astype(np.int32) << 3) + _BIAS) << exp) - _BIAS
    return np.where(u & 0x80, -mag, mag).astype(np.int16)


ULAW_DECODE_TABLE = _build_ulaw_dec()


def ulaw_decode(codes: np.ndarray) -> np.ndarray:
    """mu-law bytes -> int16 PCM (pure LUT gather)."""
    return ULAW_DECODE_TABLE[np.asarray(codes, dtype=np.uint8)]


def ulaw_encode(pcm: np.ndarray) -> np.ndarray:
    """int16 PCM -> mu-law bytes (G.711 segment algorithm,
    vectorized)."""
    x = np.asarray(pcm, dtype=np.int32)
    sign = np.where(x < 0, 0x80, 0)
    mag = np.minimum(np.abs(x), _CLIP) + _BIAS  # 132..32767
    # segment = bit_length(mag >> 7) - 1, mag >= 128 guaranteed
    exp = (np.floor(np.log2(mag >> 7)) + 1e-9).astype(np.int32)
    # float-log guard: fix any off-by-one at exact powers of two
    exp = np.where((mag >> 7) >= (1 << (exp + 1)), exp + 1, exp)
    exp = np.where((mag >> 7) < (1 << exp), exp - 1, exp)
    mant = (mag >> (exp + 3)) & 0x0F
    return (~(sign | (exp << 4) | mant) & 0xFF).astype(np.uint8)


def _build_alaw_dec() -> np.ndarray:
    codes = np.arange(256, dtype=np.int32) ^ 0x55
    mant = codes & 0x0F
    seg = (codes & 0x70) >> 4
    t = (mant << 4) + 8
    t = np.where(seg >= 1, ((mant << 4) + 0x108) << np.maximum(seg - 1, 0), t)
    return np.where(codes & 0x80, t, -t).astype(np.int16)


ALAW_DECODE_TABLE = _build_alaw_dec()


def alaw_decode(codes: np.ndarray) -> np.ndarray:
    """A-law bytes -> int16 PCM (pure LUT gather)."""
    return ALAW_DECODE_TABLE[np.asarray(codes, dtype=np.uint8)]


_ALAW_SEG_END = np.array(
    [0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF], dtype=np.int32
)


def alaw_encode(pcm: np.ndarray) -> np.ndarray:
    """int16 PCM -> A-law bytes (G.711 segment algorithm on the
    13-bit magnitude, vectorized)."""
    x = np.asarray(pcm, dtype=np.int32) >> 3  # 13-bit signed
    mask = np.where(x >= 0, 0xD5, 0x55)
    mag = np.where(x >= 0, x, -x - 1)
    seg = np.searchsorted(_ALAW_SEG_END, mag)  # first seg with mag <= end
    over = seg >= 8
    seg = np.minimum(seg, 7)
    low = (mag >> 1) & 0x0F          # segments 0 and 1
    high = (mag >> seg) & 0x0F       # segments 2..7
    aval = (seg << 4) | np.where(seg < 2, low, high)
    aval = np.where(over, 0x7F, aval)
    return ((aval ^ mask) & 0xFF).astype(np.uint8)


# ------------------------------------------------------- IMA ADPCM
# Reference step-size and index-adjust tables (IMA ADPCM spec /
# Microsoft WAVE format 0x11 "DVI ADPCM").

IMA_STEP_TABLE = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
], dtype=np.int32)

IMA_INDEX_TABLE = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)


def _ima_decode_nibbles(nibbles: np.ndarray, pred: int, index: int) -> np.ndarray:
    """Sequential IMA state machine over one block's nibbles."""
    out = np.empty(len(nibbles), dtype=np.int16)
    step_t = IMA_STEP_TABLE.tolist()
    idx_t = IMA_INDEX_TABLE.tolist()
    nib = nibbles.tolist()
    for i, n in enumerate(nib):
        step = step_t[index]
        diff = step >> 3
        if n & 1:
            diff += step >> 2
        if n & 2:
            diff += step >> 1
        if n & 4:
            diff += step
        if n & 8:
            pred -= diff
        else:
            pred += diff
        pred = max(-32768, min(32767, pred))
        index = max(0, min(88, index + idx_t[n & 7]))
        out[i] = pred
    return out


def ima_adpcm_decode_wav(payload: bytes, block_align: int, nch: int) -> np.ndarray:
    """WAVE fmt 0x11 data chunk -> int16 PCM, channels interleaved.

    Block layout per channel: int16 predictor, uint8 step index,
    uint8 reserved; then nibble data in 4-byte per-channel groups
    (low nibble first). The header predictor IS the block's first
    output sample. Blocks are self-contained (own predictor+index),
    so a sharded decode could split on block boundaries.
    """
    if nch not in (1, 2):
        raise ValueError(f"{nch}-channel IMA ADPCM")
    if block_align < 4 * nch or block_align % 4:
        raise ValueError(f"bad IMA block align {block_align}")
    chans: list[list[np.ndarray]] = [[] for _ in range(nch)]
    for off in range(0, len(payload) - (len(payload) % block_align), block_align):
        block = payload[off : off + block_align]
        preds, idxs = [], []
        for c in range(nch):
            pred, index, _rsv = struct.unpack_from("<hBB", block, 4 * c)
            if index > 88:
                raise ValueError(f"bad IMA step index {index}")
            preds.append(pred)
            idxs.append(index)
            chans[c].append(np.array([pred], dtype=np.int16))
        body = np.frombuffer(block, dtype=np.uint8)[4 * nch :]
        nibs = np.empty(len(body) * 2, dtype=np.uint8)
        nibs[0::2] = body & 0x0F
        nibs[1::2] = body >> 4
        if nch == 1:
            chans[0].append(_ima_decode_nibbles(nibs, preds[0], idxs[0]))
        else:
            # stereo: alternate 4-byte (8-nibble) groups per channel
            groups = nibs.reshape(-1, 8)
            for c in range(nch):
                chans[c].append(
                    _ima_decode_nibbles(groups[c::nch].ravel(), preds[c], idxs[c])
                )
    if not chans[0]:
        raise ValueError("empty IMA ADPCM payload")
    per = [np.concatenate(parts) for parts in chans]
    if nch == 1:
        return per[0]
    n = min(len(p) for p in per)
    inter = np.empty(n * nch, dtype=np.int16)
    for c in range(nch):
        inter[c::nch] = per[c][:n]
    return inter


def ima_adpcm_encode(samples: np.ndarray, block_align: int = 256) -> bytes:
    """int16 mono PCM -> WAVE fmt 0x11 data-chunk bytes (reference
    encode: trial-subtract quantizer, shared state machine with the
    decoder). Pads the tail block with repeats of the last sample."""
    if samples.dtype != np.int16 or samples.ndim != 1 or not len(samples):
        raise ValueError("expected non-empty 1-D int16 samples")
    if block_align < 4 or block_align % 4:
        raise ValueError(f"bad IMA block align {block_align}")
    spb = (block_align - 4) * 2 + 1  # samples per block, mono
    pad = (-(-len(samples) // spb)) * spb - len(samples)
    x = np.concatenate([samples, np.full(pad, samples[-1], np.int16)])
    step_t = IMA_STEP_TABLE.tolist()
    idx_t = IMA_INDEX_TABLE.tolist()
    out = bytearray()
    index = 0
    for off in range(0, len(x), spb):
        block = x[off : off + spb].astype(np.int64).tolist()
        pred = block[0]
        out += struct.pack("<hBB", pred, index, 0)
        nibs = []
        for s in block[1:]:
            step = step_t[index]
            delta = s - pred
            n = 8 if delta < 0 else 0
            delta = abs(delta)
            if delta >= step:
                n |= 4
                delta -= step
            if delta >= step >> 1:
                n |= 2
                delta -= step >> 1
            if delta >= step >> 2:
                n |= 1
            # decoder-mirror state update
            diff = step >> 3
            if n & 1:
                diff += step >> 2
            if n & 2:
                diff += step >> 1
            if n & 4:
                diff += step
            pred = pred - diff if n & 8 else pred + diff
            pred = max(-32768, min(32767, pred))
            index = max(0, min(88, index + idx_t[n & 7]))
            nibs.append(n)
        packed = np.asarray(nibs, dtype=np.uint8).reshape(-1, 2)
        out += (packed[:, 0] | (packed[:, 1] << 4)).tobytes()
    return bytes(out)
