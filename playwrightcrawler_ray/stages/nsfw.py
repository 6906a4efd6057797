"""Model-scoring stage: the reference's OpenNSFW2 classification
(playwrightcrawler.py:3861-3880, T1 in SURVEY.md §2.3) as a Ray Data
actor-pool stage.

This is the canonical stateful-stage pattern: the model loads ONCE per
actor in ``__init__`` (the reference loads TF weights once per process
at import, :158-160), batches flow through ``__call__``.  TensorFlow
and the OpenNSFW2 weights are not in this container, so the shipped
model is a REAL (small) one instead of a stub: an L2-regularized
logistic regression over classic public skin-detection features —
YCbCr skin-box pixel ratio (Chai–Ngan bounds), center-crop skin ratio,
per-channel statistics, Hasler–Süsstrunk colorfulness, edge density,
aspect ratio — trained deterministically by ``scripts/train_nsfw.py``
(weights in ``nsfw_weights.py``, held-out accuracy recorded there).
Inference is one standardized GEMM + sigmoid per batch.  A production
OpenNSFW2 slot-in only replaces ``_NsfwModel``; the stage contract —
actor pool sizing, batch shapes, min-resolution gate, threshold
semantics — is identical.

Usage::

    scored = images_ds.map_batches(
        NsfwScorer,                       # callable CLASS → actor pool
        batch_format="pyarrow",
        batch_size=32,                    # wide binary rows: small batches
        concurrency=4,                    # pool size; scale to cluster
        num_cpus=1,
    )
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# reference thresholds (config.py:73-76)
NSFW_MIN_PROBABILITY = 0.78
MIN_NSFW_RES = 128 * 128

N_FEATURES = 11


def image_features(px: np.ndarray) -> np.ndarray:
    """11 vectorized features of an (h, w, 3) uint8 RGB image — the
    public skin-detection pipeline (shared verbatim by training and
    inference so there is no train/serve skew)."""
    p = px.astype(np.float32)
    r, g, b = p[..., 0], p[..., 1], p[..., 2]
    mean = p.mean(axis=(0, 1)) / 255.0                              # 3
    std = p.std(axis=(0, 1)) / 255.0                                # 3
    # BT.601 chroma; skin box per Chai & Ngan (1999): Cb 77-127, Cr 133-173
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    skin = (cb >= 77) & (cb <= 127) & (cr >= 133) & (cr <= 173)
    skin_ratio = float(skin.mean())                                 # 1
    h, w = px.shape[:2]
    cy0, cy1 = h // 4, max(3 * h // 4, h // 4 + 1)
    cx0, cx1 = w // 4, max(3 * w // 4, w // 4 + 1)
    center = skin[cy0:cy1, cx0:cx1]
    center_skin = float(center.mean()) if center.size else skin_ratio  # 1
    rg = r - g
    yb = 0.5 * (r + g) - b
    colorfulness = float(
        (np.sqrt(rg.std() ** 2 + yb.std() ** 2)
         + 0.3 * np.sqrt(rg.mean() ** 2 + yb.mean() ** 2)) / 255.0)  # 1
    gray = 0.299 * r + 0.587 * g + 0.114 * b
    if h > 1 and w > 1:
        edge = float((np.abs(np.diff(gray, axis=0)).mean()
                      + np.abs(np.diff(gray, axis=1)).mean()) / 510.0)
    else:
        edge = 0.0                                                   # 1
    aspect = min(h, w) / max(h, w)                                   # 1
    return np.array([*mean, *std, skin_ratio, center_skin,
                     colorfulness, edge, aspect], dtype=np.float64)


class _NsfwModel:
    """Trained logistic skin-content model: load-once, batch predict.
    Counts constructions per process — guarding the actor-pool
    load-once contract in tests."""

    instances_per_process = 0

    def __init__(self):
        type(self).instances_per_process += 1
        from . import nsfw_weights as W  # the "weight load"

        self.w = np.asarray(W.WEIGHTS, dtype=np.float64)
        self.b = float(W.BIAS)
        self.mu = np.asarray(W.FEATURE_MEAN, dtype=np.float64)
        self.sd = np.asarray(W.FEATURE_STD, dtype=np.float64)

    def predict(self, pixel_batch: list[np.ndarray]) -> np.ndarray:
        if not pixel_batch:
            return np.empty(0, dtype=np.float64)
        feats = np.stack([image_features(px) for px in pixel_batch])
        z = ((feats - self.mu) / self.sd) @ self.w + self.b
        return 1.0 / (1.0 + np.exp(-z))


# backwards-compatible alias (the model is no longer a stub)
_StubNsfwModel = _NsfwModel


class NsfwScorer:
    """Actor-pool ``map_batches`` callable over image rows
    (``bytes``/``w``/``h`` columns): appends ``isnsfw`` (probability,
    null when below the resolution gate) and ``nsfw_flag``."""

    def __init__(self, min_resolution: int = MIN_NSFW_RES,
                 threshold: float = NSFW_MIN_PROBABILITY):
        from ..imaging.codec import decode_image  # local import: actor init

        self._decode = decode_image
        self.model = _NsfwModel()  # ONCE per actor
        self.min_resolution = min_resolution
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        bodies = batch.column("bytes").to_pylist()
        ws = batch.column("w").to_pylist()
        hs = batch.column("h").to_pylist()
        probs: list[float | None] = [None] * len(bodies)
        to_score: list[int] = []
        pixels: list[np.ndarray] = []
        for i, (b, w, h) in enumerate(zip(bodies, ws, hs)):
            if b is None or w is None or h is None or w * h <= self.min_resolution:
                continue
            try:
                px, _ = self._decode(b)
            except Exception:
                continue
            to_score.append(i)
            pixels.append(px)
        if pixels:
            scores = self.model.predict(pixels)
            for i, s in zip(to_score, scores):
                probs[i] = float(s)
        flags = [p is not None and p > self.threshold for p in probs]
        return batch.append_column(
            "isnsfw", pa.array(probs, pa.float64())
        ).append_column("nsfw_flag", pa.array(flags, pa.bool_()))
