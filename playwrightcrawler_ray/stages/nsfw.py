"""Model-scoring stage: the reference's OpenNSFW2 classification
(playwrightcrawler.py:3861-3880, T1 in SURVEY.md §2.3) as a Ray Data
actor-pool stage.

This is the canonical stateful-stage pattern: the model loads ONCE per
actor in ``__init__`` (the reference loads TF weights once per process
at import, :158-160), batches flow through ``__call__``. TensorFlow is
not in this container, so the model is a clearly-marked deterministic
STUB with the same interface: scores are a pure function of decoded
pixels (mean-channel statistics squashed through a logistic), so tests
are reproducible and the Ray plumbing — actor pool sizing, batch
shapes, min-resolution gate, threshold semantics — is real.

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


class _StubNsfwModel:
    """Deterministic stand-in for OpenNSFW2: load-once, batch predict.
    Raises if constructed more than once per process — guarding the
    actor-pool contract in tests."""

    instances_per_process = 0

    def __init__(self):
        type(self).instances_per_process += 1
        # simulate an expensive weight load
        self.weights = np.linspace(0.1, 0.9, 16)

    def predict(self, pixel_batch: list[np.ndarray]) -> np.ndarray:
        out = np.empty(len(pixel_batch), dtype=np.float64)
        for i, px in enumerate(pixel_batch):
            m = px.astype(np.float64).mean(axis=(0, 1)) / 255.0  # per-channel
            z = (m * self.weights[: m.size]).sum() * 4.0 - 1.0
            out[i] = 1.0 / (1.0 + np.exp(-z))
        return out


class NsfwScorer:
    """Actor-pool ``map_batches`` callable over image rows
    (``bytes``/``w``/``h`` columns): appends ``isnsfw`` (probability,
    null when below the resolution gate) and ``nsfw_flag``."""

    def __init__(self, min_resolution: int = MIN_NSFW_RES,
                 threshold: float = NSFW_MIN_PROBABILITY):
        from ..imaging.codec import decode_image  # local import: actor init

        self._decode = decode_image
        self.model = _StubNsfwModel()  # ONCE per actor
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
