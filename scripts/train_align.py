#!/usr/bin/env python
"""Train the bilinear image–caption alignment model behind
stages/align.py and emit playwrightcrawler_ray/stages/align_weights.py.

LAION/DataComp-style pipelines gate image+caption pairs on a CLIP
score; CLIP is not in this container, so the shipped scorer is a REAL
trained two-tower — just a small one. Training pairs are synthesized
deterministically: rendered images spanning the descriptor space
(flat colors, smooth gradients, noise, stripes; square and wide;
bright and dark), POSITIVE captions produced by the shared templater
``stages.align.describe_features`` (content words determined by the
image's measured features, synonyms and fillers randomized), NEGATIVE
captions taken from a different image whose descriptor buckets differ
in ≥ 2 dimensions. The bilinear interaction matrix is fit by
full-batch gradient descent with a fixed seed — retraining is
bit-reproducible.

Run from the repo root:  python scripts/train_align.py
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")

from playwrightcrawler_ray.stages.align import (  # noqa: E402
    CAPTION_DIM,
    caption_vector,
    describe_features,
    feature_buckets,
)
from playwrightcrawler_ray.stages.nsfw import image_features  # noqa: E402

OUT = "playwrightcrawler_ray/stages/align_weights.py"
SEED = 20260818
N_IMAGES = 3000
HELD_OUT = 400


def _smooth_field(rng, h, w, lo, hi, grid=5):
    coarse = rng.uniform(lo, hi, (grid, grid))
    ys = np.linspace(0, grid - 1, h)
    xs = np.linspace(0, grid - 1, w)
    y0 = np.clip(ys.astype(int), 0, grid - 2)
    x0 = np.clip(xs.astype(int), 0, grid - 2)
    fy = (ys - y0)[:, None]
    fx = (xs - x0)[None, :]
    c00 = coarse[y0][:, x0]
    c01 = coarse[y0][:, x0 + 1]
    c10 = coarse[y0 + 1][:, x0]
    c11 = coarse[y0 + 1][:, x0 + 1]
    return ((1 - fy) * (1 - fx) * c00 + (1 - fy) * fx * c01
            + fy * (1 - fx) * c10 + fy * fx * c11)


def _base_color(rng):
    """A channel-dominant or gray base color at a random brightness."""
    mode = int(rng.integers(0, 4))
    level = float(rng.uniform(30, 225))
    c = np.full(3, level)
    if mode < 3:                      # red / green / blue dominant
        c *= 0.55
        c[mode] = min(255.0, level * 1.6 + 40)
    return c


def gen_image(rng) -> np.ndarray:
    h = int(rng.integers(32, 128))
    if rng.integers(0, 2):
        w = max(8, int(h * rng.uniform(0.8, 1.2)))     # squarish
    else:
        w = max(8, int(h * rng.uniform(1.6, 3.0)))     # wide
    kind = int(rng.integers(0, 4))
    base = _base_color(rng)
    if kind == 0:                     # flat color
        img = np.full((h, w, 3), base)
        img += rng.integers(-4, 5, (h, w, 3))
    elif kind == 1:                   # smooth gradient around the base
        img = np.stack(
            [_smooth_field(rng, h, w, max(0, c - 60), min(255, c + 60))
             for c in base], axis=-1)
    elif kind == 2:                   # noise around the base (busy)
        img = base[None, None, :] + rng.uniform(-110, 110, (h, w, 3))
    else:                             # hard stripes (busy, two-tone)
        other = _base_color(rng)
        period = int(rng.integers(2, 5))
        rows = (np.arange(h) // period) % 2
        img = np.where(rows[:, None, None] == 0,
                       base[None, None, :], other[None, None, :])
        img = img + rng.integers(-4, 5, (h, w, 3))
    return np.clip(img, 0, 255).astype(np.uint8)


def build_pairs(rng, n_images):
    feats, caps, buckets = [], [], []
    for _ in range(n_images):
        f = image_features(gen_image(rng))
        feats.append(f)
        caps.append(describe_features(f, rng))
        buckets.append(feature_buckets(f))
    x_img, x_cap, y = [], [], []
    for i in range(n_images):
        x_img.append(feats[i])
        x_cap.append(caption_vector(caps[i]))
        y.append(1.0)
        # negative: a caption whose content buckets differ in >= 2 dims
        for _ in range(200):
            j = int(rng.integers(0, n_images))
            diff = sum(buckets[i][k] != buckets[j][k] for k in buckets[i])
            if j != i and diff >= 2:
                break
        else:
            # never label a matching (or self) caption as a negative —
            # fail loudly instead of poisoning the training set
            raise RuntimeError(
                f"no valid negative found for image {i}; image set too "
                "small or degenerate")
        x_img.append(feats[i])
        x_cap.append(caption_vector(caps[j]))
        y.append(0.0)
    return np.array(x_img), np.array(x_cap), np.array(y)


def train(fi, ci, y, l2=1e-4, lr=2.0, iters=4000):
    mu = fi.mean(axis=0)
    sd = fi.std(axis=0) + 1e-9
    fn = (fi - mu) / sd
    n, d = fn.shape
    w = np.zeros((d, CAPTION_DIM))
    b = 0.0
    for _ in range(iters):
        z = ((fn @ w) * ci).sum(axis=1) + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = (p - y)
        gw = fn.T @ (g[:, None] * ci) / n + l2 * w
        gb = float(g.mean())
        w -= lr * gw
        b -= lr * gb
    return w, b, mu, sd


def main():
    rng = np.random.default_rng(SEED)
    fi, ci, y = build_pairs(rng, N_IMAGES)
    cut = len(y) - 2 * HELD_OUT
    ft, ct, yt = fi[:cut], ci[:cut], y[:cut]
    fv, cv, yv = fi[cut:], ci[cut:], y[cut:]
    w, b, mu, sd = train(ft, ct, yt)

    def acc(f, c, yy):
        z = ((((f - mu) / sd) @ w) * c).sum(axis=1) + b
        p = 1.0 / (1.0 + np.exp(-z))
        return float(((p > 0.5) == (yy > 0.5)).mean())

    a_tr, a_va = acc(ft, ct, yt), acc(fv, cv, yv)
    print(f"train acc {a_tr:.4f}  held-out acc {a_va:.4f}")
    assert a_va >= 0.9, "model failed to separate matched/mismatched pairs"

    def fmt1(arr):
        return "[" + ", ".join(f"{v:.10g}" for v in arr) + "]"

    rows = ",\n    ".join(fmt1(r) for r in w)
    with open(OUT, "w") as f:
        f.write(
            '"""Bilinear image-caption alignment model weights.\n\n'
            "Generated by scripts/train_align.py (deterministic seed "
            f"{SEED});\nheld-out accuracy {a_va:.4f} on the synthetic "
            "described-pair corpus\nbuilt there. Do not edit; retrain "
            'instead.\n"""\n\n'
            f"HELD_OUT_ACCURACY = {a_va:.4f}\n"
            f"BILINEAR = [\n    {rows},\n]\n"
            f"BIAS = {b:.10g}\n"
            f"FEATURE_MEAN = {fmt1(mu)}\n"
            f"FEATURE_STD = {fmt1(sd)}\n"
        )
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
