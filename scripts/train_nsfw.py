#!/usr/bin/env python
"""Train the skin-content logistic model behind stages/nsfw.py and
emit its weights to playwrightcrawler_ray/stages/nsfw_weights.py.

The reference scores images with OpenNSFW2 (playwrightcrawler.py
:158-160, :3861-3880); TensorFlow and the OpenNSFW2 weights are not in
this container, so the shipped scorer is a REAL trained model over
real image features — just a small one, trained on a deterministic
synthetic corpus built here.  The features are the classic public
skin-detection pipeline (YCbCr skin-box ratio — Chai & Ngan's bounds —
plus channel statistics, Hasler–Süsstrunk colorfulness, and edge
density); the classifier is an L2-regularized logistic regression fit
by full-batch gradient descent with a fixed seed, so retraining is
bit-reproducible.

Positives are skin-dominant smooth textures; negatives include flat
UI colors, noise, text-page mockups, landscape-ish gradients AND
scenes with minor (5-20%) skin regions, which forces the decision to
ride on skin AMOUNT + smoothness rather than mere presence.

Run from the repo root:  python scripts/train_nsfw.py
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")

from playwrightcrawler_ray.stages.nsfw import image_features  # noqa: E402

OUT = "playwrightcrawler_ray/stages/nsfw_weights.py"
SEED = 20260817
N_PER_CLASS = 1200
HELD_OUT = 200


def _ycbcr_to_rgb(y, cb, cr):
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def _smooth_field(rng, h, w, lo, hi, grid=5):
    """Low-frequency random field: coarse noise bilinearly upsampled."""
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


def _skin_image(rng, h, w, coverage=1.0):
    """Smooth skin-toned texture covering `coverage` of the frame."""
    cb = _smooth_field(rng, h, w, 85, 120)
    cr = _smooth_field(rng, h, w, 138, 168)
    y = _smooth_field(rng, h, w, 90, 210)
    img = _ycbcr_to_rgb(y, cb, cr)
    if coverage < 1.0:
        bg = _negative_image(rng, h, w, allow_skin=False)
        mask = np.zeros((h, w), dtype=bool)
        bh = max(1, int(h * np.sqrt(coverage)))
        bw = max(1, int(w * np.sqrt(coverage)))
        oy = rng.integers(0, h - bh + 1)
        ox = rng.integers(0, w - bw + 1)
        mask[oy:oy + bh, ox:ox + bw] = True
        bg[mask] = img[mask]
        return bg
    return img


def _negative_image(rng, h, w, allow_skin=True):
    kind = rng.integers(0, 5)
    if kind == 0:  # flat UI color (non-skin hues)
        base = rng.integers(0, 256, 3)
        if 1.2 * base[2] > base[0] > base[2]:  # skin-ish: push to blue
            base = base[::-1]
        img = np.full((h, w, 3), base, dtype=np.uint8)
        img = np.clip(
            img.astype(int) + rng.integers(-6, 7, (h, w, 3)), 0, 255
        ).astype(np.uint8)
        return img
    if kind == 1:  # hard noise
        return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    if kind == 2:  # text-page mockup: white bg + dark line rectangles
        img = np.full((h, w, 3), 245, dtype=np.uint8)
        for _ in range(rng.integers(4, 10)):
            ly = rng.integers(0, max(1, h - 3))
            lx = rng.integers(0, max(1, w // 2))
            lw = rng.integers(w // 4, w - lx)
            img[ly:ly + 2, lx:lx + lw] = rng.integers(10, 60)
        return img
    if kind == 3:  # landscape-ish: sky/ground gradient bands
        y = _smooth_field(rng, h, w, 60, 220)
        cb = _smooth_field(rng, h, w, 130, 180)   # blue-leaning
        cr = _smooth_field(rng, h, w, 80, 125)    # below skin box
        return _ycbcr_to_rgb(y, cb, cr)
    # scene with MINOR skin region (hands/face scale)
    if allow_skin:
        return _skin_image(rng, h, w,
                           coverage=float(rng.uniform(0.05, 0.2)))
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


def build_dataset(rng, n_per_class):
    xs, ys = [], []
    for i in range(n_per_class):
        h = int(rng.integers(48, 160))
        w = int(rng.integers(48, 160))
        cov = float(rng.uniform(0.55, 1.0))
        xs.append(image_features(_skin_image(rng, h, w, coverage=cov)))
        ys.append(1.0)
        h = int(rng.integers(48, 160))
        w = int(rng.integers(48, 160))
        xs.append(image_features(_negative_image(rng, h, w)))
        ys.append(0.0)
    return np.array(xs), np.array(ys)


def train(x, y, l2=1e-3, lr=0.5, iters=3000):
    mu = x.mean(axis=0)
    sd = x.std(axis=0) + 1e-9
    xn = (x - mu) / sd
    n, d = xn.shape
    w = np.zeros(d)
    b = 0.0
    for _ in range(iters):
        z = xn @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        gw = xn.T @ (p - y) / n + l2 * w
        gb = float((p - y).mean())
        w -= lr * gw
        b -= lr * gb
    return w, b, mu, sd


def main():
    rng = np.random.default_rng(SEED)
    x, y = build_dataset(rng, N_PER_CLASS)
    xt, yt = x[:-2 * HELD_OUT], y[:-2 * HELD_OUT]
    xv, yv = x[-2 * HELD_OUT:], y[-2 * HELD_OUT:]
    w, b, mu, sd = train(xt, yt)

    def acc(xx, yy):
        p = 1.0 / (1.0 + np.exp(-(((xx - mu) / sd) @ w + b)))
        return float(((p > 0.5) == (yy > 0.5)).mean())

    a_tr, a_va = acc(xt, yt), acc(xv, yv)
    print(f"train acc {a_tr:.4f}  held-out acc {a_va:.4f}")
    assert a_va >= 0.95, "model failed to separate the classes"

    def fmt(arr):
        return "[" + ", ".join(f"{v:.10g}" for v in arr) + "]"

    with open(OUT, "w") as f:
        f.write(
            '"""Logistic skin-content model weights.\n\n'
            "Generated by scripts/train_nsfw.py (deterministic seed "
            f"{SEED});\nheld-out accuracy {a_va:.4f} on the synthetic "
            "corpus described there.\nDo not edit; retrain instead.\n"
            '"""\n\n'
            f"WEIGHTS = {fmt(w)}\n"
            f"BIAS = {b:.10g}\n"
            f"FEATURE_MEAN = {fmt(mu)}\n"
            f"FEATURE_STD = {fmt(sd)}\n"
        )
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
