"""Trained skin-content model tests (stages/nsfw.py).

The reference scores with OpenNSFW2 (playwrightcrawler.py:3861-3880);
the shipped model is a real logistic regression over public
skin-detection features, trained by scripts/train_nsfw.py.  These
tests pin: separation on FRESH data the training never saw (different
seed), feature determinism, and the batched-GEMM inference path.
"""

from __future__ import annotations

import importlib.util
import sys

import numpy as np
import pytest

from playwrightcrawler_ray.stages.nsfw import (
    _NsfwModel, image_features, N_FEATURES,
)


def _trainer():
    spec = importlib.util.spec_from_file_location(
        "train_nsfw", "scripts/train_nsfw.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["train_nsfw"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_feature_vector_shape_and_determinism():
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (40, 30, 3), dtype=np.uint8)
    f1 = image_features(px)
    f2 = image_features(px.copy())
    assert f1.shape == (N_FEATURES,)
    assert np.array_equal(f1, f2)
    assert np.isfinite(f1).all()


def test_model_separates_fresh_synthetic_data():
    """Held-out generalization beyond the training file's own split:
    a brand-new seed the trainer never used."""
    t = _trainer()
    rng = np.random.default_rng(777)  # != trainer SEED
    model = _NsfwModel()
    pos, neg = [], []
    for _ in range(40):
        h = int(rng.integers(48, 160))
        w = int(rng.integers(48, 160))
        pos.append(t._skin_image(rng, h, w,
                                 coverage=float(rng.uniform(0.6, 1.0))))
        h = int(rng.integers(48, 160))
        w = int(rng.integers(48, 160))
        neg.append(t._negative_image(rng, h, w))
    ps = model.predict(pos)
    ns = model.predict(neg)
    acc = float(((ps > 0.5).sum() + (ns <= 0.5).sum()) / (len(ps) + len(ns)))
    assert acc >= 0.9, acc
    # and the two clouds are genuinely apart on average
    assert ps.mean() - ns.mean() > 0.5


def test_minor_skin_scene_scores_low():
    """A scene with a hands/face-scale skin region must NOT flag —
    the model rides on skin AMOUNT, not presence."""
    t = _trainer()
    rng = np.random.default_rng(123)
    model = _NsfwModel()
    scenes = [t._skin_image(rng, 96, 96, coverage=0.08)
              for _ in range(10)]
    assert float(np.median(model.predict(scenes))) < 0.5


def test_batched_predict_matches_single():
    t = _trainer()
    rng = np.random.default_rng(5)
    model = _NsfwModel()
    imgs = [t._skin_image(rng, 64, 64), t._negative_image(rng, 64, 64),
            t._skin_image(rng, 50, 90, coverage=0.7)]
    batched = model.predict(imgs)
    singles = np.array([model.predict([im])[0] for im in imgs])
    assert np.allclose(batched, singles)


def test_empty_batch():
    assert _NsfwModel().predict([]).shape == (0,)
