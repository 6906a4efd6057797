"""Image-caption alignment scorer (stages/align.py): trained-model
quality on fresh synthetic pairs, caption-tower properties, the
actor-pool load-once contract, and the stage's schema/null semantics
over real encoded images."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from playwrightcrawler_ray.imaging.codec import encode_image
from playwrightcrawler_ray.stages.align import (
    AlignmentScorer,
    _AlignModel,
    caption_vector,
    describe_features,
    feature_buckets,
)
from playwrightcrawler_ray.stages.nsfw import image_features


def _fresh_images(rng, n):
    """Images spanning the descriptor space, generated INDEPENDENTLY
    of the training script's generators (flat / noise / stripes with
    explicit colors), so separation here is generalization."""
    out = []
    for i in range(n):
        h = int(rng.integers(24, 80))
        w = h if i % 2 else int(h * 2.2)
        base = np.zeros(3)
        ch = i % 4
        level = 200.0 if (i // 4) % 2 else 60.0
        if ch < 3:
            base[:] = level * 0.4
            base[ch] = level
        else:
            base[:] = level
        if (i // 8) % 2:
            img = base[None, None, :] + rng.uniform(-100, 100, (h, w, 3))
        else:
            img = np.full((h, w, 3), base) + rng.integers(-3, 4, (h, w, 3))
        out.append(np.clip(img, 0, 255).astype(np.uint8))
    return out


def test_recorded_heldout_accuracy():
    from playwrightcrawler_ray.stages import align_weights as W

    assert W.HELD_OUT_ACCURACY >= 0.9
    assert np.asarray(W.BILINEAR).shape == (11, 64)


def test_model_separates_fresh_pairs():
    """Matched captions must outscore mismatched captions on images
    and captions never seen in training (bucket-differing negatives,
    the deployment decision)."""
    rng = np.random.default_rng(321)
    model = _AlignModel()
    imgs = _fresh_images(rng, 48)
    feats = [image_features(px) for px in imgs]
    caps = [describe_features(f, rng) for f in feats]
    buckets = [feature_buckets(f) for f in feats]
    pos = model.predict(imgs, caps)
    neg_caps = []
    for i in range(len(imgs)):
        for _ in range(200):
            j = int(rng.integers(0, len(imgs)))
            diff = sum(buckets[i][k] != buckets[j][k] for k in buckets[i])
            if j != i and diff >= 2:
                break
        else:
            raise AssertionError(f"no valid negative for image {i}")
        neg_caps.append(caps[j])
    neg = model.predict(imgs, neg_caps)
    # pairwise AUC over matched-vs-mismatched for the same image
    auc = float((pos > neg).mean() + 0.5 * (pos == neg).mean())
    assert auc >= 0.85, (auc, pos.mean(), neg.mean())
    assert pos.mean() > neg.mean() + 0.15


def test_caption_vector_properties():
    v = caption_vector("bright red smooth banner")
    assert v.shape == (64,)
    assert abs(np.linalg.norm(v) - 1.0) < 1e-12
    # case-insensitive, order-free
    assert np.allclose(v, caption_vector("Banner SMOOTH red bright"))
    assert np.linalg.norm(caption_vector("")) == 0.0


def test_scorer_stage_schema_and_nulls(ray_session):
    rng = np.random.default_rng(9)
    imgs = _fresh_images(rng, 4)
    feats = [image_features(px) for px in imgs]
    caps = [describe_features(f, rng) for f in feats]
    bodies = [encode_image(px, "png") for px in imgs]
    batch = pa.table({
        "image_id": pa.array([f"i{k}" for k in range(6)]),
        "bytes": pa.array(bodies + [None, b"not an image"], pa.binary()),
        "caption": pa.array(caps + ["a caption", "another"], pa.string()),
    })
    before = _AlignModel.instances_per_process
    scorer = AlignmentScorer()
    out1 = scorer(batch)
    out2 = scorer(batch)  # second batch through the SAME actor
    assert _AlignModel.instances_per_process == before + 1  # load-once
    assert out1.column_names[-2:] == ["align_score", "align_flag"]
    scores = out1.column("align_score").to_pylist()
    assert all(s is not None for s in scores[:4])
    assert scores[4] is None          # null bytes -> null score
    assert scores[5] is None          # undecodable bytes -> null score
    flags = out1.column("align_flag").to_pylist()
    assert flags[4] is False and flags[5] is False
    assert out1.column("align_score").to_pylist() == \
        out2.column("align_score").to_pylist()   # deterministic


def test_empty_caption_scores_null():
    scorer = AlignmentScorer()
    px = np.full((16, 16, 3), 128, dtype=np.uint8)
    batch = pa.table({
        "bytes": pa.array([encode_image(px, "png")], pa.binary()),
        "caption": pa.array([""], pa.string()),
    })
    out = scorer(batch)
    assert out.column("align_score").to_pylist() == [None]
