"""Inpainting evaluator + interactive segmentation tests."""
import numpy as np
import pytest

# integration-heavy module: full-suite lane only (fast lane: -m 'not slow')
pytestmark = pytest.mark.slow

from spinnerf_tpu.eval.inpainting import (FeatureExtractor, frechet_distance,
                                          InpaintingEvaluator)
from spinnerf_tpu.pipeline.interactive import ClickSegmenter, bg_remover


def test_frechet_distance_properties(rng):
    a = rng.randn(200, 16)
    np.testing.assert_allclose(frechet_distance(a, a.copy()), 0.0, atol=1e-6)
    b = rng.randn(200, 16) + 3.0
    assert frechet_distance(a, b) > 5.0


def test_evaluator_bins_and_integral(rng):
    fe = FeatureExtractor()  # seeded random VGG trunk
    ev = InpaintingEvaluator(feature_extractor=fe)
    for i in range(6):
        img = rng.rand(32, 32, 3).astype(np.float32)
        pred = np.clip(img + rng.randn(32, 32, 3) * 0.05, 0, 1).astype(np.float32)
        mask = np.zeros((32, 32), np.float32)
        mask[: 4 * (i + 1)] = 1  # varying mask areas
        ev.add(pred, img, mask)
    out = ev.evaluation_end()
    assert "total" in out and out["total"]["n"] == 6
    assert 0 <= out["total"]["ssim"]["mean"] <= 1
    assert "fid_vgg" in out["total"]   # VGG embedding never reports "fid"
    assert 0 <= out["total"]["ssim_fid100_f1"] <= 1
    bins = [k for k in out if k.startswith("mask_")]
    assert len(bins) >= 2
    assert sum(out[k]["n"] for k in bins) == 6


def test_evaluator_inception_fid_key(rng, monkeypatch):
    """Random-weights InceptionV3 reports `fid_random_inception`, never
    `fid` — only real dropped-in weights may claim FID."""
    from spinnerf_tpu.eval.inpainting import InceptionFeatureExtractor
    # isolate from any checkpoints dropped into the session's weights dir
    monkeypatch.delenv("SPINNERF_WEIGHTS_DIR", raising=False)
    fe = InceptionFeatureExtractor(batch=4)
    assert fe.fid_key == "fid_random_inception"
    ev = InpaintingEvaluator(feature_extractor=fe)
    for i in range(3):
        img = rng.rand(40, 40, 3).astype(np.float32)
        pred = np.clip(img + rng.randn(40, 40, 3) * 0.1, 0, 1)
        mask = np.zeros((40, 40), np.float32)
        mask[:10 * (i + 1)] = 1
        ev.add(pred.astype(np.float32), img, mask)
    out = ev.evaluation_end()
    assert "fid_random_inception" in out["total"]
    assert "fid" not in out["total"]
    assert 0 <= out["total"]["ssim_fid100_f1"] <= 1


def test_click_segmenter_finds_blob(rng):
    img = np.full((60, 80, 3), 0.1, np.float32)
    img[20:40, 30:55] = np.array([0.9, 0.2, 0.2])  # red blob
    seg = ClickSegmenter(img)
    seg.add_click(42, 30, positive=True)
    seg.add_click(5, 5, positive=False)
    mask = seg.segment()
    assert mask.shape == (60, 80)
    blob = mask[22:38, 32:53]
    assert blob.mean() > 0.7, blob.mean()
    assert mask[:10, :10].mean() < 0.2


def test_click_segmenter_requires_positive():
    seg = ClickSegmenter(np.zeros((10, 10, 3), np.float32))
    seg.add_click(1, 1, positive=False)
    with pytest.raises(ValueError, match="positive"):
        seg.segment()


def test_bg_remover_isolates_object(rng):
    img = np.full((60, 80, 3), 0.95, np.float32)  # bright bg, no edges
    img[15:45, 25:60] = np.array([0.2, 0.3, 0.8])
    mask = bg_remover(img)
    assert mask[25:40, 35:50].mean() > 0.8
    assert mask[:8, :8].mean() < 0.2
