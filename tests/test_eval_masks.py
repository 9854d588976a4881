"""Learned eval-mask generation (`eval/masks.py`): ObjectMask geometry,
constraint enforcement in LearnedMaskGenerator, the ADE20k instance adapter,
and the square-crop proposer."""
import numpy as np
import pytest

# integration-heavy module: full-suite lane only (fast lane: -m 'not slow')
pytestmark = pytest.mark.slow

from spinnerf_tpu.eval import masks as em


def _blob(h, w, y0, y1, x0, x1):
    m = np.zeros((h, w), bool)
    m[y0:y1, x0:x1] = True
    return m


def test_object_mask_bbox_and_restore():
    m = _blob(40, 60, 10, 20, 15, 35)
    om = em.ObjectMask(m)
    assert (om.up, om.down, om.left, om.right) == (10, 20, 15, 35)
    np.testing.assert_array_equal(om.restore_full_mask(), m)


def test_object_mask_shift_crops_to_canvas():
    m = _blob(40, 60, 10, 20, 15, 35)
    om = em.ObjectMask(m).shift(vertical=-15)   # partially off-canvas
    full = om.restore_full_mask()
    assert full.shape == (40, 60)
    assert full[:5, 15:35].all() and not full[10:, :].any()
    gone = em.ObjectMask(m).shift(horizontal=100).restore_full_mask()
    assert not gone.any()


def test_object_mask_rescale_keeps_center():
    m = _blob(64, 64, 24, 40, 24, 40)
    om = em.ObjectMask(m).rescale(0.5)
    full = om.restore_full_mask()
    ys, xs = np.where(full)
    assert abs(ys.mean() - 31.5) < 3 and abs(xs.mean() - 31.5) < 3
    assert 40 <= full.sum() <= 100   # ~(16*0.5)^2


def test_learned_generator_respects_constraints():
    """Variants never fall below min_mask_area and respect the foreground
    bounds; an over-large object is never a candidate."""
    h = w = 64
    obj = _blob(h, w, 40, 56, 8, 24)           # 6%: candidate
    other = _blob(h, w, 8, 20, 44, 60)         # second foreground object
    gen = em.LearnedMaskGenerator(lambda img: [obj, other],
                                  num_variants_per_mask=3,
                                  downsample_levels=5, seed=1)
    out = gen.get_masks(np.zeros((h, w, 3), np.float32))
    assert len(out) >= 1
    for m in out:
        assert m.shape == (h, w) and m.dtype == np.uint8
        assert m.mean() > gen.min_mask_area
        inter = (m.astype(bool) & other).sum()
        # placement search runs on the downsampled pyramid; allow its
        # quantization on top of the configured bound
        assert inter / other.sum() <= gen.max_foreground_coverage + 0.25

    # an object above max_object_area is never proposed as a mask source
    big = _blob(h, w, 4, 60, 4, 60)            # 77% of image
    out_big = em.LearnedMaskGenerator(lambda img: [big], seed=1).get_masks(
        np.zeros((h, w, 3), np.float32))
    assert out_big == []


def test_learned_generator_deterministic_seed():
    obj = _blob(64, 64, 40, 56, 8, 24)
    a = em.LearnedMaskGenerator(lambda img: [obj], seed=3).get_masks(
        np.zeros((64, 64, 3), np.float32))
    b = em.LearnedMaskGenerator(lambda img: [obj], seed=3).get_masks(
        np.zeros((64, 64, 3), np.float32))
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_ade20k_instances_smoke():
    """Random-weights segmenter still yields a well-formed instances_fn."""
    fn = em.ade20k_instances(min_area_frac=0.001)
    img = np.random.RandomState(0).rand(48, 64, 3).astype(np.float32)
    out = fn(img)
    assert isinstance(out, list)
    for m in out:
        assert m.shape == (48, 64) and m.dtype == bool


def test_propose_random_square_crop_overlaps_mask():
    rng = np.random.RandomState(0)
    mask = np.zeros((60, 100), np.float32)
    mask[20:40, 55:80] = 1
    for _ in range(10):
        x0, y0, x1, y1 = em.propose_random_square_crop(mask, rng=rng)
        assert x1 - x0 == 60 and y1 - y0 == 60    # square, short side
        crop = mask[y0:y1, x0:x1]
        assert crop.sum() / mask.sum() >= 0.1
