"""Mask-refinement tests on analytic geometry (exact depths, no NeRF).

The synthetic world (plane + ball) gives exact per-pixel surface depths, so
reprojection consistency is exact: a mask pixel over the *plane* (over-dilated
mask) has unmasked counterparts in other views at consistent depth and must be
un-masked; a pixel showing the *ball* is masked in every view (or depth-
inconsistent) and must stay masked.
"""
import numpy as np
import pytest

from spinnerf_tpu.data import synthetic
from spinnerf_tpu.pipeline import mask_refine


def make_dumps(n_views=6, h=48, w=60, focal=72.0, dilate=6):
    """Analytic ViewDumps: depth/disp from the tracer, z samples = the true
    surface depth (a single 'sample'), alpha = 1 at the surface."""
    import cv2
    views = []
    for v in range(n_views):
        th = 2 * np.pi * v / n_views
        pos = np.array([3.5 * np.cos(th), 3.5 * np.sin(th), 2.0])
        c2w3 = synthetic.look_at_pose(pos, target=(0, 0, 0.3))
        c2w = np.concatenate([c2w3, [[0, 0, 0, 1]]], 0)
        rgb, t, hit = synthetic.render_view(c2w3, h, w, focal, with_ball=True)
        t = np.nan_to_num(t, posinf=100.0)
        mask = cv2.dilate(hit.astype(np.uint8), np.ones((5, 5), np.uint8),
                          iterations=dilate).astype(np.float32)
        views.append(mask_refine.ViewDump(
            image=rgb, mask=mask,
            z=t[..., None], alpha=np.ones((h, w, 1), np.float32),
            depth=t, disp=1.0 / np.maximum(t, 1e-6), c2w=c2w))
    return views, (h, w, focal)


@pytest.fixture(scope="module")
def dumps():
    return make_dumps()


def test_refinement_shrinks_dilated_mask(dumps):
    views, (h, w, focal) = dumps
    src = views[0]
    before = src.mask.sum()
    img, mask, disp = mask_refine.refine_view(
        src, views, focal=focal, cx=w / 2, cy=h / 2, distance_thresh=0.05)
    after = mask.sum()
    # only ring pixels visible unmasked from some other view can be freed;
    # with a 5x5 x6 dilation most of the annulus is masked in EVERY view, so
    # demand a meaningful (not total) shrink
    assert after <= before - 150, (before, after)

    # every pixel actually showing the ball must stay masked
    _, _, hit = synthetic.render_view(src.c2w[:3], h, w, focal, with_ball=True)
    assert (mask[hit] > 0.5).all(), "true-occlusion pixels were unmasked"


def test_unmasked_pixels_get_consistent_color(dumps):
    """Pasted colors come from another view's plane pixel — they must match
    the source's own no-ball render closely (same lambertian plane)."""
    views, (h, w, focal) = dumps
    src = views[0]
    img, mask, disp = mask_refine.refine_view(
        src, views, focal=focal, cx=w / 2, cy=h / 2, distance_thresh=0.05)
    changed = (src.mask > 0.5) & (mask < 0.5)
    assert changed.sum() > 50
    rgb_nb, _, _ = synthetic.render_view(src.c2w[:3], h, w, focal,
                                         with_ball=False)
    err = np.abs(img[changed] - rgb_nb[changed]).mean()
    assert err < 0.15, err


def test_refine_all_writes_layout(dumps, tmp_path):
    views, (h, w, focal) = dumps
    results = mask_refine.refine_all(views[:3], focal=focal, cx=w / 2,
                                     cy=h / 2, out_dir=tmp_path)
    assert len(results) == 3
    assert len(list((tmp_path / "refined_images").glob("*.png"))) == 3
    assert len(list((tmp_path / "refined_images" / "label").glob("*.png"))) == 3
    assert len(list((tmp_path / "refined_disp").glob("*.png"))) == 3
