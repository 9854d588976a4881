"""2D inpainting stage tests (random-weight generator; flow correctness)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

# integration-heavy module: full-suite lane only (fast lane: -m 'not slow')
pytestmark = pytest.mark.slow

from spinnerf_tpu.models import lama
from spinnerf_tpu.pipeline import inpaint2d


@pytest.fixture(scope="module")
def tiny_gen():
    gen = lama.FFCResNetGenerator(ngf=8, n_blocks=2, max_features=64)
    variables = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 4)))
    return gen, variables


def test_pad_to_modulo(rng):
    img = rng.rand(37, 50, 3).astype(np.float32)
    out, (h, w) = inpaint2d.pad_to_modulo(img, 8)
    assert out.shape == (40, 56, 3) and (h, w) == (37, 50)
    np.testing.assert_array_equal(out[:37, :50], img)


def test_predict_preserves_known_region(tiny_gen, rng):
    gen, variables = tiny_gen
    img = rng.rand(37, 45, 3).astype(np.float32)
    mask = np.zeros((37, 45), np.float32)
    mask[10:20, 12:30] = 1
    out = inpaint2d.predict(gen, variables, img, mask)
    assert out.shape == img.shape
    # outside the hole the original pixels survive exactly
    np.testing.assert_allclose(out[mask == 0], img[mask == 0], atol=1e-6)
    # inside the hole the output changed (generator wrote something)
    assert np.abs(out[mask == 1] - img[mask == 1]).mean() > 1e-3


def test_refine_predict_runs_and_blends(tiny_gen, rng):
    gen, variables = tiny_gen
    img = rng.rand(64, 72, 3).astype(np.float32)
    mask = np.zeros((64, 72), np.float32)
    mask[20:36, 24:48] = 1
    out = inpaint2d.refine_predict(gen, variables, img, mask,
                                   n_iters=2, min_side=16, px_budget=1e6,
                                   max_scales=2, mask_dilate_iters=0)
    assert out.shape == img.shape
    np.testing.assert_allclose(out[mask == 0], img[mask == 0], atol=1e-6)


def test_pyramid_levels(rng):
    img = rng.rand(128, 160, 3).astype(np.float32)
    mask = (rng.rand(128, 160) > 0.9).astype(np.float32)
    levels = inpaint2d._build_pyramid(img, mask, min_side=32,
                                      px_budget=1e9, max_scales=3)
    shapes = [l[0].shape[:2] for l in levels]
    assert shapes == [(32, 40), (64, 80), (128, 160)]
    # budget cap path
    levels = inpaint2d._build_pyramid(img, mask, min_side=32,
                                      px_budget=5000, max_scales=1)
    h, w = levels[-1][0].shape[:2]
    assert h * w <= 5500


def test_inpaint_directory(tiny_gen, rng, tmp_path):
    import cv2
    gen, variables = tiny_gen
    in_dir = tmp_path / "in"
    (in_dir / "label").mkdir(parents=True)
    for i in range(2):
        img = (rng.rand(40, 48, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(in_dir / f"img{i:03d}.png"), img)
        m = np.zeros((40, 48), np.uint8)
        m[10:20, 10:30] = 255
        cv2.imwrite(str(in_dir / "label" / f"img{i:03d}.png"), m)
    out = inpaint2d.inpaint_directory(in_dir, tmp_path / "out")
    files = sorted(out.glob("*.png"))
    assert len(files) == 2
    got = cv2.imread(str(files[0]))
    assert got.shape == (40, 48, 3)
