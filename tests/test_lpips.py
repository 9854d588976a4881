"""LPIPS module tests (random-init backbone; metric properties, torch-format
linear-head loading)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spinnerf_tpu.models import lpips as lpips_lib


@pytest.fixture(scope="module")
def lpips_fn():
    return lpips_lib.load_lpips()  # seeded random backbone


def test_identity_is_zero(lpips_fn, rng):
    x = jnp.asarray(rng.rand(32, 32, 3).astype(np.float32))
    assert float(lpips_fn(x, x)) < 1e-6


def test_symmetric_and_positive(lpips_fn, rng):
    x = jnp.asarray(rng.rand(32, 32, 3).astype(np.float32))
    y = jnp.asarray(rng.rand(32, 32, 3).astype(np.float32))
    d1, d2 = float(lpips_fn(x, y)), float(lpips_fn(y, x))
    assert d1 > 0
    np.testing.assert_allclose(d1, d2, rtol=1e-5)


def test_monotone_in_distortion(lpips_fn, rng):
    x = rng.rand(32, 32, 3).astype(np.float32)
    small = np.clip(x + rng.randn(32, 32, 3) * 0.02, 0, 1).astype(np.float32)
    large = np.clip(x + rng.randn(32, 32, 3) * 0.3, 0, 1).astype(np.float32)
    d_small = float(lpips_fn(jnp.asarray(x), jnp.asarray(small)))
    d_large = float(lpips_fn(jnp.asarray(x), jnp.asarray(large)))
    assert d_small < d_large


def test_batched_and_jittable(lpips_fn, rng):
    x = jnp.asarray(rng.rand(3, 16, 16, 3).astype(np.float32))
    y = jnp.asarray(rng.rand(3, 16, 16, 3).astype(np.float32))
    d = jax.jit(lpips_fn)(x, y)
    assert d.shape == (3,)
    assert (np.asarray(d) > 0).all()


@pytest.mark.slow
def test_gradients_flow(lpips_fn, rng):
    x = jnp.asarray(rng.rand(16, 16, 3).astype(np.float32))
    y = jnp.asarray(rng.rand(16, 16, 3).astype(np.float32))
    g = jax.grad(lambda a: lpips_fn(a, y))(x)
    assert np.abs(np.asarray(g)).max() > 0


def test_load_reference_linear_heads_if_present():
    """The LaMa-vendored LPIPS checkpoint carries the 5 linear heads."""
    import os
    path = "/root/reference/lama/models/lpips_models/vgg.pth"
    if not os.path.exists(path):
        pytest.skip("reference weights not mounted")
    lin = lpips_lib.load_lin_weights_from_torch(path)
    assert [w.shape[0] for w in lin] == list(lpips_lib.FEATURE_CHANNELS)
    assert all((np.asarray(w) >= 0).all() for w in lin)
