"""Loss-term unit tests."""
import numpy as np
import jax.numpy as jnp

from spinnerf_tpu.core import losses


def test_mse_and_psnr(rng):
    a = jnp.asarray(rng.rand(10, 3).astype(np.float32))
    b = jnp.asarray(rng.rand(10, 3).astype(np.float32))
    m = float(losses.mse(a, b))
    np.testing.assert_allclose(m, np.mean((np.asarray(a) - np.asarray(b)) ** 2),
                               atol=1e-6)
    np.testing.assert_allclose(float(losses.psnr(a, b)),
                               -10 * np.log10(m), rtol=1e-4)


def test_masked_mse_ignores_padding(rng):
    a = rng.rand(8, 3).astype(np.float32)
    b = rng.rand(8, 3).astype(np.float32)
    mask = np.array([1, 1, 1, 1, 0, 0, 0, 0], np.float32)
    got = float(losses.mse(jnp.asarray(a), jnp.asarray(b), jnp.asarray(mask)))
    want = np.mean((a[:4] - b[:4]) ** 2)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_depth_loss_variants(rng):
    pred = jnp.asarray(rng.rand(16).astype(np.float32) + 1)
    tgt = jnp.asarray(rng.rand(16).astype(np.float32) + 1)
    w = jnp.asarray(rng.rand(16).astype(np.float32))

    plain = float(losses.depth_loss(pred, tgt))
    np.testing.assert_allclose(
        plain, np.mean((np.asarray(pred) - np.asarray(tgt)) ** 2), rtol=1e-5)

    wgt = float(losses.depth_loss(pred, tgt, ray_weights=w, weighted=True))
    np.testing.assert_allclose(
        wgt, np.mean((np.asarray(pred) - np.asarray(tgt)) ** 2 * np.asarray(w)),
        rtol=1e-5)

    rel = float(losses.depth_loss(pred, tgt, relative=True))
    np.testing.assert_allclose(
        rel, np.mean(((np.asarray(pred) - np.asarray(tgt)) / np.asarray(tgt)) ** 2),
        rtol=1e-5)

    norm = float(losses.depth_loss(pred, tgt, ray_weights=w, weighted=True,
                                   normalize=True, max_depth=4.0))
    np.testing.assert_allclose(
        norm,
        np.mean(((np.asarray(pred) - np.asarray(tgt)) / 4.0) ** 2 * np.asarray(w)),
        rtol=1e-5)


def test_sigma_loss_prefers_mass_at_surface(rng):
    """Loss is lower (more negative) when density concentrates at the last
    sample (the GT depth) than when it is spread out."""
    concentrated = np.zeros((1, 16), np.float32)
    concentrated[0, -1] = 5.0
    spread = np.full((1, 16), 5.0 / 16, np.float32)
    l_conc = float(losses.sigma_loss(jnp.asarray(concentrated))[0])
    l_spread = float(losses.sigma_loss(jnp.asarray(spread))[0])
    assert l_conc < l_spread


def test_bce_with_logits_matches_formula(rng):
    logits = rng.randn(32).astype(np.float32)
    labels = (rng.rand(32) > 0.5).astype(np.float32)
    got = float(losses.bce_with_logits(jnp.asarray(logits), jnp.asarray(labels)))
    p = 1 / (1 + np.exp(-logits))
    want = -np.mean(labels * np.log(p) + (1 - labels) * np.log(1 - p))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_distortion_loss_zero_for_delta(rng):
    """A single-sample spike has (near) zero distortion; uniform weights don't."""
    z = jnp.asarray(np.linspace(2, 6, 33, dtype=np.float32)[None].repeat(4, 0))
    spike = np.zeros((4, 33), np.float32)
    spike[:, 16] = 1.0
    uniform = np.full((4, 33), 1 / 33, np.float32)
    l_spike = float(losses.distortion_loss(jnp.asarray(spike), z))
    l_unif = float(losses.distortion_loss(jnp.asarray(uniform), z))
    assert l_spike < l_unif
