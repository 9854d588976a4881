"""Sampling oracles: numpy inverse-CDF / stratified sampling cross-checks."""
import numpy as np
import jax
import jax.numpy as jnp

from spinnerf_tpu.core import sampling


def np_sample_pdf(bins, weights, u):
    """Reference-semantics inverse-CDF sampling with explicit uniforms."""
    weights = weights + 1e-5
    pdf = weights / weights.sum(-1, keepdims=True)
    cdf = np.cumsum(pdf, -1)
    cdf = np.concatenate([np.zeros_like(cdf[..., :1]), cdf], -1)
    B, S = u.shape
    out = np.empty_like(u)
    for b in range(B):
        inds = np.searchsorted(cdf[b], u[b], side="right")
        below = np.maximum(inds - 1, 0)
        above = np.minimum(inds, cdf.shape[-1] - 1)
        cdf_b, cdf_a = cdf[b][below], cdf[b][above]
        bin_b, bin_a = bins[b][below], bins[b][above]
        denom = cdf_a - cdf_b
        denom = np.where(denom < 1e-5, 1.0, denom)
        t = (u[b] - cdf_b) / denom
        out[b] = bin_b + t * (bin_a - bin_b)
    return out


def test_searchsorted_right_matches_numpy(rng):
    for _ in range(10):
        B, N, S = 7, 33, 19
        seq = np.sort(rng.rand(B, N).astype(np.float32), axis=-1)
        vals = rng.rand(B, S).astype(np.float32)
        # include exact boundary hits
        vals[:, 0] = seq[:, 5]
        got = np.asarray(sampling.searchsorted_right(jnp.asarray(seq),
                                                     jnp.asarray(vals)))
        want = np.stack([np.searchsorted(seq[b], vals[b], side="right")
                         for b in range(B)])
        np.testing.assert_array_equal(got, want)


def test_sample_pdf_matches_numpy_oracle(rng):
    B, N, S = 5, 63, 32
    bins = np.sort(rng.rand(B, N).astype(np.float32) * 4 + 1, axis=-1)
    weights = rng.rand(B, N - 1).astype(np.float32)
    u = rng.rand(B, S).astype(np.float32)
    got = sampling.sample_pdf(None, jnp.asarray(bins), jnp.asarray(weights),
                              S, u=jnp.asarray(u))
    want = np_sample_pdf(bins, weights, u)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_sample_pdf_det_spans_bins(rng):
    B, N = 3, 17
    bins = np.sort(rng.rand(B, N).astype(np.float32), axis=-1)
    weights = np.ones((B, N - 1), np.float32)
    got = np.asarray(sampling.sample_pdf(None, jnp.asarray(bins),
                                         jnp.asarray(weights), 8, det=True))
    # uniform weights + deterministic u: first sample at first bin edge,
    # last sample at (or before) the last edge
    np.testing.assert_allclose(got[:, 0], bins[:, 0], atol=1e-4)
    assert (got[:, -1] <= bins[:, -1] + 1e-5).all()
    assert (np.diff(got, axis=-1) >= -1e-6).all()


def test_stratified_z_vals_bounds_and_monotonic(rng):
    key = jax.random.PRNGKey(0)
    near = jnp.full((16,), 2.0)
    far = jnp.full((16,), 6.0)
    z = np.asarray(sampling.stratified_z_vals(key, near, far, 64, perturb=True))
    assert z.shape == (16, 64)
    assert (z >= 2.0 - 1e-5).all() and (z <= 6.0 + 1e-5).all()
    assert (np.diff(z, axis=-1) > -1e-6).all()

    z_det = np.asarray(sampling.stratified_z_vals(key, near, far, 64,
                                                  perturb=False))
    np.testing.assert_allclose(z_det[:, 0], 2.0, atol=1e-6)
    np.testing.assert_allclose(z_det[:, -1], 6.0, atol=1e-6)


def test_stratified_lindisp(rng):
    key = jax.random.PRNGKey(0)
    near = jnp.full((4,), 2.0)
    far = jnp.full((4,), 6.0)
    z = np.asarray(sampling.stratified_z_vals(key, near, far, 5,
                                              lindisp=True, perturb=False))
    want = 1.0 / (1.0 / 2.0 * (1 - np.linspace(0, 1, 5)) +
                  1.0 / 6.0 * np.linspace(0, 1, 5))
    np.testing.assert_allclose(z[0], want, atol=1e-5)


def test_hierarchical_z_vals_sorted_and_stop_grad(rng):
    key = jax.random.PRNGKey(1)
    B, N = 8, 64
    z_vals = jnp.asarray(np.sort(rng.rand(B, N).astype(np.float32) * 4 + 2, -1))
    weights = jnp.asarray(rng.rand(B, N).astype(np.float32))
    z_comb, z_samp = sampling.hierarchical_z_vals(key, z_vals, weights, 64)
    assert z_comb.shape == (B, 128)
    assert (np.diff(np.asarray(z_comb), axis=-1) >= 0).all()

    # gradient through z_samples must be zero (stop_gradient semantics)
    def f(w):
        _, zs = sampling.hierarchical_z_vals(key, z_vals, w, 16)
        return jnp.sum(zs)
    g = jax.grad(f)(weights)
    np.testing.assert_allclose(np.asarray(g), 0.0)


def test_ray_points_geometry(rng):
    o = jnp.asarray(rng.randn(4, 3).astype(np.float32))
    d = jnp.asarray(rng.randn(4, 3).astype(np.float32))
    z = jnp.asarray(np.linspace(1, 3, 5, dtype=np.float32)[None].repeat(4, 0))
    pts = np.asarray(sampling.ray_points(o, d, z))
    want = np.asarray(o)[:, None] + np.asarray(d)[:, None] * np.asarray(z)[..., None]
    np.testing.assert_allclose(pts, want, atol=1e-6)
