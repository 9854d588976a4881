"""Volume-rendering compositing oracles and gradient-semantics tests."""
import numpy as np
import jax
import jax.numpy as jnp

from spinnerf_tpu.core import rendering, rays
from spinnerf_tpu.core.rendering import RenderConfig


def np_composite(raw, z_vals, rays_d, white_bkgd=False):
    """Independent numpy alpha compositing (standard NeRF quadrature)."""
    dists = np.diff(z_vals, axis=-1)
    dists = np.concatenate([dists, np.full_like(dists[..., :1], 1e10)], -1)
    dists = dists * np.linalg.norm(rays_d, axis=-1, keepdims=True)
    rgb = 1.0 / (1.0 + np.exp(-raw[..., :3]))
    sigma = np.maximum(raw[..., 3], 0.0)
    alpha = 1.0 - np.exp(-sigma * dists)
    trans = np.cumprod(np.concatenate(
        [np.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-10], -1), -1)[..., :-1]
    weights = alpha * trans
    rgb_map = (weights[..., None] * rgb).sum(-2)
    depth = (weights * z_vals).sum(-1)
    acc = weights.sum(-1)
    disp = 1.0 / np.maximum(1e-10, depth / acc)
    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc[..., None])
    return rgb_map, disp, acc, weights, depth, alpha


def make_inputs(rng, B=6, S=32, C=4):
    raw = rng.randn(B, S, C).astype(np.float32)
    z_vals = np.sort(rng.rand(B, S).astype(np.float32) * 4 + 2, -1)
    rays_d = rng.randn(B, 3).astype(np.float32)
    return raw, z_vals, rays_d


def test_composite_matches_numpy_oracle(rng):
    raw, z_vals, rays_d = make_inputs(rng)
    for white in (False, True):
        out = rendering.composite(jnp.asarray(raw), jnp.asarray(z_vals),
                                  jnp.asarray(rays_d), white_bkgd=white)
        rgb, disp, acc, weights, depth, alpha = np_composite(
            raw, z_vals, rays_d, white_bkgd=white)
        np.testing.assert_allclose(np.asarray(out.rgb), rgb, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.rgb_sg), rgb, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.disp), disp, atol=1e-4)
        np.testing.assert_allclose(np.asarray(out.acc), acc, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.weights), weights, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.depth), depth, atol=1e-4)
        np.testing.assert_allclose(np.asarray(out.alpha), alpha, atol=1e-5)


def test_rgb_sg_blocks_sigma_gradients(rng):
    """rgb_sg must carry no gradient into sigma (detach_weights semantics,
    `DS_NeRF/run_nerf.py:1465-1467`), while rgb must."""
    raw, z_vals, rays_d = make_inputs(rng)
    raw_j = jnp.asarray(raw)

    def loss_sg(r):
        out = rendering.composite(r, jnp.asarray(z_vals), jnp.asarray(rays_d))
        return jnp.sum(out.rgb_sg)

    def loss(r):
        out = rendering.composite(r, jnp.asarray(z_vals), jnp.asarray(rays_d))
        return jnp.sum(out.rgb)

    g_sg = np.asarray(jax.grad(loss_sg)(raw_j))
    g = np.asarray(jax.grad(loss)(raw_j))
    np.testing.assert_allclose(g_sg[..., 3], 0.0)      # sigma grads blocked
    assert np.abs(g_sg[..., :3]).max() > 0             # color grads flow
    assert np.abs(g[..., 3]).max() > 0                 # normal path has both


def test_semantic_prob_map_gradients(rng):
    """prob map: grads flow to the logit channel but not to sigma
    (MVSeg `prob_map = sum w.detach()*logit`)."""
    raw, z_vals, rays_d = make_inputs(rng, C=5)

    def loss(r):
        out = rendering.composite(r, jnp.asarray(z_vals), jnp.asarray(rays_d),
                                  semantic=True)
        return jnp.sum(out.prob)

    g = np.asarray(jax.grad(loss)(jnp.asarray(raw)))
    np.testing.assert_allclose(g[..., 3], 0.0)
    assert np.abs(g[..., 4]).max() > 0


def test_only_object_removes_object_density(rng):
    """only_object is the object-REMOVAL mode: alpha *= (1 - sigmoid(logit)),
    so samples classified as object (logit >> 0) contribute nothing."""
    raw, z_vals, rays_d = make_inputs(rng, C=5)
    raw[..., 4] = 100.0  # everything is "object" -> fully removed
    out = rendering.composite(jnp.asarray(raw), jnp.asarray(z_vals),
                              jnp.asarray(rays_d), only_object=True)
    np.testing.assert_allclose(np.asarray(out.acc), 0.0, atol=1e-5)

    raw[..., 4] = -100.0  # nothing is "object" -> unchanged render
    out_oo = rendering.composite(jnp.asarray(raw), jnp.asarray(z_vals),
                                 jnp.asarray(rays_d), only_object=True)
    out_plain = rendering.composite(jnp.asarray(raw[..., :4]),
                                    jnp.asarray(z_vals), jnp.asarray(rays_d))
    np.testing.assert_allclose(np.asarray(out_oo.rgb),
                               np.asarray(out_plain.rgb), atol=1e-5)


def test_harsh_bg_remove_pushes_empty_rays_negative(rng):
    raw, z_vals, rays_d = make_inputs(rng, C=5)
    raw[..., 3] = -100.0  # empty space
    raw[..., 4] = 0.0
    out = rendering.composite(jnp.asarray(raw), jnp.asarray(z_vals),
                              jnp.asarray(rays_d), semantic=True,
                              harsh_bg_remove=True)
    assert (np.asarray(out.prob) < -9).all()


def constant_field(rgb_logit=0.0, sigma=50.0, channels=4):
    def field_fn(pts, viewdirs):
        B, S = pts.shape[0], pts.shape[1]
        raw = jnp.zeros((B, S, channels))
        raw = raw.at[..., :3].set(rgb_logit)
        raw = raw.at[..., 3].set(sigma)
        return raw
    return field_fn


def test_render_rays_dense_field_hits_near_depth(rng):
    """A uniformly dense field renders depth ~ near and acc ~ 1."""
    key = jax.random.PRNGKey(0)
    B = 16
    batch = rays.make_ray_batch(
        jnp.zeros((B, 3)), jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (B, 1)),
        near=2.0, far=6.0)
    cfg = RenderConfig(n_samples=64, n_importance=32, perturb=True)
    res = rendering.render_rays(key, batch, constant_field(), cfg)
    acc = np.asarray(res.fine.acc)
    depth = np.asarray(res.fine.depth)
    np.testing.assert_allclose(acc, 1.0, atol=1e-3)
    assert (depth < 2.3).all() and (depth >= 2.0 - 1e-3).all()
    assert res.coarse is not None
    assert res.fine.z_vals.shape == (B, 96)


def test_render_rays_empty_field_white_bkgd(rng):
    key = jax.random.PRNGKey(0)
    B = 8
    batch = rays.make_ray_batch(
        jnp.zeros((B, 3)), jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (B, 1)),
        near=2.0, far=6.0)
    cfg = RenderConfig(n_samples=32, n_importance=0, perturb=False,
                       white_bkgd=True)
    res = rendering.render_rays(key, batch, constant_field(sigma=0.0), cfg)
    np.testing.assert_allclose(np.asarray(res.fine.rgb), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(res.fine.acc), 0.0, atol=1e-5)


def test_render_rays_chunked_equals_unchunked(rng):
    key = jax.random.PRNGKey(3)
    B = 50  # deliberately not a multiple of the chunk
    ro = jnp.asarray(rng.randn(B, 3).astype(np.float32) * 0.1)
    rd = jnp.asarray(-np.abs(rng.randn(B, 3).astype(np.float32)))
    batch = rays.make_ray_batch(ro, rd, near=2.0, far=6.0)
    cfg = RenderConfig(n_samples=16, n_importance=8, perturb=False)
    field = constant_field(rgb_logit=0.3, sigma=1.0)
    full = rendering.render_rays(key, batch, field, cfg)
    chunked = rendering.render_rays_chunked(key, batch, field, cfg, chunk=16)
    # perturb=False + det PDF sampling -> rendering is key-independent,
    # so chunked and unchunked must agree exactly.
    np.testing.assert_allclose(np.asarray(chunked.fine.rgb),
                               np.asarray(full.fine.rgb), atol=1e-5)
    np.testing.assert_allclose(np.asarray(chunked.fine.depth),
                               np.asarray(full.fine.depth), atol=1e-4)
