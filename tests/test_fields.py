"""Field-network tests: shapes, encoding parity, frozen-sigma semantics."""
import numpy as np
import jax
import jax.numpy as jnp

from spinnerf_tpu.models import embedding
from spinnerf_tpu.models.fields import NeRFField, make_field_fn


def np_positional_encoding(x, num_freqs):
    """Oracle with the reference feature ordering
    [x, sin(x*2^0), cos(x*2^0), sin(x*2^1), ...]."""
    feats = [x]
    for f in 2.0 ** np.arange(num_freqs):
        feats.append(np.sin(x * f))
        feats.append(np.cos(x * f))
    return np.concatenate(feats, axis=-1)


def test_positional_encoding_matches_oracle(rng):
    x = rng.randn(7, 3).astype(np.float32)
    for L in (4, 10):
        got = np.asarray(embedding.positional_encoding(jnp.asarray(x), L))
        want = np_positional_encoding(x, L)
        assert got.shape == (7, 3 * (1 + 2 * L))
        np.testing.assert_allclose(got, want, atol=1e-5)
    assert embedding.positional_encoding_dim(3, 10) == 63
    assert embedding.positional_encoding_dim(3, 4) == 27


def test_sh_encoding_orthonormal(rng):
    """Monte-carlo check that SH basis functions are orthonormal on S^2."""
    n = 200_000
    v = rng.randn(n, 3).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    basis = np.asarray(embedding.sh_encoding(jnp.asarray(v), degree=4))
    assert basis.shape == (n, 16)
    gram = basis.T @ basis / n * (4 * np.pi)
    np.testing.assert_allclose(gram, np.eye(16), atol=0.15)


def test_nerf_field_shapes_and_dtype(rng):
    model = NeRFField(compute_dtype=jnp.float32)
    pts = jnp.asarray(rng.randn(4, 8, 3).astype(np.float32))
    vd = jnp.asarray(rng.randn(4, 3).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), pts, vd)
    raw = model.apply(params, pts, vd)
    assert raw.shape == (4, 8, 4)
    assert raw.dtype == jnp.float32

    sem = NeRFField(semantic=True, compute_dtype=jnp.float32)
    params = sem.init(jax.random.PRNGKey(0), pts, vd)
    assert sem.apply(params, pts, vd).shape == (4, 8, 5)


def test_nerf_field_param_count_matches_reference_arch():
    """Parameter count of the 8x256 trunk + heads must equal the reference
    NeRF (use_viewdirs=True, multires 10/4): trunk 256->..., skip at 4."""
    model = NeRFField(compute_dtype=jnp.float32)
    pts = jnp.zeros((1, 1, 3))
    vd = jnp.zeros((1, 3))
    params = model.init(jax.random.PRNGKey(0), pts, vd)
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    # Reference: L0 63->256; L1-4 256->256; L5 (63+256)->256; L6-7 256->256;
    # sigma 256->1; feature 256->256; view (256+27)->128; rgb 128->3.
    want = ((63 + 1) * 256 + 4 * (256 + 1) * 256 + (319 + 1) * 256 +
            2 * (256 + 1) * 256 + (256 + 1) * 1 + (256 + 1) * 256 +
            (283 + 1) * 128 + (128 + 1) * 3)
    assert n == want


def test_frozen_sigma_replaces_density_and_blocks_grads(rng):
    """NeRF_RGB semantics: sigma comes from the frozen model, no grads to it."""
    model = NeRFField(compute_dtype=jnp.float32)
    pts = jnp.asarray(rng.randn(2, 4, 3).astype(np.float32))
    vd = jnp.asarray(rng.randn(2, 3).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), pts, vd)
    frozen_params = model.init(jax.random.PRNGKey(1), pts, vd)

    frozen_fn = make_field_fn(model, frozen_params)
    rgb_fn = make_field_fn(model, params, frozen_sigma_fn=frozen_fn)

    raw = rgb_fn(pts, vd)
    frozen_raw = frozen_fn(pts, vd)
    np.testing.assert_allclose(np.asarray(raw[..., 3]),
                               np.asarray(frozen_raw[..., 3]), atol=1e-6)

    def loss(fp):
        fn = make_field_fn(model, params,
                           frozen_sigma_fn=make_field_fn(model, fp))
        return jnp.sum(fn(pts, vd) ** 2)

    g = jax.grad(loss)(frozen_params)
    assert max(np.abs(np.asarray(x)).max() for x in jax.tree.leaves(g)) == 0.0


def test_field_jit_and_grad(rng):
    model = NeRFField(compute_dtype=jnp.float32)
    pts = jnp.asarray(rng.randn(8, 16, 3).astype(np.float32))
    vd = jnp.asarray(rng.randn(8, 3).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), pts, vd)

    @jax.jit
    def loss(p):
        return jnp.mean(model.apply(p, pts, vd) ** 2)

    g = jax.jit(jax.grad(loss))(params)
    assert np.isfinite(float(loss(params)))
    gmax = max(np.abs(np.asarray(x)).max() for x in jax.tree.leaves(g))
    assert gmax > 0 and np.isfinite(gmax)


def test_trunc_exp_forward_and_clamped_grad():
    """trunc_exp: forward is exp; backward is exp of the CLAMPED input
    (`DS_NeRF/activation.py:5-18`) — finite gradients at extreme sigmas."""
    import jax
    import jax.numpy as jnp
    from spinnerf_tpu.models.activations import trunc_exp
    x = jnp.asarray([-20.0, -1.0, 0.0, 1.0, 14.0])
    np.testing.assert_allclose(np.asarray(trunc_exp(x)), np.exp(np.asarray(x)),
                               rtol=1e-6)
    g = jax.grad(lambda v: trunc_exp(v).sum())(x)
    want = np.exp(np.clip(np.asarray(x), -15.0, 15.0))
    np.testing.assert_allclose(np.asarray(g), want, rtol=1e-6)
    # the clamp's point: at x=20 plain exp grad overflows f32 scale growth;
    # trunc_exp grad stays at exp(15)
    g_big = jax.grad(lambda v: trunc_exp(v).sum())(jnp.asarray([20.0]))
    np.testing.assert_allclose(float(g_big[0]), np.exp(15.0), rtol=1e-6)
