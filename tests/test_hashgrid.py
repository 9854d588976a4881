"""Hash-grid field tests: encoding interpolation properties, field training."""
import numpy as np
import jax
import jax.numpy as jnp

from spinnerf_tpu.models.hashgrid import (HashGridEncoding, HashGridField,
                                          level_resolutions)


def test_level_resolutions_geometric():
    res = level_resolutions(16, 16, 2048.0)
    assert res[0] == 16
    assert abs(res[-1] - 2048) <= 1
    ratios = [res[i + 1] / res[i] for i in range(14)]
    assert np.std(ratios) < 0.05  # geometric progression


def test_encoding_shapes_and_determinism(rng):
    enc = HashGridEncoding(n_levels=4, features=2, log2_table_size=10,
                           base_res=4, finest_res=32, compute_dtype=jnp.float32)
    x = jnp.asarray(rng.rand(17, 3).astype(np.float32))
    params = enc.init(jax.random.PRNGKey(0), x)
    out = enc.apply(params, x)
    assert out.shape == (17, 8)
    out2 = enc.apply(params, x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_encoding_trilinear_continuity(rng):
    """Output must be continuous in position: small input deltas give small
    output deltas (catches broken corner indexing)."""
    enc = HashGridEncoding(n_levels=4, features=2, log2_table_size=12,
                           base_res=4, finest_res=64, compute_dtype=jnp.float32)
    x = jnp.asarray(rng.rand(64, 3).astype(np.float32) * 0.9 + 0.05)
    params = enc.init(jax.random.PRNGKey(0), x)
    eps = 1e-4
    a = np.asarray(enc.apply(params, x))
    b = np.asarray(enc.apply(params, x + eps))
    assert np.abs(a - b).max() < 0.1 * np.abs(a).max() + 1e-3


def test_encoding_gradient_flows_to_table(rng):
    enc = HashGridEncoding(n_levels=2, features=2, log2_table_size=8,
                           base_res=4, finest_res=8, compute_dtype=jnp.float32)
    x = jnp.asarray(rng.rand(32, 3).astype(np.float32))
    params = enc.init(jax.random.PRNGKey(0), x)

    g = jax.grad(lambda p: jnp.sum(enc.apply(p, x) ** 2))(params)
    gmax = max(np.abs(np.asarray(l)).max() for l in jax.tree.leaves(g))
    assert gmax > 0


def test_field_shapes(rng):
    model = HashGridField(n_levels=4, log2_table_size=10, bound=2.0,
                          finest_res_per_unit=32, compute_dtype=jnp.float32)
    pts = jnp.asarray(rng.randn(3, 5, 3).astype(np.float32))
    vd = jnp.asarray(rng.randn(3, 3).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), pts, vd)
    raw = model.apply(params, pts, vd)
    assert raw.shape == (3, 5, 4)

    sem = HashGridField(n_levels=4, log2_table_size=10, bound=2.0,
                        finest_res_per_unit=32, semantic=True,
                        compute_dtype=jnp.float32)
    params = sem.init(jax.random.PRNGKey(0), pts, vd)
    assert sem.apply(params, pts, vd).shape == (3, 5, 5)


def test_field_overfits_toy_density(rng):
    """The hash field must fit a target radiance much faster than chance:
    regress rgb+sigma of a ball occupancy on random points."""
    model = HashGridField(n_levels=8, log2_table_size=12, bound=1.5,
                          finest_res_per_unit=64, hidden_dim=32,
                          compute_dtype=jnp.float32)
    pts = jnp.asarray(rng.rand(512, 4, 3).astype(np.float32) * 2 - 1)
    vd = jnp.asarray(rng.randn(512, 3).astype(np.float32))
    vd = vd / jnp.linalg.norm(vd, axis=-1, keepdims=True)
    inside = (jnp.linalg.norm(pts, axis=-1) < 0.6).astype(jnp.float32)
    target_sigma = inside * 5.0
    target_rgb = jnp.stack([inside, 1 - inside, inside * 0.5], -1)

    params = model.init(jax.random.PRNGKey(0), pts, vd)
    import optax
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    @jax.jit
    def step(p, o):
        def loss(p):
            raw = model.apply(p, pts, vd)
            return (jnp.mean((jax.nn.sigmoid(raw[..., :3]) - target_rgb) ** 2)
                    + jnp.mean((jax.nn.relu(raw[..., 3]) - target_sigma) ** 2))
        l, g = jax.value_and_grad(loss)(p)
        u, o = tx.update(g, o)
        return optax.apply_updates(p, u), o, l

    l0 = None
    for i in range(60):
        params, opt, l = step(params, opt)
        if l0 is None:
            l0 = float(l)
    assert float(l) < 0.25 * l0, (l0, float(l))
