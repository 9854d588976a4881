"""Fused-MLP Pallas kernel: exact parity with the flax NeRFField, forward and
backward (runs in interpret mode on CPU; compiled on TPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spinnerf_tpu.models.fields import NeRFField
from spinnerf_tpu.ops import fused_mlp as fm


@pytest.fixture(scope="module")
def setup():
    model = NeRFField(compute_dtype=jnp.float32)
    pts = jnp.asarray(np.random.RandomState(0).randn(8, 16, 3).astype(np.float32))
    vd = np.random.RandomState(1).randn(8, 3).astype(np.float32)
    vd = jnp.asarray(vd / np.linalg.norm(vd, axis=-1, keepdims=True))
    params = model.init(jax.random.PRNGKey(0), pts, vd)
    dims = fm.dims_for_field()._replace(compute_dtype="float32")
    weights = fm.params_to_fused(params, dims, raw_in_dim=63, raw_dir_dim=27)
    field = fm.make_fused_field_fn(dims, block=128)
    return model, params, dims, weights, field, pts, vd


def test_forward_matches_flax(setup):
    model, params, dims, weights, field, pts, vd = setup
    want = np.asarray(model.apply(params, pts, vd))
    got = np.asarray(field(weights, pts, vd))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_backward_matches_flax(setup):
    model, params, dims, weights, field, pts, vd = setup

    def loss_flax(p):
        return jnp.sum(jnp.tanh(model.apply(p, pts, vd)))

    def loss_fused(w):
        return jnp.sum(jnp.tanh(field(w, pts, vd)))

    g_flax = jax.grad(loss_flax)(params)
    g_fused = jax.grad(loss_fused)(weights)

    # compare a few weight grads through the padding-aware mapping
    gf = g_flax["params"]
    pairs = [
        (g_fused["rgb_w"], gf["rgb_head"]["kernel"]),
        (g_fused["sigma_w"], gf["sigma_head"]["kernel"]),
        (g_fused["tw1"], gf["trunk_1"]["kernel"]),
        (g_fused["tw0"][:63], gf["trunk_0"]["kernel"]),
        (g_fused["feat_b"][0], gf["feature"]["bias"]),
    ]
    for got, want in pairs:
        got, want = np.asarray(got), np.asarray(want)
        scale = max(np.abs(want).max(), 1e-6)
        np.testing.assert_allclose(got / scale, want / scale, atol=1e-4)

    # padded input rows must receive zero gradient
    assert np.abs(np.asarray(g_fused["tw0"])[63:]).max() == 0.0


def test_input_gradients_match(setup):
    model, params, dims, weights, field, pts, vd = setup

    g_flax = jax.grad(lambda p: jnp.sum(jnp.tanh(model.apply(params, p, vd))))(pts)
    g_fused = jax.grad(lambda p: jnp.sum(jnp.tanh(field(weights, p, vd))))(pts)
    scale = max(np.abs(np.asarray(g_flax)).max(), 1e-6)
    np.testing.assert_allclose(np.asarray(g_fused) / scale,
                               np.asarray(g_flax) / scale, atol=1e-4)


def test_semantic_variant(rng):
    model = NeRFField(semantic=True, compute_dtype=jnp.float32)
    pts = jnp.asarray(rng.randn(4, 8, 3).astype(np.float32))
    vd = rng.randn(4, 3).astype(np.float32)
    vd = jnp.asarray(vd / np.linalg.norm(vd, axis=-1, keepdims=True))
    params = model.init(jax.random.PRNGKey(0), pts, vd)
    dims = fm.dims_for_field(semantic=True)._replace(compute_dtype="float32")
    weights = fm.params_to_fused(params, dims, raw_in_dim=63, raw_dir_dim=27)
    field = fm.make_fused_field_fn(dims, block=64)
    want = np.asarray(model.apply(params, pts, vd))
    got = np.asarray(field(weights, pts, vd))
    assert got.shape == want.shape == (4, 8, 5)
    np.testing.assert_allclose(got, want, atol=0.05, rtol=0.05)


def test_nonmultiple_point_count(setup):
    """P not a multiple of block: padding must not leak into outputs."""
    model, params, dims, weights, field, pts, vd = setup
    small = pts[:3, :5]      # 15 points, block=128
    vd3 = vd[:3]
    want = np.asarray(model.apply(params, small, vd3))
    got = np.asarray(field(weights, small, vd3))
    np.testing.assert_allclose(got, want, atol=0.05, rtol=0.05)


def test_bf16_kernel_close_to_f32(setup):
    """The production bf16 kernel stays within bf16-scale error of f32."""
    model, params, dims, weights, field, pts, vd = setup
    dims_bf = dims._replace(compute_dtype="bfloat16")
    field_bf = fm.make_fused_field_fn(dims_bf, block=128)
    a = np.asarray(field(weights, pts, vd))
    b = np.asarray(field_bf(weights, pts, vd))
    assert np.abs(a - b).max() < 0.2 * max(np.abs(a).max(), 1.0)


# --- v2: PE-in-kernel path ----------------------------------------------------

@pytest.fixture(scope="module")
def setup_v2():
    model = NeRFField(compute_dtype=jnp.float32)
    pts = jnp.asarray(
        np.random.RandomState(0).randn(8, 16, 3).astype(np.float32))
    vd = np.random.RandomState(1).randn(8, 3).astype(np.float32)
    vd = jnp.asarray(vd / np.linalg.norm(vd, axis=-1, keepdims=True))
    params = model.init(jax.random.PRNGKey(0), pts, vd)
    dims = fm.dims_for_field()._replace(compute_dtype="float32")
    weights = fm.params_to_fused(params, dims, raw_in_dim=63, raw_dir_dim=27)
    field = fm.make_fused_pe_field_fn(dims, block=128)
    return model, params, dims, weights, field, pts, vd


def test_pe_constants_reproduce_encoding(setup_v2):
    from spinnerf_tpu.models.embedding import positional_encoding
    _, _, dims, _, _, pts, vd = setup_v2
    xd = np.zeros((128, 8), np.float32)
    xd[:, :3] = np.asarray(pts).reshape(-1, 3)
    b, s = pts.shape[0], pts.shape[1]
    vdb = np.broadcast_to(np.asarray(vd)[:, None, :], (b, s, 3)).reshape(-1, 3)
    xd[:, 3:6] = vdb
    pe_x, pe_d = fm._pe_consts_for(dims)
    got_x = np.asarray(fm._encode_block(jnp.asarray(xd), *pe_x, jnp.float32))
    want_x = np.asarray(positional_encoding(jnp.asarray(xd[:, :3]), 10))
    np.testing.assert_allclose(got_x[:, :63], want_x, atol=1e-5)
    assert np.abs(got_x[:, 63:]).max() == 0.0
    got_d = np.asarray(fm._encode_block(jnp.asarray(xd), *pe_d, jnp.float32))
    want_d = np.asarray(positional_encoding(jnp.asarray(xd[:, 3:6]), 4))
    np.testing.assert_allclose(got_d[:, :27], want_d, atol=1e-5)


def test_v2_forward_matches_flax(setup_v2):
    model, params, dims, weights, field, pts, vd = setup_v2
    want = np.asarray(model.apply(params, pts, vd))
    got = np.asarray(field(weights, pts, vd))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_v2_backward_matches_flax(setup_v2):
    model, params, dims, weights, field, pts, vd = setup_v2

    def loss_flax(p):
        return jnp.sum(jnp.tanh(model.apply(p, pts, vd)))

    def loss_fused(w):
        return jnp.sum(jnp.tanh(field(w, pts, vd)))

    g_flax = jax.grad(loss_flax)(params)["params"]
    g_fused = jax.grad(loss_fused)(weights)

    pairs = [
        (g_fused["rgb_w"], g_flax["rgb_head"]["kernel"]),
        (g_fused["sigma_w"], g_flax["sigma_head"]["kernel"]),
        (g_fused["tw7"], g_flax["trunk_7"]["kernel"]),
        (g_fused["tw5"][:63], g_flax["trunk_5"]["kernel"][:63]),
        (g_fused["tw1"], g_flax["trunk_1"]["kernel"]),
        (g_fused["tw0"][:63], g_flax["trunk_0"]["kernel"]),
        (g_fused["feat_w"], g_flax["feature"]["kernel"]),
        (g_fused["feat_b"][0], g_flax["feature"]["bias"]),
        (g_fused["view_w"][:256], g_flax["view_0"]["kernel"][:256]),
        (g_fused["view_b"][0], g_flax["view_0"]["bias"]),
    ]
    for got, want in pairs:
        got, want = np.asarray(got), np.asarray(want)
        scale = max(np.abs(want).max(), 1e-6)
        np.testing.assert_allclose(got / scale, want / scale, atol=1e-4)
    assert np.abs(np.asarray(g_fused["tw0"])[63:]).max() == 0.0


def test_v2_semantic_variant(rng):
    model = NeRFField(semantic=True, compute_dtype=jnp.float32)
    pts = jnp.asarray(rng.randn(4, 8, 3).astype(np.float32))
    vd = rng.randn(4, 3).astype(np.float32)
    vd = jnp.asarray(vd / np.linalg.norm(vd, axis=-1, keepdims=True))
    params = model.init(jax.random.PRNGKey(0), pts, vd)
    dims = fm.dims_for_field(semantic=True)._replace(compute_dtype="float32")
    weights = fm.params_to_fused(params, dims, raw_in_dim=63, raw_dir_dim=27)
    field = fm.make_fused_pe_field_fn(dims, block=32)
    want = np.asarray(model.apply(params, pts, vd))
    got = np.asarray(field(weights, pts, vd))
    assert got.shape == want.shape == (4, 8, 5)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_v2_backward_accumulates_across_grid_steps(setup_v2):
    """dW accumulation over REVISITED output blocks: running the same batch
    through a smaller block (4 grid steps) must give identical weight grads
    to the single-block pass."""
    model, params, dims, weights, _, pts, vd = setup_v2
    f1 = fm.make_fused_pe_field_fn(dims, block=128)   # 1 grid step
    f4 = fm.make_fused_pe_field_fn(dims, block=32)    # 4 grid steps

    def loss(field):
        return lambda w: jnp.sum(jnp.tanh(field(w, pts, vd)))

    g1 = jax.grad(loss(f1))(weights)
    g4 = jax.grad(loss(f4))(weights)
    for n in g1:
        np.testing.assert_allclose(np.asarray(g4[n]), np.asarray(g1[n]),
                                   atol=1e-5, rtol=1e-4, err_msg=n)
