"""MXU hash-encode kernels vs the XLA oracle (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spinnerf_tpu.ops import hash_encode as he


def _mk(n=300, l=3, log2t=9, seed=0):
    t = 1 << log2t
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    table = jax.random.normal(k1, (l, t, 2), jnp.float32) * 0.1
    idx = jax.random.randint(k2, (l, 8, n), 0, t, jnp.int32)
    w = jax.random.uniform(k3, (l, 8, n), jnp.float32)
    return table, idx, w


def test_fwd_matches_xla_oracle():
    table, idx, w = _mk()
    out = he.hash_encode_mxu(table, idx, w, True)
    ref = he.hash_encode_xla(table, idx, w)
    # bf16 one-hot matmul vs f32 gather: bf16-level agreement
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-3, rtol=5e-2)


def test_bwd_matches_xla_grad():
    table, idx, w = _mk(n=200, l=2, log2t=8)

    def loss_mxu(tb):
        return jnp.sum(jnp.sin(he.hash_encode_mxu(tb, idx, w, True)))

    def loss_xla(tb):
        return jnp.sum(jnp.sin(he.hash_encode_xla(tb, idx, w)))

    g_mxu = jax.grad(loss_mxu)(table)
    g_xla = jax.grad(loss_xla)(table)
    np.testing.assert_allclose(np.asarray(g_mxu), np.asarray(g_xla),
                               atol=1e-2, rtol=5e-2)


def test_padding_nondivisible_n():
    table, idx, w = _mk(n=4097, l=2, log2t=8)
    out = he.hash_encode_mxu(table, idx, w, True)
    assert out.shape == (4097, 2, 2)
    ref = he.hash_encode_xla(table, idx, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-3, rtol=5e-2)


def test_multi_block_grid():
    # several point blocks (grid dim 1 > 1) plus padding
    table, idx, w = _mk(n=2500, l=2, log2t=8)
    out = he.hash_encode_mxu(table, idx, w, True)
    ref = he.hash_encode_xla(table, idx, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-3, rtol=5e-2)

    g_mxu = jax.grad(lambda tb: jnp.vdot(
        he.hash_encode_mxu(tb, idx, w, True), out))(table)
    g_xla = jax.grad(lambda tb: jnp.vdot(
        he.hash_encode_xla(tb, idx, w), out))(table)
    np.testing.assert_allclose(np.asarray(g_mxu), np.asarray(g_xla),
                               atol=1e-2, rtol=5e-2)


def test_recommended_impl():
    # round 3 moved the win/mxu crossover to 2^13 (ops/hash_encode.py:
    # recommended_impl — windowed beats dense for any table over one window)
    assert he.recommended_impl(12, on_tpu=True) == "mxu"
    assert he.recommended_impl(13, on_tpu=True) == "win"
    assert he.recommended_impl(15, on_tpu=True) == "win"
    assert he.recommended_impl(19, on_tpu=True) == "win"
    assert he.recommended_impl(14, on_tpu=False) == "xla"


def test_packed_rows():
    assert he.packed_rows(16) == (1 << 16) * 2 // 128
    with pytest.raises(ValueError):
        he.hash_encode_mxu(jnp.zeros((1, 4, 2)), jnp.zeros((1, 8, 8), jnp.int32),
                           jnp.zeros((1, 8, 8)), True)
