"""MXU-based hash-grid encode: gather/scatter as one-hot matmuls (Pallas).

Why this exists (measured on v5e, 100M table accesses/step — the default
DS-NeRF hash-grid workload, 786k points x 16 levels x 8 corners):

- XLA lowers both the corner gather and the gradient scatter-add to
  *serialized* loops: ~6 ns/row forward (665 ms) and ~80 ns/update backward
  (8.0 s), flat in table size and row width — no vectorized path exists.
- The TensorCore has no vector-gather hardware (v5e has no SparseCore;
  Mosaic's `tpu.dynamic_gather` only works within one 8-sublane tile).
- The one structure the TPU executes at full rate is the 128x128 MXU. So:
  pack each level's table as [R, 128] (64 entries x 2 feats per row) and
  express the 8-corner gather as `table^T @ onehot(rows)` and the
  scatter-add transpose as `onehot(rows) @ masked_grads` — both Pallas
  kernels with the level's table VMEM-resident.

Measured (v5e, full workload, T=2^15): fwd 74 ms + bwd 75 ms vs XLA's
665 ms + 8.0 s — 58x, at ~90% of MXU peak for the one-hot formulation.
Cost is FLOPs = 8 * N * R * 128 * 2 per level — linear in table size
(R = T*F/128), so T=2^19 costs ~16x T=2^15 but still beats XLA's flat 8.7 s.

Layout rules learned the hard way (see tests + docstrings):
- Everything is points-on-LANES ([L, 8, N] indices, [L, 2, N] grads/out):
  arrays with a small minor dim (e.g. [L, N, 2]) get tile-padded 2->128 by
  Mosaic, inflating HBM buffers 64x and OOMing the compiler/chip.
- The backward one-hot is built TRANSPOSED ([rc, B], points on lanes) so
  both matmuls are natively supported contractions; Mosaic cannot lower a
  dim0/dim0 contraction at these sizes.
- Temporaries of the 8 statically-unrolled corners do NOT share stack, so
  the point block B is sized for 8x live temps within the 16 MB VMEM scope.

Reference parity: this computes exactly the instant-ngp multiresolution hash
encoding used by the reference's default `NeRF_TCNN` model
(`DS_NeRF/run_nerf_helpers_tcnn.py:13-113`, tinycudann); the CUDA kernel's
role (gather + trilinear blend + scatter-add backward) is played by the MXU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# points per kernel block (lanes of every intermediate tile)
_B = 512
# table-row chunk per matmul (keeps the one-hot tile small in VMEM)
_RC = 256


def packed_rows(log2_table_size: int, features: int = 2) -> int:
    """Rows of the [R, 128] lane-packed table: 128/F entries per row."""
    t = 1 << log2_table_size
    return max(1, t * features // 128)


def recommended_impl(log2_table_size: int, on_tpu: bool | None = None) -> str:
    """On TPU: the dense one-hot path beats XLA's serialized gather/scatter
    at every table size (cost linear in R vs XLA's flat ~8.7 s), but its
    O(T)-per-point MXU work loses to the windowed Z-curve kernels
    (`ops/hash_encode_win.py`, O(window)=4096 entries per point) for any
    table bigger than one window: at 2^14 the windowed step measured 78.6 ms
    vs the dense kernel's 91.5 (v5e, round-3 bench) and the gap grows with
    T. Dense remains for tables at/below one window (2^12) where the
    windowed path degenerates to it, minus the sort."""
    if on_tpu is None:
        on_tpu = jax.devices()[0].platform == "tpu"
    if not on_tpu:
        return "xla"
    return "win" if log2_table_size >= 13 else "mxu"


# -----------------------------------------------------------------------------
# kernels — grid (L, N/B); all point-indexed tiles are [*, B] (points on lanes)
# -----------------------------------------------------------------------------

def _fwd_kernel(rows_ref, lanes_ref, w_ref, tabt_ref, out_ref, *, r_rows):
    """out[l, :, j*B:+B] = sum_c w_c * table[rows_c] feature lanes.

    rows/lanes/w blocks [1, 8, B]; transposed table block [1, 128, R];
    out block [1, 2, B].
    """
    tabt = tabt_ref[0].astype(jnp.bfloat16)                   # [128, R]
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (128, _B), 0)
    out0 = jnp.zeros((1, _B), jnp.float32)
    out1 = jnp.zeros((1, _B), jnp.float32)
    rc = min(_RC, r_rows)
    n_chunks = max(1, r_rows // rc)

    for c in range(8):
        rows_c = rows_ref[0, c:c + 1, :]                      # [1, B]
        gathered = jnp.zeros((128, _B), jnp.float32)
        for k in range(n_chunks):
            iota_r = k * rc + jax.lax.broadcasted_iota(
                jnp.int32, (rc, _B), 0)
            oht = (rows_c == iota_r).astype(jnp.bfloat16)     # [rc, B]
            gathered = gathered + jax.lax.dot_general(
                tabt[:, k * rc:(k + 1) * rc], oht,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)           # [128, B]
        lane_c = lanes_ref[0, c:c + 1, :]                     # [1, B]
        w_c = w_ref[0, c:c + 1, :]
        f0 = jnp.sum(jnp.where(sub_iota == lane_c, gathered, 0.0),
                     axis=0, keepdims=True)                   # [1, B]
        f1 = jnp.sum(jnp.where(sub_iota == lane_c + 1, gathered, 0.0),
                     axis=0, keepdims=True)
        out0 = out0 + w_c * f0
        out1 = out1 + w_c * f1
    out_ref[0] = jnp.concatenate([out0, out1], axis=0)        # [2, B]


def _bwd_kernel(rows_ref, lanes_ref, w_ref, g_ref, dtab_ref, *, r_rows):
    """dtab[l] += sum_c onehot(rows_c) @ masked(g * w_c) — scatter-add as a
    matmul. The grad-table block [1, R, 128] is revisited across the
    point-block grid dimension (zero-initialised at the first block)."""
    nb = pl.program_id(1)

    @pl.when(nb == 0)
    def _():
        dtab_ref[0] = jnp.zeros_like(dtab_ref[0])

    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (128, _B), 0)
    g0 = g_ref[0, 0:1, :]                                     # [1, B]
    g1 = g_ref[0, 1:2, :]
    rc = min(_RC, r_rows)
    n_chunks = max(1, r_rows // rc)

    for c in range(8):
        rows_c = rows_ref[0, c:c + 1, :]
        lane_c = lanes_ref[0, c:c + 1, :]
        w_c = w_ref[0, c:c + 1, :]
        vt = (jnp.where(sub_iota == lane_c, g0 * w_c, 0.0)
              + jnp.where(sub_iota == lane_c + 1, g1 * w_c, 0.0)
              ).astype(jnp.bfloat16)                          # [128, B]
        for k in range(n_chunks):
            iota_r = k * rc + jax.lax.broadcasted_iota(
                jnp.int32, (rc, _B), 0)
            oht = (rows_c == iota_r).astype(jnp.bfloat16)     # [rc, B]
            # "NT" gemm: contract the point (lane) dim of both operands
            upd = jax.lax.dot_general(
                oht, vt, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)           # [rc, 128]
            dtab_ref[0, k * rc:(k + 1) * rc, :] += upd


# -----------------------------------------------------------------------------
# host-side wrappers
# -----------------------------------------------------------------------------

def _pack(table):
    """[L, T, F] -> [L, R, 128]: entry t's features at row (t*F)//128,
    lanes (t*F)%128 ... +F-1 — a pure reshape."""
    l, t, f = table.shape
    return table.reshape(l, t * f // 128, 128)


def _prep(idx, weights, features, n_pad):
    """[L, 8, N] corner entry-indices -> row/lane/weight kernel inputs.

    The [L, 8, N] (points-minor) layout is part of the API contract: any
    layout with a small minor dim (e.g. [N, L, 8]) is tile-padded by XLA
    into a multi-GB buffer at training sizes.
    """
    rows = ((idx * features) >> 7).astype(jnp.int32)
    lanes = ((idx * features) & 127).astype(jnp.int32)
    w = weights.astype(jnp.float32)
    if n_pad != rows.shape[2]:
        pad = [(0, 0), (0, 0), (0, n_pad - rows.shape[2])]
        rows, lanes, w = (jnp.pad(x, pad) for x in (rows, lanes, w))
    return rows, lanes, w


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def hash_encode_mxu(table, idx, weights, interpret=False):
    """Multi-level hash-grid encode on the MXU.

    Args:
      table: [L, T, F=2] float32 level tables (T*F must be a multiple of 128).
      idx: [L, 8, N] int32 corner entry indices in [0, T), points minor.
      weights: [L, 8, N] trilinear corner weights.
      interpret: run kernels in interpret mode (CPU tests).

    Returns: [N, L, F] float32 encoded features.
    """
    out, _ = _fwd_impl(table, idx, weights, interpret)
    return out


def _in_specs():
    return [pl.BlockSpec((1, 8, _B), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM)] * 3


def _fwd_impl(table, idx, weights, interpret):
    l, t, f = table.shape
    if f != 2:
        raise ValueError("mxu hash encode supports features=2")
    if (t * f) % 128:
        raise ValueError("table entries * features must be divisible by 128")
    n = idx.shape[2]
    r = t * f // 128
    n_pad = ((n + _B - 1) // _B) * _B

    tabt = _pack(table).transpose(0, 2, 1)                    # [L, 128, R]
    rows, lanes, w = _prep(idx, weights, f, n_pad)

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, r_rows=r),
        grid=(l, n_pad // _B),
        in_specs=_in_specs() + [
            pl.BlockSpec((1, 128, r), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 2, _B), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((l, 2, n_pad), jnp.float32),
        interpret=interpret,
    )(rows, lanes, w, tabt)
    out = out[:, :, :n].transpose(2, 0, 1)                    # [N, L, 2]
    return out, (table.shape, rows, lanes, w, n)


def _fwd_rule(table, idx, weights, interpret):
    out, res = _fwd_impl(table, idx, weights, interpret)
    return out, res


def _bwd_rule(interpret, res, g):
    (l, t, f), rows, lanes, w, n = res
    r = t * f // 128
    n_pad = rows.shape[2]
    g_l = g.transpose(1, 2, 0).astype(jnp.float32)            # [L, 2, N]
    if n_pad != n:
        g_l = jnp.pad(g_l, [(0, 0), (0, 0), (0, n_pad - n)])

    dpacked = pl.pallas_call(
        functools.partial(_bwd_kernel, r_rows=r),
        grid=(l, n_pad // _B),
        in_specs=_in_specs() + [
            pl.BlockSpec((1, 2, _B), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, r, 128), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((l, r, 128), jnp.float32),
        interpret=interpret,
    )(rows, lanes, w, g_l)
    dtable = dpacked.reshape(l, t, f)
    return dtable, None, None


hash_encode_mxu.defvjp(_fwd_rule, _bwd_rule)


def hash_encode_xla(table, idx, weights):
    """Reference XLA path (serialized gather/scatter) — used on non-TPU
    backends and as the numerical oracle in tests.

    Args: idx/weights [L, 8, N] (same contract as :func:`hash_encode_mxu`).
    Returns [N, L, F].
    """
    l, t, f = table.shape
    n = idx.shape[2]
    flat = (idx.reshape(l, 8 * n)
            + (jnp.arange(l, dtype=jnp.int32) * t)[:, None]).reshape(-1)
    feats = table.reshape(l * t, f)[flat].reshape(l, 8, n, f)
    return jnp.sum(feats * weights[..., None].astype(feats.dtype),
                   axis=1).transpose(1, 0, 2)                  # [N, L, F]
