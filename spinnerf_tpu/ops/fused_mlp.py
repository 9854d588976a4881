"""Fully-fused NeRF MLP as a Pallas TPU kernel.

Why: the XLA-compiled 8x256 field is HBM-bound — every layer round-trips a
[P, 256] activation through HBM (~400 MB per layer at P=786k), so the train
step runs far from the MXU roofline. This kernel keeps ALL weights and the
entire layer chain of a point-block resident in VMEM — one HBM read of the
encoded inputs, one write of the 4-channel output. It is the TPU analogue of
tiny-cuda-nn's FullyFusedMLP (the reference's default sigma/color nets,
`DS_NeRF/run_nerf_helpers_tcnn.py:48-58`) applied to the big NeRF MLP
(`run_nerf_helpers.py:74-127`).

Structure handled (NeRFField parity):
  trunk: h0 = relu(x W0 + b0); h_i = relu(h_{i-1} W_i + b_i), with the skip
         concat [x, h_skip] feeding layer skip+1;
  sigma = h_last Ws + bs
  feat  = h_last Wf + bf;  v = relu([feat, d] Wv + bv);  rgb = v Wr + br
  out   = [rgb, sigma]

Backward is a custom VJP: activations are recomputed in VMEM (rematerialized)
per block and weight gradients accumulate across the grid in revisited output
blocks — no residuals ever touch HBM.

All matmuls run on the MXU in bfloat16 with float32 accumulation
(`preferred_element_type`); parameters stay float32.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class MLPDims(NamedTuple):
    in_dim: int          # encoded position width (padded)
    dir_dim: int         # encoded direction width (padded)
    width: int = 256
    depth: int = 8
    skip: int = 4        # skip concat after this trunk layer
    view_width: int = 128
    out_extra: int = 0   # extra heads (semantic logit) off the trunk
    compute_dtype: str = "bfloat16"   # matmul input dtype (f32 accumulate)
    multires: int = 10          # frequency octaves (v2 in-kernel encoding)
    multires_views: int = 4


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _forward_block(x, d, ws, dims: MLPDims, dtype=None):
    dtype = dtype or jnp.dtype(dims.compute_dtype)
    """Compute the full MLP for one block. Returns (raw, activations list).

    ws: dict of weights (f32): trunk_w[i], trunk_b[i], sigma_w/b, feat_w/b,
    view_w/b, rgb_w/b (+ sem_w/b when out_extra).
    """
    acts = []
    h = x.astype(dtype)
    for i in range(dims.depth):
        w = ws[f"tw{i}"].astype(dtype)
        h_in = h
        h = jnp.dot(h_in, w, preferred_element_type=jnp.float32) + ws[f"tb{i}"]
        h = jnp.maximum(h, 0.0)
        acts.append(h)                       # post-relu f32
        h = h.astype(dtype)
        if i == dims.skip:
            h = jnp.concatenate([x.astype(dtype), h], axis=-1)

    sigma = jnp.dot(h, ws["sigma_w"].astype(dtype),
                    preferred_element_type=jnp.float32) + ws["sigma_b"]
    heads = []
    if dims.out_extra:
        heads.append(jnp.dot(h, ws["sem_w"].astype(dtype),
                             preferred_element_type=jnp.float32) + ws["sem_b"])

    feat = jnp.dot(h, ws["feat_w"].astype(dtype),
                   preferred_element_type=jnp.float32) + ws["feat_b"]
    acts.append(feat)
    hv = jnp.concatenate([feat.astype(dtype), d.astype(dtype)], axis=-1)
    v = jnp.dot(hv, ws["view_w"].astype(dtype),
                preferred_element_type=jnp.float32) + ws["view_b"]
    v = jnp.maximum(v, 0.0)
    acts.append(v)
    rgb = jnp.dot(v.astype(dtype), ws["rgb_w"].astype(dtype),
                  preferred_element_type=jnp.float32) + ws["rgb_b"]
    out = jnp.concatenate([rgb, sigma] + heads, axis=-1)
    return out, acts


def _weight_order(dims: MLPDims):
    names = []
    for i in range(dims.depth):
        names += [f"tw{i}", f"tb{i}"]
    names += ["sigma_w", "sigma_b"]
    if dims.out_extra:
        names += ["sem_w", "sem_b"]
    names += ["feat_w", "feat_b", "view_w", "view_b", "rgb_w", "rgb_b"]
    return names


def _fwd_kernel(dims: MLPDims, n_weights: int, *refs):
    x_ref, d_ref = refs[0], refs[1]
    w_refs = refs[2:2 + n_weights]
    out_ref = refs[2 + n_weights]
    ws = {name: w_refs[i][:] for i, name in enumerate(_weight_order(dims))}
    out, _ = _forward_block(x_ref[:], d_ref[:], ws, dims)
    out_ref[:] = out


def _bwd_kernel(dims: MLPDims, n_weights: int, *refs):
    """Recompute fwd, then backprop; dW outputs accumulate across the grid."""
    x_ref, d_ref = refs[0], refs[1]
    w_refs = refs[2:2 + n_weights]
    g_ref = refs[2 + n_weights]
    dx_ref = refs[3 + n_weights]
    dd_ref = refs[4 + n_weights]
    dw_refs = refs[5 + n_weights:]

    names = _weight_order(dims)
    ws = {name: w_refs[i][:] for i, name in enumerate(names)}

    first = pl.program_id(0) == 0

    x = x_ref[:]
    d = d_ref[:]
    g = g_ref[:]
    dtype = jnp.dtype(dims.compute_dtype)

    # --- recompute forward, keeping post-relu activations ---
    acts_in = []      # input to each trunk matmul
    h = x
    trunk_out = []
    for i in range(dims.depth):
        acts_in.append(h)
        z = jnp.dot(h.astype(dtype), ws[f"tw{i}"].astype(dtype),
                    preferred_element_type=jnp.float32) + ws[f"tb{i}"]
        h = jnp.maximum(z, 0.0)
        trunk_out.append(h)
        if i == dims.skip:
            h = jnp.concatenate([x, h], axis=-1)
    h_last = h    # input to sigma/feat heads ([T, W(+in) if skip==depth-1])

    feat = jnp.dot(h_last.astype(dtype), ws["feat_w"].astype(dtype),
                   preferred_element_type=jnp.float32) + ws["feat_b"]
    hv = jnp.concatenate([feat, d], axis=-1)
    vz = jnp.dot(hv.astype(dtype), ws["view_w"].astype(dtype),
                 preferred_element_type=jnp.float32) + ws["view_b"]
    v = jnp.maximum(vz, 0.0)

    # --- backward ---
    g_rgb = g[:, :3]
    g_sigma = g[:, 3:4]
    g_sem = g[:, 4:4 + dims.out_extra] if dims.out_extra else None

    def mm(a, b):
        return jnp.dot(a.astype(dtype), b.astype(dtype),
                       preferred_element_type=jnp.float32)

    def acc(ref, val):
        @pl.when(first)
        def _():
            ref[...] = jnp.zeros_like(ref)
        ref[...] += val.reshape(ref.shape)

    # rgb head
    acc(dw_refs[names.index("rgb_w")], mm(v.T, g_rgb))
    acc(dw_refs[names.index("rgb_b")], jnp.sum(g_rgb, axis=0, keepdims=True))
    g_v = mm(g_rgb, ws["rgb_w"].T) * (vz > 0)

    # view layer
    acc(dw_refs[names.index("view_w")], mm(hv.T, g_v))
    acc(dw_refs[names.index("view_b")], jnp.sum(g_v, axis=0, keepdims=True))
    g_hv = mm(g_v, ws["view_w"].T)
    g_feat = g_hv[:, : feat.shape[-1]]
    dd_ref[:] = g_hv[:, feat.shape[-1]:]

    # feature layer
    acc(dw_refs[names.index("feat_w")], mm(h_last.T, g_feat))
    acc(dw_refs[names.index("feat_b")], jnp.sum(g_feat, axis=0, keepdims=True))
    g_hlast = mm(g_feat, ws["feat_w"].T)

    # sigma head
    acc(dw_refs[names.index("sigma_w")], mm(h_last.T, g_sigma))
    acc(dw_refs[names.index("sigma_b")], jnp.sum(g_sigma, axis=0, keepdims=True))
    g_hlast += mm(g_sigma, ws["sigma_w"].T)

    if dims.out_extra:
        acc(dw_refs[names.index("sem_w")], mm(h_last.T, g_sem))
        acc(dw_refs[names.index("sem_b")], jnp.sum(g_sem, axis=0, keepdims=True))
        g_hlast += mm(g_sem, ws["sem_w"].T)

    # trunk backward
    g_x = jnp.zeros_like(x)
    g_h = g_hlast
    for i in range(dims.depth - 1, -1, -1):
        if i == dims.skip:
            # h was cat([x, trunk_out[i]]) after this layer
            g_x += g_h[:, : dims.in_dim]
            g_h = g_h[:, dims.in_dim:]
        z_pos = trunk_out[i] > 0
        g_z = g_h * z_pos
        acc(dw_refs[names.index(f"tw{i}")], mm(acts_in[i].T, g_z))
        acc(dw_refs[names.index(f"tb{i}")], jnp.sum(g_z, axis=0, keepdims=True))
        g_h = mm(g_z, ws[f"tw{i}"].T)
    g_x += g_h
    dx_ref[:] = g_x


def _make_specs(dims: MLPDims, n_weights: int, block: int):
    in_specs = [
        pl.BlockSpec((block, dims.in_dim), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block, dims.dir_dim), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    for _ in range(n_weights):
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    return in_specs


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def fused_mlp(dims: MLPDims, block: int, weights: dict, x_enc, d_enc):
    """Fused NeRF-MLP forward.

    Args:
      dims: static MLPDims (in/dir dims already lane-padded).
      block: points per kernel block (multiple of 8; 512 is a good default).
      weights: dict of f32 arrays (see `_weight_order` / `params_to_fused`).
      x_enc: [P, in_dim] encoded positions (P a multiple of `block`).
      d_enc: [P, dir_dim] encoded directions.
    Returns: raw [P, 4 + out_extra] float32.
    """
    return _fused_fwd_impl(dims, block, weights, x_enc, d_enc)


def _fused_fwd_impl(dims, block, weights, x_enc, d_enc):
    p = x_enc.shape[0]
    names = _weight_order(dims)
    n_w = len(names)
    out_dim = 4 + dims.out_extra
    grid = (p // block,)
    kernel = functools.partial(_fwd_kernel, dims, n_w)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=_make_specs(dims, n_w, block),
        out_specs=pl.BlockSpec((block, out_dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, out_dim), jnp.float32),
        interpret=jax.default_backend() == "cpu",
    )(x_enc, d_enc, *[weights[n] for n in names])


def _fused_fwd(dims, block, weights, x_enc, d_enc):
    out = _fused_fwd_impl(dims, block, weights, x_enc, d_enc)
    return out, (weights, x_enc, d_enc)


def _fused_bwd(dims, block, res, g):
    weights, x_enc, d_enc = res
    p = x_enc.shape[0]
    names = _weight_order(dims)
    n_w = len(names)
    out_dim = 4 + dims.out_extra
    grid = (p // block,)

    in_specs = _make_specs(dims, n_w, block)
    in_specs.append(pl.BlockSpec((block, out_dim), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM))

    out_specs = [
        pl.BlockSpec((block, dims.in_dim), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block, dims.dir_dim), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((p, dims.in_dim), jnp.float32),
        jax.ShapeDtypeStruct((p, dims.dir_dim), jnp.float32),
    ]
    for n in names:
        w = weights[n]
        out_specs.append(pl.BlockSpec(
            w.shape, lambda i, nd=w.ndim: (0,) * nd,
            memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))

    kernel = functools.partial(_bwd_kernel, dims, n_w)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=jax.default_backend() == "cpu",
    )(x_enc, d_enc, *[weights[n] for n in names], g)

    dx, dd = outs[0], outs[1]
    dws = {n: outs[2 + i] for i, n in enumerate(names)}
    return dws, dx, dd


fused_mlp.defvjp(_fused_fwd, _fused_bwd)


# --- NeRFField bridge --------------------------------------------------------

def dims_for_field(multires: int = 10, multires_views: int = 4,
                   width: int = 256, depth: int = 8, skip: int = 4,
                   semantic: bool = False) -> MLPDims:
    in_dim = _round_up(3 * (1 + 2 * multires), 128)
    dir_dim = _round_up(3 * (1 + 2 * multires_views), 128)
    return MLPDims(in_dim=in_dim, dir_dim=dir_dim, width=width, depth=depth,
                   skip=skip, view_width=width // 2,
                   out_extra=1 if semantic else 0,
                   multires=multires, multires_views=multires_views)


def params_to_fused(flax_params, dims: MLPDims, *, raw_in_dim: int,
                    raw_dir_dim: int) -> dict:
    """Convert `models.fields.NeRFField` flax params into the kernel's padded
    weight dict. Zero rows are appended where encoded inputs were lane-padded,
    so padded input columns contribute nothing."""
    p = flax_params["params"]

    def dense(name):
        return np.asarray(p[name]["kernel"]), np.asarray(p[name]["bias"])

    out = {}
    for i in range(dims.depth):
        k, b = dense(f"trunk_{i}")
        if i == 0:
            k = np.pad(k, ((0, dims.in_dim - raw_in_dim), (0, 0)))
        if i == dims.skip + 1:
            # input was cat([pe(raw_in), h]); pad the pe rows out to in_dim
            k = np.concatenate(
                [np.pad(k[:raw_in_dim], ((0, dims.in_dim - raw_in_dim), (0, 0))),
                 k[raw_in_dim:]], axis=0)
        out[f"tw{i}"] = jnp.asarray(k, jnp.float32)
        out[f"tb{i}"] = jnp.asarray(b, jnp.float32)[None]

    k, b = dense("sigma_head")
    out["sigma_w"], out["sigma_b"] = jnp.asarray(k), jnp.asarray(b)[None]
    if dims.out_extra:
        k, b = dense("semantic_head")
        out["sem_w"], out["sem_b"] = jnp.asarray(k), jnp.asarray(b)[None]
    k, b = dense("feature")
    out["feat_w"], out["feat_b"] = jnp.asarray(k), jnp.asarray(b)[None]
    k, b = dense("view_0")
    # input was cat([feat(width), viewdir_pe(raw_dir)]); pad the pe rows
    k = np.concatenate(
        [k[:dims.width],
         np.pad(k[dims.width:], ((0, dims.dir_dim - raw_dir_dim), (0, 0)))],
        axis=0)
    out["view_w"], out["view_b"] = jnp.asarray(k, jnp.float32), jnp.asarray(b)[None]
    k, b = dense("rgb_head")
    out["rgb_w"], out["rgb_b"] = jnp.asarray(k), jnp.asarray(b)[None]
    return out


# --- v2: PE-in-kernel fused MLP ----------------------------------------------
# The v1 kernel above reads XLA-materialized [P, 128] f32 encodings and emits
# [P, 128] input gradients — ~1.6 GB of HBM traffic per train step — and its
# backward holds f32 activations + dx/dd blocks, which overflows the 16 MB
# VMEM budget at any useful block size (measured: scoped-vmem OOM at 21.3 MB).
# v2 fixes both:
#   * inputs are raw [P, 8] (xyz, dir, pad) — the sinusoidal encoding is
#     computed inside the kernel as ONE tiny [block, 8] @ [8, 128] selection
#     matmul followed by sin(xb + phase) (cos x == sin(x + pi/2)); lanes
#     carrying the raw input pass through, pad lanes stay zero;
#   * backward emits ONLY weight gradients (fine z_vals are stop-gradiented
#     and poses are never optimized, so input grads are dead code);
#   * recomputed activations are kept in bf16 and all transposed matmuls are
#     dot_general contractions over the row axis (no VMEM relayouts).


def _pe_constants(n_freqs: int, col0: int, raw_dim: int, out_dim: int):
    """Selection matrix S [8, out_dim], phase row, passthrough mask row such
    that encode(x) = where(mask, xb, sin(xb + phase)) with xb = xd @ S
    reproduces `models.embedding.positional_encoding` for the `raw_dim`-wide
    input stored at xd[:, col0:col0+3]."""
    s = np.zeros((8, out_dim), np.float32)
    phase = np.zeros((1, out_dim), np.float32)
    mask = np.zeros((1, out_dim), np.float32)
    for j in range(3):
        s[col0 + j, j] = 1.0
        mask[0, j] = 1.0
    for k in range(raw_dim - 3):
        j = 3 + k
        f, r = k // 6, k % 6
        s[col0 + (r % 3), j] = 2.0 ** f
        if r >= 3:
            phase[0, j] = np.pi / 2.0
    return s, phase, mask


def _encode_block(xd, s, phase, mask, dtype):
    xb = jnp.dot(xd, s, preferred_element_type=jnp.float32)
    enc = jnp.where(mask > 0, xb, jnp.sin(xb + phase))
    return enc.astype(dtype)


_N_PE = 6   # PE constant inputs: (S, phase, mask) for positions + directions


def _fwd_pe_kernel(dims: MLPDims, n_weights: int, *refs):
    xd_ref = refs[0]
    pe_refs = [r[:] for r in refs[1:1 + _N_PE]]
    w_refs = refs[1 + _N_PE:1 + _N_PE + n_weights]
    out_ref = refs[1 + _N_PE + n_weights]
    dtype = jnp.dtype(dims.compute_dtype)
    ws = {name: w_refs[i][:] for i, name in enumerate(_weight_order(dims))}
    x = _encode_block(xd_ref[:], *pe_refs[:3], dtype)
    d = _encode_block(xd_ref[:], *pe_refs[3:], dtype)
    out, _ = _forward_block(x, d, ws, dims)
    out_ref[:] = out


def _bwd_pe_kernel(dims: MLPDims, n_weights: int, *refs):
    """Recompute forward (bf16 activations), backprop weight grads only."""
    xd_ref = refs[0]
    pe_refs = [r[:] for r in refs[1:1 + _N_PE]]
    w_refs = refs[1 + _N_PE:1 + _N_PE + n_weights]
    g_ref = refs[1 + _N_PE + n_weights]
    dw_refs = refs[2 + _N_PE + n_weights:]

    names = _weight_order(dims)
    ws = {name: w_refs[i][:] for i, name in enumerate(names)}
    dtype = jnp.dtype(dims.compute_dtype)
    first = pl.program_id(0) == 0

    x = _encode_block(xd_ref[:], *pe_refs[:3], dtype)   # [T, in_dim] bf16
    d = _encode_block(xd_ref[:], *pe_refs[3:], dtype)
    g = g_ref[:]

    # --- recompute forward, bf16 activations ---
    acts_in = []           # bf16 input of each trunk matmul
    h = x
    relu_pos = []
    for i in range(dims.depth):
        acts_in.append(h)
        z = jnp.dot(h, ws[f"tw{i}"].astype(dtype),
                    preferred_element_type=jnp.float32) + ws[f"tb{i}"]
        relu_pos.append(z > 0)
        h = jnp.maximum(z, 0.0).astype(dtype)
        if i == dims.skip:
            h = jnp.concatenate([x, h], axis=-1)
    h_last = h

    feat = (jnp.dot(h_last, ws["feat_w"].astype(dtype),
                    preferred_element_type=jnp.float32)
            + ws["feat_b"]).astype(dtype)
    hv = jnp.concatenate([feat, d], axis=-1)
    vz = jnp.dot(hv, ws["view_w"].astype(dtype),
                 preferred_element_type=jnp.float32) + ws["view_b"]
    v = jnp.maximum(vz, 0.0).astype(dtype)

    # --- backward (weight grads only) ---
    g_rgb = g[:, :3]
    g_sigma = g[:, 3:4]
    g_sem = g[:, 4:4 + dims.out_extra] if dims.out_extra else None

    def mm_tn(a, b):
        """a[T, K], b[T, N] -> aᵀb [K, N] without a transpose relayout."""
        return jax.lax.dot_general(
            a, b.astype(dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def mm_nt(gout, w):
        """gout[T, N], w[K, N] -> gout wᵀ [T, K]."""
        return jax.lax.dot_general(
            gout.astype(dtype), w.astype(dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    def acc(name, val):
        ref = dw_refs[names.index(name)]

        @pl.when(first)
        def _():
            ref[...] = jnp.zeros_like(ref)
        ref[...] += val.reshape(ref.shape)

    acc("rgb_w", mm_tn(v, g_rgb))
    acc("rgb_b", jnp.sum(g_rgb, axis=0, keepdims=True))
    g_v = (mm_nt(g_rgb, ws["rgb_w"]) * (vz > 0)).astype(dtype)

    acc("view_w", mm_tn(hv, g_v))
    acc("view_b", jnp.sum(g_v, axis=0, keepdims=True))
    g_feat = mm_nt(g_v, ws["view_w"])[:, : feat.shape[-1]].astype(dtype)

    acc("feat_w", mm_tn(h_last, g_feat))
    acc("feat_b", jnp.sum(g_feat, axis=0, keepdims=True))
    g_hlast = mm_nt(g_feat, ws["feat_w"])

    acc("sigma_w", mm_tn(h_last, g_sigma))
    acc("sigma_b", jnp.sum(g_sigma, axis=0, keepdims=True))
    g_hlast += mm_nt(g_sigma, ws["sigma_w"])

    if dims.out_extra:
        acc("sem_w", mm_tn(h_last, g_sem))
        acc("sem_b", jnp.sum(g_sem, axis=0, keepdims=True))
        g_hlast += mm_nt(g_sem, ws["sem_w"])

    g_h = g_hlast
    for i in range(dims.depth - 1, -1, -1):
        if i == dims.skip:
            g_h = g_h[:, dims.in_dim:]      # input-slice grad is dead
        g_z = (g_h * relu_pos[i]).astype(dtype)
        acc(f"tw{i}", mm_tn(acts_in[i], g_z))
        acc(f"tb{i}", jnp.sum(g_z, axis=0, keepdims=True))
        if i > 0:
            g_h = mm_nt(g_z, ws[f"tw{i}"])


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def fused_mlp_pe(dims: MLPDims, block: int, weights: dict, xd):
    """Fused encode+MLP forward.

    Args:
      xd: [P, 8] float32 — columns (x, y, z, dx, dy, dz, 0, 0); P a multiple
        of `block`.
    Returns: raw [P, 4 + out_extra] float32.

    Differentiable in `weights` only (xd carries no gradient by design —
    see module note).
    """
    return _fused_pe_impl(dims, block, weights, xd)


def _pe_consts_for(dims: MLPDims):
    raw_in = 3 * (1 + 2 * dims.multires)
    raw_dir = 3 * (1 + 2 * dims.multires_views)
    pe_x = _pe_constants(dims.multires, 0, raw_in, dims.in_dim)
    pe_d = _pe_constants(dims.multires_views, 3, raw_dir, dims.dir_dim)
    return pe_x, pe_d


def _pe_args(dims):
    pe_x, pe_d = _pe_consts_for(dims)
    return [jnp.asarray(a) for a in (*pe_x, *pe_d)]


def _cast_matmul_weights(weights, dims: MLPDims):
    """Pre-cast matmul weights to the compute dtype OUTSIDE the kernel.

    The kernel body runs per grid step, so an in-kernel f32->bf16 cast of the
    ~660k weight elements repeats ~1.5k times per call (~10% of kernel time at
    the bench shapes). Biases stay f32 — they add into the f32 accumulators.
    """
    dtype = jnp.dtype(dims.compute_dtype)
    if dtype == jnp.float32:
        return weights
    return {n: (w.astype(dtype) if n.endswith("_w") or n.startswith("tw")
                else w)
            for n, w in weights.items()}


def _fused_pe_impl(dims, block, weights, xd):
    p = xd.shape[0]
    names = _weight_order(dims)
    n_w = len(names)
    out_dim = 4 + dims.out_extra
    kernel = functools.partial(_fwd_pe_kernel, dims, n_w)
    cast = _cast_matmul_weights(weights, dims)
    in_specs = [pl.BlockSpec((block, 8), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    for _ in range(_N_PE + n_w):
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    return pl.pallas_call(
        kernel,
        grid=(p // block,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block, out_dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, out_dim), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=int(2 * p * 1.2e6 / 1e3), bytes_accessed=p * 48,
            transcendentals=p * 90),
        interpret=jax.default_backend() == "cpu",
    )(xd, *_pe_args(dims), *[cast[n] for n in names])


def _fused_pe_fwd(dims, block, weights, xd):
    return _fused_pe_impl(dims, block, weights, xd), (weights, xd)


def _fused_pe_bwd(dims, block, res, g):
    weights, xd = res
    p = xd.shape[0]
    names = _weight_order(dims)
    n_w = len(names)
    out_dim = 4 + dims.out_extra

    in_specs = [pl.BlockSpec((block, 8), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    for _ in range(_N_PE + n_w):
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec((block, out_dim), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM))

    out_specs, out_shapes = [], []
    for n in names:
        w = weights[n]
        out_specs.append(pl.BlockSpec(
            w.shape, lambda i, nd=w.ndim: (0,) * nd,
            memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))

    kernel = functools.partial(_bwd_pe_kernel, dims, n_w)
    cast = _cast_matmul_weights(weights, dims)
    outs = pl.pallas_call(
        kernel,
        grid=(p // block,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=int(4 * p * 1.2e6 / 1e3), bytes_accessed=p * 64,
            transcendentals=p * 90),
        interpret=jax.default_backend() == "cpu",
    )(xd, *_pe_args(dims), *[cast[n] for n in names], g)

    dws = {n: outs[i] for i, n in enumerate(names)}
    return (dws, jnp.zeros_like(xd))


fused_mlp_pe.defvjp(_fused_pe_fwd, _fused_pe_bwd)


def make_fused_pe_field_fn(dims: MLPDims, *, block: int = 512):
    """Build `(fused_weights, pts [B,S,3], viewdirs [B,3]) -> raw [B,S,C]`
    over the v2 PE-in-kernel path. Point count is padded to `block`."""

    def field_fn(weights, pts, viewdirs):
        b, s = pts.shape[0], pts.shape[1]
        p = b * s
        vd = jnp.broadcast_to(viewdirs[:, None, :], (b, s, 3))
        xd = jnp.concatenate([pts.reshape(-1, 3), vd.reshape(-1, 3),
                              jnp.zeros((p, 2), pts.dtype)], axis=-1)
        p_pad = _round_up(p, block)
        xd = jnp.pad(xd, ((0, p_pad - p), (0, 0)))
        raw = fused_mlp_pe(dims, block, weights, xd)
        return raw[:p].reshape(b, s, -1)

    return field_fn


class FusedMLPField:
    """Drop-in NeRFField replacement running the v2 fused kernel.

    Mirrors the `models.fields.NeRFField` init/apply surface so
    `train.step.make_train_step`, the Trainer render paths, and orbax
    checkpoints work unchanged; parameters are the fused weight dict
    (initialized from an identically-seeded flax NeRFField, so switching
    implementations preserves the init distribution).

    Measured on v5e at the bench workload (786k pts): fwd+bwd 29.1 ms vs
    45.8 ms for the XLA path — HBM activation traffic and the materialized
    positional encodings are gone.
    """

    is_fused = True

    def __init__(self, *, depth: int = 8, width: int = 256,
                 multires: int = 10, multires_views: int = 4,
                 semantic: bool = False, block: int = 512,
                 compute_dtype=jnp.bfloat16):
        from spinnerf_tpu.models.fields import NeRFField
        if depth == 5:
            # skip (4) would concat after the LAST trunk layer, feeding the
            # heads a [in_dim+width] vector — a geometry neither the weight
            # converter nor the backward kernel supports; use NeRFField
            raise ValueError(
                "FusedMLPField does not support depth == skip+1 == 5 "
                "(skip-concat would feed the heads); use NeRFField")
        self.semantic = semantic
        self.dims = dims_for_field(
            multires=multires, multires_views=multires_views, width=width,
            depth=depth, semantic=semantic)._replace(
                compute_dtype=jnp.dtype(compute_dtype).name)
        self.block = block
        self._flax = NeRFField(depth=depth, width=width, multires=multires,
                               multires_views=multires_views,
                               semantic=semantic)
        self._raw_in = 3 * (1 + 2 * multires)
        self._raw_dir = 3 * (1 + 2 * multires_views)
        self._field = make_fused_pe_field_fn(self.dims, block=block)

    def init(self, key, pts, viewdirs=None):
        flax_params = self._flax.init(key, pts, viewdirs)
        return params_to_fused(flax_params, self.dims,
                               raw_in_dim=self._raw_in,
                               raw_dir_dim=self._raw_dir)

    def apply(self, weights, pts, viewdirs=None, frozen_sigma=None):
        if frozen_sigma is not None:
            raise ValueError(
                "FusedMLPField does not support the frozen-sigma "
                "(NeRF_RGB / --alpha_model_path) mode; use NeRFField")
        if viewdirs is None:
            raise ValueError("FusedMLPField requires viewdirs")
        return self._field(weights, pts, viewdirs)


def make_fused_field_fn(dims: MLPDims, *, multires: int = 10,
                        multires_views: int = 4, block: int = 512):
    """Build `(fused_weights, pts [B,S,3], viewdirs [B,3]) -> raw [B,S,C]`.

    Positional encodings are computed in XLA (fused into the surrounding
    graph); the MLP chain runs in the Pallas kernel. The point count is padded
    to a multiple of `block`.
    """
    from spinnerf_tpu.models.embedding import positional_encoding

    def field_fn(weights, pts, viewdirs):
        b, s = pts.shape[0], pts.shape[1]
        x = positional_encoding(pts.reshape(-1, 3), multires)
        vd = jnp.broadcast_to(viewdirs[:, None, :], (b, s, 3)).reshape(-1, 3)
        d = positional_encoding(vd, multires_views)
        x = jnp.pad(x, ((0, 0), (0, dims.in_dim - x.shape[-1])))
        d = jnp.pad(d, ((0, 0), (0, dims.dir_dim - d.shape[-1])))
        p = x.shape[0]
        p_pad = _round_up(p, block)
        x = jnp.pad(x, ((0, p_pad - p), (0, 0)))
        d = jnp.pad(d, ((0, p_pad - p), (0, 0)))
        raw = fused_mlp(dims, block, weights, x, d)
        return raw[:p].reshape(b, s, -1)

    return field_fn
