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


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def pad_lanes(x, multiple: int = 128):
    """Zero-pad the last dim up to a lane multiple (weights rows match)."""
    d = x.shape[-1]
    target = _round_up(d, multiple)
    if target == d:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, target - d)])


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
                   out_extra=1 if semantic else 0)


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
