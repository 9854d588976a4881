"""Loss terms for the SPIn-NeRF training objectives.

All losses take optional per-element masks so fixed-shape (padded) ray banks
work under jit — the reference filters rays by mask with dynamic shapes
(`DS_NeRF/run_nerf.py:1311-1322`); on TPU we pad and weight instead.

Parity anchors:
- image MSE / PSNR: `run_nerf_helpers.py:15-17`
- depth loss variants: `run_nerf.py:1492-1507`
- sigma loss (URF-style): `DS_NeRF/loss.py:8-44`
- segmentation BCE: `MVSeg/DS_NeRF/run_nerf.py:1315-1318`
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_mean(x, mask=None):
    """Mean of x over elements where mask != 0 (all elements when mask=None)."""
    if mask is None:
        return jnp.mean(x)
    mask = mask.astype(x.dtype)
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(x * mask) / denom


def mse(pred, target, mask=None):
    """Mean squared error; `mask` broadcasts over trailing dims."""
    err = (pred - target) ** 2
    if mask is not None and mask.ndim < err.ndim:
        mask = mask[..., None] * jnp.ones_like(err)
    return masked_mean(err, mask)


def l1(pred, target, mask=None):
    err = jnp.abs(pred - target)
    if mask is not None and mask.ndim < err.ndim:
        mask = mask[..., None] * jnp.ones_like(err)
    return masked_mean(err, mask)


def mse_to_psnr(x):
    return -10.0 * jnp.log(x) / jnp.log(10.0)


def psnr(pred, target, mask=None):
    return mse_to_psnr(mse(pred, target, mask))


def depth_loss(pred_depth, target_depth, *, ray_weights=None, mask=None,
               weighted: bool = False, relative: bool = False,
               normalize: bool = False, max_depth=None):
    """COLMAP sparse-depth supervision (`run_nerf.py:1492-1507`).

    weighted: reprojection-error weights multiply the squared error
      (takes precedence over `relative`, matching the reference's elif chain
      `run_nerf.py:1492-1507`).
    relative: error divided by target depth.
    normalize: error divided by max_depth before squaring (with weighted).
    """
    if weighted:
        if ray_weights is None:
            raise ValueError("weighted=True requires ray_weights")
        err = pred_depth - target_depth
        if normalize:
            if max_depth is None:
                raise ValueError("normalize=True requires max_depth")
            err = err / max_depth
        per_ray = err ** 2 * ray_weights
    elif relative:
        per_ray = ((pred_depth - target_depth) / target_depth) ** 2
    else:
        per_ray = (pred_depth - target_depth) ** 2
    return masked_mean(per_ray, mask)


def sigma_loss(raw_sigma):
    """URF-style distribution loss on sigma sampled from near to the GT depth.

    loss_ray = -exp(sigma_S) / (sum_s exp(sigma_s) + 1), where sigma_s are the
    relu'd densities of samples along the ray whose *last* sample sits at the
    ground-truth depth. Encourages mass to concentrate at the observed surface.
    Parity: `DS_NeRF/loss.py:43`.

    Args:
      raw_sigma: [B, S] relu-activated densities (last sample at GT depth).
    Returns: [B] per-ray loss.
    """
    # log-sum-exp shift: plain exp overflows f32 at sigma > ~88 (routine for
    # trained NeRF densities), turning the ratio into inf/inf = NaN. The +1
    # in the denominator is exp(0), so fold 0 into the max.
    m = jnp.maximum(jnp.max(raw_sigma, axis=1), 0.0)
    num = jnp.exp(raw_sigma[:, -1] - m)
    den = jnp.sum(jnp.exp(raw_sigma - m[:, None]), axis=1) + jnp.exp(-m)
    return -num / den


def bce_with_logits(logits, labels, mask=None):
    """Numerically stable binary cross-entropy on logits (MVSeg BCE loss)."""
    per = jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return masked_mean(per, mask)


def distortion_loss(weights, z_vals):
    """Mip-NeRF 360 distortion regularizer (TPU extra; not in the reference).

    Penalizes spread-out weight distributions along rays — cheap on TPU (one
    O(S^2) matmul per ray batch) and a strong floater suppressor for the
    object-removal stage.
    """
    # treat samples as bin centers with edges [z_0, midpoints, z_{S-1}] so
    # ALL S weights are penalized (truncating to S-1 would exempt the last
    # sample — exactly where far-plane floaters live)
    mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    edges = jnp.concatenate([z_vals[..., :1], mids, z_vals[..., -1:]],
                            axis=-1)                       # [..., S+1]
    centers = 0.5 * (edges[..., 1:] + edges[..., :-1])     # [..., S]
    w = weights
    # pairwise term: sum_ij w_i w_j |c_i - c_j|
    dist = jnp.abs(centers[..., :, None] - centers[..., None, :])
    loss_inter = jnp.sum(w[..., :, None] * w[..., None, :] * dist, axis=(-1, -2))
    # intra-bin term
    deltas = edges[..., 1:] - edges[..., :-1]
    loss_intra = jnp.sum(w ** 2 * deltas, axis=-1) / 3.0
    return jnp.mean(loss_inter + loss_intra)
