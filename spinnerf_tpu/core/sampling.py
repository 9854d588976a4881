"""Point sampling along rays: stratified coarse samples and inverse-CDF
hierarchical importance sampling.

TPU-first design notes:
- Everything is fixed-shape; the per-ray sample counts are static ints so XLA
  can tile the downstream MLP evals onto the MXU.
- The inverse-CDF search is expressed as a vectorized branchless comparison
  (rank-by-broadcast) rather than a binary-search loop: for NeRF-sized bin
  counts (<=192) an O(S*B) compare-and-sum on the VPU beats a serial
  binary search and maps perfectly onto 8x128 vector lanes. This replaces the
  reference's native CUDA `torchsearchsorted` kernel
  (`DS_NeRF/torchsearchsorted/src/cuda/searchsorted_cuda_kernel.cu`).
  XLA fuses the whole PDF->samples chain into a handful of VPU loops; a
  dedicated Pallas kernel was evaluated and rejected — the fused train step
  is ~93% Pallas-MLP time already (BASELINE.md), so sampling is not on the
  critical path.

Behavior parity: `render_rays` stratified section (`DS_NeRF/run_nerf.py:646-668`)
and `sample_pdf` (`DS_NeRF/run_nerf_helpers.py:304-347`).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def stratified_z_vals(key, near, far, n_samples: int, *, lindisp: bool = False,
                      perturb: bool = True, dtype=jnp.float32):
    """Coarse sample depths along each ray.

    Args:
      key: PRNG key (ignored when perturb=False).
      near/far: [B] per-ray bounds.
      n_samples: static sample count.
      lindisp: sample linearly in inverse depth instead of depth.
      perturb: jitter each sample uniformly within its stratum.
    Returns:
      z_vals [B, n_samples].
    """
    t = jnp.linspace(0.0, 1.0, n_samples, dtype=dtype)
    near = near[..., None]
    far = far[..., None]
    if lindisp:
        z_vals = 1.0 / (1.0 / near * (1.0 - t) + 1.0 / far * t)
    else:
        z_vals = near * (1.0 - t) + far * t
    z_vals = jnp.broadcast_to(z_vals, near.shape[:-1] + (n_samples,))
    if perturb:
        mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        upper = jnp.concatenate([mids, z_vals[..., -1:]], axis=-1)
        lower = jnp.concatenate([z_vals[..., :1], mids], axis=-1)
        t_rand = jax.random.uniform(key, z_vals.shape, dtype=dtype)
        z_vals = lower + (upper - lower) * t_rand
    return z_vals


def searchsorted_right(sorted_seq, values):
    """Branchless batched `searchsorted(..., side='right')`.

    For each row, counts how many entries of `sorted_seq` are <= value. With
    bin counts <=192 the [B, S, N] broadcast-compare-reduce is a pure VPU op
    and avoids gather-heavy binary search. Equivalent to
    `torch.searchsorted(cdf, u, right=True)` as used by the reference's
    hierarchical sampler (`DS_NeRF/run_nerf_helpers.py:331`).

    Args:
      sorted_seq: [B, N] row-wise sorted.
      values: [B, S].
    Returns:
      int32 indices [B, S] in [0, N].
    """
    # [B, S, N] boolean; sum over N gives the insertion index.
    le = sorted_seq[:, None, :] <= values[:, :, None]
    return jnp.sum(le.astype(jnp.int32), axis=-1)


def sample_pdf(key, bins, weights, n_samples: int, *, det: bool = False,
               u: jnp.ndarray | None = None):
    """Inverse-CDF importance sampling over histogram weights.

    Args:
      key: PRNG key (ignored when det=True or u given).
      bins: [B, N] bin edges (z-midpoints from the coarse pass).
      weights: [B, N-1] unnormalized bin weights.
      n_samples: static number of samples to draw per ray.
      det: deterministic (evenly spaced u) instead of uniform random.
      u: optional [B, n_samples] explicit uniforms (for golden tests).
    Returns:
      samples [B, n_samples], differentiably interpolated bin positions.
      (Callers stop-gradient these, matching `run_nerf.py:700`.)
    """
    dtype = weights.dtype
    weights = weights + 1e-5  # avoid nans on empty rays
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [B, N]

    batch = cdf.shape[0]
    if u is None:
        if det:
            u = jnp.broadcast_to(jnp.linspace(0.0, 1.0, n_samples, dtype=dtype),
                                 (batch, n_samples))
        else:
            u = jax.random.uniform(key, (batch, n_samples), dtype=dtype)

    # Gather-free lookup (TPU): this backend serializes vector gathers, so
    # the four take_along_axis reads at the searchsorted indices cost ~20 ms
    # per step at the bench shapes. Because `cdf` is row-sorted, the boolean
    # compare matrix `le` is a prefix of ones per (ray, sample) — the values
    # at index `inds-1` / `inds` are masked max/min reductions over the SAME
    # [B, S, N] comparison the index count uses, all VPU work (<1 ms).
    le = cdf[:, None, :] <= u[:, :, None]                    # [B, S, N]
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)

    def at_below(vals):
        # vals row-sorted ascending; vals[inds-1] = max of the prefix
        # (cdf_0 = 0 <= u guarantees a non-empty prefix)
        return jnp.max(jnp.where(le, vals[:, None, :], -big), axis=-1)

    def at_above(vals):
        # vals[min(inds, N-1)]: min of the suffix, last entry when empty
        suffix = jnp.min(jnp.where(le, big, vals[:, None, :]), axis=-1)
        return jnp.where(suffix >= big, vals[:, -1:], suffix)

    cdf_below = at_below(cdf)
    cdf_above = at_above(cdf)
    bins_below = at_below(bins)
    bins_above = at_above(bins)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)


def hierarchical_z_vals(key, z_vals, weights, n_importance: int, *, det: bool = False):
    """Fine-pass depths: importance samples merged+sorted with the coarse ones.

    Parity: `run_nerf.py:697-702` — PDF over interior coarse weights on z
    midpoints, stop-gradient, then a full sort of the union.
    Returns:
      (z_combined [B, Nc+Nf], z_samples [B, Nf]).
    """
    z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    z_samples = sample_pdf(key, z_mid, weights[..., 1:-1], n_importance, det=det)
    z_samples = jax.lax.stop_gradient(z_samples)
    z_combined = jnp.sort(jnp.concatenate([z_vals, z_samples], axis=-1), axis=-1)
    return z_combined, z_samples


def ray_points(origins, directions, z_vals):
    """World-space sample positions: o + d * z. Returns [B, S, 3]."""
    return origins[..., None, :] + directions[..., None, :] * z_vals[..., :, None]
