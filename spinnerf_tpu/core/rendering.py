"""Volume rendering: alpha compositing and the coarse->fine render pipeline.

This is the TPU-native equivalent of the reference's `raw2outputs`
(`DS_NeRF/run_nerf_helpers.py:350-401`) and `render_rays`
(`DS_NeRF/run_nerf.py:593-737`), redesigned as pure fixed-shape functions:

- One `composite()` returns *both* the grad-through-weights RGB and the
  stop-gradient-weights RGB. The reference renders the same rays twice with
  different `detach_weights` flags (`run_nerf.py:1455-1467`); here the second
  variant is a free extra weighted sum over already-computed quantities, so a
  single network evaluation serves every loss term.
- The optional semantic logit channel composites to a `prob_map` with
  stop-gradient weights (MVSeg semantics,
  `MVSeg/DS_NeRF/run_nerf_helpers.py:350-413`).
- Density noise and sampling jitter consume explicit PRNG keys.
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from spinnerf_tpu.core import sampling

# A field function maps (points [B,S,3], viewdirs [B,3]) -> raw outputs
# [B, S, C] with C >= 4: rgb logits (3), sigma (1), then optional extra heads
# (semantic logit at index 4).
FieldFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


class RenderOutputs(NamedTuple):
    """Per-ray composited maps. All [B, ...] with static shapes."""
    rgb: jnp.ndarray            # [B, 3]   grad flows through weights
    rgb_sg: jnp.ndarray         # [B, 3]   weights stop-gradiented (color-only grads)
    disp: jnp.ndarray           # [B]
    acc: jnp.ndarray            # [B]
    depth: jnp.ndarray          # [B]
    weights: jnp.ndarray        # [B, S]
    alpha: jnp.ndarray          # [B, S]
    z_vals: jnp.ndarray         # [B, S]
    prob: jnp.ndarray | None    # [B]      composited semantic logit (or None)
    logits: jnp.ndarray | None  # [B, S]   raw per-sample semantic logits


def exclusive_cumprod_one(x):
    """cumprod with a leading 1: T_i = prod_{j<i} x_j. Shape-preserving."""
    ones = jnp.ones_like(x[..., :1])
    return jnp.cumprod(jnp.concatenate([ones, x], axis=-1), axis=-1)[..., :-1]


def composite(raw, z_vals, rays_d, *, raw_noise_std: float = 0.0,
              noise_key=None, white_bkgd: bool = False,
              semantic: bool = False, only_object: bool = False,
              oo_threshold: float | None = None,
              harsh_bg_remove: bool = False,
              sigma_activation=jax.nn.relu) -> RenderOutputs:
    """Alpha-composite raw field outputs along each ray.

    alpha_i = 1 - exp(-relu(sigma_i + noise) * dist_i * |d|)
    w_i     = alpha_i * prod_{j<i}(1 - alpha_j + 1e-10)
    rgb     = sum_i w_i * sigmoid(raw_rgb_i)      (+ (1-acc) if white_bkgd)
    depth   = sum_i w_i * z_i ;  disp = 1 / max(1e-10, depth / acc)

    Args:
      raw: [B, S, C] field outputs (C=4, or 5 with a semantic logit channel).
      z_vals: [B, S] sample depths.
      rays_d: [B, 3] unnormalized ray directions (their norm scales dists).
      raw_noise_std: stddev of sigma regularization noise (train only).
      noise_key: PRNG key for the sigma noise (required if raw_noise_std > 0).
      white_bkgd: composite onto white.
      semantic: composite channel 4 into a prob map (weights stop-gradiented so
        segmentation gradients do not move geometry).
      only_object: the reference's object-REMOVAL render mode
        (`MVSeg/DS_NeRF/run_nerf_helpers.py:384-397`): alpha is multiplied by
        (1 - sigmoid(logit)), deleting density classified as object.
      oo_threshold: with only_object, zero alphas above this threshold and
        smooth alpha 5x with a 3-tap mean along the ray (the reference's
        hole-cleanup heuristic, `:389-397`).
      harsh_bg_remove: subtract 10 * (1 - acc) from the prob map so empty rays
        classify strongly as background (`:410-412`).
    """
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], 1e10)], axis=-1)
    dists = dists * jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    rgb = jax.nn.sigmoid(raw[..., :3])  # [B, S, 3]

    sigma = raw[..., 3]
    if raw_noise_std > 0.0:
        if noise_key is None:
            raise ValueError("raw_noise_std > 0 requires noise_key")
        sigma = sigma + jax.random.normal(noise_key, sigma.shape,
                                          dtype=sigma.dtype) * raw_noise_std

    alpha = 1.0 - jnp.exp(-sigma_activation(sigma) * dists)  # [B, S]

    logits = raw[..., 4] if raw.shape[-1] > 4 else None
    if only_object:
        if logits is None:
            raise ValueError("only_object requires a semantic channel")
        alpha = alpha * (1.0 - jax.nn.sigmoid(logits))
        if oo_threshold is not None:
            alpha = jnp.where(alpha > oo_threshold, 0.0, alpha)
            for _ in range(5):
                left = jnp.pad(alpha[:, 1:], ((0, 0), (0, 1)))
                right = jnp.pad(alpha[:, :-1], ((0, 0), (1, 0)))
                alpha = (left + alpha + right) / 3.0

    weights = alpha * exclusive_cumprod_one(1.0 - alpha + 1e-10)
    weights_sg = jax.lax.stop_gradient(weights)

    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    rgb_map_sg = jnp.sum(weights_sg[..., None] * rgb, axis=-2)

    depth_map = jnp.sum(weights * z_vals, axis=-1)
    acc_map = jnp.sum(weights, axis=-1)
    # double-where: an all-empty ray (acc == 0) must yield finite disp AND
    # finite gradients. A bare depth/acc is 0/0 = NaN there, and because the
    # fused train batch backprops a (zero) cotangent through every ray's
    # disp, 0 * NaN would poison ALL gradients — a loss-side isnan guard
    # cannot fix that (the reference filters host-side, `run_nerf.py:1520`).
    mean_z = depth_map / jnp.maximum(acc_map, 1e-10)
    disp_map = jnp.where(acc_map > 1e-8,
                         1.0 / jnp.maximum(1e-10, mean_z), 0.0)

    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])
        rgb_map_sg = rgb_map_sg + (1.0 - jnp.sum(weights_sg, axis=-1)[..., None])

    prob = None
    if semantic:
        if logits is None:
            raise ValueError("semantic=True requires raw channel count >= 5")
        prob = jnp.sum(weights_sg * logits, axis=-1)
        if harsh_bg_remove:
            prob = prob - 10.0 * (1.0 - acc_map)

    return RenderOutputs(rgb=rgb_map, rgb_sg=rgb_map_sg, disp=disp_map,
                         acc=acc_map, depth=depth_map, weights=weights,
                         alpha=alpha, z_vals=z_vals, prob=prob, logits=logits)


class RenderConfig(NamedTuple):
    """Static rendering hyperparameters (hashable; safe as a jit static arg)."""
    n_samples: int = 64
    n_importance: int = 64
    perturb: bool = True
    lindisp: bool = False
    raw_noise_std: float = 0.0
    white_bkgd: bool = False
    semantic: bool = False
    only_object: bool = False
    oo_threshold: float | None = None
    harsh_bg_remove: bool = False


class RenderResult(NamedTuple):
    coarse: RenderOutputs | None
    fine: RenderOutputs
    z_std: jnp.ndarray | None  # [B] std of importance samples


def render_rays(key, ray_batch: dict, field_fn: FieldFn, cfg: RenderConfig,
                fine_field_fn: FieldFn | None = None) -> RenderResult:
    """Coarse(+fine) volumetric rendering of a ray batch.

    Args:
      key: PRNG key; split internally for stratified jitter, PDF draws, noise.
      ray_batch: dict from `core.rays.make_ray_batch`.
      field_fn: coarse field (or the only field when n_importance == 0).
      cfg: static RenderConfig.
      fine_field_fn: fine field; defaults to `field_fn` (shared weights).
    """
    k_strat, k_pdf, k_noise_c, k_noise_f = jax.random.split(key, 4)
    origins, dirs = ray_batch["origins"], ray_batch["directions"]
    viewdirs = ray_batch["viewdirs"]

    z_vals = sampling.stratified_z_vals(
        k_strat, ray_batch["near"], ray_batch["far"], cfg.n_samples,
        lindisp=cfg.lindisp, perturb=cfg.perturb, dtype=origins.dtype)

    pts = sampling.ray_points(origins, dirs, z_vals)
    raw = field_fn(pts, viewdirs)
    coarse = composite(raw, z_vals, dirs, raw_noise_std=cfg.raw_noise_std,
                       noise_key=k_noise_c, white_bkgd=cfg.white_bkgd,
                       semantic=cfg.semantic, only_object=cfg.only_object,
                       oo_threshold=cfg.oo_threshold,
                       harsh_bg_remove=cfg.harsh_bg_remove)

    if cfg.n_importance <= 0:
        return RenderResult(coarse=None, fine=coarse, z_std=None)

    z_combined, z_samples = sampling.hierarchical_z_vals(
        k_pdf, z_vals, coarse.weights, cfg.n_importance, det=not cfg.perturb)
    pts_fine = sampling.ray_points(origins, dirs, z_combined)
    fine_fn = fine_field_fn if fine_field_fn is not None else field_fn
    raw_fine = fine_fn(pts_fine, viewdirs)
    fine = composite(raw_fine, z_combined, dirs,
                     raw_noise_std=cfg.raw_noise_std, noise_key=k_noise_f,
                     white_bkgd=cfg.white_bkgd, semantic=cfg.semantic,
                     only_object=cfg.only_object, oo_threshold=cfg.oo_threshold,
                     harsh_bg_remove=cfg.harsh_bg_remove)
    z_std = jnp.std(z_samples, axis=-1)
    return RenderResult(coarse=coarse, fine=fine, z_std=z_std)


def render_rays_chunked(key, ray_batch: dict, field_fn: FieldFn,
                        cfg: RenderConfig, chunk: int,
                        fine_field_fn: FieldFn | None = None,
                        mesh=None) -> RenderResult:
    """Render a large (host-resident) ray batch in fixed-size chunks.

    The TPU replacement for `batchify_rays` (`DS_NeRF/run_nerf.py:74-87`):
    pads to a multiple of `chunk`, runs a `lax.map` over chunks (one compiled
    program, serial over chunks to bound memory), and strips the padding.
    Used for full-frame rendering; training batches are sized to fit directly.

    mesh: optional `jax.sharding.Mesh` — each chunk's ray axis is sharded
    over the mesh's first axis (pixel-parallel frame rendering across chips;
    GSPMD partitions the field eval and gathers the maps over ICI).
    """
    n = ray_batch["origins"].shape[0]
    if mesh is not None:
        n_dev = mesh.devices.size
        chunk = -(-chunk // n_dev) * n_dev   # chunk divisible by mesh size
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n

    def pad0(x):
        return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))

    padded = {k: pad0(v) for k, v in ray_batch.items()}
    chunked = {k: v.reshape((n_chunks, chunk) + v.shape[1:])
               for k, v in padded.items()}
    keys = jax.random.split(key, n_chunks)

    def body(args):
        k, rb = args
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            axis = mesh.axis_names[0]

            def constrain(v):
                spec = PartitionSpec(axis, *([None] * (v.ndim - 1)))
                return jax.lax.with_sharding_constraint(
                    v, NamedSharding(mesh, spec))

            rb = {kk: constrain(v) for kk, v in rb.items()}
        return render_rays(k, rb, field_fn, cfg, fine_field_fn)

    out = jax.lax.map(body, (keys, chunked))

    def unchunk(x):
        if x is None:
            return None
        return x.reshape((n_chunks * chunk,) + x.shape[2:])[:n]

    return jax.tree.map(unchunk, out, is_leaf=lambda x: x is None)
