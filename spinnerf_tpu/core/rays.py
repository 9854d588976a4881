"""Ray generation and camera geometry (pure JAX, vmappable/jittable).

Behavioral parity with the reference pinhole conventions
(`DS_NeRF/run_nerf_helpers.py:249-300`): pixel grid in xy-indexing, camera
looks down -z, y up, directions are *not* normalized (z-depth convention for
`z_vals`), plus the NDC warp used for forward-facing scenes.

All functions are shape-polymorphic pure functions on jnp arrays; batch/mesh
sharding happens at the caller.
"""
from __future__ import annotations

import jax.numpy as jnp


def pixel_dirs(height: int, width: int, focal, principal=None, dtype=jnp.float32):
    """Per-pixel camera-frame ray directions, shape [H, W, 3].

    Camera frame: +x right, +y up, camera looks along -z. Pixel (0, 0) is the
    top-left corner; `i` indexes columns (x), `j` rows (y).
    Parity: `get_rays_np` (`DS_NeRF/run_nerf_helpers.py:263-272`).
    """
    if principal is None:
        cx, cy = width * 0.5, height * 0.5
    else:
        cx, cy = principal
    i = jnp.arange(width, dtype=dtype)[None, :]   # [1, W]
    j = jnp.arange(height, dtype=dtype)[:, None]  # [H, 1]
    x = (i - cx) / focal
    y = -(j - cy) / focal
    x, y = jnp.broadcast_to(x, (height, width)), jnp.broadcast_to(y, (height, width))
    return jnp.stack([x, y, -jnp.ones_like(x)], axis=-1)


def get_rays(height: int, width: int, focal, c2w):
    """World-frame ray origins/directions for a full image.

    Args:
      c2w: [3, 4] (or [4, 4]) camera-to-world matrix.
    Returns:
      (rays_o, rays_d), each [H, W, 3]. Directions are unnormalized.
    """
    dirs = pixel_dirs(height, width, focal, dtype=jnp.result_type(c2w, jnp.float32))
    # Rotate camera-frame dirs into world frame: d_world = R @ d_cam.
    rays_d = dirs @ c2w[:3, :3].T
    rays_o = jnp.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d


def get_rays_at_coords(height: int, width: int, focal, c2w, coords):
    """Rays through specific pixel coordinates.

    Args:
      coords: [N, 2] pixel coordinates ordered (x, y) — i.e. (col, row),
        matching the COLMAP keypoint convention used for sparse-depth rays
        (`DS_NeRF/run_nerf_helpers.py:275-280`).
    Returns:
      (rays_o, rays_d), each [N, 3].
    """
    x = (coords[:, 0] - width * 0.5) / focal
    y = -(coords[:, 1] - height * 0.5) / focal
    dirs = jnp.stack([x, y, -jnp.ones_like(x)], axis=-1)
    rays_d = dirs @ c2w[:3, :3].T
    rays_o = jnp.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d


def ndc_rays(height: int, width: int, focal, near, rays_o, rays_d):
    """Warp rays into NDC space for forward-facing scenes.

    Parity: `ndc_rays` (`DS_NeRF/run_nerf_helpers.py:283-300`). Origins are
    first advanced onto the near plane, then origin/direction are projected so
    that z in [-1, 1] maps [near, inf).
    """
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    ox, oy, oz = rays_o[..., 0], rays_o[..., 1], rays_o[..., 2]
    dx, dy, dz = rays_d[..., 0], rays_d[..., 1], rays_d[..., 2]

    sx = -1.0 / (width / (2.0 * focal))
    sy = -1.0 / (height / (2.0 * focal))

    o0 = sx * ox / oz
    o1 = sy * oy / oz
    o2 = 1.0 + 2.0 * near / oz

    d0 = sx * (dx / dz - ox / oz)
    d1 = sy * (dy / dz - oy / oz)
    d2 = -2.0 * near / oz

    return jnp.stack([o0, o1, o2], axis=-1), jnp.stack([d0, d1, d2], axis=-1)


def normalize(v, eps: float = 1e-12):
    """Unit-normalize along the last axis."""
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


def make_ray_batch(rays_o, rays_d, near, far, viewdirs=None, depths=None, weights=None):
    """Pack rays into a dict-of-arrays ray batch (the framework's wire format).

    The reference flattens rays into a [B, 8..11] float packet
    (`DS_NeRF/run_nerf.py:143-153`); we keep a named structure (pytree) so jit
    boundaries stay readable while XLA still sees flat arrays.

    Fields:
      origins [B,3], directions [B,3], near [B], far [B],
      viewdirs [B,3] (unit; defaults to normalized directions),
      depths [B] (optional ground-truth depth per ray, for depth supervision),
      weights [B] (optional per-ray supervision weight).
    """
    origins = rays_o.reshape(-1, 3)
    directions = rays_d.reshape(-1, 3)
    n = origins.shape[0]
    batch = {
        "origins": origins,
        "directions": directions,
        "near": jnp.broadcast_to(jnp.asarray(near, origins.dtype), (n,)),
        "far": jnp.broadcast_to(jnp.asarray(far, origins.dtype), (n,)),
        "viewdirs": normalize(directions) if viewdirs is None else viewdirs.reshape(-1, 3),
    }
    if depths is not None:
        batch["depths"] = depths.reshape(-1)
    if weights is not None:
        batch["weights"] = weights.reshape(-1)
    return batch
