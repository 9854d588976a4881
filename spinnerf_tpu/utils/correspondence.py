"""Cross-view correspondence via rendered depth.

Parity: `DS_NeRF/correspondence_utils.py:4-50` — take the weight-argmax depth
of each source pixel, unproject to world, reproject into a target view, and
validate by comparing against the target's own unprojection (world-space
error check). Vectorized over all pixels.
"""
from __future__ import annotations

import numpy as np


def weight_argmax_depth(z_vals: np.ndarray, weights: np.ndarray) -> np.ndarray:
    """Depth of the max-weight sample per pixel ([H, W, S] -> [H, W])."""
    idx = np.argmax(weights, axis=-1)
    return np.take_along_axis(z_vals, idx[..., None], axis=-1)[..., 0]


def reproject_correspondences(depth_a, c2w_a, c2w_b, depth_b, *, focal, cx,
                              cy, world_err_thresh: float = 0.05):
    """Dense A->B correspondences through depth, with a world-error check.

    Args:
      depth_a/depth_b: [H, W] per-pixel depths (NeRF z-convention).
      c2w_a/c2w_b: [3or4, 4] NeRF camera-to-world.
    Returns:
      (uv_b [H, W, 2] float pixel coords in B, valid [H, W] bool) — valid
      where the reprojection lands in-frame AND B's own surface unprojects to
      (approximately) the same world point.
    """
    h, w = depth_a.shape
    u, v = np.meshgrid(np.arange(w, dtype=np.float64),
                       np.arange(h, dtype=np.float64), indexing="xy")

    def unproject(u, v, z, c2w):
        dirs = np.stack([(u - cx) / focal, -(v - cy) / focal,
                         -np.ones_like(u)], -1)
        return c2w[:3, 3] + (dirs * z[..., None]) @ np.asarray(c2w)[:3, :3].T

    world_a = unproject(u, v, depth_a, c2w_a)

    rel = world_a - np.asarray(c2w_b)[:3, 3]
    cam = rel @ np.asarray(c2w_b)[:3, :3]
    z_b = -cam[..., 2]
    u_b = cx + focal * cam[..., 0] / np.maximum(z_b, 1e-9)
    v_b = cy - focal * cam[..., 1] / np.maximum(z_b, 1e-9)
    in_frame = (z_b > 0) & (u_b >= 0) & (u_b < w) & (v_b >= 0) & (v_b < h)

    ui = np.clip(u_b.astype(np.int64), 0, w - 1)
    vi = np.clip(v_b.astype(np.int64), 0, h - 1)
    world_b = unproject(u_b, v_b, depth_b[vi, ui], c2w_b)
    err = np.linalg.norm(world_b - world_a, axis=-1)
    valid = in_frame & (err < world_err_thresh)
    return np.stack([u_b, v_b], axis=-1), valid
