"""Fixed-shape ray banks: the TPU-native replacement for the reference's
ray-precompute + DataLoader machinery (`DS_NeRF/run_nerf.py:1222-1348`).

The reference materializes every ray of every training view as numpy arrays
([N*H*W, 3, 4] floats — gigabytes, "HOT at startup") and round-robins four
`DataLoader(shuffle=True)` iterators, copying each batch host->GPU. Here:

- Rays are *never materialized*. A bank stores the image/mask/depth stacks
  (device-resident, uint8-compact where possible) plus per-group **pixel index
  arrays** (view, row, col). The jitted train step samples random indices and
  computes ray origins/directions from the pose stack on device — zero
  host->device traffic in steady state and no startup precompute.
- Mask-dependent ray groups have data-dependent sizes; each group keeps its
  actual `count` as a static int and samples uniformly in [0, count), so jit
  sees fixed shapes (SURVEY §7 "pad + weight-mask" discipline).

Group semantics (parity with `run_nerf.py:1311-1322`):
  rgb   : pixels with label == 1 (inpainted-region rays of supervised views);
          in prepare/train-GT mode, all pixels.
  clf   : pixels with label == 0 (outside the mask) — or all in prepare mode.
  inp   : pixels with label != 0 (mask region of every view) with the
          LaMa-inpainted disparity as target.
  depth : COLMAP sparse-depth rays (subpixel coords, depth + weight targets).
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from spinnerf_tpu.core import rays as ray_lib
from spinnerf_tpu.parallel import mesh as mesh_lib


def dataclasses_static():
    """Mark a register_dataclass field as static (part of the jit cache key)."""
    return dataclasses.field(metadata=dict(static=True))


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class RayGroup:
    """Index set for one supervision group. `idx` is padded to a fixed shape;
    `count` (static) bounds the uniform sampling."""
    idx: Any          # [K, 3] int32 (view, row, col) — device array
    count: int = dataclasses_static()


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class DepthRayGroup:
    view: Any         # [K] int32
    coord: Any        # [K, 2] float32 (x, y) pixel coords
    depth: Any        # [K] float32 target depth
    weight: Any       # [K] float32 reprojection-error weight
    count: int = dataclasses_static()
    max_depth: float = dataclasses_static()


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class RayBank:
    images: Any            # [N, H, W, 3] float32 (device)
    poses: Any             # [N, 3, 4] float32 (device)
    labels: Any            # [N, H, W] float32 mask labels (+1/0/-1)
    inp_depths: Any | None  # [N, H, W] float32 inpainted disparity (or None)
    groups: dict           # name -> RayGroup
    depth_group: DepthRayGroup | None
    hwf: tuple = dataclasses_static()      # (H, W, focal)
    near: float = dataclasses_static()
    far: float = dataclasses_static()
    ndc: bool = dataclasses_static()


def _pad_idx(idx: np.ndarray, multiple: int = 1024):
    """Pad index rows to a multiple so recompilation doesn't trigger when a
    scene's mask size changes slightly between runs."""
    k = len(idx)
    if k == 0:
        return np.zeros((multiple, idx.shape[1]), np.int32), 0
    padded_len = ((k + multiple - 1) // multiple) * multiple
    pad = np.zeros((padded_len - k, idx.shape[1]), idx.dtype)
    return np.concatenate([idx, pad]).astype(np.int32), k


def build_raybank(scene, i_train, *, depth_list=None, prepare: bool = False,
                  train_gt: bool = False, ndc: bool = False,
                  near: float | None = None, far: float | None = None,
                  filter_depth_by_mask: bool = True,
                  semantic: bool = False) -> RayBank:
    """Assemble a RayBank from a loaded `llff.Scene`.

    Args:
      scene: `data.llff.Scene`.
      i_train: training view indices.
      depth_list: per-view sparse-depth dicts (`colmap.sparse_depth_for_views`
        order = all views sorted by name; indexed by the same view ids).
      prepare: stage-3 semantics (train on everything, no mask filtering).
      filter_depth_by_mask: drop sparse-depth rays whose keypoint lies inside
        the (dilated) object mask — the object is being removed, its depth is
        invalid (parity: `run_nerf.py:1271-1283`).
    """
    h, w, focal = scene.hwf
    i_train = np.asarray(i_train)
    images = scene.images[i_train]
    poses = scene.poses[i_train]
    if scene.masks is not None:
        labels = scene.masks[i_train].astype(np.float32)
    else:
        labels = np.zeros(images.shape[:3], np.float32)
    inp = (scene.inpainted_depths[i_train].astype(np.float32)
           if scene.inpainted_depths is not None else None)

    n = len(i_train)
    vv, rr, cc = np.meshgrid(np.arange(n), np.arange(h), np.arange(w),
                             indexing="ij")
    all_idx = np.stack([vv, rr, cc], axis=-1).reshape(-1, 3)
    flat_labels = labels.reshape(-1)

    groups = {}
    if semantic:
        # MVSeg mode (`MVSeg/DS_NeRF/run_nerf.py:1279-1318`): the rgb group is
        # every pixel; the seg group is pixels of views that HAVE a mask
        # (label >= 0), supervised with BCE on the composited logit.
        group_idx = (("rgb", all_idx), ("clf", all_idx),
                     ("seg", all_idx[flat_labels >= 0]),
                     ("inp", all_idx[flat_labels != 0]))
    elif prepare or train_gt:
        group_idx = (("rgb", all_idx), ("clf", all_idx),
                     ("inp", all_idx[flat_labels != 0]))
    else:
        group_idx = (("rgb", all_idx[flat_labels == 1]),
                     ("clf", all_idx[flat_labels == 0]),
                     ("inp", all_idx[flat_labels != 0]))

    cache = {}   # groups sharing a source array share ONE device buffer
    shuffle_rng = np.random.default_rng(0xC0FFEE)
    for name, idx in group_idx:
        key = id(idx)
        if key not in cache:
            # fixed pre-shuffle (deterministic): epoch sampling then strides
            # through a random order (see `sample_group`) — the reference's
            # shuffled-DataLoader-per-epoch semantics, statelessly
            idx = idx[shuffle_rng.permutation(len(idx))] if len(idx) else idx
            padded, count = _pad_idx(idx)
            cache[key] = RayGroup(idx=jnp.asarray(padded), count=count)
        groups[name] = cache[key]

    depth_group = None
    if depth_list is not None:
        views, coords, depths, weights = [], [], [], []
        for bank_v, scene_v in enumerate(i_train):
            d = depth_list[scene_v]
            coord = np.asarray(d["coord"], np.float32).reshape(-1, 2)
            depth = np.asarray(d["depth"], np.float32).reshape(-1)
            weight = np.asarray(d["weight"], np.float32).reshape(-1)
            if filter_depth_by_mask and scene.masks is not None and not prepare:
                r = np.clip(coord[:, 1].astype(int), 0, h - 1)
                c = np.clip(coord[:, 0].astype(int), 0, w - 1)
                keep = scene.masks[scene_v][r, c] == 0
                coord, depth, weight = coord[keep], depth[keep], weight[keep]
            views.append(np.full(len(depth), bank_v, np.int32))
            coords.append(coord)
            depths.append(depth)
            weights.append(weight)
        view = np.concatenate(views)
        coord = np.concatenate(coords)
        depth = np.concatenate(depths)
        weight = np.concatenate(weights)
        k = len(view)
        if k:   # pre-shuffle for epoch strides (view-ordered otherwise)
            perm = shuffle_rng.permutation(k)
            view, coord = view[perm], coord[perm]
            depth, weight = depth[perm], weight[perm]
        pad = mesh_lib.pad_to_multiple(max(k, 1), 1024) - k
        depth_group = DepthRayGroup(
            view=jnp.asarray(np.pad(view, (0, pad))),
            coord=jnp.asarray(np.pad(coord, ((0, pad), (0, 0)))),
            depth=jnp.asarray(np.pad(depth, (0, pad))),
            weight=jnp.asarray(np.pad(weight, (0, pad))),
            count=k, max_depth=float(depth.max()) if k else 1.0)

    if near is None:
        near = 0.0 if ndc else scene.near
    if far is None:
        far = 1.0 if ndc else scene.far

    return RayBank(images=jnp.asarray(images), poses=jnp.asarray(poses),
                   labels=jnp.asarray(labels),
                   inp_depths=jnp.asarray(inp) if inp is not None else None,
                   hwf=(h, w, float(focal)), near=float(near), far=float(far),
                   ndc=ndc, groups=groups, depth_group=depth_group)


# --- in-jit sampling --------------------------------------------------------

def rays_for_pixels(poses, hwf, view, x, y):
    """Compute world rays for (view, x, y) pixel coords on device.

    Args:
      poses: [N, 3, 4]; view: [B] int32; x, y: [B] float32 pixel coords.
    Returns: (rays_o, rays_d) each [B, 3].
    """
    h, w, focal = hwf
    dirs = jnp.stack([(x - w * 0.5) / focal,
                      -(y - h * 0.5) / focal,
                      -jnp.ones_like(x)], axis=-1)           # [B, 3] cam frame
    c2w = poses[view]                                        # [B, 3, 4]
    rays_d = jnp.einsum("bj,bij->bi", dirs, c2w[:, :3, :3])
    rays_o = c2w[:, :3, 3]
    return rays_o, rays_d


def _finish_ray_batch(bank, rays_o, rays_d, **extra):
    """Shared NDC warp + batch assembly for the bank samplers: normalized
    viewdirs are captured BEFORE the NDC warp (`run_nerf.py:110-121`)."""
    h, w, focal = bank.hwf
    viewdirs = None
    if bank.ndc:
        viewdirs = ray_lib.normalize(rays_d)
        rays_o, rays_d = ray_lib.ndc_rays(h, w, focal, 1.0, rays_o, rays_d)
    return ray_lib.make_ray_batch(rays_o, rays_d, bank.near, bank.far,
                                  viewdirs=viewdirs, **extra)


def epoch_indices(step, batch_size: int, count: int):
    """Without-replacement epoch sampling, stateless: positions stride
    through the (pre-shuffled, see `build_raybank`) ray order; each epoch
    applies a bijective rotation so batch composition shifts phase across
    epochs. Every ray is visited exactly once per `count` draws — the
    reference's shuffled-DataLoader semantics (`run_nerf.py:1337-1413`,
    four `DataLoader(shuffle=True)` iterators re-created on StopIteration),
    which uniform-with-replacement sampling does NOT give (at tiny-scene
    counts ~37% of rays miss any 1-epoch window; measured as a slower
    stage-5 takeoff, PARITY_RUN §5 r5)."""
    c = max(count, 1)
    j = step * batch_size + jnp.arange(batch_size, dtype=jnp.int32)
    e = j // c
    return (j + e * jnp.int32(65521)) % c


def sample_group(key, bank: RayBank, name: str, batch_size: int, step=None):
    """Draw a ray batch from a pixel group: without-replacement epoch
    strides when `step` is given (see `epoch_indices`), else uniform with
    replacement.

    Returns (ray_batch, targets) where targets has 'rgb' [B,3], 'label' [B],
    and 'inp_depth' [B] when the bank carries inpainted depths.
    """
    g = bank.groups[name]
    h, w, focal = bank.hwf
    if step is None:
        i = jax.random.randint(key, (batch_size,), 0, max(g.count, 1))
    else:
        i = epoch_indices(step, batch_size, g.count)
    vrc = g.idx[i]                                  # [B, 3]
    view, row, col = vrc[:, 0], vrc[:, 1], vrc[:, 2]
    rays_o, rays_d = rays_for_pixels(bank.poses, bank.hwf, view,
                                     col.astype(jnp.float32),
                                     row.astype(jnp.float32))
    batch = _finish_ray_batch(bank, rays_o, rays_d)
    targets = {
        "rgb": bank.images[view, row, col],
        "label": bank.labels[view, row, col],
    }
    if bank.inp_depths is not None:
        targets["inp_depth"] = bank.inp_depths[view, row, col]
    return batch, targets


def sample_depth_group(key, bank: RayBank, batch_size: int, step=None):
    """Draw a sparse-depth ray batch (epoch strides when `step` given)."""
    g = bank.depth_group
    h, w, focal = bank.hwf
    if step is None:
        i = jax.random.randint(key, (batch_size,), 0, max(g.count, 1))
    else:
        i = epoch_indices(step, batch_size, g.count)
    view = g.view[i]
    coord = g.coord[i]
    rays_o, rays_d = rays_for_pixels(bank.poses, bank.hwf, view,
                                     coord[:, 0], coord[:, 1])
    return _finish_ray_batch(bank, rays_o, rays_d,
                             depths=g.depth[i], weights=g.weight[i])


def frame_ray_batch(bank_or_hwf, c2w, near, far, ndc: bool = False,
                    render_factor: int = 0):
    """All rays of one camera pose as a ray batch (for full-frame rendering).

    render_factor > 0 renders at H/f x W/f with focal/f (parity:
    `render_path` `run_nerf.py:168-177`).
    Returns (ray_batch, (H_out, W_out)).
    """
    h, w, focal = bank_or_hwf if isinstance(bank_or_hwf, tuple) else bank_or_hwf.hwf
    if render_factor:
        h, w, focal = h // render_factor, w // render_factor, focal / render_factor
    rays_o, rays_d = ray_lib.get_rays(h, w, focal, c2w)
    viewdirs = None
    if ndc:
        viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
        rays_o, rays_d = ray_lib.ndc_rays(h, w, focal, 1.0, rays_o, rays_d)
    return ray_lib.make_ray_batch(rays_o, rays_d, near, far,
                                  viewdirs=viewdirs), (h, w)


def sample_single_image(key, bank: RayBank, batch_size: int, step_idx,
                        *, precrop_iters: int = 0, precrop_frac: float = 0.5):
    """The reference's `--no_batching` sampler (`run_nerf.py:1415-1452`):
    all rays of one random training view, with a centered crop for the first
    `precrop_iters` steps. Fully in-jit; `step_idx` may be traced.
    """
    h, w, focal = bank.hwf
    k_view, k_row, k_col = jax.random.split(key, 3)
    n_views = bank.poses.shape[0]
    view = jax.random.randint(k_view, (), 0, n_views)

    use_crop = step_idx < precrop_iters if precrop_iters > 0 else False
    # full-image bounds are [0, h) x [0, w) — a centered-offset formulation
    # (h//2 ± h//2) never reaches the last row/column when h or w is odd
    dh = int(h // 2 * precrop_frac)
    dw = int(w // 2 * precrop_frac)
    lo_r = jnp.where(use_crop, h // 2 - dh, 0)
    hi_r = jnp.where(use_crop, h // 2 + dh, h)
    lo_c = jnp.where(use_crop, w // 2 - dw, 0)
    hi_c = jnp.where(use_crop, w // 2 + dw, w)
    row = jax.random.randint(k_row, (batch_size,), lo_r, hi_r)
    col = jax.random.randint(k_col, (batch_size,), lo_c, hi_c)

    views = jnp.full((batch_size,), view, jnp.int32)
    rays_o, rays_d = rays_for_pixels(bank.poses, bank.hwf, views,
                                     col.astype(jnp.float32),
                                     row.astype(jnp.float32))
    batch = _finish_ray_batch(bank, rays_o, rays_d)
    targets = {"rgb": bank.images[views, row, col],
               "label": bank.labels[views, row, col]}
    return batch, targets
