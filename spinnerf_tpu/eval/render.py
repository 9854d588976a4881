"""Full-frame and path rendering: the TPU replacement for `render_path`
(`DS_NeRF/run_nerf.py:168-307`).

A frame's pixels are flattened into one ray batch and rendered in fixed-size
chunks through a single compiled program (`core.rendering.render_rays_chunked`),
with the chunk dimension shardable over the data mesh axis. Per-frame artifact
dumping (rgb/depth/disp/weight/z/alpha/pose/intrinsics) reproduces the disk
contract that `mask_refinement.py` and the MVSeg tooling consume.
"""
from __future__ import annotations

import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from spinnerf_tpu.core import rendering
from spinnerf_tpu.core.rendering import RenderConfig
from spinnerf_tpu.data import raybank
from spinnerf_tpu.eval.metrics import to8b


# Light maps are one value per pixel; the heavy ones ("weights", "z_vals",
# "alpha") are per-SAMPLE [H, W, S] tensors — at production shape (1008x567,
# 64+64 samples, f32) each is ~290 MB/frame. Renderers therefore return only
# the maps the caller asks for, and the selection happens INSIDE the jit so
# XLA dead-code-eliminates the unrequested stacks entirely: they never hit
# HBM across chunks, let alone the host link. (Before this, every periodic
# panel/testset/guidance render shipped ~900 MB over the device relay —
# measured ~10x the whole train-interval cost at statue scale.)
LIGHT_MAPS = ("rgb", "disp", "acc", "depth")
HEAVY_MAPS = ("weights", "z_vals", "alpha")


def _default_maps(cfg: RenderConfig):
    return LIGHT_MAPS + (("prob",) if cfg.semantic else ())


def maps_for_save(save_dir, save_alpha: bool = False):
    """The per-pixel maps a pose-list render must fetch to feed the
    reference's per-frame artifact tree (`run_nerf.py:231-295`): rgb/disp
    always; depth/weights/z_vals only when dumping; alpha on request.

    Single source of truth for `render_path` and `Trainer.render_poses_list`
    — the two must agree or dump time KeyErrors.
    """
    needed = ("rgb", "disp")
    if save_dir is not None:
        needed += ("depth", "weights", "z_vals")
    if save_alpha:
        needed += ("alpha",)
    return needed


def _select_fine(fine, maps):
    """Pick the requested RenderOutputs fields (runs inside jit)."""
    out = {}
    for m in maps:
        v = getattr(fine, m)
        if v is None:
            raise ValueError(
                f"requested map '{m}' is not produced by this renderer "
                f"(semantic head off?)")
        out[m] = v
    return out


def _to_host_maps(sel: dict, h, w):
    """Flat [N, ...] device maps -> {name: numpy [H, W, ...]}."""
    return {k: np.asarray(v).reshape((h, w) + v.shape[1:])
            for k, v in sel.items()}


def make_frame_renderer(hwf, field_fn, cfg: RenderConfig, *, near, far,
                        ndc: bool = False, chunk: int = 8192,
                        fine_field_fn=None, render_factor: int = 0,
                        mesh=None, maps=None):
    """Build a jitted `(key, c2w) -> per-pixel maps` renderer.

    Reuse one renderer across a pose list: an un-jitted
    `render_rays_chunked` re-traces its whole graph for every frame
    (seconds per pose over a 120-frame spiral video).

    maps: which per-pixel maps to return (default LIGHT_MAPS + "prob" when
    cfg.semantic). Request HEAVY_MAPS entries only when you will read them —
    see the note above LIGHT_MAPS.
    """
    maps = _default_maps(cfg) if maps is None else tuple(maps)
    h, w, focal = hwf
    if render_factor:
        h, w, focal = (h // render_factor, w // render_factor,
                       focal / render_factor)

    @jax.jit
    def _render(key, c2w):
        batch, _ = raybank.frame_ray_batch((h, w, focal), c2w, near, far,
                                           ndc=ndc)
        res = rendering.render_rays_chunked(key, batch, field_fn, cfg,
                                            chunk,
                                            fine_field_fn=fine_field_fn,
                                            mesh=mesh)
        return _select_fine(res.fine, maps)

    def render(key, c2w):
        return _to_host_maps(_render(key, jnp.asarray(c2w)), h, w)

    return render


def render_frame(key, c2w, hwf, field_fn, cfg: RenderConfig, *,
                 near, far, ndc: bool = False, chunk: int = 8192,
                 fine_field_fn=None, render_factor: int = 0, maps=None):
    """Render one camera pose to per-pixel maps.

    Returns dict with rgb [H,W,3], disp/acc/depth [H,W] (+ prob [H,W] when
    cfg.semantic); request weights/z_vals/alpha [H,W,S] via `maps`.
    For many poses at the same intrinsics, build `make_frame_renderer` once.
    """
    return make_frame_renderer(hwf, field_fn, cfg, near=near, far=far,
                               ndc=ndc, chunk=chunk,
                               fine_field_fn=fine_field_fn,
                               render_factor=render_factor,
                               maps=maps)(key, c2w)


def make_param_frame_renderer(hwf, apply_fn, cfg: RenderConfig, *, near, far,
                              ndc: bool = False, chunk: int = 8192,
                              render_factor: int = 0, mesh=None,
                              fine_apply_fn=None, maps=None):
    """Like `make_frame_renderer` but the field params are jit ARGUMENTS:
    `(params, key, c2w) -> maps` with params = {"coarse": ..., ["fine": ...]}.

    Build ONCE per intrinsics and reuse across training — periodic
    video/testset hooks then render with the updated weights without
    recompiling (params as closure constants would recompile every hook).
    """
    maps = _default_maps(cfg) if maps is None else tuple(maps)
    h, w, focal = hwf
    if render_factor:
        h, w, focal = (h // render_factor, w // render_factor,
                       focal / render_factor)

    @jax.jit
    def _render(params, key, c2w):
        def coarse(pts, vd):
            return apply_fn(params["coarse"], pts, vd)

        if "fine" in params:
            _fine_apply = fine_apply_fn or apply_fn

            def fine(pts, vd):
                return _fine_apply(params["fine"], pts, vd)
        else:
            fine = coarse
        batch, _ = raybank.frame_ray_batch((h, w, focal), c2w, near, far,
                                           ndc=ndc)
        res = rendering.render_rays_chunked(key, batch, coarse, cfg, chunk,
                                            fine_field_fn=fine, mesh=mesh)
        return _select_fine(res.fine, maps)

    def render(params, key, c2w):
        return _to_host_maps(_render(params, key, jnp.asarray(c2w)), h, w)

    return render


def render_path(key, poses, hwf, field_fn, cfg: RenderConfig, *, near, far,
                ndc: bool = False, chunk: int = 8192, fine_field_fn=None,
                render_factor: int = 0, save_dir=None, gt_images=None,
                save_alpha: bool = False, progress: bool = True,
                frame_fn=None):
    """Render a pose list; optionally dump the reference's per-frame artifact
    tree (rgb/, depth/, disp/, weight/, z/, pose/, intrinsics.txt).

    Returns (rgbs [M,H,W,3], disps [M,H,W]) as numpy arrays.
    """
    h, w, focal = hwf
    if render_factor:
        h, w, focal = h // render_factor, w // render_factor, focal / render_factor

    if save_dir is not None:
        save_dir = Path(save_dir)
        for sub in ["rgb", "depth", "disp", "weight", "z", "pose", "images"] + \
                   (["alpha"] if save_alpha else []):
            (save_dir / sub).mkdir(parents=True, exist_ok=True)
        intrinsics = np.array([[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]])
        np.savetxt(save_dir / "intrinsics.txt", intrinsics)

    rgbs, disps = [], []
    keys = jax.random.split(key, len(poses))
    needed = maps_for_save(save_dir, save_alpha)
    renderer = frame_fn if frame_fn is not None else make_frame_renderer(
        (h, w, focal), field_fn, cfg, near=near, far=far, ndc=ndc,
        chunk=chunk, fine_field_fn=fine_field_fn, maps=needed)
    for i, (k, c2w) in enumerate(zip(keys, poses)):
        maps = renderer(k, jnp.asarray(c2w))
        rgbs.append(maps["rgb"])
        disps.append(maps["disp"])
        if save_dir is not None:
            import imageio.v2 as imageio
            imageio.imwrite(save_dir / "rgb" / f"{i:06d}.png", to8b(maps["rgb"]))
            np.save(save_dir / "depth" / f"{i:06d}.npy", maps["depth"])
            np.save(save_dir / "disp" / f"{i:06d}.npy", maps["disp"])
            np.save(save_dir / "weight" / f"{i:06d}.npy", maps["weights"])
            np.save(save_dir / "z" / f"{i:06d}.npy", maps["z_vals"])
            if save_alpha:
                np.save(save_dir / "alpha" / f"{i:06d}.npy", maps["alpha"])
            pose44 = np.concatenate([np.asarray(c2w)[:3, :4],
                                     [[0, 0, 0, 1]]], axis=0)
            np.savetxt(save_dir / "pose" / f"{i:06d}.txt", pose44)
            if gt_images is not None:
                imageio.imwrite(save_dir / "images" / f"{i:06d}.png",
                                to8b(gt_images[i]))
    return np.stack(rgbs), np.stack(disps)


def write_video(path, frames, fps: int = 30):
    """Write an mp4 from [M,H,W,3] float or grayscale/uint8 frames.

    Prefers imageio+ffmpeg (better quality control); falls back to OpenCV's
    built-in mp4v encoder when no ffmpeg backend is available.
    """
    frames = [np.asarray(f) for f in frames]
    frames = [to8b(f) if f.dtype != np.uint8 else f for f in frames]
    frames = [np.repeat(f[..., None], 3, axis=-1) if f.ndim == 2 else f
              for f in frames]
    try:
        import imageio.v2 as imageio
        imageio.mimwrite(str(path), frames, fps=fps, quality=8)
        return
    except (ValueError, ImportError, OSError):
        pass
    import cv2
    h, w = frames[0].shape[:2]
    vw = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"),
                         fps, (w, h))
    if not vw.isOpened():
        # last resort: per-frame PNGs next to the requested path
        from pathlib import Path
        out = Path(str(path) + ".frames")
        out.mkdir(parents=True, exist_ok=True)
        for i, f in enumerate(frames):
            cv2.imwrite(str(out / f"{i:04d}.png"),
                        cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
        return
    for f in frames:
        vw.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    vw.release()


def normalize_disps_for_video(disps):
    """NaN-zeroed disparity normalized by its 95th percentile
    (parity: `run_nerf.py:1214-1218`)."""
    d = np.nan_to_num(np.asarray(disps), nan=0.0)
    denom = np.percentile(d, 95)
    return d / (denom if denom > 0 else 1.0)
