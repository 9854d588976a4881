"""MVSeg stage: lift sparse 2D object masks to view-consistent 3D masks.

The reference runs a forked semantic NeRF program (`MVSeg/DS_NeRF/run_nerf.py`)
whose render modes produce per-view masks:
  render_mask  : binary object-mask images (`run_nerf.py:198-201`; here
                 acc-gated — see render_masks for the documented deviation)
  post_opening : 3x3 morphological opening cleanup (`--post_opening`)
  mask_filter  : white-out everything outside the object
  only_object  : delete the object and composite a random background
  IoU/Acc eval : rendered mask vs GT (`run_nerf.py:1409-1423`)

Here the same trainer handles it (Config.mvseg=True gives the field a
semantic head and the fused step a BCE term); this module adds the mask
rendering/eval/export products.
"""
from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from spinnerf_tpu.eval import metrics as eval_metrics
from spinnerf_tpu.eval import render as eval_render


def post_opening(mask: np.ndarray, kernel: int = 3) -> np.ndarray:
    """cv2 MORPH_OPEN with a kxk kernel (`MVSeg/DS_NeRF/run_nerf.py:221`)."""
    import cv2
    return cv2.morphologyEx(mask.astype(np.uint8), cv2.MORPH_OPEN,
                            np.ones((kernel, kernel), np.uint8))


def render_masks(trainer, poses, *, threshold: float = 0.5,
                 opening: bool = False, render_factor: int = 0):
    """Render binary object masks for a pose list via the semantic head.

    Returns masks [M, H, W] float 0/1.
    """
    cfg = trainer.cfg
    coarse_fn, fine_fn = trainer.field_fns()
    rcfg = trainer.tcfg.render._replace(perturb=False, raw_noise_std=0.0,
                                        semantic=True)
    renderer = eval_render.make_frame_renderer(
        trainer.scene.hwf, coarse_fn, rcfg, near=trainer.bank.near,
        far=trainer.bank.far, ndc=trainer.bank.ndc, chunk=cfg.chunk,
        fine_field_fn=fine_fn, render_factor=render_factor)
    out = []
    for i, c2w in enumerate(poses):
        maps = renderer(jax.random.PRNGKey(i), jnp.asarray(c2w))
        # sigmoid(prob) * acc > threshold. DELIBERATE deviation from the
        # reference's render_mask branch (`MVSeg run_nerf.py:198-201`,
        # sigmoid only): empty rays (acc ~ 0) composite a logit near 0,
        # i.e. sigmoid ~ 0.5, and an ungated threshold flips them to
        # "object" on noise sign alone. The acc gate is the reference's own
        # recipe from its mask_filter branch (`run_nerf.py:195`).
        p = 1.0 / (1.0 + np.exp(-np.asarray(maps["prob"])))
        m = (p * np.asarray(maps["acc"]) > threshold).astype(np.float32)
        if opening:
            m = post_opening(m).astype(np.float32)
        out.append(m)
    return np.stack(out)


def evaluate_masks(pred_masks, gt_masks):
    """Mean pixel accuracy and IoU over views (MVSeg's printed metrics)."""
    accs, ious = [], []
    for p, g in zip(pred_masks, gt_masks):
        if g.min() < 0:       # view without GT
            continue
        m = eval_metrics.mask_metrics(jnp.asarray(p), jnp.asarray(g))
        accs.append(float(m["accuracy"]))
        ious.append(float(m["iou"]))
    return {"accuracy": float(np.mean(accs)) if accs else float("nan"),
            "iou": float(np.mean(ious)) if ious else float("nan")}


def export_masks(trainer, out_subdir: str = "label", *, opening: bool = True,
                 dilate_iterations: int = 0):
    """Render masks for every scene view and write them into the dataset
    layout (`images_<f>/<out_subdir>/<name>.png`) — the product the
    downstream DS-NeRF stages consume as `label/`.
    """
    import cv2
    cfg = trainer.cfg
    scene_dir = Path(cfg.datadir)
    factor = cfg.factor
    img_dir = scene_dir / (f"images_{factor}" if factor and factor != 1
                           else "images")
    out_dir = img_dir / out_subdir
    out_dir.mkdir(parents=True, exist_ok=True)

    masks = render_masks(trainer, trainer.scene.poses, opening=opening)
    # MUST match the scene loader's file list exactly (cutout/pseudo
    # exclusions, pose-count truncation) or masks misalign to filenames
    from spinnerf_tpu.data.llff import _list_images
    names = [p.stem for p in _list_images(img_dir)][:len(masks)]
    if dilate_iterations > 0:
        from spinnerf_tpu.data.llff import dilate_mask
        masks = np.stack([dilate_mask(m, iterations=dilate_iterations)
                          for m in masks])
    for name, m in zip(names, masks):
        cv2.imwrite(str(out_dir / f"{name}.png"),
                    (np.clip(m, 0, 1) * 255).astype(np.uint8))
    return out_dir, masks


def render_object_removed(trainer, poses, *, bg_key=None,
                          render_factor: int = 0, threshold=None,
                          mask_filter: bool = False):
    """only_object render: delete the object, optionally compositing leftover
    transparency onto a random background (the MVSeg object-removal preview).

    mask_filter: white out every pixel the semantic head does NOT attribute
    to the object — `sigmoid(prob) * acc > 0.5` gates the render and the
    rest goes to 1.0 (`MVSeg/DS_NeRF/run_nerf.py:194-197`).
    """
    cfg = trainer.cfg
    coarse_fn, fine_fn = trainer.field_fns()
    rcfg = trainer.tcfg.render._replace(
        perturb=False, raw_noise_std=0.0, semantic=True, only_object=True,
        oo_threshold=threshold)
    renderer = eval_render.make_frame_renderer(
        trainer.scene.hwf, coarse_fn, rcfg, near=trainer.bank.near,
        far=trainer.bank.far, ndc=trainer.bank.ndc, chunk=cfg.chunk,
        fine_field_fn=fine_fn, render_factor=render_factor)
    rgbs = []
    for i, c2w in enumerate(poses):
        maps = renderer(jax.random.PRNGKey(i), jnp.asarray(c2w))
        rgb = maps["rgb"]
        if mask_filter:
            prob = 1.0 / (1.0 + np.exp(-np.asarray(maps["prob"])))
            m = (prob * np.asarray(maps["acc"]) > 0.5).astype(np.float32)
            rgb = rgb * m[..., None] + (1.0 - m[..., None])
        if bg_key is not None:
            bg = np.asarray(jax.random.uniform(
                jax.random.fold_in(bg_key, i), (3,)))
            rgb = rgb + (1.0 - maps["acc"][..., None]) * bg
        rgbs.append(rgb)
    return np.stack(rgbs)
