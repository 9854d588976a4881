"""End-to-end SPIn-NeRF pipeline orchestration.

The reference is three separately-launched programs glued by shell commands
and directory copies (`README.md:57-141`):

  1. `imgs2poses.py`                       -> poses_bounds.npy (+ COLMAP)
  2. MVSeg NeRF                            -> view-consistent masks
  3. DS-NeRF `--prepare`                   -> disparities into lama/LaMa_test_images
  4. LaMa on disparities                   -> images_<f>/depth/
  5. LaMa on RGB + masks                   -> images_<f>/lama_images/
  6. DS-NeRF fit (`--lpips`)               -> inpainted NeRF
  7. eval                                  -> PSNR/SSIM/LPIPS

This module replaces the rm/cp choreography with deterministic functions over
the same on-disk layout, so a scene directory produced/consumed here is
bit-compatible with the reference dataset contract.
"""
from __future__ import annotations

import shutil
from dataclasses import replace as dc_replace
from pathlib import Path

import numpy as np

from spinnerf_tpu.config import Config


def _images_dir(cfg: Config) -> Path:
    f = cfg.factor
    return Path(cfg.datadir) / (f"images_{f}" if f and f != 1 else "images")


def stage_mvseg(cfg: Config, *, n_iters=None, log=print):
    """Stage 2: lift sparse masks to every view (writes `label/`)."""
    from spinnerf_tpu.pipeline import mvseg as mvseg_lib
    from spinnerf_tpu.train.loop import Trainer
    # i_feat=0: the periodic prepare/sanity render dumps belong to the fit
    # stage (`README.md:140` i_feat=200); MVSeg's product is `export_masks`
    # below — a leaked fit-stage i_feat would render every view's full-res
    # disparity dozens of times inside this stage's wall-clock.
    mv_cfg = dc_replace(cfg, mvseg=True, expname=cfg.expname + "_mvseg",
                        prepare=True, lpips=False, i_feat=0)
    tr = Trainer(mv_cfg, log=log)
    tr.fit(n_iters=n_iters)
    out_dir, masks = mvseg_lib.export_masks(tr, out_subdir="label",
                                            opening=cfg.post_opening)
    log(f"[mvseg] wrote {len(masks)} masks to {out_dir}")
    return out_dir


def stage_prepare(cfg: Config, *, n_iters=None, log=print):
    """Stage 3: fit the depth NeRF on original images and dump per-view
    disparities + downsampled masks (LaMa guidance inputs)."""
    from spinnerf_tpu.train.loop import Trainer
    # i_feat=0 disables in-loop dumps; the single end-of-training dump below
    # reproduces the reference's `i_feat=4000` over `N_iters=4001`
    # (`README.md:65`: exactly one guidance dump, at the end).
    prep_cfg = dc_replace(cfg, prepare=True, lpips=False,
                          expname=cfg.expname + "_prepare", N_gt=0, i_feat=0)
    tr = Trainer(prep_cfg, log=log)
    tr.fit(n_iters=n_iters)
    out = tr._prepare_hook(tr.state.step)
    log(f"[prepare] guidance inputs at {out}")
    return out


def stage_inpaint_guidance(cfg: Config, lama_in: Path, *,
                           checkpoint_path=None, refine: bool = True,
                           log=print):
    """Stages 4+5: LaMa-inpaint the disparities into `images_<f>/depth/` and
    the RGB images into `images_<f>/lama_images/`."""
    import cv2
    from spinnerf_tpu.pipeline import inpaint2d
    img_dir = _images_dir(cfg)

    # image-name mapping: guidance files img{i:03}.png follow sorted order
    names = sorted(p.name for p in img_dir.iterdir()
                   if p.suffix.lower() in (".png", ".jpg", ".jpeg"))

    # one generator + compiled graphs shared by the disparity and RGB passes
    gen, variables = inpaint2d.load_generator(checkpoint_path)
    inpainter = inpaint2d.Inpainter(gen, variables)

    # disparities -> depth/
    disp_out = inpaint2d.inpaint_directory(
        lama_in, Path(cfg.basedir) / cfg.expname / "lama_disp_out",
        refine=refine, inpainter=inpainter)
    depth_dir = img_dir / "depth"
    depth_dir.mkdir(exist_ok=True)
    for i, name in enumerate(names):
        src = disp_out / f"img{i:03d}.png"
        if src.exists():
            shutil.copy(src, depth_dir / (Path(name).stem + ".png"))
    log(f"[inpaint] disparities -> {depth_dir}")

    # RGB -> lama_images/
    rgb_in = Path(cfg.basedir) / cfg.expname / "lama_rgb_in"
    (rgb_in / "label").mkdir(parents=True, exist_ok=True)
    label_dir = img_dir / "label"
    for i, name in enumerate(names):
        shutil.copy(img_dir / name, rgb_in / f"img{i:03d}.png")
        m = cv2.imread(str(label_dir / (Path(name).stem + ".png")),
                       cv2.IMREAD_GRAYSCALE)
        cv2.imwrite(str(rgb_in / "label" / f"img{i:03d}.png"), m)
    rgb_out = inpaint2d.inpaint_directory(
        rgb_in, Path(cfg.basedir) / cfg.expname / "lama_rgb_out",
        refine=refine, inpainter=inpainter)
    lama_dir = img_dir / "lama_images"
    lama_dir.mkdir(exist_ok=True)
    for i, name in enumerate(names):
        src = rgb_out / f"img{i:03d}.png"
        if src.exists():
            shutil.copy(src, lama_dir / (Path(name).stem + ".png"))
    log(f"[inpaint] RGB -> {lama_dir}")
    return depth_dir, lama_dir


def stage_fit(cfg: Config, *, n_iters=None, log=print):
    """Stage 6: the inpainted-NeRF optimization (masked MSE + LPIPS + the
    disparity prior)."""
    from spinnerf_tpu.train.loop import Trainer
    fit_cfg = dc_replace(cfg, prepare=False, lpips=True,
                         expname=cfg.expname + "_fit")
    tr = Trainer(fit_cfg, log=log)
    tr.fit(n_iters=n_iters)
    return tr


def stage_eval(cfg: Config, trainer, *, log=print):
    """Stage 7: PSNR + SSIM + LPIPS of test-view renders vs GT (the paper's
    protocol, `DS_NeRF/eval_metrics_script.py:26-33`: full-image metrics,
    plus masked PSNR/SSIM/LPIPS where a hole mask exists — the paper's
    inpainting tables score the masked region). LPIPS is numerically real
    only when VGG16/lin weights are dropped in (`spinnerf_tpu/weights.py`);
    otherwise the key is `lpips_random_vgg`.

    Mask source: `scene.masks_gt` (the exact GT hole masks, e.g.
    `label_full/`) when loaded — MVSeg's `export_masks` overwrites `label/`
    with estimated, dilated masks, which must not define the scored region
    for GT test views — else the `label/` masks."""
    import jax.numpy as jnp
    from spinnerf_tpu.eval import metrics
    if len(trainer.i_test) == 0:
        log("[eval] no test views")
        return {}
    from spinnerf_tpu.models.lpips import load_lpips_labeled
    lpips_fn, lpips_key = load_lpips_labeled()
    eval_masks = (trainer.scene.masks_gt if trainer.scene.masks_gt is not None
                  else trainer.scene.masks)
    rgbs, _ = trainer.render_poses_list(trainer.scene.poses[trainer.i_test])
    rows = []
    for r, t in zip(rgbs, trainer.i_test):
        gt = jnp.asarray(trainer.scene.images[t])
        pred = jnp.asarray(r)
        row = {"psnr": float(metrics.psnr(pred, gt)),
               "ssim": float(metrics.ssim(pred, gt)),
               lpips_key: float(lpips_fn(pred, gt))}
        if eval_masks is not None:
            m = jnp.asarray((np.abs(eval_masks[t]) > 0.5)
                            .astype(np.float32))
            if float(m.sum()) > 0:  # views without a hole have no masked row
                row["masked_psnr"] = float(metrics.psnr(pred, gt, m))
                row["masked_ssim"] = float(metrics.ssim(pred, gt, mask=m))
                # masked LPIPS: composite GT outside the hole so only the
                # inpainted region contributes perceptual difference (static
                # shapes — no per-view bbox recompiles)
                comp = pred * m[..., None] + gt * (1.0 - m[..., None])
                row["masked_" + lpips_key] = float(lpips_fn(comp, gt))
        rows.append(row)
    summary = {k: float(np.mean([r[k] for r in rows if k in r]))
               for k in set().union(*rows)}
    log(f"[eval] {summary}")
    return {"per_view": rows, "summary": summary}


def run_pipeline(cfg: Config, *, mvseg_iters=None, prepare_iters=None,
                 fit_iters=None, lama_checkpoint=None, refine=True,
                 skip_mvseg=False, guidance_hook=None, log=print):
    """Run the full scene pipeline. Returns the final fit Trainer + metrics.

    `guidance_hook`: optional callable() invoked between the inpaint stage
    and the fit — e.g. `tools/full_run.py --analytic-guidance` substitutes
    a synthetic scene's analytic object-removed renders when no trained
    LaMa checkpoint exists in the environment.

    `pipeline_results.json` additionally records per-stage wall-clock
    seconds under `stage_seconds` (the reference's three separately-launched
    programs have no such end-to-end accounting)."""
    import json
    import time
    timings: dict[str, float] = {}

    def _timed(name, fn, *a, **kw):
        t0 = time.perf_counter()
        out = fn(*a, **kw)
        timings[name] = round(time.perf_counter() - t0, 2)
        log(f"[pipeline] stage {name}: {timings[name]:.1f}s")
        return out

    if not skip_mvseg:
        _timed("mvseg", stage_mvseg, cfg, n_iters=mvseg_iters, log=log)
    lama_in = _timed("prepare", stage_prepare, cfg,
                     n_iters=prepare_iters, log=log)
    _timed("inpaint_guidance", stage_inpaint_guidance, cfg, lama_in,
           checkpoint_path=lama_checkpoint, refine=refine, log=log)
    if guidance_hook is not None:
        guidance_hook()
    trainer = _timed("fit", stage_fit, cfg, n_iters=fit_iters, log=log)
    results = _timed("eval", stage_eval, cfg, trainer, log=log)
    results["stage_seconds"] = timings
    out = Path(cfg.basedir) / cfg.expname / "pipeline_results.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    return trainer, results
