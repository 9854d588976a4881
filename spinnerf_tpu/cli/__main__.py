"""Command-line entry: `python -m spinnerf_tpu.cli <command> [flags]`.

Commands mirror the reference's separately-launched programs (SURVEY §0):
  train    DS-NeRF training / --prepare pass (`DS_NeRF/run_nerf.py`)
  render   render-only modes (`--render_only` equivalents)
  eval     PSNR/SSIM/LPIPS over two image dirs (`eval_metrics_script.py`)
  poses    COLMAP -> poses_bounds.npy export (`imgs2poses.py`)
  synth    generate the synthetic test scene

All accept `--config <file>` with the reference's config.txt syntax.
"""
from __future__ import annotations

import sys


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return 0
    cmd, rest = argv[0], argv[1:]

    if cmd == "train":
        from spinnerf_tpu.config import load_config
        from spinnerf_tpu.train.loop import Trainer
        cfg = load_config(rest)
        tr = Trainer(cfg)
        tr.fit()
        return 0

    if cmd == "render":
        from spinnerf_tpu.config import load_config
        from spinnerf_tpu.train.loop import Trainer
        cfg = load_config(rest)
        cfg.no_reload = False
        tr = Trainer(cfg)
        start = tr.state.step
        if cfg.render_test_ray:
            # sigma-vs-depth visualization along the first train view's
            # sparse-depth rays (`run_nerf.py:1190-1207`)
            import jax
            import jax.numpy as jnp
            import numpy as np
            from spinnerf_tpu.core import rendering, sampling
            from spinnerf_tpu.data import raybank as rb
            from spinnerf_tpu.utils.visualization import visualize_sigma
            out = tr.exp_dir / f"renderonly_ray_{start:06d}"
            out.mkdir(parents=True, exist_ok=True)
            batch = rb.sample_depth_group(jax.random.PRNGKey(0), tr.bank, 64)
            coarse_fn, fine_fn = tr.field_fns()
            rcfg = tr.tcfg.render._replace(perturb=False, raw_noise_std=0.0)
            z = sampling.stratified_z_vals(jax.random.PRNGKey(0),
                                           batch["near"], batch["far"],
                                           rcfg.n_samples, perturb=False,
                                           lindisp=rcfg.lindisp)
            pts = sampling.ray_points(batch["origins"], batch["directions"], z)
            raw = fine_fn(pts, batch["viewdirs"])
            sigma = jax.nn.relu(raw[..., 3])
            visualize_sigma(np.asarray(sigma[0]), np.asarray(z[0]),
                            out / "rays.png")
            res = rendering.render_rays(jax.random.PRNGKey(0), batch,
                                        coarse_fn, rcfg, fine_field_fn=fine_fn)
            print("colmap depth:", float(batch["depths"][0]))
            print("estimated depth:", float(res.fine.depth[0]))
            print(f"sigma plot written to {out}/rays.png")
            return 0
        if cfg.render_test:
            poses, name = tr.scene.poses[tr.i_test], "test"
            gt = tr.scene.images[tr.i_test]
        elif cfg.render_train:
            poses, name = tr.scene.poses[tr.i_train], "train"
            gt = tr.scene.images[tr.i_train]
        else:
            poses, name, gt = tr.scene.render_poses, "path", None
        out = tr.exp_dir / f"renderonly_{name}_{start:06d}"
        rgbs, disps = tr.render_poses_list(poses, save_dir=out, gt_images=gt,
                                           save_alpha=True)
        from spinnerf_tpu.eval import render as eval_render
        eval_render.write_video(out / "rgb.mp4", rgbs)
        eval_render.write_video(out / "disp.mp4",
                                eval_render.normalize_disps_for_video(disps))
        print(f"wrote {len(rgbs)} frames to {out}")
        return 0

    if cmd == "mvseg":
        from spinnerf_tpu.config import load_config
        from spinnerf_tpu.pipeline import mvseg as mvseg_lib
        from spinnerf_tpu.train.loop import Trainer
        cfg = load_config(rest)
        cfg.mvseg = True
        tr = Trainer(cfg)
        tr.fit()
        out_dir, masks = mvseg_lib.export_masks(
            tr, out_subdir="label", opening=cfg.post_opening)
        print(f"wrote {len(masks)} lifted masks to {out_dir}")
        if tr.scene.masks_gt is not None:
            m = mvseg_lib.evaluate_masks(masks, tr.scene.masks_gt)
            print(f"mask accuracy {m['accuracy']:.4f} IoU {m['iou']:.4f}")
        return 0

    if cmd == "inpaint":
        import argparse
        ap = argparse.ArgumentParser("spinnerf inpaint")
        ap.add_argument("--indir", required=True)
        ap.add_argument("--outdir", required=True)
        ap.add_argument("--model_path", default=None,
                        help="big-lama torch checkpoint to convert")
        ap.add_argument("--refine", action="store_true")
        a = ap.parse_args(rest)
        from spinnerf_tpu.pipeline import inpaint2d
        out = inpaint2d.inpaint_directory(a.indir, a.outdir,
                                          checkpoint_path=a.model_path,
                                          refine=a.refine)
        print(f"inpainted images written to {out}")
        return 0

    if cmd == "pipeline":
        from spinnerf_tpu.config import load_config
        from spinnerf_tpu.pipeline.stages import run_pipeline
        cfg = load_config(rest)
        _, results = run_pipeline(cfg)
        print(results.get("summary", {}))
        return 0

    if cmd == "refine_masks":
        import argparse
        ap = argparse.ArgumentParser("spinnerf refine_masks")
        ap.add_argument("--render_dir", required=True,
                        help="render_path dump dir (rgb/z/alpha/pose/...)")
        ap.add_argument("--mask_dir", required=True)
        ap.add_argument("--out_dir", required=True)
        ap.add_argument("--distance_thresh", type=float, default=0.01)
        ap.add_argument("--alpha_thresh", type=float, default=0.1)
        ap.add_argument("--dilate_iters", type=int, default=5)
        a = ap.parse_args(rest)
        import cv2
        import numpy as np
        from pathlib import Path
        from spinnerf_tpu.data.llff import dilate_mask
        from spinnerf_tpu.pipeline import mask_refine
        mask_files = sorted(Path(a.mask_dir).glob("*.png"))
        masks = []
        for f in mask_files:
            m = cv2.imread(str(f), cv2.IMREAD_GRAYSCALE).astype(np.float32)
            m = (m / max(m.max(), 1) > 0.5).astype(np.float32)
            if a.dilate_iters:
                m = dilate_mask(m, iterations=a.dilate_iters)
            masks.append(m)
        dumps = mask_refine.load_view_dumps(a.render_dir, masks)
        intr = np.loadtxt(Path(a.render_dir) / "intrinsics.txt")
        mask_refine.refine_all(dumps, focal=intr[0, 0], cx=intr[0, 2],
                               cy=intr[1, 2],
                               alpha_thresh=a.alpha_thresh,
                               distance_thresh=a.distance_thresh,
                               out_dir=a.out_dir,
                               names=[f.name for f in mask_files])
        print(f"refined masks written to {a.out_dir}")
        return 0

    if cmd == "eval":
        from spinnerf_tpu.eval.cli import eval_dirs
        return eval_dirs(rest)

    if cmd == "poses":
        from spinnerf_tpu.pipeline.poses import gen_poses
        match = rest[1] if len(rest) > 1 else "exhaustive_matcher"
        gen_poses(rest[0], match_type=match)
        print(f"poses_bounds.npy written for {rest[0]}")
        return 0

    if cmd == "gen_masks":
        # synthesize an inpainting eval dataset: for each image, write
        # `<name>_crop000.png` + `<name>_crop000_maskNNN.png` pairs (the LaMa
        # eval-dataset convention; parity: `lama/bin/gen_mask_dataset.py`)
        import argparse
        ap = argparse.ArgumentParser("spinnerf gen_masks")
        ap.add_argument("--indir", required=True)
        ap.add_argument("--outdir", required=True)
        ap.add_argument("--n_masks", type=int, default=1,
                        help="mask variants per image")
        ap.add_argument("--kind", default="mixed",
                        choices=["mixed", "irregular", "rectangle",
                                 "outpainting", "dumb"])
        ap.add_argument("--seed", type=int, default=0)
        a = ap.parse_args(rest)
        import cv2
        import numpy as np
        from pathlib import Path
        from spinnerf_tpu.data import lama_masks
        gen = {"mixed": lama_masks.MixedMaskGenerator(),
               "irregular": lambda h, w, rng: lama_masks.irregular_mask(
                   h, w, rng),
               "rectangle": lambda h, w, rng: lama_masks.rectangle_mask(
                   h, w, rng),
               "outpainting": lambda h, w, rng: lama_masks.outpainting_mask(
                   h, w, rng),
               "dumb": lambda h, w, rng: lama_masks.dumb_area_mask(
                   h, w, rng)}[a.kind]
        indir, outdir = Path(a.indir), Path(a.outdir)
        outdir.mkdir(parents=True, exist_ok=True)
        rng = np.random.RandomState(a.seed)
        n_pairs = 0
        for p in sorted(indir.iterdir()):
            if p.suffix.lower() not in (".png", ".jpg", ".jpeg"):
                continue
            img = cv2.imread(str(p))
            h, w = img.shape[:2]
            stem = f"{p.stem}_crop000"
            cv2.imwrite(str(outdir / f"{stem}.png"), img)
            for k in range(a.n_masks):
                m = np.asarray(gen(h, w, rng)).reshape(h, w)
                cv2.imwrite(str(outdir / f"{stem}_mask{k:03d}.png"),
                            (m * 255).astype(np.uint8))
                n_pairs += 1
        print(f"wrote {n_pairs} image/mask pairs to {outdir}")
        return 0

    if cmd == "synth":
        from spinnerf_tpu.data import synthetic
        out = synthetic.make_scene(rest[0])
        print(f"synthetic scene written to {out}")
        return 0

    print(f"unknown command: {cmd}", file=sys.stderr)
    return 2


if __name__ == "__main__":
    sys.exit(main())
