"""Realistic-scale full-pipeline run (reference schedules, per-stage timing).

Generates a statue-demo-scale synthetic scene — 100 views (40 object-removed
GT test views first + 60 training views, the paper's quantitative protocol,
`README.md:27-31`) at full-res 2016x1134, trained at factor 2 (1008x567, the
statue demo's resolution class) — and runs all 7 pipeline stages under the
reference's published budgets:

  MVSeg    N_iters=4000             (`MVSeg/DS_NeRF/configs/mv_config.txt`)
  prepare  N_iters=4001, i_feat=4000 (`README.md:65`)
  LaMa     refine=True              (`README.md:80`)
  fit      N_iters=10001, --lpips, i_feat=200 (`README.md:140`)
  eval     PSNR/SSIM/LPIPS + masked PSNR (`DS_NeRF/eval_metrics_script.py`)

Writes FULLRUN.json at the repo root with per-stage wall-clock and final
metrics. Flags:

  --model {mlp,hashgrid}  field family: the fused-Pallas MLP flagship
                          (reference `--no_tcnn` path) or the hash-grid at
                          the reference default 2^19 table.
  --iters-scale S         divide every stage budget by S (smoke runs).
  --views N --gt N        override view counts.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

# runnable as `python tools/full_run.py` from anywhere: sys.path[0] is
# tools/, not the repo root
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=("mlp", "hashgrid"), default="mlp")
    ap.add_argument("--iters-scale", type=float, default=1.0)
    ap.add_argument("--views", type=int, default=100)
    ap.add_argument("--gt", type=int, default=40)
    ap.add_argument("--h", type=int, default=1134)
    ap.add_argument("--w", type=int, default=2016)
    ap.add_argument("--factor", type=int, default=2)
    ap.add_argument("--workdir", default="/tmp/spinnerf_fullrun")
    ap.add_argument("--out", default="FULLRUN.json")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny model + no LaMa refine (driver plumbing test)")
    ap.add_argument("--analytic-guidance", default=None, action="store_true",
                    help="after TIMING the LaMa stage (real FFC graphs), "
                    "substitute the synthetic scene's analytic object-removed "
                    "renders as the fit guidance. Default: on when no "
                    "big-lama checkpoint is registered (random-weight LaMa "
                    "guidance would make the fit/eval metrics measure the "
                    "missing checkpoint, not the pipeline); off when real "
                    "weights exist (SPINNERF_WEIGHTS_DIR)")
    ap.add_argument("--skip-mvseg", action="store_true",
                    help="reuse label/ masks already exported by a previous "
                    "(possibly interrupted) run on the same scene dir")
    ap.add_argument("--mvseg-seconds", type=float, default=None,
                    help="with --skip-mvseg: record this measured mvseg "
                    "wall-clock (from the interrupted run's log) in "
                    "stage_seconds instead of omitting the stage")
    args = ap.parse_args(argv)

    from spinnerf_tpu.config import Config
    from spinnerf_tpu.data import synthetic
    from spinnerf_tpu.pipeline import stages

    if args.analytic_guidance is None:
        from spinnerf_tpu import weights as wreg
        args.analytic_guidance = wreg.find("big_lama") is None

    if args.gt <= 0:
        # stage_eval needs test views; otherwise hours of stages end in an
        # empty report
        raise SystemExit("--gt must be >= 1 (object-removed GT test views)")

    work = Path(args.workdir)
    t0 = time.perf_counter()
    scene_dir = work / "scene"
    # resume marker: stamp the generation params and only reuse a scene whose
    # LAST artifact (sparse/0/points3D.bin, written after poses_bounds.npy)
    # exists and whose params match — an interrupted or differently-sized
    # generation is regenerated, not silently reused
    gen_params = {"views": args.views, "gt": args.gt, "h": args.h,
                  "w": args.w, "factor": args.factor,
                  "analytic": bool(args.analytic_guidance)}
    marker = scene_dir / "fullrun_scene.json"
    complete = (marker.exists()
                and (scene_dir / "sparse/0/points3D.bin").exists()
                and json.loads(marker.read_text()) == gen_params)
    if not complete:
        import shutil
        if scene_dir.exists():
            shutil.rmtree(scene_dir)
        print(f"[fullrun] generating {args.views}-view scene "
              f"({args.h}x{args.w}, factor {args.factor})", flush=True)
        # sparse initial masks on 6 of the 60 training views (MVSeg lifts
        # the rest); first --gt views are object-removed GT.
        train0 = args.gt
        mask_views = list(range(train0, args.views,
                                max(1, (args.views - train0) // 6)))
        synthetic.make_scene(
            scene_dir, n_views=args.views, h=args.h, w=args.w,
            factor=args.factor, n_gt=args.gt, n_points=3000,
            mask_views=mask_views, gt_mask_subdir="label_full")
        # the pipeline must recreate the guidance products itself; keep the
        # analytic object-removed renders aside for --analytic-guidance
        fdir = scene_dir / (f"images_{args.factor}"
                            if args.factor != 1 else "images")
        if args.analytic_guidance:
            keep = scene_dir / "analytic_guidance"
            keep.mkdir(exist_ok=True)
            shutil.move(str(fdir / "lama_images"), keep / "lama_images")
            shutil.move(str(fdir / "depth"), keep / "depth")
        else:
            shutil.rmtree(fdir / "lama_images")
            shutil.rmtree(fdir / "depth")
        marker.write_text(json.dumps(gen_params))
    gen_s = round(time.perf_counter() - t0, 1)
    print(f"[fullrun] scene ready in {gen_s}s", flush=True)

    s = args.iters_scale
    cfg = Config(
        # DS_NeRF/configs/config.txt verbatim (statue demo: factor 2)
        expname="fullrun", basedir=str(work / "logs"),
        datadir=str(scene_dir), dataset_type="llff",
        N_gt=args.gt, factor=args.factor,
        N_rand=1024, N_samples=64, N_importance=64,
        use_viewdirs=True, raw_noise_std=1.0,
        colmap_depth=True, depth_loss=True, depth_lambda=0.1,
        no_ndc=True, lindisp=True, render_factor=1,
        i_feat=200, feat_weight=0.1,
        # the scene config's lrate 0.03 / decay 10 is the TCNN operating
        # point (`DS_NeRF/configs/config.txt` with the tcnn default model);
        # the 8x256 MLP (`--no_tcnn`) diverges at 0.03 at statue scale
        # (measured: prepare stuck at 5.6 dB) — its reference operating
        # point is the argparse default 5e-4 / 250 (`run_nerf.py:769-771`)
        lrate=(0.03 if args.model == "hashgrid" else 5e-4),
        lrate_decay=(10 if args.model == "hashgrid" else 250),
        white_bkgd=True,
        # score masked metrics against the exact GT hole masks — MVSeg's
        # export overwrites label/ with estimated dilated masks
        masks_gt_subdir="label_full",
        # stage-command flags (README.md:65,140): no checkpoint/video dumps
        i_weights=0, i_video=0, i_testset=0, i_print=500,
        no_tcnn=(args.model == "mlp"),
        lpips_batch_size=4,
    )
    if args.smoke:
        from dataclasses import replace as dc_replace
        cfg = dc_replace(cfg, netdepth=2, netwidth=32, netdepth_fine=2,
                         netwidth_fine=32, multires=4, multires_views=2,
                         N_samples=8, N_importance=4, N_rand=64, chunk=2048,
                         lpips_render_factor=2, patch_len_factor=2,
                         lpips_batch_size=1, compute_dtype="float32")
    if args.skip_mvseg:
        label_dir = (scene_dir / (f"images_{args.factor}"
                                  if args.factor != 1 else "images")
                     / "label")
        n_labels = len(list(label_dir.glob("*.png"))) if label_dir.exists() \
            else 0
        if n_labels < args.views:
            raise SystemExit(f"--skip-mvseg: only {n_labels}/{args.views} "
                             f"masks under {label_dir}")
    guidance_hook = None
    if args.analytic_guidance:
        fdir = scene_dir / (f"images_{args.factor}"
                            if args.factor != 1 else "images")

        def guidance_hook():
            # LaMa stage TIMED above with the real FFC graphs; its outputs
            # came from an untrained generator (no big-lama ckpt in this
            # environment), so the fit would measure the missing weights,
            # not the pipeline. Substitute the scene's analytic
            # object-removed renders (bit-exact guidance).
            import shutil as sh
            src = scene_dir / "analytic_guidance"
            for d in ("lama_images", "depth"):
                sh.rmtree(fdir / d, ignore_errors=True)
                sh.copytree(src / d, fdir / d)
            print("[fullrun] guidance replaced by the analytic "
                  "object-removed renders (--analytic-guidance)", flush=True)

    trainer, results = stages.run_pipeline(
        cfg,
        mvseg_iters=max(2, int(4000 / s)),
        prepare_iters=max(2, int(4001 / s)),
        fit_iters=max(2, int(10001 / s)),
        refine=not args.smoke,
        skip_mvseg=args.skip_mvseg,
        guidance_hook=guidance_hook)
    if args.skip_mvseg and args.mvseg_seconds is not None:
        # keep stage_seconds float-only (consumers sum/plot it); the
        # provenance note rides at the top level
        results["stage_seconds"]["mvseg"] = args.mvseg_seconds
        results["mvseg_timing_note"] = (
            "measured by a previous interrupted run on this scene "
            "(masks reused)")

    results["config"] = {
        "model": args.model, "views": args.views, "n_gt": args.gt,
        "analytic_guidance": bool(args.analytic_guidance),
        "train_res": [args.h // args.factor, args.w // args.factor],
        "iters": {"mvseg": max(2, int(4000 / s)),
                  "prepare": max(2, int(4001 / s)),
                  "fit": max(2, int(10001 / s))},
        "scene_gen_seconds": gen_s,
        "device": str(__import__("jax").devices()[0].device_kind),
    }
    results.pop("per_view", None)
    Path(args.out).write_text(json.dumps(results, indent=2))
    print(json.dumps({k: results[k] for k in
                      ("summary", "stage_seconds", "config")
                      if k in results}, indent=2))


if __name__ == "__main__":
    sys.exit(main())
