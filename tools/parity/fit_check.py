"""Stage-5 (inpainted-NeRF fit) dynamic parity: torch reference vs ours.

The paper's headline capability is the final fit (`DS_NeRF/run_nerf.py:
1454-1612`): MSE outside the mask, inpainted-RGB MSE inside (weights
detached), inpainted-disparity supervision, and the patch-LPIPS perceptual
term. This harness runs BOTH implementations on the SAME synthetic scene
with the SAME guidance products through the shared disk contract
(`images_<f>/{label,lama_images,depth}` — the synthetic scene's guidance is
analytic: `lama_images` is the exact object-removed render), with the SAME
perceptual metric: `export_lpips.py` dumps our seeded LPIPS weights and the
reference's `lpips` shim rebuilds the identical network in torch
(`SPINNERF_LPIPS_NPZ`), so `--lpips` optimizes the same function on both
sides.

Scored on the `--N_gt` object-removed GT test views (the paper's
quantitative protocol): per-view full and MASKED PSNR vs GT, plus
cross-render agreement between the two implementations, plus train
loss/PSNR trajectories.

Usage:
    python tools/parity/fit_check.py --workdir /root/parity_fit \
        [--iters 1000] [--skip-ref] [--skip-ours] [--report out.json]
"""
from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

from parity.dynamic_check import (OUR_PRINT, REF_PRINT, _imread,  # noqa: E402
                                  parse_traj, run_logged)

N_GT = 2

# stage-5 flag surface (`README.md:140` + `DS_NeRF/configs/config.txt`
# semantics at tiny-CPU scale), consumed verbatim by both CLIs
COMMON_FLAGS = [
    "--dataset_type", "llff", "--factor", "2",
    "--use_viewdirs",
    "--no_tcnn", "--no_ndc", "--lindisp", "--white_bkgd",
    "--colmap_depth", "--depth_loss", "--depth_lambda", "0.1",
    "--N_rand", "128", "--N_samples", "32", "--N_importance", "32",
    "--netdepth", "8", "--netwidth", "128",
    "--N_gt", str(N_GT),
    "--raw_noise_std", "0", "--lrate", "0.001", "--lrate_decay", "50",
    "--i_video", "1000000", "--i_weights", "1000000",
    "--render_factor", "1",
    # the perceptual term (`run_nerf.py:1523-1561`): 2 random train views
    # per iter, matched metric via the shim. patch_len_factor 2 (not the
    # full-scale default 4): the toy scene's 40x50 frames need >= 16-pixel
    # patches to survive VGG16's four pools — 10x12 pools to 0x0 in BOTH
    # implementations
    "--lpips", "--lpips_batch_size", "2",
    "--lpips_render_factor", "1", "--patch_len_factor", "2",
]


def make_scene(scene_dir: Path):
    if (scene_dir / "poses_bounds.npy").exists():
        return
    from spinnerf_tpu.data import synthetic
    # first N_GT views are object-removed GT (test set); all views carry
    # label masks; lama_images/depth are the analytic guidance
    synthetic.make_scene(scene_dir, n_views=10, h=80, w=100, factor=2,
                         seed=0, n_gt=N_GT)


def run_reference(ws: Path, iters: int) -> float:
    run_dir = ws / "ref_run"
    run_dir.mkdir(parents=True, exist_ok=True)
    env = dict(os.environ, SPINNERF_LPIPS_NPZ=str(ws / "lpips_shared.npz"))
    cmd = [sys.executable, str(REPO / "tools/parity/run_reference_train.py"),
           "--expname", "fitparity", "--basedir", str(run_dir / "logs"),
           "--datadir", str(ws / "scene"),
           "--N_iters", str(iters), "--i_print", "20",
           "--i_testset", str(iters), "--i_feat", str(iters),
           *COMMON_FLAGS]
    return run_logged(cmd, run_dir, ws / "ref.log", env=env)


def run_ours(ws: Path, iters: int, on_tpu: bool = False) -> float:
    run_dir = ws / "ours_run"
    run_dir.mkdir(parents=True, exist_ok=True)
    env = dict(os.environ,
               PYTHONPATH=str(REPO) + ":" + os.environ.get("PYTHONPATH", ""))
    if not on_tpu:
        env.update(JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    cmd = [sys.executable, "-m", "spinnerf_tpu.cli", "train",
           "--expname", "fitparity", "--basedir", str(run_dir / "logs"),
           "--datadir", str(ws / "scene"),
           "--N_iters", str(iters), "--i_print", "20",
           "--i_testset", str(iters), "--i_feat", str(iters),
           "--no_reload", "--fused_mlp", "False",
           *COMMON_FLAGS]
    return run_logged(cmd, run_dir, ws / "ours.log", env=env)


def _mask_psnr(a, b, m):
    err = (a - b) ** 2
    mm = np.broadcast_to(m[..., None], err.shape)
    mse = float((err * mm).sum() / max(mm.sum(), 1))
    return float(-10.0 * np.log10(max(mse, 1e-12)))


def compare(ws: Path, iters: int) -> dict:
    report: dict = {}
    ref_traj = parse_traj(ws / "ref.log", REF_PRINT)
    our_traj = parse_traj(ws / "ours.log", OUR_PRINT)
    report["ref_final"] = {"iter": ref_traj[-1][0], "loss": ref_traj[-1][1],
                           "psnr": ref_traj[-1][2]}
    report["ours_final"] = {"iter": our_traj[-1][0], "loss": our_traj[-1][1],
                            "psnr": our_traj[-1][2]}
    tail_ref = [p for i, _, p in ref_traj if i >= iters // 2]
    tail_our = [p for i, _, p in our_traj if i >= iters // 2]
    report["train_psnr_tail_mean"] = {
        "ref": float(np.mean(tail_ref)), "ours": float(np.mean(tail_our)),
        "abs_diff": float(abs(np.mean(tail_ref) - np.mean(tail_our)))}

    # N_gt protocol: test views are the first N_GT (object-removed GT)
    ref_dir = ws / "ref_run/logs/fitparity" / f"testset_{iters:06d}"
    our_dir = ws / "ours_run/logs/fitparity" / f"testset_{iters:06d}"
    gt_dir = ws / "scene/images_2"
    names = sorted(gt_dir.glob("view*.png"))
    import cv2
    rows = []
    for k in range(N_GT):
        ref_img = _imread(ref_dir / "rgb" / f"{k:06d}.png")
        our_img = _imread(our_dir / "rgb" / f"{k:06d}.png")
        gt = _imread(names[k])
        m = cv2.imread(str(gt_dir / "label" / f"{names[k].stem}.png"),
                       cv2.IMREAD_GRAYSCALE)
        m = (m > 127).astype(np.float32)
        rows.append({
            "view": k,
            "psnr_ref_vs_ours": _psnr(ref_img, our_img),
            "psnr_ref_vs_gt": _psnr(ref_img, gt),
            "psnr_ours_vs_gt": _psnr(our_img, gt),
            "masked_psnr_ref_vs_gt": _mask_psnr(ref_img, gt, m),
            "masked_psnr_ours_vs_gt": _mask_psnr(our_img, gt, m),
            "masked_psnr_ref_vs_ours": _mask_psnr(ref_img, our_img, m),
        })
    report["testset"] = rows
    return report


def _psnr(a, b):
    mse = float(np.mean((a - b) ** 2))
    return float(-10.0 * np.log10(max(mse, 1e-12)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/root/parity_fit")
    ap.add_argument("--iters", type=int, default=1000)
    ap.add_argument("--skip-ref", action="store_true")
    ap.add_argument("--skip-ours", action="store_true")
    ap.add_argument("--ours-tpu", action="store_true",
                    help="run the ours side on the TPU in its production "
                    "bf16 configuration (the §2 3000-iter protocol) instead "
                    "of CPU f32 — the claim is end-state equivalence, and "
                    "this also folds the bf16-vs-f32 gap into the measured "
                    "diff (below seed noise in the §2 run)")
    ap.add_argument("--compare-only", action="store_true")
    ap.add_argument("--report", default=None)
    args = ap.parse_args()

    ws = Path(args.workdir)
    ws.mkdir(parents=True, exist_ok=True)
    make_scene(ws / "scene")
    if not (ws / "lpips_shared.npz").exists():
        from parity.export_lpips import export
        export(str(ws / "lpips_shared.npz"))

    times = {}
    if not args.compare_only:
        if not args.skip_ref:
            times["ref_wall_s"] = run_reference(ws, args.iters)
        if not args.skip_ours:
            times["ours_wall_s"] = run_ours(ws, args.iters,
                                            on_tpu=args.ours_tpu)

    report = compare(ws, args.iters)
    report.update(times)
    text = json.dumps(report, indent=2)
    print(text)
    if args.report:
        Path(args.report).write_text(text)


if __name__ == "__main__":
    main()
