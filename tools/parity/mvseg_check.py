"""MVSeg dynamic parity: the ACTUAL torch MVSeg fork vs our semantic mode.

Runs `MVSeg/DS_NeRF/run_nerf.py train()` (CPU torch, unmodified reference via
refenv shims — clip/tinycudann/etc.) and `spinnerf_tpu.cli mvseg` on the SAME
synthetic scene: sparse object masks on a subset of training views
(`label_mv_bootstrapped`, the bootstrap setting) with exact GT silhouettes
for every view (`label_full`). Compares, on the held-out views:

  * IoU(reference prob-map mask, GT) — from the reference's own testset
    `prob/` dumps (`MVSeg run_nerf.py:1437-1445` -> `render_path` savedir);
  * IoU(our lifted mask, GT) — from `mvseg export_masks`;
  * IoU(reference mask, our mask) — cross-implementation agreement.

Different RNGs => the claim is agreement of the lifted segmentation, not
step equality.

Usage:
    python tools/parity/mvseg_check.py --workdir /root/parity_mvseg \
        [--iters 400] [--skip-ref] [--skip-ours] [--report out.json]
"""
from __future__ import annotations

import argparse
import json
import shutil
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[2]

# Shared trainer scale (mirrors dynamic_check.py's tiny-CPU stage config);
# MVSeg's parser has no --prepare/--i_feat/--lpips, and adds --clf_weight.
COMMON_FLAGS = [
    "--dataset_type", "llff", "--factor", "2",
    "--no_tcnn", "--no_ndc", "--lindisp", "--white_bkgd",
    "--N_rand", "128", "--N_samples", "32", "--N_importance", "32",
    "--netdepth", "8", "--netwidth", "128",
    "--llffhold", "5", "--raw_noise_std", "0",
    "--lrate", "0.001", "--lrate_decay", "50",
    "--clf_weight", "0.01",
    "--i_video", "1000000", "--i_weights", "1000000",
]

MASK_VIEWS = (1, 2, 3, 4, 6, 7, 8, 9)   # llffhold 5 -> views 0, 5 held out


def make_scene(scene_dir: Path):
    if (scene_dir / "poses_bounds.npy").exists():
        return
    sys.path.insert(0, str(REPO))
    from spinnerf_tpu.data import synthetic
    synthetic.make_scene(scene_dir, n_views=10, h=80, w=100, factor=2,
                         seed=0, mask_views=list(MASK_VIEWS),
                         gt_mask_subdir="label_full")
    # the MVSeg reference reads bootstrap masks from
    # `images_2/label_mv_bootstrapped/<imgstem>.png` (load_llff.py:95-107);
    # ours reads them via --mask_subdir. One copy serves both.
    img2 = scene_dir / "images_2"
    src = img2 / "label"
    dst = img2 / "label_mv_bootstrapped"
    if src.is_dir() and not dst.exists():
        shutil.copytree(src, dst)


def run_logged(cmd, cwd: Path, log_path: Path, env=None) -> float:
    t0 = time.time()
    with open(log_path, "w") as log:
        subprocess.run(cmd, cwd=cwd, stdout=log, stderr=subprocess.STDOUT,
                       check=True, env=env)
    return time.time() - t0


def run_reference(ws: Path, iters: int) -> float:
    import os
    run_dir = ws / "ref_run"
    run_dir.mkdir(parents=True, exist_ok=True)
    env = dict(os.environ, PARITY_REF_VARIANT="MVSeg/DS_NeRF")
    cmd = [sys.executable, str(REPO / "tools/parity/run_reference_train.py"),
           "--expname", "parity", "--basedir", str(run_dir / "logs"),
           "--datadir", str(ws / "scene"),
           "--N_iters", str(iters), "--i_print", "20",
           "--i_testset", str(iters),
           *COMMON_FLAGS]
    return run_logged(cmd, run_dir, ws / "ref.log", env=env)


def run_ours(ws: Path, iters: int) -> float:
    import os
    run_dir = ws / "ours_run"
    run_dir.mkdir(parents=True, exist_ok=True)
    # PALLAS_AXON_POOL_IPS="" keeps the CPU run off the TPU relay
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="",
               PYTHONPATH=str(REPO) + ":" + os.environ.get("PYTHONPATH", ""))
    cmd = [sys.executable, "-m", "spinnerf_tpu.cli", "mvseg",
           "--expname", "parity", "--basedir", str(run_dir / "logs"),
           "--datadir", str(ws / "scene"),
           "--N_iters", str(iters), "--i_print", "20",
           "--i_testset", str(iters),
           "--mask_subdir", "label_mv_bootstrapped",
           "--masks_gt_subdir", "label_full",
           # the reference ran with its argparse default use_viewdirs=False
           # (its no_tcnn semantic path only EXISTS viewdirs-off: the
           # 5-channel output_linear, `run_nerf_helpers.py:102,125`); our
           # default is True, so pin it off for model parity
           "--use_viewdirs", "False",
           "--no_reload", "--fused_mlp", "False",
           *COMMON_FLAGS]
    return run_logged(cmd, run_dir, ws / "ours.log", env=env)


def _read_mask(p: Path) -> np.ndarray:
    import cv2
    img = cv2.imread(str(p), cv2.IMREAD_GRAYSCALE)
    if img is None:
        raise FileNotFoundError(p)
    return (img.astype(np.float32) / 255.0) > 0.5


def _iou(a: np.ndarray, b: np.ndarray) -> float:
    union = np.logical_or(a, b).sum()
    return float(np.logical_and(a, b).sum() / union) if union else 1.0


def compare(ws: Path, iters: int) -> dict:
    import cv2
    scene = ws / "scene"
    gt_dir = scene / "images_2" / "label_full"
    gt_files = sorted(gt_dir.glob("*.png"))
    n_views = len(gt_files)
    i_test = [i for i in range(n_views) if i % 5 == 0]

    # reference testset prob dumps are indexed by test-set position;
    # our lifted masks are exported per-view into the scene's label dir
    ref_prob_dir = (ws / "ref_run" / "logs" / "parity"
                    / f"testset_{iters:06d}" / "prob")

    rows = []
    for k, view in enumerate(i_test):
        gt = _read_mask(gt_files[view])
        ref = _read_mask(ref_prob_dir / f"{k:06d}.png")
        if ref.shape != gt.shape:
            ref = cv2.resize(ref.astype(np.uint8),
                             (gt.shape[1], gt.shape[0]),
                             interpolation=cv2.INTER_NEAREST) > 0
        our_path = sorted((scene / "images_2" / "label").glob("*.png"))[view]
        ours = _read_mask(our_path)
        rows.append({
            "view": view,
            "iou_ref_vs_gt": _iou(ref, gt),
            "iou_ours_vs_gt": _iou(ours, gt),
            "iou_ref_vs_ours": _iou(ref, ours),
        })
    summary = {k: float(np.mean([r[k] for r in rows]))
               for k in rows[0] if k != "view"}
    return {"per_view": rows, "summary": summary}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--iters", type=int, default=400)
    ap.add_argument("--skip-ref", action="store_true")
    ap.add_argument("--skip-ours", action="store_true")
    ap.add_argument("--report", default=None)
    a = ap.parse_args()

    ws = Path(a.workdir)
    ws.mkdir(parents=True, exist_ok=True)
    make_scene(ws / "scene")

    out = {}
    if not a.skip_ref:
        out["ref_wall_s"] = run_reference(ws, a.iters)
    if not a.skip_ours:
        out["ours_wall_s"] = run_ours(ws, a.iters)
    out.update(compare(ws, a.iters))
    report = Path(a.report) if a.report else ws / "mvseg_report.json"
    report.write_text(json.dumps(out, indent=2))
    print(json.dumps(out["summary"], indent=2))


if __name__ == "__main__":
    main()
