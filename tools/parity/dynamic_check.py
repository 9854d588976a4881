"""Dynamic (training-trajectory) parity: the ACTUAL torch reference vs ours.

Runs `DS_NeRF/run_nerf.py train()` (CPU torch, unmodified reference code via
refenv shims) and `spinnerf_tpu.cli train` (CPU JAX) on the SAME synthetic
scene with the SAME flags, then compares:

  * loss/PSNR trajectories (parsed from both logs),
  * final testset renders: PSNR(ref render, our render) per test view and
    each implementation's render-vs-GT PSNR,
  * the `--prepare` disparity dumps that stage LaMa guidance
    (`run_nerf.py:1599-1609` vs `Trainer._prepare_hook`).

The two trainers use different RNGs, so step-for-step equality is impossible;
the parity claim is that both converge to the same scene reconstruction:
renders agree with each other (cross-PSNR) about as well as either agrees
with GT.

Usage:
    python tools/parity/dynamic_check.py --workdir /root/parity_ws \
        [--iters 600] [--skip-ref] [--skip-ours] [--report out.json]
"""
from __future__ import annotations

import argparse
import json
import re
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[2]

# One flag list, consumed verbatim by both CLIs (ours parses the reference's
# flag surface). Mirrors the reference scene config (`DS_NeRF/configs/
# config.txt`) at tiny-CPU scale: stage-3 "prepare" semantics.
COMMON_FLAGS = [
    "--dataset_type", "llff", "--factor", "2",
    # pass explicitly: the reference's argparse default is False while ours
    # is True (the scene configs set True, `DS_NeRF/configs/config.txt:15`);
    # leaving it implicit compared different models under "the same flags"
    "--use_viewdirs",
    "--no_tcnn", "--no_ndc", "--lindisp", "--white_bkgd",
    "--colmap_depth", "--depth_loss", "--depth_lambda", "0.1",
    "--N_rand", "128", "--N_samples", "32", "--N_importance", "32",
    "--netdepth", "8", "--netwidth", "128",
    "--prepare", "--N_gt", "0", "--llffhold", "5",
    "--raw_noise_std", "0", "--lrate", "0.001", "--lrate_decay", "50",
    "--i_video", "1000000", "--i_weights", "1000000",
    # the reference's `--prepare` dump slices masks with `::render_factor`
    # (`run_nerf.py:1606-1608`) — 0 (its argparse default) crashes; its scene
    # configs always set 1 (`DS_NeRF/configs/config.txt:25`)
    "--render_factor", "1",
]

REF_PRINT = re.compile(r"\[TRAIN\] Iter: (\d+) Loss: ([\d.e+-]+)\s+PSNR: ([\d.e+-]+)")
OUR_PRINT = re.compile(r"\[(\d+)/\d+\] loss ([\d.e+-]+) psnr ([\d.e+-]+)")


def make_scene(scene_dir: Path):
    if (scene_dir / "poses_bounds.npy").exists():
        return
    sys.path.insert(0, str(REPO))
    from spinnerf_tpu.data import synthetic
    synthetic.make_scene(scene_dir, n_views=10, h=80, w=100, factor=2, seed=0)


def run_logged(cmd, cwd: Path, log_path: Path, env=None,
               stall_timeout: float = 300.0, retries: int = 3) -> float:
    """Run `cmd` logging to `log_path`, with a startup-stall watchdog.

    A TPU client that dials the relay too soon after the previous client
    exits can wedge forever before producing any output (observed on the
    round-5 tunnel: the remote grant handoff serializes behind the prior
    session's teardown and a too-early dial never recovers). If the log
    has not grown past the jax platform banner within `stall_timeout`
    seconds, the child is killed and relaunched — a fresh dial after the
    pause acquires immediately. Once output flows, no timeout applies.
    """
    t0 = time.time()
    for attempt in range(retries):
        with open(log_path, "w") as log:
            proc = subprocess.Popen(cmd, cwd=cwd, stdout=log,
                                    stderr=subprocess.STDOUT, env=env)
            t_start = time.time()
            stalled = False
            while True:
                try:
                    proc.wait(timeout=10)
                    break
                except subprocess.TimeoutExpired:
                    pass
                log_sz = log_path.stat().st_size
                if log_sz > 400:          # past the banner: it's alive
                    proc.wait()
                    break
                if time.time() - t_start > stall_timeout:
                    stalled = True
                    proc.kill()
                    proc.wait()
                    break
        if stalled:
            print(f"[run_logged] startup stall ({stall_timeout:.0f}s, "
                  f"attempt {attempt + 1}/{retries}); retrying", flush=True)
            time.sleep(20)
            continue
        if proc.returncode != 0:
            raise subprocess.CalledProcessError(proc.returncode, cmd)
        return time.time() - t0
    raise RuntimeError(f"{cmd[:2]}... stalled {retries}x at startup "
                       f"(TPU relay grant never arrived)")


def run_reference(ws: Path, iters: int) -> float:
    run_dir = ws / "ref_run"
    run_dir.mkdir(parents=True, exist_ok=True)
    cmd = [sys.executable, str(REPO / "tools/parity/run_reference_train.py"),
           "--expname", "parity", "--basedir", str(run_dir / "logs"),
           "--datadir", str(ws / "scene"),
           "--N_iters", str(iters), "--i_print", "20",
           "--i_testset", str(iters), "--i_feat", str(iters),
           *COMMON_FLAGS]
    return run_logged(cmd, run_dir, ws / "ref.log")


def run_ours(ws: Path, iters: int) -> float:
    run_dir = ws / "ours_run"
    run_dir.mkdir(parents=True, exist_ok=True)
    import os
    # PALLAS_AXON_POOL_IPS="" keeps the CPU run off the TPU relay entirely
    # (the sitecustomize otherwise dials the tunnel at startup and hangs
    # when it is down)
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="",
               PYTHONPATH=str(REPO) + ":" + os.environ.get("PYTHONPATH", ""))
    cmd = [sys.executable, "-m", "spinnerf_tpu.cli", "train",
           "--expname", "parity", "--basedir", str(run_dir / "logs"),
           "--datadir", str(ws / "scene"),
           "--N_iters", str(iters), "--i_print", "20",
           "--i_testset", str(iters), "--i_feat", str(iters),
           "--no_reload", "--fused_mlp", "False",
           *COMMON_FLAGS]
    return run_logged(cmd, run_dir, ws / "ours.log", env=env)


def parse_traj(log_path: Path, pattern) -> list[tuple[int, float, float]]:
    out = []
    for line in log_path.read_text().splitlines():
        m = pattern.search(line)
        if m:
            out.append((int(m.group(1)), float(m.group(2)), float(m.group(3))))
    return out


def _imread(p: Path) -> np.ndarray:
    import cv2
    img = cv2.imread(str(p), cv2.IMREAD_UNCHANGED)
    if img is None:
        raise FileNotFoundError(p)
    if img.ndim == 3:
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    return img.astype(np.float32) / 255.0


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a - b) ** 2))
    return float(-10.0 * np.log10(max(mse, 1e-12)))


def compare(ws: Path, iters: int) -> dict:
    report: dict = {}

    ref_traj = parse_traj(ws / "ref.log", REF_PRINT)
    our_traj = parse_traj(ws / "ours.log", OUR_PRINT)
    report["ref_final"] = {"iter": ref_traj[-1][0], "loss": ref_traj[-1][1],
                           "psnr": ref_traj[-1][2]}
    report["ours_final"] = {"iter": our_traj[-1][0], "loss": our_traj[-1][1],
                            "psnr": our_traj[-1][2]}
    # trajectory agreement: train PSNR at matching iterations (tail half,
    # where the batch-noise has averaged out)
    ref_by_iter = dict((i, p) for i, _, p in ref_traj)
    pairs = [(p, dict((i, q) for i, _, q in our_traj).get(it))
             for it, p in ref_by_iter.items()
             if it >= iters // 2 and it in dict((i, q) for i, _, q in our_traj)]
    tail_ref = [p for i, _, p in ref_traj if i >= iters // 2]
    tail_our = [p for i, _, p in our_traj if i >= iters // 2]
    report["train_psnr_tail_mean"] = {
        "ref": float(np.mean(tail_ref)), "ours": float(np.mean(tail_our)),
        "abs_diff": float(abs(np.mean(tail_ref) - np.mean(tail_our)))}

    # testset renders
    ref_dir = ws / "ref_run/logs/parity" / f"testset_{iters:06d}"
    our_dir = ws / "ours_run/logs/parity" / f"testset_{iters:06d}"
    gt_dir = ws / "scene/images_2"
    names = sorted(gt_dir.glob("view*.png"))
    test_views = [0, 5]  # llffhold=5 over 10 views
    rows = []
    for k, v in enumerate(test_views):
        ref_img = _imread(ref_dir / "rgb" / f"{k:06d}.png")
        our_img = _imread(our_dir / "rgb" / f"{k:06d}.png")
        gt = _imread(names[v])
        rows.append({
            "view": v,
            "psnr_ref_vs_ours": _psnr(ref_img, our_img),
            "psnr_ref_vs_gt": _psnr(ref_img, gt),
            "psnr_ours_vs_gt": _psnr(our_img, gt),
        })
    report["testset"] = rows

    # prepare disparity dumps (ref: cwd-relative lama/LaMa_test_images;
    # ours: <expdir>/lama_input)
    ref_lama = ws / "ref_run/lama/LaMa_test_images"
    our_lama = ws / "ours_run/logs/parity/lama_input"
    disp_rows = []
    for i in range(10):
        try:
            a = _imread(ref_lama / f"img{i:0>3}.png")
            b = _imread(our_lama / f"img{i:0>3}.png")
        except FileNotFoundError:
            continue
        disp_rows.append({"view": i, "mean_abs_diff": float(np.mean(np.abs(a - b))),
                          "corr": float(np.corrcoef(a.ravel(), b.ravel())[0, 1])})
    report["prepare_disparity"] = disp_rows
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/root/parity_ws")
    ap.add_argument("--iters", type=int, default=600)
    ap.add_argument("--skip-ref", action="store_true")
    ap.add_argument("--skip-ours", action="store_true")
    ap.add_argument("--compare-only", action="store_true")
    ap.add_argument("--report", default=None)
    args = ap.parse_args()

    ws = Path(args.workdir)
    ws.mkdir(parents=True, exist_ok=True)
    make_scene(ws / "scene")

    times = {}
    if not args.compare_only:
        if not args.skip_ref:
            times["ref_wall_s"] = run_reference(ws, args.iters)
        if not args.skip_ours:
            times["ours_wall_s"] = run_ours(ws, args.iters)

    report = compare(ws, args.iters)
    report.update(times)
    text = json.dumps(report, indent=2)
    print(text)
    if args.report:
        Path(args.report).write_text(text)


if __name__ == "__main__":
    main()
