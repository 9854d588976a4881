"""Hash-grid training QUALITY at the reference default size (2^19, 16 levels).

The windowed encode's Z-CDF PAGE hash (`ops/hash_encode_win.py::
corner_indices_weights_win`: `segment(point)*1024 + xor_prime_hash(cell) &
1023`, segments = equal-sample-count cuts of the Z-order calibrated from
the scene) deviates from instant-ngp's global XOR-prime hash in its
collision PATTERN: collisions are confined within equal-density segments.
A hash grid trains *through* collisions by construction (instant-ngp §4),
but that must be DEMONSTRATED at the default size — not assumed — in BOTH
execution regimes: the exact-gather fallback (batches < n_windowed_min,
the default harness shape) and the real windowed kernels with their
window-clamp aliasing (`--n-rand 2048+`). TWO predecessor index functions
failed exactly this test (folded-Morton: ~9 dB batch-dependent aliasing;
fixed cubic regions: -15 dB capacity collapse on concentrated scenes —
PARITY_RUN §4 history) — this harness is the standing regression gate for
index-function redesigns, with `--hash-impl xla` as the XOR-prime control
arm.

This tool trains, on the SAME synthetic scene as `dynamic_check.py` (so the
recorded torch-reference MLP trajectories in PARITY_RUN.md are directly
comparable):

  a) our hash-grid field (reference-default 2^19 x 16, `--hash_impl auto`
     => windowed kernels on TPU / the bit-identical oracle elsewhere), and
  b) our MLP field (`--no_tcnn`), flag-matched to the recorded runs,

with the same ray/sampling budget, then compares train-PSNR trajectories
and held-out renders (views 0, 5 under --llffhold 5): each model vs GT and
hash-grid vs MLP cross-render.

Usage:
    python tools/parity/hashgrid_quality.py --workdir /root/parity_hg \
        [--iters 3000] [--report out.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

from parity.dynamic_check import (OUR_PRINT, _imread, _psnr,  # noqa: E402
                                  make_scene, parse_traj, run_logged)

# ray/sampling budget matched to the recorded dynamic_check runs
# (PARITY_RUN.md §2); model flags differ per arm below
BASE_FLAGS = [
    "--dataset_type", "llff", "--factor", "2",
    "--use_viewdirs",
    "--no_ndc", "--lindisp", "--white_bkgd",
    "--colmap_depth", "--depth_loss", "--depth_lambda", "0.1",
    "--N_rand", "128", "--N_samples", "32", "--N_importance", "32",
    "--prepare", "--N_gt", "0", "--llffhold", "5",
    "--raw_noise_std", "0", "--lrate_decay", "50",
    "--i_video", "1000000", "--i_weights", "1000000",
    "--render_factor", "1",
]


def run_arm(ws: Path, name: str, iters: int, model_flags: list[str],
            on_tpu: bool, n_rand: int | None = None) -> float:
    if on_tpu:
        # cooldown: a TPU client that connects in the stale-grant window
        # right after the previous client process exits can hang forever
        # on the relay (observed on the round-5 tunnel); fresh clients
        # after a pause acquire instantly
        import time
        time.sleep(75)
    run_dir = ws / f"{name}_run"
    run_dir.mkdir(parents=True, exist_ok=True)
    env = dict(os.environ,
               PYTHONPATH=str(REPO) + ":" + os.environ.get("PYTHONPATH", ""))
    if not on_tpu:
        env.update(JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    flags = list(BASE_FLAGS)
    if n_rand is not None:
        # the windowed-kernel regime needs >= n_windowed_min(2^19)
        # points per encode (196,608 since the round-5 3/4 floor): in
        # prepare mode the step renders THREE ray groups (rgb/clf/depth —
        # no inp group), so the coarse pass is N_rand x 3 x 32 points and
        # N_rand >= 4096 keeps every pass comfortably windowed. The
        # default 128 stays on the exact-gather fallback — both regimes
        # must be quality-proven (VERDICT r3 #3).
        flags[flags.index("--N_rand") + 1] = str(n_rand)
    cmd = [sys.executable, "-m", "spinnerf_tpu.cli", "train",
           "--expname", name, "--basedir", str(run_dir / "logs"),
           "--datadir", str(ws / "scene"),
           "--N_iters", str(iters), "--i_print", "20",
           "--i_testset", str(iters), "--i_feat", str(iters),
           "--no_reload", *flags, *model_flags]
    return run_logged(cmd, run_dir, ws / f"{name}.log", env=env)


def compare(ws: Path, iters: int) -> dict:
    report: dict = {}
    for name in ("hashgrid", "mlp"):
        traj = parse_traj(ws / f"{name}.log", OUR_PRINT)
        tail = [p for i, _, p in traj if i >= iters // 2]
        report[f"{name}_final"] = {"iter": traj[-1][0], "loss": traj[-1][1],
                                   "psnr": traj[-1][2]}
        report[f"{name}_psnr_tail_mean"] = float(np.mean(tail))
    report["tail_abs_diff"] = float(abs(report["hashgrid_psnr_tail_mean"]
                                        - report["mlp_psnr_tail_mean"]))

    gt_dir = ws / "scene/images_2"
    names = sorted(gt_dir.glob("view*.png"))
    rows = []
    for k, v in enumerate([0, 5]):  # llffhold=5 over 10 views
        hg = _imread(ws / "hashgrid_run/logs/hashgrid"
                     / f"testset_{iters:06d}/rgb/{k:06d}.png")
        ml = _imread(ws / "mlp_run/logs/mlp"
                     / f"testset_{iters:06d}/rgb/{k:06d}.png")
        gt = _imread(names[v])
        rows.append({"view": v,
                     "psnr_hashgrid_vs_gt": _psnr(hg, gt),
                     "psnr_mlp_vs_gt": _psnr(ml, gt),
                     "psnr_hashgrid_vs_mlp": _psnr(hg, ml)})
    report["testset"] = rows
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/root/parity_hg")
    ap.add_argument("--iters", type=int, default=3000)
    ap.add_argument("--lrate-hash", default="0.01",
                    help="instant-ngp-class LR for the hash grid (the "
                    "reference scene configs run tcnn at 0.01-0.03)")
    ap.add_argument("--table-wd", default=None,
                    help="optional hash-table L2 decay for the hashgrid arm "
                    "(`Config.table_wd`): the few-view regularizer when the "
                    "2^19 table dwarfs the scene's pixel count")
    ap.add_argument("--hash-impl", default=None,
                    help="`Config.hash_impl` override for the hashgrid arm. "
                    "`xla` selects the classic instant-ngp XOR-prime hash "
                    "(dense indexing where (r+1)^3 <= T) — the CONTROL arm "
                    "isolating the custom Morton hash's collision pattern "
                    "from table-capacity effects (viable at this scene's "
                    "tiny point count; the windowed kernels exist because "
                    "this path does not scale)")
    ap.add_argument("--n-rand", type=int, default=None,
                    help="override the hashgrid arm's ray batch (>=4096 at "
                    "32+32 samples and 3 prepare-mode ray groups puts "
                    "every encode above n_windowed_min(2^19), engaging the "
                    "REAL windowed kernels instead of the exact-gather "
                    "fallback)")
    ap.add_argument("--no-calib", action="store_true",
                    help="disable Z-CDF page-bound density calibration "
                    "(`Config.hash_region_calib`) — the uniform Z-volume "
                    "split ablation; measured -11.6 dB on the (concentrated) "
                    "harness scene, PARITY_RUN §4")
    ap.add_argument("--skip-hash", action="store_true",
                    help="reuse an existing hashgrid_run/hashgrid.log in "
                    "the workdir (resume after an interrupted mlp arm)")
    ap.add_argument("--skip-mlp", action="store_true",
                    help="reuse an existing mlp_run/mlp.log in the workdir "
                    "(e.g. copied from a sibling run with identical flags)")
    ap.add_argument("--lrate-mlp", default="0.001",
                    help="matches the recorded PARITY_RUN MLP runs")
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU (oracle encode) instead of the TPU")
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--report", default=None)
    args = ap.parse_args()

    ws = Path(args.workdir)
    ws.mkdir(parents=True, exist_ok=True)
    make_scene(ws / "scene")

    times = {}
    if not args.skip_train:
        hash_flags = ["--lrate", args.lrate_hash]
        if args.table_wd is not None:
            hash_flags += ["--table_wd", args.table_wd]
        if args.hash_impl is not None:
            hash_flags += ["--hash_impl", args.hash_impl]
        if args.no_calib:
            hash_flags += ["--hash_region_calib", "False"]
        if not args.skip_hash:
            times["hashgrid_wall_s"] = run_arm(
                ws, "hashgrid", args.iters, hash_flags, on_tpu=not args.cpu,
                n_rand=args.n_rand)
        if not args.skip_mlp:
            times["mlp_wall_s"] = run_arm(
                ws, "mlp", args.iters,
                ["--no_tcnn", "--netdepth", "8", "--netwidth", "128",
                 "--lrate", args.lrate_mlp, "--fused_mlp", "False"],
                on_tpu=not args.cpu)

    report = compare(ws, args.iters)
    report.update(times)
    text = json.dumps(report, indent=2)
    print(text)
    if args.report:
        Path(args.report).write_text(text)


if __name__ == "__main__":
    main()
