"""Export our (seeded) JAX LPIPS weights to an .npz the torch shim can load.

Stage-5 parity needs BOTH trainers to optimize the SAME perceptual metric:
the container has no pretrained VGG16 (zero egress), so `load_lpips()` falls
back to a seeded random VGG backbone + uniform linear heads — a valid frozen
random-projection perceptual metric. This tool dumps those exact arrays; the
parity shim (`tools/parity/shims/lpips/__init__.py`) rebuilds the identical
network in torch when `SPINNERF_LPIPS_NPZ` points at the dump, making the
reference's patch-LPIPS term (`DS_NeRF/run_nerf.py:1523-1561`) numerically
the same function as ours.

Usage:
    python tools/parity/export_lpips.py /tmp/lpips_shared.npz
"""
from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))


def export(out_path: str, seed: int = 0):
    from spinnerf_tpu.models import lpips as jl

    fn = jl.load_lpips(seed=seed)
    vgg_params, lin = fn.consts
    arrays = {}
    for i in range(len(jl._VGG_PLAN)):
        layer = vgg_params["params"][f"conv_{i}"]
        # flax [kh, kw, in, out] -> torch [out, in, kh, kw]
        arrays[f"conv_{i}_kernel"] = np.transpose(
            np.asarray(layer["kernel"], np.float32), (3, 2, 0, 1))
        arrays[f"conv_{i}_bias"] = np.asarray(layer["bias"], np.float32)
    for i, w in enumerate(lin):
        arrays[f"lin_{i}"] = np.asarray(w, np.float32)
    arrays["plan"] = np.asarray(
        [[ch, int(pool), int(tap)] for ch, pool, tap in jl._VGG_PLAN],
        np.int64)
    arrays["shift"] = jl._SHIFT
    arrays["scale"] = jl._SCALE
    np.savez(out_path, **arrays)
    print(f"wrote {out_path}: {len(arrays)} arrays")


if __name__ == "__main__":
    export(sys.argv[1] if len(sys.argv) > 1 else "/tmp/lpips_shared.npz")
