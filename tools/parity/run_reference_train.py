"""Subprocess entry: run the ACTUAL torch reference `train()` on CPU.

Usage:
    python tools/parity/run_reference_train.py [reference CLI flags...]

Env:
    PARITY_REF_VARIANT: "DS_NeRF" (default) or "MVSeg/DS_NeRF".

The reference parses `sys.argv` inside `train()` (`DS_NeRF/run_nerf.py:963-965`),
so we forward our argv verbatim. Runs headless: the tkinter GUI thread the
reference spawns unconditionally (`run_nerf.py:1151-1153`) dies with TclError
on a display-less host without affecting training.
"""
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from parity import refenv  # noqa: E402


def main():
    variant = os.environ.get("PARITY_REF_VARIANT", "DS_NeRF")
    forwarded = sys.argv[1:]
    # The reference never seeds torch/numpy; its model init is OS-entropy.
    # On the toy parity scenes the sparse-depth term shocks the first
    # optimizer steps (|grad| ~120 at step 1-2) and SOME inits collapse
    # into the dead-ReLU all-white attractor (train PSNR flat ~6, zero
    # gradients) while others recover and train — a 1000-iter fit run was
    # lost to this. Pin the init so reference arms are reproducible;
    # SPINNERF_REF_SEED selects an alternative if a pinned seed happens to
    # be a collapsing one on a new scene.
    seed = int(os.environ.get("SPINNERF_REF_SEED", "0"))
    import numpy as np
    import torch
    torch.manual_seed(seed)
    np.random.seed(seed)
    ref = refenv.load_reference(variant)
    sys.argv = ["run_nerf.py"] + forwarded
    ref.train()


if __name__ == "__main__":
    main()
