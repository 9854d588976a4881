"""Numerical sanitizers and failure diagnostics (SURVEY §5).

Reference equivalents:
- `torch.autograd.set_detect_anomaly(True)` always-on
  (`run_nerf_helpers.py:5`) -> opt-in `enable_nan_debug()` (jax_debug_nans)
  because the always-on version is a large slowdown;
- the DEBUG NaN/Inf scan over render outputs (`run_nerf.py:733-736`) ->
  `check_finite()` over arbitrary pytrees, usable under jit via
  `jax.debug.callback`;
- LaMa's SIGUSR1 stack-trace dump (`saicinpainting/utils.py:101-109`) ->
  `install_signal_dump()`.
"""
from __future__ import annotations

import signal
import sys
import traceback

import jax
import jax.numpy as jnp
import numpy as np


def enable_nan_debug(enable: bool = True):
    """Make JAX raise on any NaN produced inside jit (debug only — disables
    some fusions and adds sync points)."""
    jax.config.update("jax_debug_nans", enable)


def check_finite(tree, name: str = "tree", *, raise_error: bool = True):
    """Host-side finite check over a pytree. Returns list of bad leaf paths."""
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if not np.isfinite(arr).all():
            bad.append((jax.tree_util.keystr(path),
                        int(np.isnan(arr).sum()), int(np.isinf(arr).sum())))
    if bad and raise_error:
        raise FloatingPointError(f"non-finite values in {name}: {bad}")
    return bad


def assert_finite_in_jit(x, name: str = "x"):
    """Usable inside jit: checks on host after the step completes."""
    def cb(v):
        if not np.isfinite(v).all():
            print(f"! [Numerical Error] {name} contains nan or inf",
                  file=sys.stderr)
    jax.debug.callback(cb, x)
    return x


def install_signal_dump(sig=signal.SIGUSR1):
    """Dump all thread stacks on `kill -USR1 <pid>` (LaMa parity)."""
    def handler(signum, frame):
        print(f"=== stack dump (signal {signum}) ===", file=sys.stderr)
        for tid, fr in sys._current_frames().items():
            print(f"--- thread {tid} ---", file=sys.stderr)
            traceback.print_stack(fr, file=sys.stderr)
    signal.signal(sig, handler)
