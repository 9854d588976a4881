"""MXU column-rate calibration + windowed hash-encode kernel timings.

The round-4 kernel sprint's measurement harness (the experimental kernel
variants it compared are productionized in `ops/hash_encode_win.py`; this
keeps the calibration and the production-path timings reproducible).

Findings it established (v5e, 786,432 points x 16 levels x 2^19 table):

  calib K=64 / K=128        ~5.5 cols/cycle EITHER WAY — one-hot gather
                            matmuls are COLUMN-pass bound, so K is free:
                            packing two corners per matmul (K 64->128,
                            `_paired_gather`) halves the forward floor
  fwd committed (r3)        26.9 ms  ->  paired fwd 17.1 ms
  bwd committed (r3)        15.4 ms  (already ~6.9 cols/cycle; a paired
                            variant measured 17.6 ms — its dup-lane grad
                            table doubles the revisited VMEM block to 8 MB
                            — so the backward stays per-corner)
  in-kernel .T removal      26.9 -> 24.8 ms (subsumed by pairing)
  bf16 cotangent build      15.4 -> 20.1 ms (rejected)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/kbench.py
"""
from __future__ import annotations

import argparse
import functools
import time

import sys as _sys
from pathlib import Path as _P
_sys.path.insert(0, str(_P(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from spinnerf_tpu.models import hashgrid as hg
from spinnerf_tpu.ops import hash_encode_win as hw

_B = hw._B


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))


def t(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    rtt_t0 = time.perf_counter()
    _sync(out)
    rtt = time.perf_counter() - rtt_t0
    return max(0.0, (rtt_t0 - t0 - rtt)) / n * 1000  # ms


def _cal_kernel(k: int, reps: int, a_ref, b_ref, o_ref):
    acc = jnp.zeros((128, _B), jnp.float32)
    for r in range(reps):
        acc = acc + jax.lax.dot_general(
            a_ref[0, :, :k], b_ref[0, :k, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    o_ref[0] = acc


def calibrate(k: int, reps: int = 8, blocks: int = 4096):
    """Raw MXU column rate at the gather kernels' matmul shape."""
    a = jnp.ones((blocks, 128, 128), jnp.bfloat16)
    b = jnp.ones((blocks, 128, _B), jnp.bfloat16)
    f = pl.pallas_call(
        functools.partial(_cal_kernel, k, reps),
        grid=(blocks,),
        in_specs=[pl.BlockSpec((1, 128, 128), lambda i: (i, 0, 0)),
                  pl.BlockSpec((1, 128, _B), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, 128, _B), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((blocks, 128, _B), jnp.float32),
    )
    ms = t(jax.jit(f), a, b)
    cols = blocks * reps * _B
    rate = cols / (ms * 1e-3) / 940e6  # cols per cycle at 940 MHz
    print(f"calib K={k:3d}: {ms:7.2f} ms  {rate:5.2f} cols/cycle")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=786432)
    ap.add_argument("--skip-calib", action="store_true")
    args = ap.parse_args()

    N = args.n
    L, T = 16, 1 << 19
    res_t = tuple(hg.level_resolutions(L, 16, 2048.0 * 100.0))
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (N, 3))
    table = jax.random.uniform(key, (L, T, 2), jnp.float32, -1e-4, 1e-4)

    if not args.skip_calib:
        for k in (64, 128):
            calibrate(k)

    n_pad = -(-N // _B) * _B
    xt_s, _, _ = jax.block_until_ready(
        jax.jit(lambda x: hw.sort_perm(x, float(max(res_t)), n_pad))(x))
    pages = jax.block_until_ready(
        jax.jit(lambda xt: hw.window_pages(xt, res_t, T))(xt_s))

    fwd = jax.jit(lambda tab, xt, pg:
                  hw.hash_encode_win_fused(tab, xt, res_t, pg))
    print(f"fused fwd (paired)  {t(fwd, table, xt_s, pages):8.2f} ms")

    vjp = jax.jit(lambda tab, xt, pg: jax.grad(
        lambda tb: jnp.sum(hw.hash_encode_win_fused(tb, xt, res_t, pg)
                           ** 2))(tab))
    print(f"fused fwd+bwd       {t(vjp, table, xt_s, pages):8.2f} ms")

    # window-clamp alias fraction at this shape (uniform bounds)
    idx, _ = jax.jit(lambda xt: hw.corner_indices_weights_win(
        xt, res_t, T))(xt_s)
    frac = float(jax.jit(lambda i: hw.overflow_fraction(i, T))(idx))
    print(f"window-alias fraction (uniform bounds): {frac:.4f}")


if __name__ == "__main__":
    main()
