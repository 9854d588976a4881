"""Component-level profile of the hash-grid encode paths on the live TPU.

Times each stage of the 2^19 windowed encode (sort, corner/index prep,
forward kernel, forward+backward) and the end-to-end field step, at the
training workload shape (786k points x 16 levels), so optimization work
targets the measured bottleneck instead of a guess.
"""
import time

import sys as _sys
from pathlib import Path as _P
_sys.path.insert(0, str(_P(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    # block_until_ready is a no-op over the axon relay backend; the only
    # reliable sync is a host fetch. Fetch one scalar from the first leaf.
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))


def t(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    # queued calls serialize on the single device stream; one fetch at the
    # end costs one relay RTT (~25 ms), amortized over n
    _sync(out)
    rtt_t0 = time.perf_counter()
    _sync(out)
    rtt = time.perf_counter() - rtt_t0
    return max(0.0, (rtt_t0 - t0 - rtt)) / n * 1000  # ms


def main():
    from spinnerf_tpu.ops import hash_encode_win as hw
    from spinnerf_tpu.models import hashgrid as hg

    N = 786432
    L, T, F = 16, 1 << 19, 2
    resolutions = hg.level_resolutions(L, 16, 2048.0 * 100.0)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (N, 3))
    table = jax.random.uniform(key, (L, T, F), jnp.float32, -1e-4, 1e-4)

    finest = float(max(resolutions))
    n_pad = -(-N // hw._B) * hw._B

    sort_j = jax.jit(lambda x: hw.sort_perm(x, finest, n_pad))
    print(f"sort_perm           {t(sort_j, x):8.2f} ms")

    xt_s, perm, inv_perm = jax.block_until_ready(sort_j(x))

    corners_j = jax.jit(
        lambda xt: hw.corner_indices_weights_win(xt, resolutions, T))
    print(f"corners+weights     {t(corners_j, xt_s):8.2f} ms")
    idx, w = jax.block_until_ready(corners_j(xt_s))

    wo_j = jax.jit(lambda idx: hw.window_offsets(idx, T))
    print(f"window_offsets      {t(wo_j, idx):8.2f} ms")
    pages, off = jax.block_until_ready(wo_j(idx))

    prep_j = jax.jit(lambda off, w: hw._prep(off, w, n_pad))
    print(f"prep(pad off/w)     {t(prep_j, off, w):8.2f} ms")

    fwd_j = jax.jit(lambda tab, idx, w, pages:
                    hw.hash_encode_win(tab, idx, w, pages))
    print(f"win kernel fwd      {t(fwd_j, table, idx, w, pages):8.2f} ms")

    vjp_j = jax.jit(lambda tab, idx, w, pages: jax.grad(
        lambda tb: jnp.sum(hw.hash_encode_win(tb, idx, w, pages) ** 2)
    )(tab))
    print(f"win kernel fwd+bwd  {t(vjp_j, table, idx, w, pages):8.2f} ms")

    res_t = tuple(resolutions)
    pages_j = jax.jit(lambda xt: hw.window_pages(xt, res_t, T))
    print(f"window_pages(fused) {t(pages_j, xt_s):8.2f} ms")
    pages_f = jax.block_until_ready(pages_j(xt_s))

    ffwd_j = jax.jit(lambda tab, xt, pages:
                     hw.hash_encode_win_fused(tab, xt, res_t, pages))
    print(f"fused kernel fwd    {t(ffwd_j, table, xt_s, pages_f):8.2f} ms")

    fvjp_j = jax.jit(lambda tab, xt, pages: jax.grad(
        lambda tb: jnp.sum(hw.hash_encode_win_fused(tb, xt, res_t, pages)
                           ** 2))(tab))
    print(f"fused kernel f+b    {t(fvjp_j, table, xt_s, pages_f):8.2f} ms")

    e2e_j = jax.jit(lambda tab, x: hw.encode_win(tab, x, resolutions))
    print(f"encode_win e2e fwd  {t(e2e_j, table, x):8.2f} ms")

    e2e_g = jax.jit(lambda tab, x: jax.grad(
        lambda tb: jnp.sum(hw.encode_win(tb, x, resolutions) ** 2))(tab))
    print(f"encode_win e2e f+b  {t(e2e_g, table, x):8.2f} ms")

    # full field apply (encoder + MLPs) fwd and fwd+bwd
    model = hg.HashGridField(log2_table_size=19)
    pts = (jax.random.uniform(key, (4096, 192, 3)) - 0.5) * 6.0
    vd = jax.random.normal(key, (4096, 3))
    vd = vd / jnp.linalg.norm(vd, axis=-1, keepdims=True)
    params = model.init(key, pts[:2], vd[:2])
    apply_j = jax.jit(lambda p, pts, vd: model.apply(p, pts, vd))
    print(f"field apply fwd     {t(apply_j, params, pts, vd, n=10):8.2f} ms")
    loss_g = jax.jit(lambda p, pts, vd: jax.grad(
        lambda pp: jnp.mean(model.apply(pp, pts, vd) ** 2))(p))
    print(f"field apply f+b     {t(loss_g, params, pts, vd, n=10):8.2f} ms")


if __name__ == "__main__":
    main()
