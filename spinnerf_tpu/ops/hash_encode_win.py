"""Sorted-window hash-grid encode: O(window) MXU gathers (Pallas).

The dense one-hot formulation in `ops/hash_encode.py` does O(T) MXU work per
point (every block multiplies against the whole table) — 3.5 s/step at the
reference-default `log2_hashmap_size=19` (`DS_NeRF/run_nerf_helpers_tcnn.py:24`).
This module restores O(1)-per-access cost the TPU way:

1. **Sort points along a Z-order curve** (54-bit Morton key as two int32
   lanes, `lax.sort` with num_keys=2 — measured 2.3 ms for 786k points on
   v5e). Consecutive points become spatial neighbours.
2. **Locality-preserving hash**: level index = low 27 Morton bits of the
   level's cell coords, masked to the table size, instead of instant-ngp's
   XOR-prime hash. Spatially adjacent cells now map to nearby table entries,
   so a block of sorted points touches a compact index *window*. (A hash
   grid trains through collisions by construction — instant-ngp §4 — so the
   collision PATTERN is a free design axis; this choice trades the CUDA
   hash for one the MXU can exploit. Collision rate is the same O(cells/T).)
3. **Windowed one-hot matmuls**: each 512-point block multiplies against a
   2-page window (2x2048 entries = 64 packed rows) of the level table that
   Pallas DMAs in via a scalar-prefetched page id — 128x less MXU work than
   the dense kernel at 2^19. The rare corner whose offset exceeds the
   window (Z-curve discontinuities; measured <1% at training point
   distributions, see `tests/test_hash_encode_win.py`) is aliased to
   `offset mod 4096` inside the window — one extra deterministic collision,
   identical in forward and backward.
4. **Backward**: per-block window gradients are accumulated straight into
   an HBM gradient table with in-kernel async DMA (sequential TPU grid =>
   no races); blocks' windows may overlap arbitrarily.

The XLA oracle (`hash_encode_win_xla`) reproduces the window-clamp
semantics bit-exactly and is the CPU fallback and test reference.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# points per kernel block (lanes of every point-indexed tile)
_B = 512
# entries per table page; a window is two consecutive pages
PAGE_ENTRIES = 2048
WINDOW_ENTRIES = 2 * PAGE_ENTRIES
# packed-row geometry (features=2, 64 entries/row)
_PAGE_ROWS = PAGE_ENTRIES * 2 // 128          # 32
_WIN_ROWS = 2 * _PAGE_ROWS                    # 64


# -----------------------------------------------------------------------------
# Morton codes (bit interleave) — all uint32 lane math
# -----------------------------------------------------------------------------

def _spread9(v):
    """Spread the low 9 bits of v so they occupy every 3rd bit (27 bits)."""
    v = v & jnp.uint32(0x1FF)
    v = (v | (v << 16)) & jnp.uint32(0x030000FF)
    v = (v | (v << 8)) & jnp.uint32(0x0300F00F)
    v = (v | (v << 4)) & jnp.uint32(0x030C30C3)
    v = (v | (v << 2)) & jnp.uint32(0x09249249)
    return v


def morton27(cx, cy, cz):
    """27-bit Morton interleave of the low 9 bits of each axis (uint32)."""
    return _spread9(cx) | (_spread9(cy) << 1) | (_spread9(cz) << 2)


def morton_sort_keys(x, finest_res: float):
    """x: [N, 3] in [0,1] -> (hi, lo) int32 Morton keys at <=18 bits/axis.

    Sorting by (hi, lo) orders points along the Z-curve of the finest grid,
    which is what gives blocks their window locality at every level.
    """
    res = min(float(finest_res), float(1 << 18))
    c = jnp.clip((x * res).astype(jnp.uint32), 0, jnp.uint32(int(res) - 1))
    cx, cy, cz = c[:, 0], c[:, 1], c[:, 2]
    hi = morton27(cx >> 9, cy >> 9, cz >> 9)
    lo = morton27(cx, cy, cz)
    return hi.astype(jnp.int32), lo.astype(jnp.int32)


# -----------------------------------------------------------------------------
# permutation (sort / unsort) with gather-only VJPs
# -----------------------------------------------------------------------------

@jax.custom_vjp
def permute_rows(x, perm, inv_perm):
    """x[perm] where perm is a permutation; VJP is a gather with inv_perm
    (XLA's default VJP of gather is a serialized scatter-add — ~8x slower
    on v5e; a permutation's transpose is itself a gather)."""
    return jnp.take(x, perm, axis=0)


def _permute_fwd(x, perm, inv_perm):
    return jnp.take(x, perm, axis=0), (perm, inv_perm)


def _permute_bwd(res, g):
    perm, inv_perm = res
    return jnp.take(g, inv_perm, axis=0), None, None


permute_rows.defvjp(_permute_fwd, _permute_bwd)


# -----------------------------------------------------------------------------
# shared window geometry (kernel prep AND oracle — must match bit-exactly)
# -----------------------------------------------------------------------------

def window_offsets(idx, t: int):
    """idx: [L, 8, N] int32 entry indices (points sorted along the Z-curve,
    N a multiple of _B). Returns:

      pages [L, NB] int32 — first page of each block's 2-page window,
        clamped so the window stays inside the table;
      off [L, 8, N] int32 — in-window entry offsets in [0, WINDOW_ENTRIES),
        out-of-window corners aliased by `mod WINDOW_ENTRIES`.
    """
    l, _, n = idx.shape
    nb = n // _B
    n_pages = t // PAGE_ENTRIES
    blocks = idx.reshape(l, 8, nb, _B)
    pages = jnp.min(blocks, axis=(1, 3)) // PAGE_ENTRIES      # [L, NB]
    pages = jnp.minimum(pages, max(n_pages - 2, 0))
    off = blocks - (pages * PAGE_ENTRIES)[:, None, :, None]
    # one wrap handles both directions: offsets beyond the window (Z-curve
    # discontinuities) and negative ones (small indices under the
    # n_pages-2 clamp) alias into [0, WINDOW_ENTRIES)
    off = off % WINDOW_ENTRIES
    return pages.astype(jnp.int32), off.reshape(l, 8, n).astype(jnp.int32)


def overflow_fraction(idx, t: int):
    """Fraction of corner accesses aliased by the window clamp (diagnostic)."""
    l, _, n = idx.shape
    nb = n // _B
    blocks = idx.reshape(l, 8, nb, _B)
    pages = jnp.min(blocks, axis=(1, 3)) // PAGE_ENTRIES
    pages = jnp.minimum(pages, max(t // PAGE_ENTRIES - 2, 0))
    off = blocks - (pages * PAGE_ENTRIES)[:, None, :, None]
    return jnp.mean(((off < 0) | (off >= WINDOW_ENTRIES)).astype(jnp.float32))


# -----------------------------------------------------------------------------
# kernels — grid (L, NB); point tiles [*, B]; window = 2 pages of the table
# -----------------------------------------------------------------------------

def _win_fwd_kernel(pages_ref, off_ref, w_ref, tab0_ref, tab1_ref, out_ref):
    """out[l, :, bB:+B] = trilinear blend of window-gathered features.

    off is RELATIVE to the window (precomputed by `window_offsets`);
    tab0/tab1 are the two [1, _PAGE_ROWS, 128] pages, scalar-prefetch-indexed.

    Per corner: one row one-hot matmul gathers the point's 128-lane row,
    then a single PAIR mask (lane>>1 == off&63 covers both feature lanes)
    accumulates w_c * masked row into S — 3 vreg ops/corner instead of the
    two per-feature compare+select+reduce chains. The even/odd parity sums
    that split S into (f0, f1) happen ONCE per block as a tiny [2,128]
    matmul (HIGHEST precision: S is an f32 accumulation).
    """
    tabt = jnp.concatenate([tab0_ref[0], tab1_ref[0]],
                           axis=0).T.astype(jnp.bfloat16)     # [128, 64]
    iota_pair = jax.lax.broadcasted_iota(jnp.int32, (128, _B), 0) >> 1
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (_WIN_ROWS, _B), 0)
    s = jnp.zeros((128, _B), jnp.float32)
    for c in range(8):
        off_c = off_ref[0, c:c + 1, :]                        # [1, B]
        oht = ((off_c >> 6) == iota_r).astype(jnp.bfloat16)   # [64, B]
        gathered = jax.lax.dot_general(
            tabt, oht, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)               # [128, B]
        w_c = w_ref[0, c:c + 1, :]
        s = s + jnp.where(iota_pair == (off_c & 63), gathered * w_c, 0.0)
    # parity split, once per block: out[0] = even-lane sum (f0), out[1] =
    # odd-lane sum (f1). Two masked full reductions — NOT a [2,128] matmul,
    # which Mosaic pads to M=128 (and x3 passes at f32 precision), costing
    # as much as three extra corner gathers.
    parity = jax.lax.broadcasted_iota(jnp.int32, (128, _B), 0) & 1
    f0 = jnp.sum(jnp.where(parity == 0, s, 0.0), axis=0, keepdims=True)
    f1 = jnp.sum(jnp.where(parity == 1, s, 0.0), axis=0, keepdims=True)
    out_ref[0] = jnp.concatenate([f0, f1], axis=0)            # [2, B]


def _win_bwd_kernel(pages_ref, off_ref, w_ref, g_ref, dtab_ref):
    """Accumulate each block's window gradient into the level's grad table.

    The whole per-level packed grad table ([R, 128] — 4 MB at 2^19) stays
    VMEM-resident as a revisited output block across the point-block grid
    dimension; the 64-row window update lands via a dynamic-slice
    accumulate. Zeroed on the level's first block.

    The per-lane cotangent row vt uses the same pair-mask trick as the
    forward: g01 (cotangent laid out by lane parity) is built once per
    block, each corner is then mask+scale — 3 vreg ops instead of the two
    per-feature compare+select chains.
    """
    l = pl.program_id(0)
    b = pl.program_id(1)

    @pl.when(b == 0)
    def _():
        dtab_ref[0] = jnp.zeros_like(dtab_ref[0])

    row0 = pages_ref[l, b] * _PAGE_ROWS
    iota_pair = jax.lax.broadcasted_iota(jnp.int32, (128, _B), 0) >> 1
    parity = jax.lax.broadcasted_iota(jnp.int32, (128, _B), 0) & 1
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (_WIN_ROWS, _B), 0)
    g01 = jnp.where(parity == 0, g_ref[0, 0:1, :], g_ref[0, 1:2, :])
    upd = jnp.zeros((_WIN_ROWS, 128), jnp.float32)
    for c in range(8):
        off_c = off_ref[0, c:c + 1, :]
        w_c = w_ref[0, c:c + 1, :]
        vt = jnp.where(iota_pair == (off_c & 63), g01 * w_c,
                       0.0).astype(jnp.bfloat16)              # [128, B]
        oht = ((off_c >> 6) == iota_r).astype(jnp.bfloat16)   # [64, B]
        upd = upd + jax.lax.dot_general(
            oht, vt, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)               # [64, 128]

    dtab_ref[0, pl.ds(row0, _WIN_ROWS), :] += upd


# -----------------------------------------------------------------------------
# host-side wrappers
# -----------------------------------------------------------------------------

def _prep(off, weights, n_pad):
    """Pad the relative entry offsets + weights to a _B multiple along
    points. Row/lane decomposition happens in-kernel (off>>6 / off&63 at
    F=2) — window starts are page-aligned, so in-window positions equal
    absolute packed positions; shipping `off` alone saves one [L, 8, N]
    HBM stream versus precomputed rows+lanes."""
    off = off.astype(jnp.int32)
    w = weights.astype(jnp.float32)
    if n_pad != off.shape[2]:
        pad = [(0, 0), (0, 0), (0, n_pad - off.shape[2])]
        off, w = (jnp.pad(x, pad) for x in (off, w))
    return off, w


def _pack(table):
    l, t, f = table.shape
    return table.reshape(l, t * f // 128, 128)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def hash_encode_win(table, idx, weights, pages, interpret=False):
    """Sorted-window hash-grid encode on the MXU.

    Args:
      table: [L, T, F=2] float32; T a multiple of PAGE_ENTRIES.
      idx: [L, 8, N] int32 corner entry indices, points SORTED along the
        Z-curve (see `morton_sort_keys`); N a multiple of _B.
      weights: [L, 8, N] trilinear corner weights.
      pages: [L, N/_B] int32 window pages from `window_offsets(idx, T)`.
      interpret: run kernels in interpret mode (CPU tests).

    Returns [N, L*F] float32 features, level-major (column l*F + f) —
    NEVER [N, L, F]: a 2-wide minor dim tile-pads to 128 lanes on TPU,
    inflating every HBM read/write of the output (and its cotangent on the
    backward pass) by 64x.
    """
    out, _ = _win_fwd_impl(table, idx, weights, pages, interpret)
    return out


def _point_specs():
    return [pl.BlockSpec((1, 8, _B), lambda i, j, pages: (i, 0, j),
                         memory_space=pltpu.VMEM)] * 2


def _win_fwd_impl(table, idx, weights, pages, interpret):
    l, t, f = table.shape
    if f != 2:
        raise ValueError("windowed hash encode supports features=2")
    if t % PAGE_ENTRIES:
        raise ValueError(f"table entries must divide {PAGE_ENTRIES}")
    if t // PAGE_ENTRIES < 2:
        raise ValueError("table too small for the windowed path; use the "
                         "dense kernel (ops/hash_encode.py)")
    n = idx.shape[2]
    if n % _B:
        raise ValueError(f"point count must be a multiple of {_B}")
    r = t * f // 128

    _, off = window_offsets(idx, t)
    off, w = _prep(off, weights, n)
    tabt = _pack(table)                                        # [L, R, 128]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(l, n // _B),
        in_specs=_point_specs() + [
            pl.BlockSpec((1, _PAGE_ROWS, 128),
                         lambda i, j, pages: (i, pages[i, j], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _PAGE_ROWS, 128),
                         lambda i, j, pages: (i, pages[i, j] + 1, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 2, _B), lambda i, j, pages: (i, 0, j),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _win_fwd_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((l, 2, n), jnp.float32),
        interpret=interpret,
    )(pages, off, w, tabt, tabt)
    # [L, 2, N] -> [L*2, N] is free (contiguous); the transpose to [N, L*2]
    # moves between two DENSE layouts (N-minor -> 32-minor, padded 4x not
    # 64x). Returning [N, L, F] here would tile-pad F=2 to 128 lanes.
    return out.reshape(l * 2, n).T, ((l, t, f), off, w, pages)


def _win_fwd_rule(table, idx, weights, pages, interpret):
    return _win_fwd_impl(table, idx, weights, pages, interpret)


def _win_bwd_rule(interpret, res, g):
    (l, t, f), off, w, pages = res
    r = t * f // 128
    n = off.shape[2]
    # g arrives [N, L*2]; dense-transpose then free reshape to [L, 2, N]
    g_l = g.T.reshape(l, 2, n).astype(jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(l, n // _B),
        in_specs=_point_specs() + [
            pl.BlockSpec((1, 2, _B), lambda i, j, pages: (i, 0, j),
                         memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, r, 128), lambda i, j, pages: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    dpacked = pl.pallas_call(
        _win_bwd_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((l, r, 128), jnp.float32),
        interpret=interpret,
    )(pages, off, w, g_l)
    return dpacked.reshape(l, t, f), None, None, None


hash_encode_win.defvjp(_win_fwd_rule, _win_bwd_rule)


# -----------------------------------------------------------------------------
# fused-geometry kernels: corner indices/weights computed IN-kernel
# -----------------------------------------------------------------------------
#
# The standalone kernels above stream precomputed `off` + `weights`
# ([L, 8, N] int32 + f32 = 800 MB at training shape) through HBM on the
# forward pass and AGAIN on the backward; producing them costs ~12 ms of
# XLA lane math per step on top (round-3 prof_hash). The fused variants
# take only the sorted coords block ([3, B] — 6 KB) plus two scalar-prefetch
# arrays (window pages, per-level resolutions) and rebuild the corner
# geometry inside the kernel: ~200 vreg-ops on [1, B] rows per block,
# ~1.5% of the block's existing VPU work, in exchange for dropping both
# 800 MB streams and the XLA prep stage entirely.

def _corner_geom(xt, res_l, base, log2t: int, mask_t):
    """In-kernel corner window-offsets + trilinear weights for one
    (level, block): bit-identical to `corner_indices_weights_win` followed
    by `window_offsets`'s off computation on the same inputs (same f32 op
    order, same uint32 lane math; `& (WINDOW_ENTRIES-1)` equals the host's
    floor-mod on int32 for a power-of-two window).

    xt: [3, B] f32 Z-sorted block coords; res_l: scalar f32 level scale;
    base: scalar int32 window start entry (page * PAGE_ENTRIES).
    Returns ([8] of [1, B] int32 in-window offsets, [8] of [1, B] f32 w).
    """
    k_fold = jnp.uint32(2246822519)
    k_hi = jnp.uint32(2654435761)
    xs = xt * res_l
    x0f = jnp.floor(xs)
    frac = xs - x0f
    # Mosaic has no f32->u32 convert; f32->i32->u32 is exact here (coords
    # are < 2^18) and bitwise-identical to the host's direct u32 cast
    x0 = x0f.astype(jnp.int32).astype(jnp.uint32)
    sp_lo = [[_spread9(x0[a:a + 1, :] + jnp.uint32(d)) << a for a in range(3)]
             for d in (0, 1)]
    sp_hi = [[_spread9((x0[a:a + 1, :] + jnp.uint32(d)) >> 9) << a
              for a in range(3)] for d in (0, 1)]
    fr = [[1.0 - frac[a:a + 1, :], frac[a:a + 1, :]] for a in range(3)]
    offs, ws = [], []
    for ci in range(8):
        i, j, k = (ci >> 2) & 1, (ci >> 1) & 1, ci & 1
        m = sp_lo[i][0] | sp_lo[j][1] | sp_lo[k][2]
        hi = sp_hi[i][0] | sp_hi[j][1] | sp_hi[k][2]
        mixed = m ^ ((m >> log2t) * k_fold) ^ (hi * k_hi)
        idx_c = (mixed & mask_t).astype(jnp.int32)
        offs.append((idx_c - base) & jnp.int32(WINDOW_ENTRIES - 1))
        ws.append(fr[0][i] * fr[1][j] * fr[2][k])
    return offs, ws


def _win_fwd_fused_kernel(log2t: int, mask_t: int, pages_ref, res_ref,
                          xt_ref, tab0_ref, tab1_ref, out_ref):
    """Fused-geometry forward: `_win_fwd_kernel`'s gather/blend loop with
    off/w rebuilt in-kernel from the coords block."""
    l = pl.program_id(0)
    j = pl.program_id(1)
    base = pages_ref[l, j] * PAGE_ENTRIES
    offs, ws = _corner_geom(xt_ref[...], res_ref[l].astype(jnp.float32),
                            base, log2t, jnp.uint32(mask_t))
    tabt = jnp.concatenate([tab0_ref[0], tab1_ref[0]],
                           axis=0).T.astype(jnp.bfloat16)     # [128, 64]
    iota_pair = jax.lax.broadcasted_iota(jnp.int32, (128, _B), 0) >> 1
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (_WIN_ROWS, _B), 0)
    s = jnp.zeros((128, _B), jnp.float32)
    for c in range(8):
        off_c = offs[c]                                       # [1, B]
        oht = ((off_c >> 6) == iota_r).astype(jnp.bfloat16)   # [64, B]
        gathered = jax.lax.dot_general(
            tabt, oht, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)               # [128, B]
        s = s + jnp.where(iota_pair == (off_c & 63), gathered * ws[c], 0.0)
    parity = jax.lax.broadcasted_iota(jnp.int32, (128, _B), 0) & 1
    f0 = jnp.sum(jnp.where(parity == 0, s, 0.0), axis=0, keepdims=True)
    f1 = jnp.sum(jnp.where(parity == 1, s, 0.0), axis=0, keepdims=True)
    out_ref[0] = jnp.concatenate([f0, f1], axis=0)            # [2, B]


def _win_bwd_fused_kernel(log2t: int, mask_t: int, pages_ref, res_ref,
                          xt_ref, g_ref, dtab_ref):
    """Fused-geometry backward: `_win_bwd_kernel`'s accumulate loop with
    off/w rebuilt in-kernel."""
    l = pl.program_id(0)
    b = pl.program_id(1)

    @pl.when(b == 0)
    def _():
        dtab_ref[0] = jnp.zeros_like(dtab_ref[0])

    page = pages_ref[l, b]
    offs, ws = _corner_geom(xt_ref[...], res_ref[l].astype(jnp.float32),
                            page * PAGE_ENTRIES, log2t, jnp.uint32(mask_t))
    row0 = page * _PAGE_ROWS
    iota_pair = jax.lax.broadcasted_iota(jnp.int32, (128, _B), 0) >> 1
    parity = jax.lax.broadcasted_iota(jnp.int32, (128, _B), 0) & 1
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (_WIN_ROWS, _B), 0)
    g01 = jnp.where(parity == 0, g_ref[0, 0:1, :], g_ref[0, 1:2, :])
    upd = jnp.zeros((_WIN_ROWS, 128), jnp.float32)
    for c in range(8):
        off_c = offs[c]
        vt = jnp.where(iota_pair == (off_c & 63), g01 * ws[c],
                       0.0).astype(jnp.bfloat16)              # [128, B]
        oht = ((off_c >> 6) == iota_r).astype(jnp.bfloat16)   # [64, B]
        upd = upd + jax.lax.dot_general(
            oht, vt, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)               # [64, 128]

    dtab_ref[0, pl.ds(row0, _WIN_ROWS), :] += upd


def window_pages(xt_s, resolutions, t: int):
    """[L, N/_B] window pages straight from sorted coords. The full
    [L, 8, N] corner-index array exists only inside XLA's fused
    min-reduction here (w's compute chain is dead code) — nothing
    block-sized is materialized to HBM."""
    idx, _ = corner_indices_weights_win(xt_s, resolutions, t)
    return window_offsets(idx, t)[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 4))
def hash_encode_win_fused(table, xt_s, resolutions, pages, interpret=False):
    """Sorted-window hash-grid encode with in-kernel corner geometry.

    Same contract and results as `hash_encode_win(table, idx, w, pages)`
    where `idx, w = corner_indices_weights_win(xt_s, resolutions, t)` —
    but off/w never exist outside the kernel. Differentiable wrt `table`
    only (sample positions are not trainable in this pipeline).

    Args:
      table: [L, T, F=2] float32.
      xt_s: [3, N] f32 Z-SORTED coords in [0,1] (from `sort_perm`),
        N a multiple of _B.
      resolutions: static tuple of per-level int resolutions.
      pages: [L, N/_B] int32 from `window_pages(xt_s, resolutions, T)`.
    """
    out, _ = _win_fused_impl(table, xt_s, resolutions, pages, interpret)
    return out


def _win_fused_impl(table, xt_s, resolutions, pages, interpret):
    l, t, f = table.shape
    if f != 2:
        raise ValueError("windowed hash encode supports features=2")
    if t % PAGE_ENTRIES or t // PAGE_ENTRIES < 2:
        raise ValueError("table too small for the windowed path")
    n = xt_s.shape[1]
    if n % _B:
        raise ValueError(f"point count must be a multiple of {_B}")
    log2t = t.bit_length() - 1
    res_arr = jnp.asarray(resolutions, jnp.int32)
    tabt = _pack(table)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(l, n // _B),
        in_specs=[
            pl.BlockSpec((3, _B), lambda i, j, pages, res: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _PAGE_ROWS, 128),
                         lambda i, j, pages, res: (i, pages[i, j], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _PAGE_ROWS, 128),
                         lambda i, j, pages, res: (i, pages[i, j] + 1, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 2, _B), lambda i, j, pages, res: (i, 0, j),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_win_fwd_fused_kernel, log2t, t - 1),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((l, 2, n), jnp.float32),
        interpret=interpret,
    )(pages, res_arr, xt_s, tabt, tabt)
    return out.reshape(l * 2, n).T, ((l, t, f), xt_s, pages)


def _win_fused_fwd_rule(table, xt_s, resolutions, pages, interpret):
    return _win_fused_impl(table, xt_s, resolutions, pages, interpret)


def _win_fused_bwd_rule(resolutions, interpret, res, g):
    (l, t, f), xt_s, pages = res
    r = t * f // 128
    n = xt_s.shape[1]
    log2t = t.bit_length() - 1
    res_arr = jnp.asarray(resolutions, jnp.int32)
    g_l = g.T.reshape(l, 2, n).astype(jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(l, n // _B),
        in_specs=[
            pl.BlockSpec((3, _B), lambda i, j, pages, res: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, _B), lambda i, j, pages, res: (i, 0, j),
                         memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, r, 128), lambda i, j, pages, res: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    dpacked = pl.pallas_call(
        functools.partial(_win_bwd_fused_kernel, log2t, t - 1),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((l, r, 128), jnp.float32),
        interpret=interpret,
    )(pages, res_arr, xt_s, g_l)
    return dpacked.reshape(l, t, f), None, None


hash_encode_win_fused.defvjp(_win_fused_fwd_rule, _win_fused_bwd_rule)


def corner_indices_weights_win(xt, resolutions, t: int):
    """Locality-preserving corner indices for the windowed kernel.

    xt: [3, N] in [0,1], coords-major (points SORTED along the Z-curve —
    the layout `sort_perm` emits; [N, 3] would lane-pad 3->128). Returns
    (idx [L, 8, N] int32, w [L, 8, N] f32) with trilinear weights identical
    to `HashGridEncoding.corner_indices_weights` but the hash replaced by

        m   = morton27(c)                      # 27-bit Z-index, low 9b/axis
        idx = (m ^ (m >> log2 t) * K1 ^ morton27(c >> 9) * K2) mod t

    The Z-index is window-local for spatially adjacent cells. The two XOR
    terms fold the out-of-range bits back in pseudo-randomly; each is
    constant across a sorted block's neighbourhood, so they shift the whole
    window instead of breaking it. The mapping is injective (collision-free)
    while m < t, i.e. for level resolutions <= 2^floor(log2(t)/3) - 1
    (res <= 63 at the reference-default t=2^19); the reference's dense
    indexing stays collision-free slightly longer (up to (r+1)^3 <= t,
    res 79 at 2^19) but is not Z-local — for the in-between levels this
    trades a few extra pseudo-random collisions for MXU-windowable access
    (instant-ngp §4: hash grids train through collisions by construction;
    the collision PATTERN is a free design axis).
    """
    if t & (t - 1):
        raise ValueError("table size must be a power of two")
    log2t = t.bit_length() - 1
    mask = jnp.uint32(t - 1)
    k_fold = jnp.uint32(2246822519)
    k_hi = jnp.uint32(2654435761)
    scales = jnp.asarray(resolutions, xt.dtype)
    xs = scales[:, None, None] * xt[None]                  # [L, 3, N]
    x0f = jnp.floor(xs)
    frac = xs - x0f
    x0 = x0f.astype(jnp.uint32)
    # the 8 corners take only TWO distinct values per axis (c and c+1):
    # spread the bits 2x3 times (low 9b) + 2x3 (high 9b) instead of 8x3+8x3
    # — the spread9 chains are ~2/3 of this function's lane math
    sp_lo = [[_spread9(x0[:, a, :] + np.uint32(d)) << a for a in range(3)]
             for d in (0, 1)]                              # [2][3] of [L, N]
    sp_hi = [[_spread9((x0[:, a, :] + np.uint32(d)) >> 9) << a
              for a in range(3)] for d in (0, 1)]
    idx_c, w_c = [], []
    for ci in range(8):
        i, j, k = (ci >> 2) & 1, (ci >> 1) & 1, ci & 1
        m = sp_lo[i][0] | sp_lo[j][1] | sp_lo[k][2]
        hi = sp_hi[i][0] | sp_hi[j][1] | sp_hi[k][2]
        mixed = m ^ ((m >> log2t) * k_fold) ^ (hi * k_hi)
        idx_c.append((mixed & mask).astype(jnp.int32))
        wx = frac[:, 0, :] if i else 1.0 - frac[:, 0, :]
        wy = frac[:, 1, :] if j else 1.0 - frac[:, 1, :]
        wz = frac[:, 2, :] if k else 1.0 - frac[:, 2, :]
        w_c.append(wx * wy * wz)
    return (jnp.stack(idx_c, axis=1),
            jnp.stack(w_c, axis=1).astype(jnp.float32))


def sort_perm(x, finest_res: float, n_pad: int, extra=()):
    """Z-curve sort of padded points. Returns (x_sorted [3, n_pad] —
    coords-major, the dense TPU layout — plus perm, inv_perm int32
    [n_pad], plus one sorted [n_pad] column per `extra` entry).

    Pad slots (id >= N) carry clamped copies of the last point so they sort
    adjacently and never widen a real block's window. The coordinate
    columns (and any `extra` per-point columns, e.g. view directions for
    the sorted-through-MLP field path) ride the SAME `lax.sort` as the
    keys — a separate x[perm] row-gather would materialize the [N, 3]
    array lane-padded 3->128 on TPU (42x HBM inflation). inv_perm comes
    from a second key-only sort; no serialized scatter anywhere."""
    n = x.shape[0]
    hi, lo = morton_sort_keys(x, finest_res)
    cols = [x[:, 0], x[:, 1], x[:, 2], *extra]
    if n_pad != n:
        pad = (n_pad - n,)
        hi = jnp.concatenate([hi, jnp.full(pad, hi[-1])])
        lo = jnp.concatenate([lo, jnp.full(pad, lo[-1])])
        cols = [jnp.concatenate([c, jnp.full(pad, c[-1])]) for c in cols]
    iota = jnp.arange(n_pad, dtype=jnp.int32)
    out = jax.lax.sort((hi, lo, iota, *cols), num_keys=2)
    perm = out[2]
    _, inv_perm = jax.lax.sort((perm, iota), num_keys=1)
    return (jnp.stack(out[3:6], axis=0), perm, inv_perm, *out[6:])


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def unsort_columns(perm, inv_perm, *cols):
    """Restore caller order for per-point columns produced in Z-sorted
    order — the cheap inverse of `sort_perm` for SMALL channel counts.

    A row-gather of a [N, C] array would tile-pad C -> 128 lanes on TPU;
    sorting the columns keyed by `perm` applies the inverse permutation as
    dense column traffic instead (sorted position j holds original index
    perm[j]; ordering by perm ascending is exactly the unsort). The VJP is
    the forward permutation, applied the same way keyed by `inv_perm`."""
    return jax.lax.sort((perm, *cols), num_keys=1)[1:]


def _unsort_fwd(perm, inv_perm, *cols):
    return unsort_columns(perm, inv_perm, *cols), (perm, inv_perm)


def _unsort_bwd(res, g):
    perm, inv_perm = res
    g_sorted = jax.lax.sort((inv_perm, *g), num_keys=1)[1:]
    return (None, None, *g_sorted)


unsort_columns.defvjp(_unsort_fwd, _unsort_bwd)


def encode_win(table, x, resolutions, *, interpret=False, use_kernel=True):
    """Full windowed hash-grid encode of UNSORTED points.

    x: [N, 3] in [0,1]; table [L, T, 2]. Returns [N, L*2] float32
    (level-major columns; dense minor dim — see `hash_encode_win`).
    Sorts points along the Z-curve, encodes with the windowed kernel (or the
    bit-identical XLA oracle when `use_kernel=False` — the CPU path), and
    restores the caller's point order. Fully differentiable wrt `table`.
    """
    l, t, f = table.shape
    n = x.shape[0]
    n_pad = -(-n // _B) * _B
    xt_s, perm, inv_perm = sort_perm(x, float(max(resolutions)), n_pad)
    if use_kernel:
        pages = window_pages(xt_s, resolutions, t)
        out = hash_encode_win_fused(table, xt_s, tuple(resolutions), pages,
                                    interpret)
    else:
        idx, w = corner_indices_weights_win(xt_s, resolutions, t)
        pages, _ = window_offsets(idx, t)
        out = hash_encode_win_xla(table, idx, w, pages)
    return permute_rows(out, inv_perm, perm)[:n]          # [N, L*F]


def hash_encode_win_xla(table, idx, weights, pages):
    """XLA oracle with bit-identical window-clamp semantics (CPU fallback
    and numerical reference for the Pallas kernels). Returns [N, L*F],
    level-major — same contract as `hash_encode_win`."""
    l, t, f = table.shape
    n = idx.shape[2]
    _, off = window_offsets(idx, t)
    eff = (pages * PAGE_ENTRIES)[:, None, :].repeat(8, 1)
    eff = jnp.repeat(eff, _B, axis=2) + off                    # [L, 8, N]
    flat = (eff.reshape(l, 8 * n)
            + (jnp.arange(l, dtype=jnp.int32) * t)[:, None]).reshape(-1)
    feats = table.reshape(l * t, f)[flat].reshape(l, 8, n, f)
    out = jnp.sum(feats * weights[..., None].astype(feats.dtype),
                  axis=1)                                      # [L, N, F]
    return out.transpose(1, 0, 2).reshape(n, l * f)
