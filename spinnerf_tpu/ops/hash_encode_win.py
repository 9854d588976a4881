"""Sorted-window hash-grid encode: O(window) MXU gathers (Pallas).

The dense one-hot formulation in `ops/hash_encode.py` does O(T) MXU work per
point (every block multiplies against the whole table) — 3.5 s/step at the
reference-default `log2_hashmap_size=19` (`DS_NeRF/run_nerf_helpers_tcnn.py:24`).
This module restores O(1)-per-access cost the TPU way:

1. **Sort points along a Z-order curve** (54-bit Morton key as two int32
   lanes, `lax.sort` with num_keys=2 — measured 2.3 ms for 786k points on
   v5e). Consecutive points become spatial neighbours.
2. **Position-region hash** (`corner_indices_weights_win`): coarse levels
   (collision-free in 27 Morton bits) index by cell Morton; fine levels by
   `region(point) base + xor_prime_hash(cell) & cap`, where the region is
   a PREFIX of the point's sort key. All 8 corners of a point share its
   region, consecutive sorted points have equal-or-adjacent regions, and a
   region's entries fit one kernel window — so a block of sorted points
   touches a compact index *window* BY CONSTRUCTION, batch-independently,
   on real ray-sample distributions (<1% fine-level corner aliasing at
   training shapes). (An earlier folded-Morton index keyed fine cells by
   their low Morton bits, which are pseudo-random across a block at real
   point spreads: 68-94% of fine corners aliased batch-DEPENDENTLY,
   costing ~9 dB vs an XOR-hash control — PARITY_RUN §4. Collisions
   themselves are fine — instant-ngp §4 trains through them — but the
   collision pattern must not depend on the batch.)
3. **Windowed one-hot matmuls**: each 512-point block multiplies against a
   2-page window (2x2048 entries = 64 packed rows) of the level table that
   Pallas DMAs in via a scalar-prefetched page id — 128x less MXU work than
   the dense kernel at 2^19. The rare out-of-window corner (region-boundary
   blocks) is aliased to `offset mod 4096` inside the window — one extra
   deterministic collision, identical in forward and backward.
4. **Backward**: per-block window gradients are accumulated straight into
   an HBM gradient table with in-kernel async DMA (sequential TPU grid =>
   no races); blocks' windows may overlap arbitrarily.
5. **Small batches** (`N < N_WINDOWED_MIN`: too few blocks for window
   locality) fall back to `hash_encode_exact` — XLA gather with the SAME
   index function, zero aliasing, cheap at that size.

The XLA oracle (`hash_encode_win_xla`) reproduces the window-clamp
semantics bit-exactly and is the kernel test reference.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# instant-ngp's spatial-hash primes (`run_nerf_helpers_tcnn.py` semantics,
# shared with models/hashgrid.py) — the in-region mixing of the fine-level
# position-region hash (`corner_indices_weights_win`)
_PRIMES = (1, 2654435761, 805459861)

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

    The sort grid is finest_res rounded UP to a power of two (<= 2^18): the
    position-region hash requires the region grid (floor(x * 2^k)) to be a
    bit-PREFIX of the sort key so region ids are monotone along the sorted
    stream — under a non-power-of-two sort grid they are not (measured 32%%
    fine-level window aliasing at 786k points vs 0.7%% fixed).
    """
    res = float(1 << min(18, max(1, int(np.ceil(np.log2(
        max(float(finest_res), 2.0)))))))
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

def _corner_geom(xt, bc, res_l, dense_l, base, t: int):
    """In-kernel corner window-offsets + trilinear weights for one
    (level, block): bit-identical to `corner_indices_weights_win` followed
    by `window_offsets`'s off computation on the same inputs (same f32 op
    order, same uint32 lane math; `& (WINDOW_ENTRIES-1)` equals the host's
    floor-mod on int32 for a power-of-two window).

    xt: [3, B] f32 Z-sorted block coords; bc: [2, B] f32 per-point region
    (entry base, capacity mask) from the host's `region_lookup` (values are
    f32-exact ints < 2^24); res_l: scalar f32 level scale; dense_l: scalar
    int32, 1 if this level is in the injective-morton regime (host:
    `res <= res_dense`); base: scalar int32 window start entry
    (page * PAGE_ENTRIES).
    Returns ([8] of [1, B] int32 in-window offsets, [8] of [1, B] f32 w).
    """
    p1 = jnp.uint32(_PRIMES[1])
    p2 = jnp.uint32(_PRIMES[2])
    xs = xt * res_l
    # clamp to the grid's last cell — bit-identical to the host path's
    # boundary clamp in `corner_indices_weights_win` (same f32 op order)
    x0f = jnp.minimum(jnp.floor(xs), res_l - 1.0)
    frac = xs - x0f
    # Mosaic has no f32->u32 convert; f32->i32->u32 is exact here (coords
    # are < 2^18) and bitwise-identical to the host's direct u32 cast
    x0 = x0f.astype(jnp.int32).astype(jnp.uint32)
    rbase = bc[0:1, :].astype(jnp.int32).astype(jnp.uint32)   # [1, B]
    capm = bc[1:2, :].astype(jnp.int32).astype(jnp.uint32)    # [1, B]
    use_dense = dense_l > 0
    sp_lo = [[_spread9(x0[a:a + 1, :] + jnp.uint32(d)) << a for a in range(3)]
             for d in (0, 1)]
    fr = [[1.0 - frac[a:a + 1, :], frac[a:a + 1, :]] for a in range(3)]
    offs, ws = [], []
    for ci in range(8):
        i, j, k = (ci >> 2) & 1, (ci >> 1) & 1, ci & 1
        m = sp_lo[i][0] | sp_lo[j][1] | sp_lo[k][2]
        cx = x0[0:1, :] + jnp.uint32(i)
        cy = x0[1:2, :] + jnp.uint32(j)
        cz = x0[2:3, :] + jnp.uint32(k)
        hashed = rbase + ((cx ^ (cy * p1) ^ (cz * p2)) & capm)
        idx_c = jnp.where(use_dense, m, hashed).astype(jnp.int32)
        offs.append((idx_c - base) & jnp.int32(WINDOW_ENTRIES - 1))
        ws.append(fr[0][i] * fr[1][j] * fr[2][k])
    return offs, ws


def _win_fwd_fused_kernel(t: int, pages_ref, res_ref,
                          xt_ref, bc_ref, tab0_ref, tab1_ref, out_ref):
    """Fused-geometry forward: `_win_fwd_kernel`'s gather/blend loop with
    off/w rebuilt in-kernel from the coords block. res_ref is [L, 2]:
    (level scale, dense-morton-regime flag); bc_ref the [2, B] per-point
    region base/capmask block."""
    l = pl.program_id(0)
    j = pl.program_id(1)
    base = pages_ref[l, j] * PAGE_ENTRIES
    offs, ws = _corner_geom(xt_ref[...], bc_ref[...],
                            res_ref[l, 0].astype(jnp.float32),
                            res_ref[l, 1], base, t)
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


def _win_bwd_fused_kernel(t: int, pages_ref, res_ref,
                          xt_ref, bc_ref, g_ref, dtab_ref):
    """Fused-geometry backward: `_win_bwd_kernel`'s accumulate loop with
    off/w rebuilt in-kernel."""
    l = pl.program_id(0)
    b = pl.program_id(1)

    @pl.when(b == 0)
    def _():
        dtab_ref[0] = jnp.zeros_like(dtab_ref[0])

    page = pages_ref[l, b]
    offs, ws = _corner_geom(xt_ref[...], bc_ref[...],
                            res_ref[l, 0].astype(jnp.float32),
                            res_ref[l, 1], page * PAGE_ENTRIES, t)
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


# Below this many (padded) points the windowed kernels lose their premise:
# too few blocks to keep each block's Z-span inside a handful of regions,
# so window aliasing grows — while XLA's serialized gather/scatter is still
# cheap. The model path switches to `hash_encode_exact` under this bound.
N_WINDOWED_MIN = 1 << 17


def hash_encode_exact(table, idx, weights):
    """Exact (window-free) encode with the SAME index function as the
    windowed kernels — the small-batch fallback (and the CPU model path):
    XLA gather + weighted sum, O(1) per access, differentiable wrt table
    (scatter-add backward — serialized on TPU, which is why this only runs
    under `N_WINDOWED_MIN`). Returns [N, L*F] level-major, the windowed
    contract, with zero aliasing."""
    l, t, f = table.shape
    n = idx.shape[2]
    feats = jnp.take_along_axis(
        table, idx.reshape(l, -1)[..., None], axis=1).reshape(l, 8, n, f)
    out = jnp.sum(feats * weights[..., None].astype(feats.dtype), axis=1)
    return out.transpose(1, 0, 2).reshape(n, l * f)


def window_pages(xt_s, resolutions, t: int, region_caps=None):
    """[L, N/_B] window pages straight from sorted coords. The full
    [L, 8, N] corner-index array exists only inside XLA's fused
    min-reduction here (w's compute chain is dead code) — nothing
    block-sized is materialized to HBM."""
    idx, _ = corner_indices_weights_win(xt_s, resolutions, t, region_caps)
    return window_offsets(idx, t)[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 4, 5))
def hash_encode_win_fused(table, xt_s, resolutions, pages, interpret=False,
                          region_caps=None):
    """Sorted-window hash-grid encode with in-kernel corner geometry.

    Same contract and results as `hash_encode_win(table, idx, w, pages)`
    where `idx, w = corner_indices_weights_win(xt_s, resolutions, t,
    region_caps)` — but off/w never exist outside the kernel.
    Differentiable wrt `table` only (sample positions are not trainable in
    this pipeline).

    Args:
      table: [L, T, F=2] float32.
      xt_s: [3, N] f32 Z-SORTED coords in [0,1] (from `sort_perm`),
        N a multiple of _B.
      resolutions: static tuple of per-level int resolutions.
      pages: [L, N/_B] int32 from `window_pages(xt_s, resolutions, T,
        region_caps)`.
      region_caps: static tuple of per-region capacities (see
        `normalize_caps`); None = uniform.
    """
    out, _ = _win_fused_impl(table, xt_s, resolutions, pages, interpret,
                             region_caps)
    return out


def _point_bc(xt_s, t, region_caps):
    """[2, N] f32 per-point (region base, capacity mask) kernel input."""
    base, capm = region_lookup(region_ids(xt_s, t), t, region_caps)
    return jnp.stack([base, capm]).astype(jnp.float32)


def _win_fused_impl(table, xt_s, resolutions, pages, interpret, region_caps):
    l, t, f = table.shape
    if f != 2:
        raise ValueError("windowed hash encode supports features=2")
    if t % PAGE_ENTRIES or t // PAGE_ENTRIES < 2:
        raise ValueError("table too small for the windowed path")
    n = xt_s.shape[1]
    if n % _B:
        raise ValueError(f"point count must be a multiple of {_B}")
    res_arr = _res_scalars(resolutions, t)
    bc = _point_bc(xt_s, t, region_caps)
    tabt = _pack(table)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(l, n // _B),
        in_specs=[
            pl.BlockSpec((3, _B), lambda i, j, pages, res: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, _B), lambda i, j, pages, res: (0, j),
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
        functools.partial(_win_fwd_fused_kernel, t),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((l, 2, n), jnp.float32),
        interpret=interpret,
    )(pages, res_arr, xt_s, bc, tabt, tabt)
    # bc rides the residuals ([2, N] f32 — 6 MB at training shape): the
    # backward would otherwise rebuild it (region_ids + the [R, N] one-hot
    # region_lookup matmul) per pass — measured ~2 ms/step at 786k points
    return out.reshape(l * 2, n).T, ((l, t, f), xt_s, bc, pages)


def _res_scalars(resolutions, t: int):
    """[L, 2] int32 scalar-prefetch rows: (level scale, dense-regime flag)."""
    _, _, res_dense = region_geometry(t)
    return jnp.asarray([[int(r), int(r <= res_dense)] for r in resolutions],
                       jnp.int32)


def _win_fused_fwd_rule(table, xt_s, resolutions, pages, interpret,
                        region_caps):
    return _win_fused_impl(table, xt_s, resolutions, pages, interpret,
                           region_caps)


def _win_fused_bwd_rule(resolutions, interpret, region_caps, res, g):
    (l, t, f), xt_s, bc, pages = res
    r = t * f // 128
    n = xt_s.shape[1]
    res_arr = _res_scalars(resolutions, t)
    g_l = g.T.reshape(l, 2, n).astype(jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(l, n // _B),
        in_specs=[
            pl.BlockSpec((3, _B), lambda i, j, pages, res: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, _B), lambda i, j, pages, res: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, _B), lambda i, j, pages, res: (i, 0, j),
                         memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, r, 128), lambda i, j, pages, res: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    dpacked = pl.pallas_call(
        functools.partial(_win_bwd_fused_kernel, t),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((l, r, 128), jnp.float32),
        interpret=interpret,
    )(pages, res_arr, xt_s, bc, g_l)
    return dpacked.reshape(l, t, f), None, None


hash_encode_win_fused.defvjp(_win_fused_fwd_rule, _win_fused_bwd_rule)


def region_ids(xt, t: int):
    """[N] uint32 region of each point: Morton code of its coarse cell on
    the cubic region grid (a PREFIX of the sort key, so region ids are
    monotone along the Z-sorted stream). xt: [3, N] in [0,1]."""
    region_bits, _, _ = region_geometry(t)
    rres = float(1 << (region_bits // 3))
    rc = jnp.clip((xt * rres).astype(jnp.uint32), 0,
                  jnp.uint32((1 << (region_bits // 3)) - 1))
    return morton27(rc[0], rc[1], rc[2])


def normalize_caps(t: int, region_caps):
    """Validated per-region capacities. None -> uniform split of t over
    the region grid. Returns a tuple of R ints: powers of two in
    [1, WINDOW_ENTRIES], summing to at most t (entries past the sum are
    simply unused table capacity)."""
    region_bits, cap_bits, _ = region_geometry(t)
    r = 1 << region_bits
    if region_caps is None:
        return (1 << cap_bits,) * r
    caps = tuple(int(c) for c in region_caps)
    if len(caps) != r:
        raise ValueError(f"region_caps must have {r} entries, got {len(caps)}")
    if not 0 < sum(caps) <= t:
        raise ValueError(f"region_caps must sum to <= {t}, got {sum(caps)}")
    for c in caps:
        if c < 1 or c > WINDOW_ENTRIES or (c & (c - 1)):
            raise ValueError(f"caps must be powers of two in "
                             f"[1, {WINDOW_ENTRIES}]; got {c}")
    return caps


def region_lookup(region, t: int, region_caps=None):
    """(base [N] u32, capmask [N] u32) for per-point regions via a one-hot
    f32 matmul (values < 2^24 are f32-exact; a serialized jnp.take gather
    would cost ~60 ms at training N on TPU)."""
    caps = normalize_caps(t, region_caps)
    r = len(caps)
    base_np = np.concatenate([[0], np.cumsum(caps)[:-1]]).astype(np.float32)
    vals = jnp.asarray(np.stack([base_np,
                                 np.asarray(caps, np.float32) - 1.0]))
    iota = jnp.arange(r, dtype=jnp.uint32)[:, None]         # [R, 1]
    onehot = (iota == region[None, :]).astype(jnp.float32)  # [R, N]
    out = jax.lax.dot_general(vals, onehot,
                              dimension_numbers=(((1,), (0,)), ((), ())))
    return out[0].astype(jnp.uint32), out[1].astype(jnp.uint32)


def region_geometry(t: int):
    """(region_bits, cap_bits, collision-free resolution bound) for table
    size t. Regions are cubic (region_bits divisible by 3), the FEWEST that
    keep a region's cap = 2^cap_bits inside one kernel window — so a
    region's entries always fit the 2-page DMA. t=2^19 (the reference
    default): 512 regions x 1024 entries."""
    log2t = t.bit_length() - 1
    win_bits = WINDOW_ENTRIES.bit_length() - 1            # 12
    region_bits = 3 * (-(-max(log2t - win_bits, 0) // 3))  # ceil to cubic
    cap_bits = log2t - region_bits
    # dense-morton regime only while the WHOLE level grid fits one kernel
    # window: coarser-but-bigger grids (e.g. res 30-63 at 2^19) have
    # occupancy GAPS along the Z-curve that blow per-block index spans
    # (measured 12-25% aliased corners at res 30/56) — the region hash
    # keeps those levels window-tight too
    res_dense = 15                                        # (15+1)^3 = 4096
    return region_bits, cap_bits, res_dense


def corner_indices_weights_win(xt, resolutions, t: int, region_caps=None):
    """Window-local corner indices for the sorted-window kernel.

    xt: [3, N] in [0,1], coords-major (points SORTED along the Z-curve —
    the layout `sort_perm` emits; [N, 3] would lane-pad 3->128). Returns
    (idx [L, 8, N] int32, w [L, 8, N] f32) with trilinear weights identical
    to `HashGridEncoding.corner_indices_weights` but the index function
    replaced by a two-regime scheme:

    COARSE levels (res <= res_dense = 15: the whole level grid fits one
    4096-entry kernel window — see `region_geometry`):
        idx = morton27(cell)            # injective AND Z-window-local

    FINE levels (everything above) — the POSITION-REGION hash:
        region = morton27(floor(x * 2^(rb/3)))        # rb = 9 at 2^19
        idx    = region * 2^cb + (xor_prime_hash(cell) & (2^cb - 1))

    where region comes from the POINT's position (a prefix of its sort
    key), not the corner cell, and cb = log2 t - rb (1024 entries/region
    at 2^19). Properties this buys:

    - Z-window-locality BY CONSTRUCTION: all 8 corners of a point share
      its region; consecutive Z-sorted points have equal-or-adjacent
      regions, so a 512-point block's indices span a few contiguous
      2^cb-entry ranges <= the kernel's 4096-entry window. (The previous
      folded-Morton index keyed fine cells by their LOW 9 Morton bits,
      which are pseudo-random across a block at realistic ray-sample
      spreads — measured 68-94%% of fine-level corners aliased by the
      window clamp, batch-DEPENDENTLY, costing ~9 dB vs an XOR-hash
      control at equal capacity; see PARITY_RUN §4.)
    - Batch-independence: idx is a pure function of (point position,
      cell) — no dependence on which other points share the batch.
    - Collisions are confined within a region (cells of one region
      compete for its 2^cb entries via the reference's XOR-prime hash,
      `run_nerf_helpers_tcnn.py` semantics); region load follows sample
      density rather than being uniform — the remaining gap to an ideal
      allocation-calibrated map (instant-ngp §4: hash grids train
      through collisions; the PATTERN is a free design axis).
    - A cell read from points in different regions (region-boundary
      cells) resolves to different entries — equivalent to a hard
      spatial partition of the hash table (block-hash grids), a known
      benign discontinuity at 1/8-scene granularity.
    """
    if t & (t - 1):
        raise ValueError("table size must be a power of two")
    region_bits, cap_bits, res_dense = region_geometry(t)
    p1 = jnp.uint32(_PRIMES[1])
    p2 = jnp.uint32(_PRIMES[2])
    scales = jnp.asarray(resolutions, xt.dtype)
    xs = scales[:, None, None] * xt[None]                  # [L, 3, N]
    # clamp the cell to res-1 (the grid's last cell): a clipped boundary
    # point x == 1.0 otherwise lands in cell `res` whose +1 corner (res+1)
    # escapes the dense-morton window span (and, for small tables, the
    # table itself). frac then reaches 1.0 so the full weight sits on the
    # corner at coordinate res — the reference grid extent.
    x0f = jnp.minimum(jnp.floor(xs), scales[:, None, None] - 1.0)
    frac = xs - x0f
    x0 = x0f.astype(jnp.uint32)
    # the point's region: prefix of the sort key (monotone along the
    # Z-sorted stream). [N], shared by all levels and corners. Its base
    # entry + in-region hash mask come from the (possibly calibrated)
    # capacity tables via a one-hot matmul — NOT jnp.take, whose serialized
    # TPU gather would cost ~60 ms at training point counts.
    region = region_ids(xt, t)                             # [N] uint32
    base, capm = region_lookup(region, t, region_caps)     # [N] each, u32
    # dense-morton regime per level (static python bools)
    dense_l = jnp.asarray([r <= res_dense for r in resolutions])[:, None]
    # the 8 corners take only TWO distinct values per axis (c and c+1):
    # spread the bits 2x3 times instead of 8x3 for the morton regime
    sp_lo = [[_spread9(x0[:, a, :] + np.uint32(d)) << a for a in range(3)]
             for d in (0, 1)]                              # [2][3] of [L, N]
    idx_c, w_c = [], []
    for ci in range(8):
        i, j, k = (ci >> 2) & 1, (ci >> 1) & 1, ci & 1
        m = sp_lo[i][0] | sp_lo[j][1] | sp_lo[k][2]        # [L, N]
        cx = x0[:, 0, :] + np.uint32(i)
        cy = x0[:, 1, :] + np.uint32(j)
        cz = x0[:, 2, :] + np.uint32(k)
        hashed = base[None, :] + ((cx ^ (cy * p1) ^ (cz * p2))
                                  & capm[None, :])         # [L, N]
        idx_c.append(jnp.where(dense_l, m, hashed).astype(jnp.int32))
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


def encode_win(table, x, resolutions, *, interpret=False, use_kernel=True,
               region_caps=None):
    """Full windowed hash-grid encode of UNSORTED points.

    x: [N, 3] in [0,1]; table [L, T, 2]. Returns [N, L*2] float32
    (level-major columns; dense minor dim — see `hash_encode_win`).
    Sorts points along the Z-curve, encodes with the windowed kernel (or
    with `hash_encode_exact` — the same index function through a plain XLA
    gather, no window-clamp aliasing — when `use_kernel=False` or the batch
    is under `N_WINDOWED_MIN`), and restores the caller's point order.
    Fully differentiable wrt `table`. `region_caps` selects calibrated
    per-region capacities (see `normalize_caps`); it changes the index
    semantics and must match the caps the table was trained with.
    (`hash_encode_win_xla` remains the bit-identical kernel test oracle.)
    """
    l, t, f = table.shape
    n = x.shape[0]
    n_pad = -(-n // _B) * _B
    xt_s, perm, inv_perm = sort_perm(x, float(max(resolutions)), n_pad)
    if use_kernel and n_pad >= N_WINDOWED_MIN:
        pages = window_pages(xt_s, resolutions, t, region_caps)
        out = hash_encode_win_fused(table, xt_s, tuple(resolutions), pages,
                                    interpret, region_caps)
    else:
        idx, w = corner_indices_weights_win(xt_s, resolutions, t, region_caps)
        out = hash_encode_exact(table, idx, w)
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
