"""Sorted-window hash-grid encode: O(window) MXU gathers (Pallas).

The dense one-hot formulation in `ops/hash_encode.py` does O(T) MXU work per
point (every block multiplies against the whole table) — 3.5 s/step at the
reference-default `log2_hashmap_size=19` (`DS_NeRF/run_nerf_helpers_tcnn.py:24`).
This module restores O(1)-per-access cost the TPU way:

1. **Sort points along a Z-order curve** (54-bit Morton key as two int32
   lanes, `lax.sort` with num_keys=2 — measured 2.3 ms for 786k points on
   v5e). Consecutive points become spatial neighbours.
2. **Two-regime index** (`corner_indices_weights_win`):
   DENSE levels — scene-calibrated SHIFTED MORTON (round 5): a per-level
   occupied box (origin o, extents e; `hashgrid.calibrate_dense_box`)
   qualifies a level for `idx = morton27(clip(cell - o, 0, e) + corner)`
   whenever the box's corner codes fit `box_dense_ok` — INJECTIVE and
   GLOBAL, the instant-ngp dense-level semantics (one entry per cell, full
   gradient mass, no spatial seams). At the reference's bound=100 a
   capture occupies <1% of the cube, so the shift makes coarse AND mid
   levels' codes compact (levels 16..199 qualify on the §4 scene, beyond
   tcnn's own (r+1)^3 <= T dense set) with 0.0000% measured window
   aliasing. This closed the measured ~3.3 dB held-out gap the round-4
   all-paged design paid on coarse levels (PARITY_RUN §4).
   FINE levels — the **Z-CDF page hash**:
   `segment(point) * PAGE_ENTRIES + xor_prime_hash(cell) & (PAGE_ENTRIES-1)`,
   where the segment is the point's Z-order key bucketed against
   equal-sample-count boundaries calibrated from the scene
   (`hashgrid.calibrate_page_bounds`). All 8 corners of a point share its
   segment, segment ids are monotone along the sorted stream, and each
   segment holds ~equal sample mass — so a block of sorted points touches
   a compact index *window* BY CONSTRUCTION, batch-independently, the
   whole table is used however small a fraction of [-bound, bound]^3 the
   scene occupies, AND per-segment collision load stays near the global
   XOR hash's (2.47 vs ~2.8 sample-weighted cells/entry at the finest
   level on the §4 scene). (Two predecessor designs were killed by the §4 quality
   harness: a folded-Morton index whose fine-level corners aliased
   batch-DEPENDENTLY, ~9 dB vs the XOR control; then a fixed cubic region
   grid that collapsed concentrated scenes — every real capture at the
   reference's bound=100 — onto ~8k of 2^19 entries, 15.9 dB vs 30.6.
   Collisions themselves are fine — instant-ngp §4 trains through them —
   but the pattern must be batch-independent and the capacity
   density-proportional.)
3. **Windowed one-hot matmuls**: each 512-point block multiplies against a
   2-page window (2x1024 entries) of the level table — the two pages
   INDEPENDENTLY addressed per (level, block) via scalar-prefetched page
   ids (fine levels: consecutive segments; dense levels: the block's
   min/max corner-code pages) — 256x less MXU work than the dense kernel
   at 2^19, and the forward gathers two corners per matmul
   (`_paired_gather`). The rare out-of-window corner is aliased to
   `offset mod 2048` inside the window (`_two_page_off`) — one extra
   deterministic collision, identical in forward and backward.
4. **Backward**: per-block window gradients are accumulated straight into
   an HBM gradient table with in-kernel async DMA (sequential TPU grid =>
   no races); blocks' windows may overlap arbitrarily.
5. **Small batches** (`N < n_windowed_min(T)`: blocks heavier than one
   equal-count segment overflow the 2-page window) fall back to
   `hash_encode_exact` — XLA gather with the SAME index function, zero
   aliasing, cheap at that size.

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
# shared with models/hashgrid.py) — the in-segment mixing of the fine-level
# Z-CDF page hash (`corner_indices_weights_win`)
_PRIMES = (1, 2654435761, 805459861)

# points per kernel block (lanes of every point-indexed tile)
_B = 512
# entries per table page = one Z-CDF segment; a window is two consecutive
# pages. 1024-entry pages (down from round-3's 2048) let the forward gather
# TWO corners per MXU matmul: each corner's 2048-entry window fits a 64-lane
# half of a [128, 128] block-diagonal stationary (`_paired_gather`), halving
# the column-pass floor (measured 26.9 -> 17.1 ms at the training shape).
PAGE_ENTRIES = 1024
WINDOW_ENTRIES = 2 * PAGE_ENTRIES             # 2048
# packed layout (backward/grad tables): 128-lane rows of 64 entries
_PAGE_ROWS = PAGE_ENTRIES * 2 // 128          # 16
_WIN_ROWS = 2 * _PAGE_ROWS                    # 32
# dup-lane layout (forward stationary): 32-row pages of 32 entries x 64
# lanes, duplicated across both lane halves (`_pack_dup`)
_PAGE_ROWS_DUP = 32


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
    Z-CDF page hash wants the partition grid (`zkey27`, floor(x * 512)) to
    be a bit-PREFIX of the sort key so segment ids are monotone along the
    sorted stream — under a non-power-of-two sort grid they are not
    (measured 32%% fine-level window aliasing at 786k points vs 0.7%%
    fixed).
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

# log2(PAGE_ENTRIES): page id of an entry index is `idx >> _PAGE_SHIFT`
_PAGE_SHIFT = 10


def _two_page_off(idx, pa, pb):
    """In-window offsets for an INDEPENDENTLY-ADDRESSED two-page window.

    Page `pa` occupies window half [0, PAGE_ENTRIES); page `pb` occupies
    [PAGE_ENTRIES, WINDOW_ENTRIES). Indices in neither page wrap into the
    window via the pa-anchored floor-mod — one deterministic aliased
    collision, identical forward/backward (and bit-identical to the legacy
    consecutive-page rule whenever pb == pa + 1). pa == pb is legal: both
    halves then hold the same page, and offsets resolve to the first half.
    All int32; shapes broadcast."""
    pg = idx >> _PAGE_SHIFT
    use_b = (pg == pb) & (pg != pa)
    anchor = jnp.where(use_b, pb - 1, pa)
    # two's-complement AND with (2^k - 1) == floor-mod for any int32, so
    # negative (below-window) offsets wrap exactly like the old `%`
    return (idx - anchor * PAGE_ENTRIES) & (WINDOW_ENTRIES - 1)


def two_page_effective(off, pa, pb):
    """Absolute table entries addressed by in-window offsets: the oracle's
    inverse of `_two_page_off` (first half -> page pa, second -> pb)."""
    return jnp.where(off < PAGE_ENTRIES, pa * PAGE_ENTRIES + off,
                     pb * PAGE_ENTRIES + off - PAGE_ENTRIES)


def _consecutive_pages(blocks, t: int):
    """Legacy two-page choice from materialized corner indices: pa = each
    block's min-index page (clamped so pa+1 exists), pb = pa + 1 — the
    round-4 single-page-id window, bit-identical coverage. Right for the
    Z-CDF fine regime, where a block's indices span consecutive segments
    and an overspilling block's MIDDLE segment holds most of its corners.
    Dense (shifted-morton) levels instead want the block's (min, max)
    pages — corner codes cluster at octant-jump ENDS — which
    `window_pages` computes per level; this index-only default cannot
    tell regimes apart and serves the standalone/test path."""
    pa = jnp.min(blocks, axis=(1, 3)) >> _PAGE_SHIFT          # [L, NB]
    pa = jnp.minimum(pa, max(t // PAGE_ENTRIES - 2, 0))
    return jnp.stack([pa, pa + 1], axis=1).astype(jnp.int32)  # [L, 2, NB]


def _pack_pages(pages):
    """[L, 2, NB] page pairs -> [L, NB] int32 with pa in the low 16 bits
    and pb in the high 16 — the scalar-prefetch operand lives in SMEM,
    whose budget a [L, 2, NB] int32 array exceeds at full-frame render
    chunks (measured: 16 levels x 2 x 8192 blocks = 1.0M > the 1M SMEM
    cap). Page ids are < T/PAGE_ENTRIES <= 2^15 for every supported table
    (T <= 2^25), so the packed value stays positive int32."""
    l, _, nb = pages.shape
    if pages.shape[1] != 2:
        raise ValueError("pages must be [L, 2, NB]")
    return (pages[:, 0, :] | (pages[:, 1, :] << 16)).astype(jnp.int32)


def window_offsets(idx, t: int, pages=None):
    """idx: [L, 8, N] int32 entry indices (points sorted along the Z-curve,
    N a multiple of _B). Returns:

      pages [L, 2, NB] int32 — the two independently-addressed pages of
        each block's window (`_consecutive_pages` when not given);
      off [L, 8, N] int32 — in-window entry offsets in [0, WINDOW_ENTRIES)
        per `_two_page_off`, out-of-window corners aliased by the
        pa-anchored `mod WINDOW_ENTRIES`.
    """
    l, _, n = idx.shape
    nb = n // _B
    blocks = idx.reshape(l, 8, nb, _B)
    if pages is None:
        pages = _consecutive_pages(blocks, t)
    pa = pages[:, 0, None, :, None]
    pb = pages[:, 1, None, :, None]
    off = _two_page_off(blocks, pa, pb)
    return pages, off.reshape(l, 8, n).astype(jnp.int32)


def overflow_fraction(idx, t: int, pages=None):
    """Fraction of corner accesses aliased by the window clamp (diagnostic)."""
    l, _, n = idx.shape
    nb = n // _B
    blocks = idx.reshape(l, 8, nb, _B)
    if pages is None:
        pages = _consecutive_pages(blocks, t)
    pg = blocks >> _PAGE_SHIFT
    inw = ((pg == pages[:, 0, None, :, None])
           | (pg == pages[:, 1, None, :, None]))
    return 1.0 - jnp.mean(inw.astype(jnp.float32))


# -----------------------------------------------------------------------------
# kernels — grid (L, NB); point tiles [*, B]; window = 2 pages of the table
# -----------------------------------------------------------------------------

def _paired_gather(offs, ws, pg0, pg1, out_ref):
    """Shared forward body: corner-PAIRED windowed gather + trilinear blend.

    offs/ws: lists of 8 [1, B] in-window offsets (int32, [0, WINDOW_ENTRIES))
    and f32 trilinear weights; pg0/pg1: the window's two dup-lane pages
    ([_PAGE_ROWS_DUP, 128] bf16, lanes 64-127 duplicating 0-63).

    One [128,128]x[128,B] matmul gathers TWO corners: the stationary is the
    2048-entry window laid block-diagonally across the two 64-lane halves
    (duplicated lanes masked), and a [128, B] one-hot whose rows 0-63 select
    corner c0's window row and rows 64-127 corner c1's lands c0's row in
    output lanes 0-63 and c1's in 64-127 with no cross-pollution — 4
    matmuls per block instead of 8. Measured 26.9 -> 17.1 ms at the 786k x
    16-level training shape (the MXU streams ~5.7 one-hot columns/cycle
    regardless of K, so doubling K to pack two corners halves the
    column-pass floor). Weights stay f32: they scale the f32-accumulated
    gather output, not the bf16 one-hot.
    """
    iota_rk = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    iota_lk = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    raw = jnp.concatenate([pg0, pg1, pg0, pg1], axis=0)       # [128, 128]
    w2t = jnp.where((iota_rk < 64) == (iota_lk < 64), raw,
                    jnp.bfloat16(0.0))                        # block-diagonal
    # all row-target / pair-target / weight selection is done on explicit
    # 64-row HALVES (corner c0 rides rows/lanes 0-63, c1 64-127) — this
    # replaces the old full-width `where(lo, ...)` selects, which cost
    # three [128, B] VPU ops per quadrant on the kernel's critical path
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (64, _B), 0)
    pair_h = iota_h >> 1
    s = jnp.zeros((64, _B), jnp.float32)                      # s[r] folds
    for q in range(4):                                        # rows r, r+64
        o0, o1 = offs[2 * q], offs[2 * q + 1]
        oht2 = jnp.concatenate(
            [iota_h == (o0 >> 5), iota_h == (o1 >> 5)],
            axis=0).astype(jnp.bfloat16)                      # [128, B]
        g = jax.lax.dot_general(
            w2t, oht2, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)               # [128, B]
        s = (s + jnp.where(pair_h == (o0 & 31), g[0:64] * ws[2 * q], 0.0)
             + jnp.where(pair_h == (o1 & 31), g[64:128] * ws[2 * q + 1],
                         0.0))
    # parity split, once per block: out[0] = even-lane sum (f0), out[1] =
    # odd-lane sum (f1) — feature parity is preserved across both 64-lane
    # halves (row r+64 folded onto row r keeps r & 1). Two masked full
    # reductions — NOT a [2,128] matmul, which Mosaic pads to M=128,
    # costing as much as three extra corner gathers.
    parity = iota_h & 1
    f0 = jnp.sum(jnp.where(parity == 0, s, 0.0), axis=0, keepdims=True)
    f1 = jnp.sum(jnp.where(parity == 1, s, 0.0), axis=0, keepdims=True)
    out_ref[0] = jnp.concatenate([f0, f1], axis=0)            # [2, B]


def _corner_ref_offs(off_ref, w_ref):
    offs = [off_ref[0, c:c + 1, :] for c in range(8)]
    ws = [w_ref[0, c:c + 1, :] for c in range(8)]
    return offs, ws


def _win_fwd_kernel(pages_ref, off_ref, w_ref, pg0_ref, pg1_ref, out_ref):
    """Standalone paired forward: off RELATIVE to the window (precomputed
    by `window_offsets`); pg0/pg1 the scalar-prefetch-indexed dup-lane
    pages."""
    offs, ws = _corner_ref_offs(off_ref, w_ref)
    _paired_gather(offs, ws, pg0_ref[0, 0], pg1_ref[0, 0], out_ref)


def _bwd_accumulate(offs, ws, g_ref, pa, pb, dtab_ref):
    """Shared backward body: per-corner window-grad accumulate into the
    level's PACKED grad table ([R, 128] f32 — 4 MB at 2^19), VMEM-resident
    as a revisited output block across the point-block grid dimension; the
    window's two 16-row page updates land via dynamic-slice accumulates
    (first window half -> page pa, second -> pb — `_two_page_off`'s
    mapping; pa == pb just accumulates both halves into the same rows).

    Stays per-corner (8 [*,B]x[B,128] contractions): the committed
    backward already streams ~6.9 columns/cycle — a corner-paired variant
    (disjoint lane halves + quadrant fold, like the forward) measured
    17.6 ms vs 15.4, because its dup-lane grad table doubles the revisited
    VMEM block to 8 MB and the fold adds VPU work on the critical path.

    The per-lane cotangent row vt: g01 (cotangent laid out by lane parity)
    is built once per block, each corner is then mask+scale.
    """
    iota_pair = jax.lax.broadcasted_iota(jnp.int32, (128, _B), 0) >> 1
    parity = jax.lax.broadcasted_iota(jnp.int32, (128, _B), 0) & 1
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (_WIN_ROWS, _B), 0)
    g01 = jnp.where(parity == 0, g_ref[0, 0:1, :], g_ref[0, 1:2, :])
    upd = jnp.zeros((_WIN_ROWS, 128), jnp.float32)
    for c in range(8):
        off_c = offs[c]
        vt = jnp.where(iota_pair == (off_c & 63), g01 * ws[c],
                       0.0).astype(jnp.bfloat16)              # [128, B]
        oht = ((off_c >> 6) == iota_r).astype(jnp.bfloat16)   # [32, B]
        upd = upd + jax.lax.dot_general(
            oht, vt, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)               # [32, 128]

    dtab_ref[0, pl.ds(pa * _PAGE_ROWS, _PAGE_ROWS), :] += upd[:_PAGE_ROWS]
    dtab_ref[0, pl.ds(pb * _PAGE_ROWS, _PAGE_ROWS), :] += upd[_PAGE_ROWS:]


def _win_bwd_kernel(pages_ref, off_ref, w_ref, g_ref, dtab_ref):
    l = pl.program_id(0)
    b = pl.program_id(1)

    @pl.when(b == 0)
    def _():
        dtab_ref[0] = jnp.zeros_like(dtab_ref[0])

    offs, ws = _corner_ref_offs(off_ref, w_ref)
    v = pages_ref[l, b]
    _bwd_accumulate(offs, ws, g_ref, v & 0xFFFF, v >> 16, dtab_ref)


# -----------------------------------------------------------------------------
# host-side wrappers
# -----------------------------------------------------------------------------

def _prep(off, weights, n_pad):
    """Pad the relative entry offsets + weights to a _B multiple along
    points. Row/lane decomposition happens in-kernel (off>>5 / off&31 in
    the forward's dup-lane layout, off>>6 / off&63 in the backward's packed
    layout) — window starts are page-aligned, so in-window positions equal
    absolute positions; shipping `off` alone saves one [L, 8, N] HBM stream
    versus precomputed rows+lanes."""
    off = off.astype(jnp.int32)
    w = weights.astype(jnp.float32)
    if n_pad != off.shape[2]:
        pad = [(0, 0), (0, 0), (0, n_pad - off.shape[2])]
        off, w = (jnp.pad(x, pad) for x in (off, w))
    return off, w


def _pack(table):
    """Packed f32 layout (grad tables): [L, R, 128], 128-lane rows of 64
    entries."""
    l, t, f = table.shape
    return table.reshape(l, t * f // 128, 128)


def _pack_dup(table):
    """Dup-lane bf16 page layout (forward stationary): [L, T//PAGE_ENTRIES,
    _PAGE_ROWS_DUP, 128]. Page p, row r, lane l holds entry
    p*PAGE_ENTRIES + r*32 + ((l & 63) >> 1), feature l & 1; lanes 64-127
    duplicate 0-63 so `_paired_gather`'s block-diagonal stationary is a
    plain concat + mask. bf16 here also halves the per-block window DMA."""
    l, t, f = table.shape
    pg = table.reshape(l, t // PAGE_ENTRIES, _PAGE_ROWS_DUP, 32 * f)
    return jnp.concatenate([pg, pg], axis=-1).astype(jnp.bfloat16)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def hash_encode_win(table, idx, weights, pages, interpret=False):
    """Sorted-window hash-grid encode on the MXU.

    Args:
      table: [L, T, F=2] float32; T a multiple of PAGE_ENTRIES.
      idx: [L, 8, N] int32 corner entry indices, points SORTED along the
        Z-curve (see `morton_sort_keys`); N a multiple of _B.
      weights: [L, 8, N] trilinear corner weights.
      pages: [L, 2, N/_B] int32 window page pairs from
        `window_offsets(idx, T)`.
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

    _, off = window_offsets(idx, t, pages)
    off, w = _prep(off, weights, n)
    tabd = _pack_dup(table)                        # [L, n_pages, 32, 128]
    pages_pk = _pack_pages(pages)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(l, n // _B),
        in_specs=_point_specs() + [
            pl.BlockSpec((1, 1, _PAGE_ROWS_DUP, 128),
                         lambda i, j, pages: (i, pages[i, j] & 0xFFFF, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _PAGE_ROWS_DUP, 128),
                         lambda i, j, pages: (i, pages[i, j] >> 16, 0, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 2, _B), lambda i, j, pages: (i, 0, j),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _win_fwd_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((l, 2, n), jnp.float32),
        interpret=interpret,
    )(pages_pk, off, w, tabd, tabd)
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
    )(_pack_pages(pages), off, w, g_l)
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

def _corner_geom(xt, bc, res_ref, l, pa, pb, t: int):
    """In-kernel corner window-offsets + trilinear weights for one
    (level, block): bit-identical to `corner_indices_weights_win` followed
    by `_two_page_off` on the same inputs (same f32 op order, same uint32
    lane math; `& (WINDOW_ENTRIES-1)` equals the host's floor-mod on int32
    for a power-of-two window).

    xt: [3, B] f32 Z-sorted block coords; bc: [2, B] f32 per-point segment
    (entry base, capacity mask) from the host's `page_lookup` (values are
    f32-exact ints < 2^24); res_ref/l: the [L, 8] `_res_scalars` SMEM ref
    — per-level (scale, dense flag, ox, oy, oz, ex, ey, ez) — and the
    level to read; pa/pb: scalar int32 window page pair.
    Returns ([8] of [1, B] int32 in-window offsets, [8] of [1, B] f32 w).
    """
    p1 = jnp.uint32(_PRIMES[1])
    p2 = jnp.uint32(_PRIMES[2])
    res_l = res_ref[l, 0].astype(jnp.float32)
    use_dense = res_ref[l, 1] > 0
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
    # shifted-clipped box coords for the dense regime (host op order:
    # f32 clip, then integer cast); fine levels spread raw coords whose
    # morton result the where() discards
    csel = [jnp.where(
        use_dense,
        jnp.clip(x0f[a:a + 1, :] - res_ref[l, 2 + a].astype(jnp.float32),
                 0.0, res_ref[l, 5 + a].astype(jnp.float32))
        .astype(jnp.int32).astype(jnp.uint32),
        x0[a:a + 1, :]) for a in range(3)]
    sp_lo = [[_spread9(csel[a] + jnp.uint32(d)) << a for a in range(3)]
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
        offs.append(_two_page_off(idx_c, pa, pb))
        ws.append(fr[0][i] * fr[1][j] * fr[2][k])
    return offs, ws


def _win_fwd_fused_kernel(t: int, pages_ref, res_ref,
                          xt_ref, bc_ref, pg0_ref, pg1_ref, out_ref):
    """Fused-geometry forward: `_paired_gather` with off/w rebuilt
    in-kernel from the coords block. res_ref is [L, 8] (`_res_scalars`);
    bc_ref the [2, B] per-point segment base/capmask block."""
    l = pl.program_id(0)
    j = pl.program_id(1)
    v = pages_ref[l, j]
    offs, ws = _corner_geom(xt_ref[...], bc_ref[...], res_ref, l,
                            v & 0xFFFF, v >> 16, t)
    _paired_gather(offs, ws, pg0_ref[0, 0], pg1_ref[0, 0], out_ref)


def _win_bwd_fused_kernel(t: int, pages_ref, res_ref,
                          xt_ref, bc_ref, g_ref, dtab_ref):
    """Fused-geometry backward: `_bwd_accumulate` with off/w rebuilt
    in-kernel."""
    l = pl.program_id(0)
    b = pl.program_id(1)

    @pl.when(b == 0)
    def _():
        dtab_ref[0] = jnp.zeros_like(dtab_ref[0])

    v = pages_ref[l, b]
    pa, pb = v & 0xFFFF, v >> 16
    offs, ws = _corner_geom(xt_ref[...], bc_ref[...], res_ref, l, pa, pb, t)
    _bwd_accumulate(offs, ws, g_ref, pa, pb, dtab_ref)


# Absolute floor of the windowed regime (see `n_windowed_min`).
N_WINDOWED_MIN = 1 << 15


def n_windowed_min(t: int) -> int:
    """Minimum (padded) point count for the windowed kernels at table size
    t. A 512-point block spans ~ceil(B * n_segments / N) + 1 consecutive
    equal-count segments, and the kernel window covers exactly 2 — block
    mass <= one segment (N >= _B * n_segments) gives zero aliasing by
    construction. The floor is set to 3/4 of that bound: at the
    reference's published prepare config (N_rand 1024 x 64 coarse samples
    x 3 ray groups = 196,608 points — EXACTLY the floor at 2^19) the
    measured aliasing is 4.3% on the harness scene's calibrated index,
    while the exact-gather fallback there costs ~1.2 s/step of serialized
    XLA gather (~80 min over a 4001-iter prepare stage, measured round 5).
    Below the floor aliasing grows fast (17% at half the bound, 32% at
    3/8) and the exact path takes over — same index function, zero
    aliasing, tolerable cost at such sizes."""
    return max(N_WINDOWED_MIN, (_B * n_segments(t) * 3) // 4)


def hash_encode_exact(table, idx, weights):
    """Exact (window-free) encode with the SAME index function as the
    windowed kernels — the small-batch fallback (and the CPU model path):
    XLA gather + weighted sum, O(1) per access, differentiable wrt table
    (scatter-add backward — serialized on TPU, which is why this only runs
    under `n_windowed_min`). Returns [N, L*F] level-major, the windowed
    contract, with zero aliasing."""
    l, t, f = table.shape
    n = idx.shape[2]
    feats = jnp.take_along_axis(
        table, idx.reshape(l, -1)[..., None], axis=1).reshape(l, 8, n, f)
    out = jnp.sum(feats * weights[..., None].astype(feats.dtype), axis=1)
    return out.transpose(1, 0, 2).reshape(n, l * f)


def window_pages(xt_s, resolutions, t: int, page_bounds=None,
                 dense_box=None):
    """[L, 2, N/_B] window page pairs straight from sorted coords, chosen
    per regime (no [L, 8, N] corner-index array is materialized):

    - FINE levels — the legacy consecutive pair (min segment clamped,
      +1): idx = base_p + h with h < PAGE_ENTRIES and bases multiples of
      PAGE_ENTRIES, so the block's min index page IS its min segment —
      one shared per-point segment reduction serves every fine level.
      Bit-identical to the round-4 window.
    - DENSE (shifted-morton) levels — the block's (min, max) corner-code
      pages: codes cluster at octant-jump ends, and morton27 is monotone
      in each cell coordinate, so corner 0 (all +0) carries each point's
      min code and corner 7 (all +1) its max — two codes per point per
      dense level instead of eight.
    """
    dense_box = normalize_dense_box(resolutions, t, dense_box)
    n = xt_s.shape[1]
    nb = n // _B
    n_pages = t // PAGE_ENTRIES
    base, _ = page_lookup(zkey27(xt_s), t, page_bounds)
    seg = (base >> jnp.uint32(_PAGE_SHIFT)).astype(jnp.int32)
    fine_pa = jnp.minimum(jnp.min(seg.reshape(nb, _B), axis=1),
                          max(n_pages - 2, 0))                # [NB]
    rows_pa, rows_pb = [], []
    for r, box in zip(resolutions, dense_box):
        if box is None:
            rows_pa.append(fine_pa)
            rows_pb.append(fine_pa + 1)
            continue
        o = jnp.asarray(box[:3], xt_s.dtype)[:, None]
        e = jnp.asarray(box[3:], xt_s.dtype)[:, None]
        xs = xt_s * float(r)
        x0f = jnp.minimum(jnp.floor(xs), float(r) - 1.0)
        c0 = jnp.clip(x0f - o, 0.0, e).astype(jnp.uint32)     # [3, N]
        m0 = morton27(c0[0], c0[1], c0[2]).astype(jnp.int32)
        c7 = c0 + jnp.uint32(1)
        m7 = morton27(c7[0], c7[1], c7[2]).astype(jnp.int32)
        rows_pa.append(jnp.min((m0 >> _PAGE_SHIFT).reshape(nb, _B), axis=1))
        rows_pb.append(jnp.max((m7 >> _PAGE_SHIFT).reshape(nb, _B), axis=1))
    return jnp.stack([jnp.stack(rows_pa), jnp.stack(rows_pb)],
                     axis=1).astype(jnp.int32)                # [L, 2, NB]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 4, 5, 6))
def hash_encode_win_fused(table, xt_s, resolutions, pages, interpret=False,
                          page_bounds=None, dense_box=None):
    """Sorted-window hash-grid encode with in-kernel corner geometry.

    Same contract and results as `hash_encode_win(table, idx, w, pages)`
    where `idx, w = corner_indices_weights_win(xt_s, resolutions, t,
    page_bounds, dense_box)` — but off/w never exist outside the kernel.
    Differentiable wrt `table` only (sample positions are not trainable in
    this pipeline).

    Args:
      table: [L, T, F=2] float32.
      xt_s: [3, N] f32 Z-SORTED coords in [0,1] (from `sort_perm`),
        N a multiple of _B.
      resolutions: static tuple of per-level int resolutions.
      pages: [L, 2, N/_B] int32 from `window_pages(xt_s, resolutions, T,
        page_bounds, dense_box)`.
      page_bounds: static tuple of Z-CDF segment boundaries (see
        `normalize_bounds`); None = uniform Z-volume split.
      dense_box: static per-level shifted-morton boxes (see
        `normalize_dense_box`); None = the legacy whole-grid default.
    """
    out, _ = _win_fused_impl(table, xt_s, resolutions, pages, interpret,
                             page_bounds, dense_box)
    return out


def _point_bc(xt_s, t, page_bounds):
    """[2, N] f32 per-point (segment base, capacity mask) kernel input."""
    base, capm = page_lookup(zkey27(xt_s), t, page_bounds)
    return jnp.stack([base, capm]).astype(jnp.float32)


def _win_fused_impl(table, xt_s, resolutions, pages, interpret, page_bounds,
                    dense_box):
    l, t, f = table.shape
    if f != 2:
        raise ValueError("windowed hash encode supports features=2")
    if t % PAGE_ENTRIES or t // PAGE_ENTRIES < 2:
        raise ValueError("table too small for the windowed path")
    n = xt_s.shape[1]
    if n % _B:
        raise ValueError(f"point count must be a multiple of {_B}")
    dense_box = normalize_dense_box(resolutions, t, dense_box)
    res_arr = _res_scalars(resolutions, t, dense_box)
    bc = _point_bc(xt_s, t, page_bounds)
    tabd = _pack_dup(table)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(l, n // _B),
        in_specs=[
            pl.BlockSpec((3, _B), lambda i, j, pages, res: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, _B), lambda i, j, pages, res: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _PAGE_ROWS_DUP, 128),
                         lambda i, j, pages, res: (i, pages[i, j] & 0xFFFF,
                                                   0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _PAGE_ROWS_DUP, 128),
                         lambda i, j, pages, res: (i, pages[i, j] >> 16,
                                                   0, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 2, _B), lambda i, j, pages, res: (i, 0, j),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_win_fwd_fused_kernel, t),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((l, 2, n), jnp.float32),
        interpret=interpret,
    )(_pack_pages(pages), res_arr, xt_s, bc, tabd, tabd)
    # bc rides the residuals ([2, N] f32 — 6 MB at training shape): the
    # backward would otherwise rebuild it (zkey27 + the [K, N]
    # page_lookup compare-reduction) per pass — measured ~2 ms/step at
    # 786k points
    return out.reshape(l * 2, n).T, ((l, t, f), xt_s, bc, pages)


def _res_scalars(resolutions, t: int, dense_box):
    """[L, 8] int32 scalar-prefetch rows: (level scale, dense-regime flag,
    box origin ox/oy/oz, box extents ex/ey/ez) — `dense_box` NORMALIZED."""
    rows = []
    for r, box in zip(resolutions, dense_box):
        b = box if box is not None else (0, 0, 0, 0, 0, 0)
        rows.append([int(r), int(box is not None), *[int(v) for v in b]])
    return jnp.asarray(rows, jnp.int32)


def _win_fused_fwd_rule(table, xt_s, resolutions, pages, interpret,
                        page_bounds, dense_box):
    return _win_fused_impl(table, xt_s, resolutions, pages, interpret,
                           page_bounds, dense_box)


def _win_fused_bwd_rule(resolutions, interpret, page_bounds, dense_box,
                        res, g):
    (l, t, f), xt_s, bc, pages = res
    r = t * f // 128
    n = xt_s.shape[1]
    res_arr = _res_scalars(resolutions, t,
                           normalize_dense_box(resolutions, t, dense_box))
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
    )(_pack_pages(pages), res_arr, xt_s, bc, g_l)
    return dpacked.reshape(l, t, f), None, None


hash_encode_win_fused.defvjp(_win_fused_fwd_rule, _win_fused_bwd_rule)


# UNCALIBRATED whole-grid dense regime bound: res <= 7 is the largest grid
# whose corner morton codes (coords <= 7 -> morton27(7,7,7) = 511) fit one
# kernel window unconditionally. Bigger UNSHIFTED grids fail per-block
# windowing at octant crossings (measured 12-25% aliased corners at res
# 30/56 in round 3, and 28.9%/10.6% at res 16/30 on a CENTERED scene even
# with (min, max) two-page windows — the cube-center plane is morton's
# worst seam and recentered captures always straddle it). The CALIBRATED
# dense boxes (origin-shifted morton, `normalize_dense_box`) are how
# coarse/mid levels actually enter the dense regime: shifting by the
# occupied box's origin moves the seam structure to the box scale, and
# the §4 scene then measures 0.0000% aliasing for every qualifying level.
# At the reference default (base_res 16) no level is in the UNCALIBRATED
# regime; calibrated boxes cover levels 16..199 on the §4 scene.
RES_DENSE = 7

# Max entry count of a CALIBRATED dense box (32 pages). Measured on the §4
# scene's ray distribution (true near/far): boxes through span 4096 (res
# 16..106, up to ~13 cells/axis) leave 0.0000% of corners outside the
# (min, max) two-page window; span 32768 (res 199, ~22-cell box) measures
# 8.0%, span 2^18 (res 374) 10.4% with coords already overflowing the
# table next level up. The cap admits res <= ~199: the splitting damage of
# keeping such levels on the page hash (every cell fragmented across tens
# of equal-sample segments) measured worse than the window-clamp aliasing
# of admitting them — quality gate in PARITY_RUN §4 r5.
DENSE_BOX_CAP = 32 * PAGE_ENTRIES


def box_morton_span(e) -> int:
    """Upper bound (exclusive) of shifted-morton corner codes for a box
    with per-axis cell extents e = (ex, ey, ez): corners reach e_a + 1, so
    each axis needs ceil(log2(e_a + 2)) bits and standard 3x-interleave
    spans 2^(3 * max-axis bits)."""
    bits = max(int(np.ceil(np.log2(int(a) + 2))) for a in e)
    return 1 << (3 * bits)


def box_dense_ok(e, t: int, cap: int = DENSE_BOX_CAP) -> bool:
    """A box qualifies for the injective shifted-morton regime when its
    corner codes (a) fit the level's table row, (b) fit `cap` (bounding
    per-block window spread), and (c) fit morton27's 9-bit coordinates."""
    return (box_morton_span(e) <= min(t, cap)
            and max(int(a) for a in e) + 1 <= 511)


def default_dense_box(resolutions, t: int):
    """Per-level UNCALIBRATED dense boxes: the whole grid ((0,0,0) origin,
    extents res-1), kept only where the full grid's corner codes fit ONE
    kernel window (res <= 7 — the legacy dense-morton regime, bit-identical
    indices). Everything else is None (Z-CDF page hash)."""
    out = []
    for r in resolutions:
        e = (r - 1, r - 1, r - 1)
        out.append(((0, 0, 0) + e)
                   if box_dense_ok(e, t, cap=WINDOW_ENTRIES) else None)
    return tuple(out)


def normalize_dense_box(resolutions, t: int, dense_box):
    """Validated per-level dense boxes: a tuple with one entry per level,
    each either None (Z-CDF page-hash regime) or 6 ints
    (ox, oy, oz, ex, ey, ez) — origin cell and INCLUSIVE cell extents of
    the level's occupied box (corners reach e+1). None for the whole
    argument selects `default_dense_box`. Boxes are part of the table's
    INDEX SEMANTICS (like page_bounds): train and render must agree."""
    if dense_box is None:
        return default_dense_box(resolutions, t)
    if len(dense_box) != len(resolutions):
        raise ValueError(f"dense_box must have {len(resolutions)} entries, "
                         f"got {len(dense_box)}")
    out = []
    for r, box in zip(resolutions, dense_box):
        if box is None:
            out.append(None)
            continue
        o, e = [int(v) for v in box[:3]], [int(v) for v in box[3:]]
        if len(box) != 6 or min(o) < 0 or min(e) < 0:
            raise ValueError(f"dense_box entry must be 6 ints >= 0: {box}")
        if any(oa + ea > r - 1 for oa, ea in zip(o, e)):
            raise ValueError(f"dense_box {box} exceeds the res-{r} grid")
        if not box_dense_ok(e, t):
            raise ValueError(f"dense_box {box} does not qualify for the "
                             f"dense regime at table size {t}")
        out.append(tuple(o) + tuple(e))
    return tuple(out)


def zkey27(xt):
    """[N] int32 Z-order key of each point on the FIXED 512^3 partition
    grid (morton27 of floor(x*512)) — a prefix of the point's sort key
    whenever the sort grid is >= 512/axis (always at the reference-default
    finest_res), so page ids from `page_lookup` are monotone along the
    Z-sorted stream; under a coarser sort grid they still span only the
    (Morton-contiguous) children of each sort cell. xt: [3, N] in [0,1]."""
    rc = jnp.clip((xt * 512.0).astype(jnp.uint32), 0, jnp.uint32(511))
    return morton27(rc[0], rc[1], rc[2]).astype(jnp.int32)


def n_segments(t: int):
    return t // PAGE_ENTRIES


def uniform_bounds(t: int):
    """Equal Z-VOLUME split of the 2^27 key space over t//PAGE_ENTRIES segments
    — the uncalibrated default. Equivalent to the fixed cubic-region grid
    this replaced: correct for space-filling scenes, but a scene occupying
    a small fraction of [-bound, bound]^3 (every real capture at the
    reference's bound=100, `run_nerf_helpers_tcnn.py:30`) then maps all its
    samples into a handful of segments — measured 15.9 dB vs the 30.6 dB
    XOR control on the §4 harness scene. Calibrate (`hashgrid.
    calibrate_page_bounds`) for anything but synthetic full-cube points."""
    n = n_segments(t)
    step = (1 << 27) // n
    return tuple(k * step for k in range(n))


def normalize_bounds(t: int, page_bounds):
    """Validated Z-CDF segment boundaries: a sorted tuple of t//PAGE_ENTRIES
    int keys in [0, 2^27), first 0. Segment k covers Z-keys
    [bounds[k], bounds[k+1]); its table entries are
    [k*PAGE_ENTRIES, (k+1)*PAGE_ENTRIES). None -> `uniform_bounds`."""
    if page_bounds is None:
        return uniform_bounds(t)
    b = tuple(int(v) for v in page_bounds)
    if len(b) != n_segments(t):
        raise ValueError(f"page_bounds must have {n_segments(t)} entries, "
                         f"got {len(b)}")
    if b[0] != 0:
        raise ValueError("page_bounds[0] must be 0")
    if any(lo > hi for lo, hi in zip(b, b[1:])) or b[-1] >= (1 << 27):
        raise ValueError("page_bounds must be sorted and < 2^27")
    return b


def page_lookup(z27, t: int, page_bounds=None):
    """(base [N] u32, capmask [N] u32) for per-point Z-keys: base =
    PAGE_ENTRIES * (#bounds <= key - 1) via a fused broadcast-compare
    reduction (a serialized jnp.searchsorted gather would cost ~60 ms at
    training N on TPU). Density-calibrated bounds put ~equal training
    sample counts in every segment, so the full table is used (at
    near-XOR collision load) whatever fraction of the unit cube the scene
    occupies AND a Z-sorted block's indices span ~(block/segment sample
    ratio) consecutive segments."""
    bounds = jnp.asarray(normalize_bounds(t, page_bounds), jnp.int32)
    cmp = (z27[None, :] >= bounds[:, None]).astype(jnp.float32)  # [K, N]
    page = jnp.sum(cmp, axis=0) - 1.0                 # [N] f32-exact (< 2^9)
    base = (page * float(PAGE_ENTRIES)).astype(jnp.int32).astype(jnp.uint32)
    capm = jnp.full_like(base, jnp.uint32(PAGE_ENTRIES - 1))
    return base, capm


def corner_indices_weights_win(xt, resolutions, t: int, page_bounds=None,
                               dense_box=None):
    """Window-local corner indices for the sorted-window kernel.

    xt: [3, N] in [0,1], coords-major (points SORTED along the Z-curve —
    the layout `sort_perm` emits; [N, 3] would lane-pad 3->128). Returns
    (idx [L, 8, N] int32, w [L, 8, N] f32) with trilinear weights identical
    to `HashGridEncoding.corner_indices_weights` but the index function
    replaced by a two-regime scheme:

    DENSE levels (a calibrated per-level box (o, e) covers the scene's
    occupied cells and its corner codes fit `box_dense_ok`) — SHIFTED
    MORTON:
        idx = morton27(clip(cell - o, 0, e) + corner)   # INJECTIVE, GLOBAL

    This is the instant-ngp dense-level semantics the Z-CDF partition was
    measured to lose ~3.3 dB against (PARITY_RUN §4, round 4): every
    reader of a cell resolves to the SAME entry regardless of its segment
    (full gradient mass per cell, no spatial seams), and the origin shift
    makes the occupied box's codes compact — at the reference's bound=100
    (captures occupy <1% of the cube), levels far beyond the unshifted
    r<=63 bound qualify, and the §4 scene measures 0.0000% window
    aliasing for every qualifying level. Out-of-box queries clamp to the
    box faces (graceful: those regions hold no training mass by
    construction of the calibration). With `dense_box=None` the default
    is the legacy whole-grid regime (res <= 7 only).

    FINE levels (everything else) — the Z-CDF PAGE hash:
        seg  = #(page_bounds <= zkey27(point)) - 1
        idx  = seg * PAGE_ENTRIES + (xor_prime_hash(cell) & (PAGE_ENTRIES - 1))

    where the segment comes from the POINT's Z-order key on the fixed
    512^3 grid against calibrated equal-sample-count boundaries
    (`hashgrid.calibrate_page_bounds`; uniform Z-volume split when None).
    Properties this buys:

    - Z-window-locality BY CONSTRUCTION: all 8 corners of a point share
      its segment; segment ids are monotone along the Z-sorted stream, and
      each segment holds ~1/n_segments of the training samples (measured
      0.0% aliased corners at the 786k-point training shape) — a
      512-point block's indices span ~1-2 consecutive PAGE_ENTRIES
      ranges <= the kernel's 2048-entry window.
    - FULL table capacity on real scenes: boundaries follow the sample
      CDF, so a capture occupying 0.1% of [-bound, bound]^3 (the
      reference's bound=100 default) still spreads over all t entries.
      (The round-3 fixed cubic region grid mapped such scenes into a
      handful of regions — effective capacity ~8k of 2^19 entries,
      measured 15.9 dB vs the 30.6 dB XOR control, PARITY_RUN §4. The
      earlier folded-Morton index instead aliased 68-94% of fine corners
      batch-DEPENDENTLY, ~9 dB; both redesigns were driven by the same
      harness.)
    - Batch-independence: idx is a pure function of (point position,
      cell) given the static bounds — no dependence on which other points
      share the batch.
    - Collisions are confined within a segment (cells of one segment
      compete for its PAGE_ENTRIES entries via the reference's XOR-prime
      hash, `run_nerf_helpers_tcnn.py` semantics) at near-XOR load
      (2.47 vs ~2.8 sample-weighted distinct cells/entry at the finest
      level on the §4 scene; instant-ngp §4: hash grids train through
      collisions; the PATTERN is a free design axis).
    - A cell read from points in different segments (boundary cells)
      resolves to different entries — equivalent to a hard spatial
      partition of the hash table (block-hash grids), a known benign
      discontinuity, here at equal-density granularity.
    """
    if t & (t - 1):
        raise ValueError("table size must be a power of two")
    dense_box = normalize_dense_box(resolutions, t, dense_box)
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
    # the point's Z-CDF segment: from its Z-key against the (possibly
    # calibrated) boundaries via a fused compare-reduction — NOT jnp.take
    # or searchsorted, whose serialized TPU gathers would cost ~60 ms at
    # training point counts. [N], shared by all levels and corners.
    base, capm = page_lookup(zkey27(xt), t, page_bounds)   # [N] each, u32
    # shifted-morton regime per level (static flags + [L, 3] box arrays;
    # fine-level rows are placeholders masked out by the where() below)
    dense_l = jnp.asarray([b is not None for b in dense_box])[:, None]
    o_arr = jnp.asarray([(b[:3] if b else (0, 0, 0)) for b in dense_box],
                        x0f.dtype)[:, :, None]             # [L, 3, 1]
    e_arr = jnp.asarray([(b[3:] if b else (0, 0, 0)) for b in dense_box],
                        x0f.dtype)[:, :, None]
    x0d = jnp.clip(x0f - o_arr, 0.0, e_arr).astype(jnp.uint32)
    # morton coords: shifted-clipped for dense levels, raw for fine levels
    # (whose morton result is discarded by the where) — one spread set
    csel = jnp.where(dense_l[:, None], x0d, x0)            # [L, 3, N] u32
    # the 8 corners take only TWO distinct values per axis (c and c+1):
    # spread the bits 2x3 times instead of 8x3 for the morton regime
    sp_lo = [[_spread9(csel[:, a, :] + np.uint32(d)) << a for a in range(3)]
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
               page_bounds=None, dense_box=None):
    """Full windowed hash-grid encode of UNSORTED points.

    x: [N, 3] in [0,1]; table [L, T, 2]. Returns [N, L*2] float32
    (level-major columns; dense minor dim — see `hash_encode_win`).
    Sorts points along the Z-curve, encodes with the windowed kernel (or
    with `hash_encode_exact` — the same index function through a plain XLA
    gather, no window-clamp aliasing — when `use_kernel=False` or the batch
    is under `n_windowed_min(T)`), and restores the caller's point order.
    Fully differentiable wrt `table`. `page_bounds` selects calibrated
    Z-CDF segment boundaries (see `normalize_bounds`); it changes the index
    semantics and must match the caps the table was trained with.
    (`hash_encode_win_xla` remains the bit-identical kernel test oracle.)
    """
    l, t, f = table.shape
    n = x.shape[0]
    n_pad = -(-n // _B) * _B
    xt_s, perm, inv_perm = sort_perm(x, float(max(resolutions)), n_pad)
    if use_kernel and n_pad >= n_windowed_min(t):
        pages = window_pages(xt_s, resolutions, t, page_bounds, dense_box)
        out = hash_encode_win_fused(table, xt_s, tuple(resolutions), pages,
                                    interpret, page_bounds, dense_box)
    else:
        idx, w = corner_indices_weights_win(xt_s, resolutions, t,
                                            page_bounds, dense_box)
        out = hash_encode_exact(table, idx, w)
    return permute_rows(out, inv_perm, perm)[:n]          # [N, L*F]


def hash_encode_win_xla(table, idx, weights, pages):
    """XLA oracle with bit-identical window-clamp semantics (CPU fallback
    and numerical reference for the Pallas kernels). Returns [N, L*F],
    level-major — same contract as `hash_encode_win`."""
    l, t, f = table.shape
    n = idx.shape[2]
    _, off = window_offsets(idx, t, pages)
    pa = jnp.repeat(pages[:, 0, :], _B, axis=1)[:, None, :]    # [L, 1, N]
    pb = jnp.repeat(pages[:, 1, :], _B, axis=1)[:, None, :]
    eff = two_page_effective(off, pa, pb)                      # [L, 8, N]
    flat = (eff.reshape(l, 8 * n)
            + (jnp.arange(l, dtype=jnp.int32) * t)[:, None]).reshape(-1)
    feats = table.reshape(l * t, f)[flat].reshape(l, 8, n, f)
    out = jnp.sum(feats * weights[..., None].astype(feats.dtype),
                  axis=1)                                      # [L, N, F]
    return out.transpose(1, 0, 2).reshape(n, l * f)
