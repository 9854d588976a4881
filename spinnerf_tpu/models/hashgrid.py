"""Instant-NGP-style multiresolution hash-grid field in pure JAX.

TPU-native equivalent of the reference's default model `NeRF_TCNN`
(`DS_NeRF/run_nerf_helpers_tcnn.py:13-113`, tinycudann CUDA): 16-level
HashGrid (2 features/level, 2^19 table, base res 16, finest 2048*bound),
tiny sigma MLP (2 layers x 64 -> 1 + 15 geo features), SH degree-4 direction
encoding, color MLP (3 layers x 64 -> 3). Raw output channel order matches
`NeRFField`: [rgb logits, sigma(pre-activation), optional semantic logit]
(MVSeg widens the sigma net by one logit channel,
`MVSeg/DS_NeRF/run_nerf_helpers_tcnn.py:50,99-113`).

TPU design notes:
- All 16 levels are encoded in ONE vectorized gather from a single
  [L, T, F] table (XLA lowers it to a batched dynamic-gather; no per-level
  Python loop survives tracing).
- PERFORMANCE (measured, v5e, 786k points x 16 levels x 8 corners):
  XLA lowers the corner gather and the scatter-add backward to *serialized*
  loops (~665 ms fwd, ~8 s fwd+bwd, flat in table size) — the classic
  hash-grid-on-TPU trap; v5e has no vector-gather hardware (no SparseCore).
  The fix is gather/scatter recast as one-hot MXU matmuls against a
  lane-packed table: `ops/hash_encode.py` (dense, O(T)/point) for tables
  at/below one 4096-entry window, `ops/hash_encode_win.py` (Z-curve
  windowed, O(window)/point + sorted-through-MLP field flow) above —
  69 ms fwd+bwd at the reference-default log2_T=19 (round 3), 78.6 ms
  full train step (52k rays/s) vs the flagship fused-MLP's 37.6 ms.
- Levels whose dense grid fits the table use collision-free linear indexing;
  finer levels use the standard spatial hash with primes (1, 2654435761,
  805459861) — the same scheme as instant-ngp, chosen per level statically.
- The trilinear blend is expressed as an 8-corner weighted sum fused by XLA
  into the gather's consumer; the tiny MLPs run in bfloat16 on the MXU.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from spinnerf_tpu.models.embedding import sh_encoding

_PRIMES = (1, 2654435761, 805459861)


def calibrate_page_bounds(x01, log2_table_size: int):
    """Density-calibrated Z-CDF segment boundaries for the windowed hash.

    x01: [K, 3] normalized sample positions in [0,1] (e.g. stratified ray
    samples from the scene's ray bank — deterministic given the scene, so a
    restored checkpoint recomputes identical bounds). Returns a tuple of
    T//PAGE_ENTRIES sorted Z-keys (`hash_encode_win.zkey27` space) cutting the
    samples' Z-order into EQUAL-COUNT segments: segment k (table entries
    [k*PAGE_ENTRIES, (k+1)*PAGE_ENTRIES)) then receives ~1/n_segments of the
    training samples, so

      * the FULL table is used whatever fraction of [-bound, bound]^3 the
        scene occupies (the reference's bound=100 maps real captures into
        <0.1%% of the cube — a uniform spatial split collapses them onto a
        few segments: measured 15.9 dB vs the 30.6 dB XOR-prime control,
        PARITY_RUN §4),
      * per-segment COLLISION load stays near the global XOR hash's
        (sample-weighted distinct cells/entry at the finest level on the
        §4 scene: 2.47 here vs the XOR control's ~2.8 — equalizing
        UNIQUE-cell counts instead measures 3.03 and more window aliasing
        on concentrated distributions, so sample quantiles win on both
        axes), and
      * a Z-sorted training block of B points spans ~B/(K/n_segments)
        consecutive segments — inside the kernel's 2-page window by
        construction (measured 0.0%% aliased corners at the 786k-point
        training shape).

    Boundary k is the k/n_segments sample quantile of the Z-keys; duplicate
    quantiles (mass concentrated inside single 1/512-cells) are advanced to
    distinct keys so no segment is unreachable.
    """
    from spinnerf_tpu.ops import hash_encode_win as hw
    t = 1 << log2_table_size
    n_seg = hw.n_segments(t)
    if n_seg < 2:
        return None
    rc = np.clip((np.asarray(x01, np.float64) * 512.0).astype(np.int64),
                 0, 511)

    def spread(v):
        out = np.zeros_like(v)
        for b in range(9):
            out |= ((v >> b) & 1) << (3 * b)
        return out

    z = np.sort(spread(rc[:, 0]) | (spread(rc[:, 1]) << 1)
                | (spread(rc[:, 2]) << 2))
    bounds = z[(np.arange(n_seg, dtype=np.int64) * len(z)) // n_seg]
    bounds[0] = 0
    # equal quantiles (heavy mass in one 1/512-cell) would leave segments
    # empty; advancing each duplicate to the next free key hands the spare
    # capacity to the neighbouring Z-range instead
    for k in range(1, n_seg):
        if bounds[k] <= bounds[k - 1]:
            bounds[k] = bounds[k - 1] + 1
    bounds = np.minimum(bounds, (1 << 27) - 1)
    for k in range(n_seg - 2, -1, -1):   # re-sort after the top clamp
        if bounds[k] >= bounds[k + 1]:
            bounds[k] = bounds[k + 1] - 1
    bounds[0] = 0
    return tuple(int(b) for b in bounds)


def calibrate_dense_box(x01, resolutions, log2_table_size: int):
    """Per-level occupied-box calibration for the shifted-morton dense
    regime (`hash_encode_win.normalize_dense_box`).

    x01: [K, 3] normalized sample positions in [0,1] (the same
    deterministic stratified ray grid `calibrate_page_bounds` uses).
    For each level: the tight cell bounding box of the samples, padded by
    one cell each side (boundary-jitter margin). Levels whose padded box
    passes `box_dense_ok` — corner codes fit min(T, DENSE_BOX_CAP) —
    become INJECTIVE and GLOBAL (one table entry per occupied cell,
    instant-ngp dense-level semantics); the rest return None and keep the
    Z-CDF page hash. At the reference's bound=100 (captures occupy <1% of
    [-bound, bound]^3) this covers the coarse AND mid levels whose
    segment-partitioning cost ~3.3 dB held-out in round 4 (PARITY_RUN §4).
    Returns a tuple of per-level None or (ox, oy, oz, ex, ey, ez)."""
    from spinnerf_tpu.ops import hash_encode_win as hw
    t = 1 << log2_table_size
    x = np.asarray(x01, np.float64)
    out = []
    for r in resolutions:
        cells = np.clip(np.floor(x * r), 0, r - 1).astype(np.int64)
        o = np.maximum(cells.min(axis=0) - 1, 0)
        top = np.minimum(cells.max(axis=0) + 1, r - 1)
        e = top - o
        box = tuple(int(v) for v in o) + tuple(int(v) for v in e)
        out.append(box if hw.box_dense_ok(e, t) else None)
    return tuple(out)


def level_resolutions(n_levels: int, base_res: int, finest_res: float):
    """Per-level grid resolutions N_l = floor(base * b^l) with
    b = exp2(log2(finest/base) / (L-1))."""
    if n_levels == 1:
        return [base_res]
    b = np.exp2(np.log2(finest_res / base_res) / (n_levels - 1))
    return [int(np.floor(base_res * b ** l)) for l in range(n_levels)]


class HashGridEncoding(nn.Module):
    """Multiresolution hash encoding of positions in [0, 1]^3 -> [L*F].

    `impl` selects the gather strategy:
      - "mxu": dense one-hot-matmul Pallas kernels (`ops/hash_encode.py`) —
        fast on TPU at small tables, but O(T) MXU work per point.
      - "win": Z-curve-sorted windowed Pallas kernels
        (`ops/hash_encode_win.py`) — O(window) per point, the fast path at
        the reference-default 2^19 table. Fine levels use the Z-CDF page
        hash (XOR-prime mixing within equal-density Z-order segments — a
        documented collision-pattern change; instant-ngp trains through
        collisions by construction). Small batches take the exact-gather
        fallback automatically (`hash_encode_win.n_windowed_min`).
      - "win_xla": the windowed index function through the exact-gather
        fallback (`hash_encode_win.hash_encode_exact`) — the CPU reference
        for "win"; it omits the kernel's window-clamp aliasing
        (`hash_encode_win.hash_encode_win_xla` is the bit-identical
        kernel test oracle).
      - "xla": plain gather / scatter-add with the reference's XOR-prime
        hash (CPU reference path for "mxu").
      - "auto": on TPU, "win" for any table over one window
        (log2_table_size >= 13) else "mxu"; "xla" elsewhere
        (`recommended_impl`).
    """
    n_levels: int = 16
    features: int = 2
    log2_table_size: int = 19
    base_res: int = 16
    finest_res: float = 2048.0
    compute_dtype: jnp.dtype = jnp.bfloat16
    impl: str = "auto"
    # density-calibrated Z-CDF segment boundaries for the windowed hash
    # (`hash_encode_win.normalize_bounds`); None = uniform Z-volume split.
    # Static (affects index semantics -> must be identical at train and
    # render; pinned to the experiment dir by the Trainer).
    page_bounds: tuple | None = None
    # per-level shifted-morton boxes (`hash_encode_win.normalize_dense_box`,
    # from `calibrate_dense_box`); None = the legacy whole-grid default
    # (res <= 7). Static index semantics, pinned like page_bounds.
    dense_box: tuple | None = None

    def corner_indices_weights(self, x):
        """x: [N, 3] in [0, 1] -> (idx [L, 8, N] int32, w [L, 8, N] f32).

        Layout contract: points are the MINOR dim of every intermediate —
        any [.., 8]/[.., 3]-minor tensor gets tile-padded (to 128 lanes) by
        XLA at training sizes, inflating HBM by 16-64x.
        """
        t = 1 << self.log2_table_size
        resolutions = level_resolutions(self.n_levels, self.base_res,
                                        self.finest_res)
        scales = jnp.asarray(resolutions, x.dtype)            # [L]
        # per-axis [L, N] tensors (points minor)
        xs = scales[:, None, None] * x.T[None]                # [L, 3, N]
        x0f = jnp.floor(xs)
        frac = xs - x0f                                       # [L, 3, N]
        x0 = x0f.astype(jnp.uint32)

        dense_ok = np.asarray([(r + 1) ** 3 <= t for r in resolutions])
        res_u = jnp.asarray(resolutions, jnp.uint32)[:, None]  # [L, 1]
        p1 = jnp.asarray(np.uint32(_PRIMES[1]))
        p2 = jnp.asarray(np.uint32(_PRIMES[2]))
        ok = jnp.asarray(dense_ok)[:, None]                    # [L, 1]

        idx_c, w_c = [], []
        for ci in range(8):
            i, j, k = (ci >> 2) & 1, (ci >> 1) & 1, ci & 1
            cx = x0[:, 0, :] + np.uint32(i)                    # [L, N]
            cy = x0[:, 1, :] + np.uint32(j)
            cz = x0[:, 2, :] + np.uint32(k)
            dense_idx = (cx * (res_u + 1) + cy) * (res_u + 1) + cz
            hash_idx = cx ^ (cy * p1) ^ (cz * p2)
            idx_c.append(jnp.where(ok, dense_idx, hash_idx) % t)
            wx = frac[:, 0, :] if i else 1.0 - frac[:, 0, :]
            wy = frac[:, 1, :] if j else 1.0 - frac[:, 1, :]
            wz = frac[:, 2, :] if k else 1.0 - frac[:, 2, :]
            w_c.append(wx * wy * wz)
        idx = jnp.stack(idx_c, axis=1)                         # [L, 8, N]
        w = jnp.stack(w_c, axis=1)
        return idx.astype(jnp.int32), w.astype(jnp.float32)

    def _resolve_impl(self):
        if self.impl != "auto":
            return self.impl
        from spinnerf_tpu.ops import hash_encode as he
        if self.features != 2 or ((1 << self.log2_table_size) * 2) % 128:
            return "xla"
        impl = he.recommended_impl(self.log2_table_size)
        if impl == "win" and (1 << self.log2_table_size) < 4096:
            return "mxu"   # table smaller than one 2-page window
        return impl

    @nn.compact
    def __call__(self, x, sorted_extra=None):
        """x: [..., 3] in [0, 1]. Returns [..., n_levels * features].

        sorted_extra: optional tuple of flat [N] per-point columns. When
        given (windowed impls only), the SORTED encode is returned instead:
        `(feats_sorted [n_pad, L*F], perm, inv_perm, extra_sorted tuple)`
        — the caller runs its pointwise consumers (MLP heads) in Z-sorted
        order and restores order once on its own small output via
        `hash_encode_win.unsort_columns`, instead of un-permuting the wide
        feature matrix here (measured ~10 ms/786k points saved on v5e).
        """
        t = 1 << self.log2_table_size
        table = self.param(
            "table",
            lambda key, shape: jax.random.uniform(key, shape, jnp.float32,
                                                  -1e-4, 1e-4),
            (self.n_levels, t, self.features))

        shape = x.shape[:-1]
        x = jnp.clip(x.reshape(-1, 3), 0.0, 1.0)             # [N, 3]
        impl = self._resolve_impl()

        if impl in ("win", "win_xla"):
            from spinnerf_tpu.ops import hash_encode_win as hw
            resolutions = level_resolutions(self.n_levels, self.base_res,
                                            self.finest_res)
            if sorted_extra is not None:
                n = x.shape[0]
                n_pad = -(-n // hw._B) * hw._B
                xt_s, perm, inv_perm, *extra_s = hw.sort_perm(
                    x, float(max(resolutions)), n_pad, extra=sorted_extra)
                if impl == "win" and n_pad >= hw.n_windowed_min(t):
                    # fused-geometry kernel: corner indices/weights are
                    # rebuilt in-kernel; only the [L, 2, NB] window page
                    # pairs are computed host-side (fused reductions)
                    pages = hw.window_pages(xt_s, resolutions, t,
                                            self.page_bounds, self.dense_box)
                    out = hw.hash_encode_win_fused(
                        table, xt_s, tuple(resolutions), pages,
                        page_bounds=self.page_bounds,
                        dense_box=self.dense_box)
                else:
                    # small batches (and the CPU path): exact gather with
                    # the same index function — no window aliasing, and
                    # XLA's serialized gather is cheap at this size
                    idx, w = hw.corner_indices_weights_win(
                        xt_s, resolutions, t, self.page_bounds,
                        self.dense_box)
                    out = hw.hash_encode_exact(table, idx, w)
                return (out.astype(self.compute_dtype), perm, inv_perm,
                        tuple(extra_s))
            out = hw.encode_win(table, x, resolutions,
                                use_kernel=(impl == "win"),
                                page_bounds=self.page_bounds,
                                dense_box=self.dense_box)      # [N, L*F]
            return out.astype(self.compute_dtype).reshape(
                *shape, self.n_levels * self.features)

        idx, w = self.corner_indices_weights(x)
        if impl == "mxu":
            from spinnerf_tpu.ops import hash_encode as he
            out = he.hash_encode_mxu(table, idx, w)            # [N, L, F]
            out = out.astype(self.compute_dtype)
        else:
            feats = jnp.take_along_axis(
                table.astype(self.compute_dtype),
                idx.reshape(self.n_levels, -1)[..., None], axis=1)
            feats = feats.reshape(self.n_levels, 8, x.shape[0],
                                  self.features)               # [L, 8, N, F]
            out = jnp.sum(feats * w[..., None].astype(self.compute_dtype),
                          axis=1).transpose(1, 0, 2)           # [N, L, F]
        return out.reshape(*shape, self.n_levels * self.features)


class HashGridField(nn.Module):
    """Hash-grid NeRF: encoder + tiny sigma/color MLPs (NeRF_TCNN parity)."""
    # opt out of the trainer's scan-of-remat chunking: each chunk's backward
    # materializes a gradient for the whole hash table, so chunking multiplies
    # table-grad HBM writes (and the per-chunk Z-sort) by the chunk count
    # (`train/step.py::_apply`; measured 3.8x step slowdown at 2^19)
    scan_chunk_exempt = True
    bound: float = 100.0
    n_levels: int = 16
    features: int = 2
    log2_table_size: int = 19
    base_res: int = 16
    finest_res_per_unit: float = 2048.0   # finest = this * bound
    geo_feat_dim: int = 15
    hidden_dim: int = 64
    num_layers: int = 2
    hidden_dim_color: int = 64
    num_layers_color: int = 3
    sh_degree: int = 4
    semantic: bool = False
    compute_dtype: jnp.dtype = jnp.bfloat16
    impl: str = "auto"
    page_bounds: tuple | None = None
    dense_box: tuple | None = None

    def _heads(self, enc, d, dtype):
        """Sigma + color MLP heads over encoded features (pointwise: runs
        identically on caller-ordered or Z-sorted points). Returns raw
        channel tuple (rgb x3 ..., sigma_raw, [semantic])."""
        h = enc.astype(dtype)
        for i in range(self.num_layers - 1):
            h = nn.relu(nn.Dense(self.hidden_dim, dtype=dtype,
                                 name=f"sigma_{i}")(h))
        n_out = 1 + (1 if self.semantic else 0) + self.geo_feat_dim
        h = nn.Dense(n_out, dtype=dtype, name="sigma_out")(h)

        # density = trunc_exp(raw): strictly positive with clamped-backward
        # exp — NeRF_TCNN parity (`run_nerf_helpers_tcnn.py:99`,
        # `activation.py:5-18`). The downstream renderer's relu is then the
        # identity. A raw (pre-activation) sigma here dies under relu: the
        # tiny sigma net is spatially ~constant at init, so one negative
        # optimizer step zeroes all density with no gradient to recover.
        from spinnerf_tpu.models.activations import trunc_exp
        sigma = trunc_exp(h[..., 0:1].astype(jnp.float32))
        ofs = 1
        heads = []
        if self.semantic:
            heads.append(h[..., 1:2].astype(jnp.float32))
            ofs = 2
        geo = h[..., ofs:]

        c = jnp.concatenate([d.astype(dtype), geo], axis=-1)
        for i in range(self.num_layers_color - 1):
            c = nn.relu(nn.Dense(self.hidden_dim_color, dtype=dtype,
                                 name=f"color_{i}")(c))
        rgb = nn.Dense(3, dtype=dtype, name="color_out")(c).astype(jnp.float32)
        return rgb, sigma, heads

    @nn.compact
    def __call__(self, pts, viewdirs=None, frozen_sigma=None):
        """pts [..., 3] world coords in [-bound, bound]; viewdirs unit [..., 3]
        broadcast over the sample axis. Returns [..., 4(+1)] float32."""
        dtype = self.compute_dtype
        x = (pts + self.bound) / (2.0 * self.bound)
        if viewdirs is None:
            raise ValueError("HashGridField requires view directions")
        enc_mod = HashGridEncoding(
            n_levels=self.n_levels, features=self.features,
            log2_table_size=self.log2_table_size, base_res=self.base_res,
            finest_res=self.finest_res_per_unit * self.bound,
            compute_dtype=dtype, impl=self.impl,
            page_bounds=self.page_bounds, dense_box=self.dense_box,
            name="encoder")

        vd = jnp.broadcast_to(viewdirs[..., None, :], pts.shape[:-1] + (3,))

        if enc_mod._resolve_impl() in ("win", "win_xla"):
            # sorted-through-MLP: every consumer of the encode is pointwise,
            # so the MLP heads run directly on Z-sorted points and only the
            # final 4(+1) raw channels are restored to caller order (keyed
            # sort) — unsorting the [N, L*F] feature matrix here would cost
            # a wide row-gather fwd AND bwd per apply
            from spinnerf_tpu.ops.hash_encode_win import unsort_columns
            shape = pts.shape[:-1]
            n = int(np.prod(shape)) if shape else 1
            vd_flat = vd.reshape(-1, 3)
            enc_s, perm, inv_perm, vd_cols = enc_mod(
                x.reshape(-1, 3),
                sorted_extra=(vd_flat[:, 0], vd_flat[:, 1], vd_flat[:, 2]))
            d = sh_encoding(jnp.stack(vd_cols, axis=-1),
                            degree=self.sh_degree)
            rgb, sigma, heads = self._heads(enc_s, d, dtype)
            cols = (rgb[:, 0], rgb[:, 1], rgb[:, 2], sigma[:, 0],
                    *(hd[:, 0] for hd in heads))
            cols = unsort_columns(perm, inv_perm, *cols)
            raw = jnp.stack(cols, axis=-1)[:n].reshape(*shape, len(cols))
            sigma = raw[..., 3:4]
            if frozen_sigma is not None:
                sigma = frozen_sigma.astype(jnp.float32)
            return jnp.concatenate(
                [raw[..., 0:3], sigma, raw[..., 4:]], axis=-1)

        enc = enc_mod(x)
        d = sh_encoding(vd, degree=self.sh_degree)
        rgb, sigma, heads = self._heads(enc, d, dtype)
        if frozen_sigma is not None:
            sigma = frozen_sigma.astype(jnp.float32)
        return jnp.concatenate([rgb, sigma] + heads, axis=-1)
