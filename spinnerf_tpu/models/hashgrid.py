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
- PERFORMANCE (measured, v5e): XLA's tiny-row (F=2) gathers and the
  scatter-add backward into the 2^19-entry tables run ~1000x off HBM
  bandwidth (~630 ms fwd / ~4.5 s fwd+bwd for 4096x128 points at default
  size) — the classic hash-grid-on-TPU trap. The dense `NeRFField` MLP is
  pure MXU matmul and is the throughput flagship on TPU (~17 it/s fused
  step); this field is kept for reference parity and small-table configs.
  A Pallas kernel holding each 2 MB level table VMEM-resident is the
  planned fix (`spinnerf_tpu/ops/`).
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


def level_resolutions(n_levels: int, base_res: int, finest_res: float):
    """Per-level grid resolutions N_l = floor(base * b^l) with
    b = exp2(log2(finest/base) / (L-1))."""
    if n_levels == 1:
        return [base_res]
    b = np.exp2(np.log2(finest_res / base_res) / (n_levels - 1))
    return [int(np.floor(base_res * b ** l)) for l in range(n_levels)]


class HashGridEncoding(nn.Module):
    """Multiresolution hash encoding of positions in [0, 1]^3 -> [L*F]."""
    n_levels: int = 16
    features: int = 2
    log2_table_size: int = 19
    base_res: int = 16
    finest_res: float = 2048.0
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        """x: [..., 3] in [0, 1]. Returns [..., n_levels * features]."""
        t = 1 << self.log2_table_size
        resolutions = level_resolutions(self.n_levels, self.base_res,
                                        self.finest_res)
        table = self.param(
            "table",
            lambda key, shape: jax.random.uniform(key, shape, jnp.float32,
                                                  -1e-4, 1e-4),
            (self.n_levels, t, self.features))

        shape = x.shape[:-1]
        x = jnp.clip(x.reshape(-1, 3), 0.0, 1.0)             # [N, 3]
        n = x.shape[0]

        scales = jnp.asarray(resolutions, x.dtype)            # [L]
        xs = x[:, None, :] * scales[None, :, None]            # [N, L, 3]
        x0 = jnp.floor(xs)
        frac = xs - x0                                        # [N, L, 3]
        x0 = x0.astype(jnp.uint32)

        # 8 corner offsets [8, 3]
        corners = jnp.asarray(
            [[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)],
            jnp.uint32)
        cxyz = x0[:, :, None, :] + corners[None, None]        # [N, L, 8, 3]

        # static per-level choice: dense (collision-free) vs hashed
        dense_ok = np.asarray([(r + 1) ** 3 <= t for r in resolutions])
        res_u = jnp.asarray(resolutions, jnp.uint32)[None, :, None]  # [1,L,1]
        cx, cy, cz = cxyz[..., 0], cxyz[..., 1], cxyz[..., 2]
        dense_idx = (cx * (res_u + 1) + cy) * (res_u + 1) + cz
        p1 = jnp.asarray(np.uint32(_PRIMES[1]))
        p2 = jnp.asarray(np.uint32(_PRIMES[2]))
        hash_idx = cx ^ (cy * p1) ^ (cz * p2)
        idx = jnp.where(jnp.asarray(dense_ok)[None, :, None],
                        dense_idx, hash_idx) % t               # [N, L, 8]

        # one batched gather over the level axis: [L, T, F] x [L, N*8] -> [L, N*8, F]
        idx_l = idx.transpose(1, 0, 2).reshape(self.n_levels, n * 8)
        feats = jnp.take_along_axis(table.astype(self.compute_dtype),
                                    idx_l[..., None].astype(jnp.int32), axis=1)
        feats = feats.reshape(self.n_levels, n, 8, self.features) \
                     .transpose(1, 0, 2, 3)                    # [N, L, 8, F]

        # trilinear weights per corner
        w = jnp.where(corners[None, None].astype(bool),
                      frac[:, :, None, :], 1.0 - frac[:, :, None, :])
        w = jnp.prod(w, axis=-1).astype(self.compute_dtype)    # [N, L, 8]

        out = jnp.sum(feats * w[..., None], axis=2)            # [N, L, F]
        return out.reshape(*shape, self.n_levels * self.features)


class HashGridField(nn.Module):
    """Hash-grid NeRF: encoder + tiny sigma/color MLPs (NeRF_TCNN parity)."""
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

    @nn.compact
    def __call__(self, pts, viewdirs=None, frozen_sigma=None):
        """pts [..., 3] world coords in [-bound, bound]; viewdirs unit [..., 3]
        broadcast over the sample axis. Returns [..., 4(+1)] float32."""
        dtype = self.compute_dtype
        x = (pts + self.bound) / (2.0 * self.bound)
        enc = HashGridEncoding(
            n_levels=self.n_levels, features=self.features,
            log2_table_size=self.log2_table_size, base_res=self.base_res,
            finest_res=self.finest_res_per_unit * self.bound,
            compute_dtype=dtype, name="encoder")(x)

        h = enc.astype(dtype)
        for i in range(self.num_layers - 1):
            h = nn.relu(nn.Dense(self.hidden_dim, dtype=dtype,
                                 name=f"sigma_{i}")(h))
        n_out = 1 + (1 if self.semantic else 0) + self.geo_feat_dim
        h = nn.Dense(n_out, dtype=dtype, name="sigma_out")(h)

        sigma = h[..., 0:1].astype(jnp.float32)
        if frozen_sigma is not None:
            sigma = frozen_sigma.astype(jnp.float32)
        ofs = 1
        heads = []
        if self.semantic:
            heads.append(h[..., 1:2].astype(jnp.float32))
            ofs = 2
        geo = h[..., ofs:]

        if viewdirs is None:
            raise ValueError("HashGridField requires view directions")
        vd = jnp.broadcast_to(viewdirs[..., None, :], pts.shape[:-1] + (3,))
        d = sh_encoding(vd, degree=self.sh_degree).astype(dtype)

        c = jnp.concatenate([d, geo], axis=-1)
        for i in range(self.num_layers_color - 1):
            c = nn.relu(nn.Dense(self.hidden_dim_color, dtype=dtype,
                                 name=f"color_{i}")(c))
        rgb = nn.Dense(3, dtype=dtype, name="color_out")(c).astype(jnp.float32)

        return jnp.concatenate([rgb, sigma] + heads, axis=-1)
