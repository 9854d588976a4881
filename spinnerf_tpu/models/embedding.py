"""Input encodings: NeRF sinusoidal positional encoding and spherical
harmonics for view directions.

Parity: `Embedder`/`get_embedder` (`DS_NeRF/run_nerf_helpers.py:22-70`) —
output layout is [x, sin(x*f0), cos(x*f0), sin(x*f1), cos(x*f1), ...] with
log-spaced frequencies 2^0 .. 2^(multires-1), each applied to the full input
vector. Implemented as one broadcasted op instead of a list of lambdas.
"""
from __future__ import annotations

import jax.numpy as jnp


def positional_encoding_dim(input_dim: int, num_freqs: int,
                            include_input: bool = True) -> int:
    return input_dim * ((1 if include_input else 0) + 2 * num_freqs)


def positional_encoding(x, num_freqs: int, include_input: bool = True):
    """Sinusoidal frequency encoding.

    Args:
      x: [..., D] inputs.
      num_freqs: number of octaves (reference `multires`); frequencies are
        2^linspace(0, num_freqs-1, num_freqs) = 2^0 .. 2^(num_freqs-1).
    Returns:
      [..., D * (include_input + 2*num_freqs)] with per-frequency interleaved
      (sin, cos) blocks, matching the reference feature ordering.
    """
    if num_freqs == 0:
        return x
    freqs = 2.0 ** jnp.arange(num_freqs, dtype=x.dtype)  # [F]
    xb = x[..., None, :] * freqs[:, None]                # [..., F, D]
    # [..., F, 2, D]: sin block then cos block per frequency.
    enc = jnp.stack([jnp.sin(xb), jnp.cos(xb)], axis=-2)
    enc = enc.reshape(*x.shape[:-1], 2 * num_freqs * x.shape[-1])
    if include_input:
        enc = jnp.concatenate([x, enc], axis=-1)
    return enc


# --- Spherical harmonics (degree 4) for hash-grid view encoding -------------
# Matches the tiny-cuda-nn "SphericalHarmonics" basis used by the reference's
# NeRF_TCNN direction encoder (`DS_NeRF/run_nerf_helpers_tcnn.py:33-38`).

def sh_encoding(dirs, degree: int = 4):
    """Real spherical harmonics basis evaluated at unit directions.

    Args:
      dirs: [..., 3] unit vectors.
      degree: number of SH bands (1..4). Output dim = degree**2.
    """
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    out = [jnp.full_like(x, 0.28209479177387814)]  # l=0
    if degree > 1:
        out += [-0.48860251190291987 * y,
                0.48860251190291987 * z,
                -0.48860251190291987 * x]
    if degree > 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        out += [1.0925484305920792 * xy,
                -1.0925484305920792 * yz,
                0.94617469575755997 * zz - 0.31539156525251999,
                -1.0925484305920792 * xz,
                0.54627421529603959 * (xx - yy)]
    if degree > 3:
        out += [0.59004358992664352 * y * (-3.0 * xx + yy),
                2.8906114426405538 * xy * z,
                0.45704579946446572 * y * (1.0 - 5.0 * zz),
                0.3731763325901154 * z * (5.0 * zz - 3.0),
                0.45704579946446572 * x * (1.0 - 5.0 * zz),
                1.4453057213202769 * z * (xx - yy),
                0.59004358992664352 * x * (-xx + 3.0 * yy)]
    return jnp.stack(out, axis=-1)
