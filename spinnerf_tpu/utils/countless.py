"""COUNTLESS 2x downsampling (mode-pooling without counting).

Parity: the reference vendors W. Silversmith's COUNTLESS benchmark suite for
2D mode-downsampling of segmentation masks
(`lama/saicinpainting/evaluation/masks/countless/countless2d.py`), used when
preparing mask datasets at multiple scales. This is an independent
implementation of the published algorithm.

The algorithm picks, for each 2x2 block (a, b, c, d), the majority label if
one exists (a pairwise match among a/b/c) and otherwise d — equivalent to the
statistical mode for 4 samples. `PICK(x, y) = x if x == y else 0` is expressed
arithmetically so the whole image is processed vectorized; a +1 shift makes 0
a usable sentinel (the "zero-corrected" countless variant).

Both a NumPy implementation (host-side mask prep) and a jax.numpy one
(jit/TPU-safe, used inside eval pipelines) are provided.

Scope: of the vendored suite, only `zero_corrected_countless` (2D) is
load-bearing in the reference — the single call site is
`evaluation/masks/mask.py:226` (mask pyramid downsampling). The
`countless3d` variants and the benchmark/memprof harness are unused by any
reference pipeline and are deliberately not ported.
"""
from __future__ import annotations

import numpy as np


def _nz(x, fallback, xp):
    return xp.where(x != 0, x, fallback)


def countless2d(img: np.ndarray) -> np.ndarray:
    """Mode-downsample a 2D label image by 2x2 (NumPy).

    Odd dimensions are edge-padded (same convention as the reference's
    `upgraded_countless2d`). Works for any integer dtype; values may include
    0 (zero-corrected via internal +1 shift).
    """
    return _countless2d(img, np)


def countless2d_jax(img):
    """jit-compatible jax.numpy variant of :func:`countless2d`."""
    import jax.numpy as jnp
    return _countless2d(img, jnp)


def _countless2d(img, xp):
    if img.ndim != 2:
        raise ValueError(f"countless2d expects a 2D image, got {img.shape}")
    h, w = img.shape
    ph, pw = h % 2, w % 2
    if ph or pw:
        if xp is np:
            img = np.pad(img, ((0, ph), (0, pw)), mode="edge")
        else:
            img = xp.pad(img, ((0, ph), (0, pw)), mode="edge")

    # shift so the minimum value maps to 1 and 0 becomes the "no match"
    # sentinel — a plain +1 collides with negative labels (e.g. the -1
    # excluded-view label) and uint64 wrap; widen to int64 first so small
    # dtypes cannot overflow (uint8 255 -> 0)
    wide = img.astype(np.int64)
    data = wide - wide.min() + 1

    a = data[0::2, 0::2]
    b = data[0::2, 1::2]
    c = data[1::2, 0::2]
    d = data[1::2, 1::2]

    ab = a * (a == b)
    ac = a * (a == c)
    bc = b * (b == c)
    mode = _nz(_nz(ab, _nz(ac, bc, xp), xp), d, xp)
    return (mode - 1 + wide.min()).astype(img.dtype)


def downsample_mask(mask: np.ndarray, factor: int) -> np.ndarray:
    """Repeated COUNTLESS 2x until the requested power-of-two factor.

    Parity with the reference's usage: masks are downsampled with mode
    pooling (not interpolation) so label identities survive.
    """
    if factor < 1 or factor & (factor - 1):
        raise ValueError(f"factor must be a power of two, got {factor}")
    out = mask
    while factor > 1:
        out = countless2d(out)
        factor //= 2
    return out
