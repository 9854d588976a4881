"""Field activations.

`trunc_exp` — exponential density activation with a range-clamped backward
pass (parity: `DS_NeRF/activation.py:5-18`, the activation of the reference's
default hash-grid model `NeRF_TCNN`). The exp keeps density strictly positive
so volume-rendering gradients never die (a ReLU density with a spatially
near-constant init collapses to zero after one optimizer step and stops
learning); the clamped backward (exp of x clipped to [-15, 15]) prevents
fp overflow in the gradient when the density grows large.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def trunc_exp(x):
    """exp(x) with gradient exp(clip(x, -15, 15))."""
    return jnp.exp(x)


def _fwd(x):
    return jnp.exp(x), x


def _bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, -15.0, 15.0)),)


trunc_exp.defvjp(_fwd, _bwd)
