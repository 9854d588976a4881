"""LaMa training losses (parity: `lama/saicinpainting/training/losses/`).

big-lama weights (`configs/training/big-lama.yaml:8-23`): masked L1 with
weight_known=10 / weight_missing=0, non-saturating adversarial with R1
gradient penalty (weight 10, gp 0.001, mask_as_fake_target), discriminator
feature matching (weight 100), and a segmentation-perceptual "resnet_pl"
(weight 30) — substituted here by the JAX VGG16 feature distance
(`models.lpips.VGG16Features`), since the ADE20k ResNet50-dilated weights are
not distributable in this environment; the hook accepts any feature extractor.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class LamaLossWeights(NamedTuple):
    l1_known: float = 10.0
    l1_missing: float = 0.0
    adversarial: float = 10.0
    gp_coef: float = 0.001
    feature_matching: float = 100.0
    perceptual: float = 30.0


def masked_l1(pred, target, mask, *, weight_known: float,
              weight_missing: float):
    """Per-pixel L1 with different weights inside/outside the hole
    (`losses/__init__` masked_l1_loss semantics)."""
    per = jnp.abs(pred - target)
    w = mask * weight_missing + (1.0 - mask) * weight_known
    return jnp.mean(per * w)


def generator_adversarial_loss(fake_logits, mask=None):
    """Non-saturating generator loss: -log sigmoid(D(fake)) == softplus(-x).
    With `mask`, only hole pixels count (`adversarial.py:115-126`)."""
    per = jax.nn.softplus(-fake_logits)
    if mask is None:
        return jnp.mean(per)
    m = _resize_mask(mask, fake_logits.shape[1:3])
    return jnp.sum(per * m) / jnp.maximum(jnp.sum(m * jnp.ones_like(per)), 1.0)


def discriminator_adversarial_loss(real_logits, fake_logits, mask):
    """Non-saturating D loss with mask-as-fake-target: inside the hole the
    'real' image is also treated as fake (`adversarial.py:128-169`)."""
    m = _resize_mask(mask, real_logits.shape[1:3])
    # real pixels: label 1 outside the hole, 0 inside
    loss_real = (1 - m) * jax.nn.softplus(-real_logits) + \
        m * jax.nn.softplus(real_logits)
    loss_fake = jax.nn.softplus(fake_logits)
    return jnp.mean(loss_real) + jnp.mean(loss_fake)


def r1_gradient_penalty(disc_apply, disc_params, real, mask):
    """R1 penalty: E[|grad_x D(real)|^2] (`adversarial.py:81-113`)."""
    def score(x):
        logits, _ = disc_apply(disc_params, x)
        m = _resize_mask(mask, logits.shape[1:3])
        return jnp.sum(logits * (1 - m)) / real.shape[0]
    g = jax.grad(score)(real)
    return jnp.sum(g ** 2) / real.shape[0]


def feature_matching_loss(fake_feats, real_feats, mask=None):
    """L2 between D features of fake and (stop-grad) real
    (`feature_matching.py:19`)."""
    total = 0.0
    for f, r in zip(fake_feats, real_feats):
        total += jnp.mean((f - jax.lax.stop_gradient(r)) ** 2)
    return total / len(fake_feats)


def perceptual_loss(features_apply, feat_params, pred, target):
    """Feature-space L2 through a frozen conv net (resnet_pl substitute)."""
    fp = features_apply(feat_params, pred)
    ft = features_apply(feat_params, jax.lax.stop_gradient(target))
    total = 0.0
    for a, b in zip(fp, ft):
        total += jnp.mean((a - jax.lax.stop_gradient(b)) ** 2)
    return total / len(fp)


def _resize_mask(mask, hw):
    """Nearest-resize a [N, H, W, 1] mask to the logit grid."""
    if mask.shape[1:3] == tuple(hw):
        return mask
    return jax.image.resize(mask, (mask.shape[0], hw[0], hw[1],
                                   mask.shape[-1]), method="nearest")
