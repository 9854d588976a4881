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


def generator_adversarial_loss(fake_logits, mask=None, *,
                               use_unmasked: bool = True,
                               extra_mask_weight: float = 0.0):
    """Non-saturating generator loss: -log sigmoid(D(fake)) == softplus(-x),
    averaged over ALL pixels in the big-lama configuration
    (`adversarial.py:102-115`: use_unmasked_for_gen=True,
    extra_mask_weight_for_gen=0 — the mask reweights only when those are
    overridden)."""
    per = jax.nn.softplus(-fake_logits)
    if mask is not None and (not use_unmasked or extra_mask_weight > 0):
        m = _resize_mask(mask, fake_logits.shape[1:3])
        per = per * (m if not use_unmasked
                     else 1.0 + m * extra_mask_weight)
    return jnp.mean(per)


def discriminator_adversarial_loss(real_logits, fake_logits, mask):
    """Non-saturating D loss with mask-as-fake-target
    (`adversarial.py:121-140`): the real image is labeled real EVERYWHERE;
    the generator output is labeled fake inside the hole and real outside it
    (its known-region output must also fool D)."""
    m = _resize_mask(mask, fake_logits.shape[1:3])
    loss_real = jax.nn.softplus(-real_logits)
    loss_fake = m * jax.nn.softplus(fake_logits) + \
        (1.0 - m) * jax.nn.softplus(-fake_logits)
    return jnp.mean(loss_real + loss_fake)


def r1_gradient_penalty(disc_apply, disc_params, real):
    """R1 penalty (`adversarial.py:70-78` make_r1_gp): backprop
    sum(D(real)) to the input and take the batch mean of per-sample squared
    gradient norms — no masking, no batch-size prescaling."""
    def score(x):
        logits, _ = disc_apply(disc_params, x)
        return jnp.sum(logits)
    g = jax.grad(score)(real)
    return jnp.mean(jnp.sum(g.reshape(g.shape[0], -1) ** 2, axis=1))


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
