"""Patch discriminator for LaMa adversarial training.

Parity: pix2pixHD `NLayerDiscriminator` (the reference's big-lama
discriminator, `lama/saicinpainting/training/modules/pix2pixhd.py`, selected
by `configs/training/big-lama.yaml` `discriminator: pix2pixhd_nlayer`):
4x4 convs, stride 2, LeakyReLU(0.2), BatchNorm after the first layer, width
doubling to 512, a stride-1 layer, then a 1-channel logit head. Returns the
per-layer features too (used by the feature-matching loss).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class NLayerDiscriminator(nn.Module):
    ndf: int = 64
    n_layers: int = 4
    input_nc: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: [N, H, W, C]. Returns (logits [N, h, w, 1], features list)."""
        feats = []
        h = nn.Conv(self.ndf, (4, 4), strides=(2, 2), padding=2,
                    name="conv0")(x)
        h = nn.leaky_relu(h, 0.2)
        feats.append(h)
        nf = self.ndf
        for i in range(1, self.n_layers):
            nf = min(nf * 2, 512)
            h = nn.Conv(nf, (4, 4), strides=(2, 2), padding=2, use_bias=False,
                        name=f"conv{i}")(h)
            h = nn.BatchNorm(use_running_average=not train,
                             name=f"bn{i}")(h)
            h = nn.leaky_relu(h, 0.2)
            feats.append(h)
        nf = min(nf * 2, 512)
        h = nn.Conv(nf, (4, 4), strides=(1, 1), padding=2, use_bias=False,
                    name="conv_last")(h)
        h = nn.BatchNorm(use_running_average=not train, name="bn_last")(h)
        h = nn.leaky_relu(h, 0.2)
        feats.append(h)
        logits = nn.Conv(1, (4, 4), strides=(1, 1), padding=2,
                         name="head")(h)
        return logits, feats
