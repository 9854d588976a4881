"""The pix2pixHD generator/discriminator zoo + model factories.

Parity: `lama/saicinpainting/training/modules/pix2pixhd.py`
(`GlobalGenerator:341`, `MultiDilatedGlobalGenerator:178`,
`MultidilatedNLayerDiscriminator:616`, `ResnetBlock:30`),
`multidilated_conv.py:6` (`MultidilatedConv`), `ffc.py:370`
(`FFCNLayerDiscriminator`), and the factories in `modules/__init__.py:7,22`.
These are the non-flagship architectures the reference's Hydra config tree
can select (`configs/training/*.yaml` generator/discriminator groups); the
flagship big-lama pair lives in `models.lama` / `models.discriminator`.

TPU notes: everything is NHWC flax with reflect padding; the multidilated
branches are parallel stride-1 convs XLA fuses well; no torch-style module
lists — dilations are static Python unrolls inside one compiled graph.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from spinnerf_tpu.models.lama import (FFCBnAct, FFCResNetGenerator,
                                      TorchConvTranspose, reflect_pad)


class MultidilatedConv(nn.Module):
    """Parallel convs at dilations min_dilation * 2^i, combined by sum
    (`multidilated_conv.py:6-65`, comb_mode='sum')."""
    features: int
    kernel: int = 3
    dilation_num: int = 3
    min_dilation: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        out = 0.0
        dilation = self.min_dilation
        for i in range(self.dilation_num):
            pad = (self.kernel - 1) // 2 * dilation
            h = reflect_pad(x, pad)
            out = out + nn.Conv(self.features, (self.kernel, self.kernel),
                                kernel_dilation=(dilation, dilation),
                                padding="VALID", use_bias=self.use_bias,
                                name=f"dil{i}")(h)
            dilation *= 2
        return out


class ResnetBlock(nn.Module):
    """pix2pixHD residual block: two reflect-padded 3x3 conv+BN(+ReLU)
    (`pix2pixhd.py:30-89`); `multidilated` switches the convs to
    `MultidilatedConv` (`MultidilatedResnetBlock:155-175`)."""
    features: int
    dilation: int = 1
    multidilated: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        def conv(name, h):
            if self.multidilated:
                return MultidilatedConv(self.features, name=name)(h)
            pad = self.dilation
            h = reflect_pad(h, pad)
            return nn.Conv(self.features, (3, 3),
                           kernel_dilation=(self.dilation, self.dilation),
                           padding="VALID", name=name)(h)

        h = nn.relu(nn.BatchNorm(use_running_average=not train,
                                 name="bn1")(conv("conv1", x)))
        h = nn.BatchNorm(use_running_average=not train,
                         name="bn2")(conv("conv2", h))
        return x + h


class GlobalGenerator(nn.Module):
    """pix2pixHD GlobalGenerator (`pix2pixhd.py:341-436`): 7x7 stem,
    stride-2 downsampling stack, resnet bottleneck, conv-transpose
    upsampling, 7x7 head with tanh/sigmoid output.

    `multidilated=True` gives `MultiDilatedGlobalGenerator`
    (`pix2pixhd.py:178-236`) — multidilated bottleneck blocks.
    """
    input_nc: int = 4
    output_nc: int = 3
    ngf: int = 64
    n_downsampling: int = 3
    n_blocks: int = 9
    max_features: int = 1024
    multidilated: bool = False
    out_act: str = "tanh"    # reference default add_out_act=True -> tanh

    @nn.compact
    def __call__(self, x, train: bool = False):
        ngf, maxf = self.ngf, self.max_features
        h = reflect_pad(x, 3)
        h = nn.Conv(ngf, (7, 7), padding="VALID", name="stem")(h)
        h = nn.relu(nn.BatchNorm(use_running_average=not train,
                                 name="stem_bn")(h))
        for i in range(self.n_downsampling):
            mult = 2 ** i
            h = reflect_pad(h, 1)
            h = nn.Conv(min(maxf, ngf * mult * 2), (3, 3), strides=(2, 2),
                        padding="VALID", name=f"down{i}")(h)
            h = nn.relu(nn.BatchNorm(use_running_average=not train,
                                     name=f"down{i}_bn")(h))
        feats = min(maxf, ngf * 2 ** self.n_downsampling)
        for i in range(self.n_blocks):
            h = ResnetBlock(feats, multidilated=self.multidilated,
                            name=f"block{i}")(h, train)
        for i in range(self.n_downsampling):
            mult = 2 ** (self.n_downsampling - i)
            h = TorchConvTranspose(min(maxf, ngf * mult // 2),
                                   name=f"up{i}")(h)
            h = nn.relu(nn.BatchNorm(use_running_average=not train,
                                     name=f"up{i}_bn")(h))
        h = reflect_pad(h, 3)
        h = nn.Conv(self.output_nc, (7, 7), padding="VALID", name="head")(h)
        if self.out_act == "tanh":
            return jnp.tanh(h)
        if self.out_act == "sigmoid":
            return jax.nn.sigmoid(h)
        return h


def MultiDilatedGlobalGenerator(**kwargs):
    """`pix2pixhd.py:178` — GlobalGenerator with multidilated bottleneck."""
    return GlobalGenerator(multidilated=True, **kwargs)


class MultidilatedNLayerDiscriminator(nn.Module):
    """Patch discriminator with multidilated convs
    (`pix2pixhd.py:616-664`). Returns (logits, feature list)."""
    ndf: int = 64
    n_layers: int = 4
    input_nc: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = []
        # stride-2 via avg_pool after stride-1 multidilated conv (the
        # reference passes stride through its conv ctor; pooling keeps the
        # dilated branches aligned and is TPU-friendly)
        h = MultidilatedConv(self.ndf, kernel=3, name="conv0")(x)
        h = nn.avg_pool(h, (2, 2), strides=(2, 2))
        h = nn.leaky_relu(h, 0.2)
        feats.append(h)
        nf = self.ndf
        for i in range(1, self.n_layers):
            nf = min(nf * 2, 512)
            h = MultidilatedConv(nf, kernel=3, use_bias=False,
                                 name=f"conv{i}")(h)
            h = nn.avg_pool(h, (2, 2), strides=(2, 2))
            h = nn.leaky_relu(nn.BatchNorm(use_running_average=not train,
                                           name=f"bn{i}")(h), 0.2)
            feats.append(h)
        nf = min(nf * 2, 512)
        h = MultidilatedConv(nf, kernel=3, use_bias=False, name="conv_last")(h)
        h = nn.leaky_relu(nn.BatchNorm(use_running_average=not train,
                                       name="bn_last")(h), 0.2)
        feats.append(h)
        logits = nn.Conv(1, (3, 3), padding=1, name="out")(h)
        return logits, feats


class FFCNLayerDiscriminator(nn.Module):
    """FFC patch discriminator (`ffc.py:370-433`): FFC_BN_ACT stack with
    leaky-relu, global branch ratio from `conv_kwargs`, concat at the end.
    Returns (logits, feature list)."""
    ndf: int = 64
    n_layers: int = 3
    input_nc: int = 3
    max_features: int = 512
    ratio_g: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = []

        def cat(h):
            h_l, h_g = h
            return h_l if h_g is None else jnp.concatenate([h_l, h_g], -1)

        h = FFCBnAct(self.ndf, kernel=3, ratio_gin=0.0, ratio_gout=0.0,
                     act="leaky", name="conv0")((x, None), train)
        feats.append(cat(h))
        nf = self.ndf
        for i in range(1, self.n_layers):
            nf_prev_ratio = 0.0 if i == 1 else self.ratio_g
            nf = min(nf * 2, self.max_features)
            h = FFCBnAct(nf, kernel=3, stride=2, ratio_gin=nf_prev_ratio,
                         ratio_gout=self.ratio_g, act="leaky",
                         name=f"conv{i}")(h, train)
            feats.append(cat(h))
        nf = min(nf * 2, 512)
        h = FFCBnAct(nf, kernel=3, ratio_gin=self.ratio_g,
                     ratio_gout=self.ratio_g, act="leaky",
                     name="conv_last")(h, train)
        y = cat(h)
        feats.append(y)
        logits = nn.Conv(1, (3, 3), padding=1, name="out")(y)
        return logits, feats


def make_generator(kind: str, **kwargs):
    """Generator factory (`modules/__init__.py:7-19`). Kinds: `ffc_resnet`
    (big-lama default), `pix2pixhd_global`, `pix2pixhd_multidilated`."""
    if kind == "ffc_resnet":
        return FFCResNetGenerator(**kwargs)
    if kind == "pix2pixhd_global":
        return GlobalGenerator(**kwargs)
    if kind == "pix2pixhd_multidilated":
        return MultiDilatedGlobalGenerator(**kwargs)
    raise ValueError(f"Unknown generator kind {kind}")


def make_discriminator(kind: str, **kwargs):
    """Discriminator factory (`modules/__init__.py:22-32` + the FFC variant
    `ffc.py:370`). Kinds: `pix2pixhd_nlayer` (big-lama default),
    `pix2pixhd_nlayer_multidilated`, `ffc_nlayer`."""
    from spinnerf_tpu.models.discriminator import NLayerDiscriminator
    if kind == "pix2pixhd_nlayer":
        return NLayerDiscriminator(**kwargs)
    if kind == "pix2pixhd_nlayer_multidilated":
        return MultidilatedNLayerDiscriminator(**kwargs)
    if kind == "ffc_nlayer":
        return FFCNLayerDiscriminator(**kwargs)
    raise ValueError(f"Unknown discriminator kind {kind}")
