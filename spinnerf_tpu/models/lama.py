"""LaMa: Fast-Fourier-Convolution inpainting generator in JAX/flax.

TPU-native reimplementation of the reference's FFC stack
(`lama/saicinpainting/training/modules/ffc.py`):
- `FourierUnit`     rfft2 -> 1x1 conv+BN+ReLU on stacked (re, im) -> irfft2
                    (`ffc.py:49-113`)
- `SpectralTransform` 1x1 reduce -> FourierUnit (+optional LFU) -> 1x1 expand
                    with residual (`ffc.py:116-163`)
- `FFC` / `FFC_BN_ACT` dual local/global branches with l2l/l2g/g2l/g2g cross
                    connections (`ffc.py:166-254`)
- `FFCResnetBlock`  two FFC_BN_ACT with residual (`ffc.py:258-283`)
- `FFCResNetGenerator` reflect-pad stem, 3 stride-2 downs, 18 blocks
                    (ratio_g 0.75), 3 transpose-conv ups, sigmoid head —
                    the big-lama configuration
                    (`ffc.py:305-367`, `configs/training/big-lama.yaml:26-44`).

Everything is NHWC (TPU-preferred); `convert.py`-style helpers load torch
`state_dict`s weight-exactly, including the (re, im)-interleaved channel
layout of the FourierUnit conv and torch's ConvTranspose2d arithmetic.
BatchNorm runs in inference mode with converted running stats by default
(big-lama inference is the pipeline use case; training-mode BN is supported
via `use_running_average=False`).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def reflect_pad(x, pad: int):
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


# --- real FFTs via complex FFTs ---------------------------------------------
# The axon TPU backend reliably lowers C2C fft/ifft but the VJPs of
# rfft2/irfft2 (R2C/C2R adjoints) hit flaky UNIMPLEMENTED errors. These
# helpers compute the identical half-spectrum values through full complex
# FFTs (whose adjoints are again complex FFTs), trading 2x FFT flops for a
# dependable gradient path. Axes are (1, 2) of an NHWC array.

def rfft2_via_c2c(x, norm="ortho"):
    """== jnp.fft.rfft2(x, axes=(1,2), norm=norm) for real x [N,H,W,C]."""
    w = x.shape[2]
    f = jnp.fft.fft2(jax.lax.complex(x, jnp.zeros_like(x)), axes=(1, 2),
                     norm=norm)
    return f[:, :, : w // 2 + 1]


def irfft2_via_c2c(hspec, s, norm="ortho"):
    """== jnp.fft.irfft2(hspec, s=s, axes=(1,2), norm=norm).

    Rebuilds the full Hermitian spectrum from the half spectrum, runs a
    complex ifft2, and returns the real part.
    """
    h, w = s
    wf = w // 2 + 1
    # columns to mirror: j = 1 .. w-wf  (excludes DC; excludes Nyquist when
    # w is even because w-wf = w/2-1 then)
    body = hspec[:, :, 1: w - wf + 1]
    mirror = jnp.conj(body[:, :, ::-1])          # col j -> w - j
    # row i -> (h - i) % h: reverse rows then rotate by one
    mirror = jnp.roll(mirror[:, ::-1, :], 1, axis=1)
    full = jnp.concatenate([hspec, mirror], axis=2)
    out = jnp.fft.ifft2(full, axes=(1, 2), norm=norm)
    return out.real


class ConvBNAct(nn.Module):
    """Conv (reflect padding) -> BatchNorm -> activation."""
    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    use_bias: bool = False
    bn: bool = True
    act: bool = True
    pad: int | None = None     # None => (kernel-1)//2 * dilation

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.pad if self.pad is not None else \
            (self.kernel - 1) // 2 * self.dilation
        x = reflect_pad(x, pad)
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    kernel_dilation=(self.dilation, self.dilation),
                    padding="VALID", use_bias=self.use_bias, name="conv")(x)
        if self.bn:
            x = nn.BatchNorm(use_running_average=not train, name="bn")(x)
        if self.act:
            x = nn.relu(x)
        return x


class FourierUnit(nn.Module):
    """Spectral 1x1 conv: rfft2 -> conv+BN+ReLU on interleaved (re, im)
    channels -> irfft2. Channel interleave matches torch's
    (b, c, 2, h, w).view(b, 2c, h, w) so converted weights are exact."""
    features: int
    fft_norm: str = "ortho"

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, h, w, c = x.shape
        f = rfft2_via_c2c(x.astype(jnp.float32),
                          norm=self.fft_norm)           # [N, H, Wf, C] complex
        f = jnp.stack([f.real, f.imag], axis=-1)        # [N, H, Wf, C, 2]
        f = f.reshape(n, h, w // 2 + 1, 2 * c)          # interleaved re/im
        f = nn.Conv(self.features * 2, (1, 1), use_bias=False,
                    name="conv")(f)
        f = nn.BatchNorm(use_running_average=not train, name="bn")(f)
        f = nn.relu(f)
        f = f.reshape(n, h, w // 2 + 1, self.features, 2)
        comp = jax.lax.complex(f[..., 0], f[..., 1])
        out = irfft2_via_c2c(comp, s=(h, w), norm=self.fft_norm)
        return out.astype(x.dtype)


class SpectralTransform(nn.Module):
    """1x1 reduce -> FourierUnit (+LFU) -> residual 1x1 expand
    (`ffc.py:116-163`)."""
    features: int
    stride: int = 1
    enable_lfu: bool = False   # big-lama disables it

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.stride == 2:
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = nn.Conv(self.features // 2, (1, 1), use_bias=False,
                    name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, name="conv1_bn")(x)
        x = nn.relu(x)
        out = FourierUnit(self.features // 2, name="fu")(x, train)
        if self.enable_lfu:
            n, h, w, c = x.shape
            xs = x[..., : c // 4]
            xs = jnp.concatenate(jnp.split(xs, 2, axis=1), axis=-1)
            xs = jnp.concatenate(jnp.split(xs, 2, axis=2), axis=-1)
            xs = FourierUnit(self.features // 2, name="lfu")(xs, train)
            xs = jnp.tile(xs, (1, 2, 2, 1))
        else:
            xs = 0.0
        return nn.Conv(self.features, (1, 1), use_bias=False,
                       name="conv2")(x + out + xs)


class FFC(nn.Module):
    """Dual-branch fast Fourier convolution (`ffc.py:166-225`).

    Input/output are (local, global) tuples; either side may be None when its
    ratio is 0.
    """
    features: int
    kernel: int = 3
    ratio_gin: float = 0.0
    ratio_gout: float = 0.0
    stride: int = 1
    dilation: int = 1
    enable_lfu: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x_l, x_g = x if isinstance(x, tuple) else (x, None)
        in_cg = 0 if x_g is None else x_g.shape[-1]
        out_cg = int(self.features * self.ratio_gout)
        out_cl = self.features - out_cg
        pad = (self.kernel - 1) // 2 * self.dilation

        def conv(name, feats):
            def f(h):
                h = reflect_pad(h, pad)
                return nn.Conv(feats, (self.kernel, self.kernel),
                               strides=(self.stride, self.stride),
                               kernel_dilation=(self.dilation, self.dilation),
                               padding="VALID", use_bias=False, name=name)(h)
            return f

        out_l = out_g = None
        if out_cl > 0:
            out_l = 0.0
            if x_l is not None:
                out_l = conv("convl2l", out_cl)(x_l)
            if in_cg > 0:
                out_l = out_l + conv("convg2l", out_cl)(x_g)
        if out_cg > 0:
            out_g = 0.0
            if x_l is not None:
                out_g = conv("convl2g", out_cg)(x_l)
            if in_cg > 0:
                out_g = out_g + SpectralTransform(
                    out_cg, stride=self.stride, enable_lfu=self.enable_lfu,
                    name="convg2g")(x_g, train)
        return out_l, out_g


class FFCBnAct(nn.Module):
    """FFC followed by per-branch BN + activation (`ffc.py:228-254`).

    `act`: "relu" (generator) or "leaky" (0.2 slope — the FFC discriminator,
    `ffc.py:376-377`).
    """
    features: int
    kernel: int = 3
    ratio_gin: float = 0.0
    ratio_gout: float = 0.0
    stride: int = 1
    dilation: int = 1
    enable_lfu: bool = False
    act: str = "relu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        x_l, x_g = FFC(self.features, self.kernel, self.ratio_gin,
                       self.ratio_gout, self.stride, self.dilation,
                       self.enable_lfu, name="ffc")(x, train)
        act = nn.relu if self.act == "relu" else \
            lambda h: nn.leaky_relu(h, 0.2)
        if x_l is not None:
            x_l = act(nn.BatchNorm(use_running_average=not train,
                                   name="bn_l")(x_l))
        if x_g is not None:
            x_g = act(nn.BatchNorm(use_running_average=not train,
                                   name="bn_g")(x_g))
        return x_l, x_g


class FFCResnetBlock(nn.Module):
    """Two FFC_BN_ACT layers with a per-branch residual (`ffc.py:258-283`)."""
    features: int
    ratio: float = 0.75
    dilation: int = 1
    enable_lfu: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        id_l, id_g = x
        x_l, x_g = FFCBnAct(self.features, 3, self.ratio, self.ratio,
                            dilation=self.dilation,
                            enable_lfu=self.enable_lfu, name="conv1")(x, train)
        x_l, x_g = FFCBnAct(self.features, 3, self.ratio, self.ratio,
                            dilation=self.dilation,
                            enable_lfu=self.enable_lfu,
                            name="conv2")((x_l, x_g), train)
        return id_l + x_l, id_g + x_g


class TorchConvTranspose(nn.Module):
    """ConvTranspose matching torch's ConvTranspose2d(k=3, s=2, p=1, op=1)
    arithmetic: out = 2*in. Implemented as input dilation + VALID conv with
    asymmetric padding, so torch weights (flipped) convert exactly."""
    features: int

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, x.shape[-1],
                                                       self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        # conv_transpose with explicit padding ((1,2),(1,2)) reproduces
        # torch p=1, op=1: out = (in-1)*2 - 2*1 + 3 + 1 = 2*in
        y = jax.lax.conv_transpose(
            x, kernel, strides=(2, 2), padding=((1, 2), (1, 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias


class FFCResNetGenerator(nn.Module):
    """The big-lama inpainting generator (`ffc.py:305-367` + big-lama.yaml).

    Input: [N, H, W, 4] (masked RGB + mask), H/W multiples of 8.
    Output: [N, H, W, 3] sigmoid RGB.

    Exposes `front` (stem + downsamples -> latent tuple) and `rear`
    (resblocks + upsamples + head) separately for the refiner's latent
    optimization (`saicinpainting/evaluation/refinement.py:90-189` splits the
    generator the same way). `__call__` = rear(front(x)).
    """
    input_nc: int = 4
    output_nc: int = 3
    ngf: int = 64
    n_downsampling: int = 3
    n_blocks: int = 18
    ratio_g: float = 0.75
    max_features: int = 1024
    enable_lfu: bool = False

    def setup(self):
        ngf, maxf = self.ngf, self.max_features
        self.stem = FFCBnAct(ngf, kernel=7, ratio_gin=0.0, ratio_gout=0.0,
                             name="stem")
        downs = []
        for i in range(self.n_downsampling):
            mult = 2 ** i
            gout = (self.ratio_g if i == self.n_downsampling - 1 else 0.0)
            downs.append(FFCBnAct(min(maxf, ngf * mult * 2), kernel=3,
                                  stride=2, ratio_gin=0.0, ratio_gout=gout,
                                  name=f"down{i}"))
        self.downs = downs
        feats = min(maxf, ngf * 2 ** self.n_downsampling)
        self.blocks = [FFCResnetBlock(feats, ratio=self.ratio_g,
                                      enable_lfu=self.enable_lfu,
                                      name=f"block{i}")
                       for i in range(self.n_blocks)]
        ups, up_bns = [], []
        for i in range(self.n_downsampling):
            mult = 2 ** (self.n_downsampling - i)
            ups.append(TorchConvTranspose(min(maxf, ngf * mult // 2),
                                          name=f"up{i}"))
            up_bns.append(nn.BatchNorm(name=f"up{i}_bn"))
        self.ups = ups
        self.up_bns = up_bns
        self.head = nn.Conv(self.output_nc, (7, 7), padding="VALID",
                            name="head")

    def front(self, x, train: bool = False):
        """Stem + downsamples -> (z_local, z_global) latent pair."""
        h = self.stem((x, None), train)
        for d in self.downs:
            h = d(h, train)
        return h

    def rear(self, h, train: bool = False):
        """Resblocks + upsamples + head -> sigmoid RGB."""
        for b in self.blocks:
            h = b(h, train)
        x_l, x_g = h
        y = x_l if x_g is None else jnp.concatenate([x_l, x_g], axis=-1)
        for up, bn in zip(self.ups, self.up_bns):
            y = nn.relu(bn(up(y), use_running_average=not train))
        y = reflect_pad(y, 3)
        return jax.nn.sigmoid(self.head(y))

    def __call__(self, x, train: bool = False):
        return self.rear(self.front(x, train), train)


# --- torch weight conversion -------------------------------------------------

def _t_conv(w):
    """torch conv weight [out, in, kh, kw] -> flax [kh, kw, in, out]."""
    return jnp.asarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))


def _t_convT(w):
    """torch ConvTranspose2d weight [in, out, kh, kw] -> the HWIO kernel used
    by `jax.lax.conv_transpose` (which correlates with the kernel after
    transposition semantics): flip spatial dims and swap in/out."""
    w = np.asarray(w)[:, :, ::-1, ::-1]           # flip kh, kw
    return jnp.asarray(np.transpose(w, (2, 3, 0, 1)))  # -> [kh, kw, in, out]


def _t_bn(prefix, sd):
    return {
        "scale": jnp.asarray(np.asarray(sd[prefix + ".weight"])),
        "bias": jnp.asarray(np.asarray(sd[prefix + ".bias"])),
        "mean": jnp.asarray(np.asarray(sd[prefix + ".running_mean"])),
        "var": jnp.asarray(np.asarray(sd[prefix + ".running_var"])),
    }


def convert_big_lama(state_dict) -> dict:
    """Convert a big-lama generator `state_dict` (torch, keys
    `generator.model.{i}...` or `model.{i}...`) into this module's params.

    Returns {"params": ..., "batch_stats": ...} for `FFCResNetGenerator`.
    """
    sd = {}
    for k, v in state_dict.items():
        k = k.replace("generator.", "", 1) if k.startswith("generator.") else k
        sd[k] = v

    n_down, n_blocks = 3, 18
    params: dict = {}
    stats: dict = {}

    def put(tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = leaf

    def conv_entry(dst, src):
        put(params, dst + ("kernel",), _t_conv(sd[src + ".weight"]))
        if src + ".bias" in sd:
            put(params, dst + ("bias",), jnp.asarray(np.asarray(sd[src + ".bias"])))

    def bn_entry(dst, src):
        bn = _t_bn(src, sd)
        put(params, dst + ("scale",), bn["scale"])
        put(params, dst + ("bias",), bn["bias"])
        put(stats, dst + ("mean",), bn["mean"])
        put(stats, dst + ("var",), bn["var"])

    def ffc_bn_act(dst, idx, *, has_global_in, has_global_out):
        base = f"model.{idx}"
        conv_entry(dst + ("ffc", "convl2l"), base + ".ffc.convl2l")
        if has_global_out:
            conv_entry(dst + ("ffc", "convl2g"), base + ".ffc.convl2g")
        if has_global_in:
            conv_entry(dst + ("ffc", "convg2l"), base + ".ffc.convg2l")
        if has_global_in and has_global_out:
            g = dst + ("ffc", "convg2g")
            conv_entry(g + ("conv1",), base + ".ffc.convg2g.conv1.0")
            bn_entry(g + ("conv1_bn",), base + ".ffc.convg2g.conv1.1")
            conv_entry(g + ("fu", "conv"), base + ".ffc.convg2g.fu.conv_layer")
            bn_entry(g + ("fu", "bn"), base + ".ffc.convg2g.fu.bn")
            conv_entry(g + ("conv2",), base + ".ffc.convg2g.conv2")
        bn_entry(dst + ("bn_l",), base + ".bn_l")
        if has_global_out:
            bn_entry(dst + ("bn_g",), base + ".bn_g")

    # stem is model.1 (model.0 is ReflectionPad)
    ffc_bn_act(("stem",), 1, has_global_in=False, has_global_out=False)
    for i in range(n_down):
        ffc_bn_act((f"down{i}",), 2 + i, has_global_in=False,
                   has_global_out=(i == n_down - 1))

    def res_ffc(dst, base, *, first_conv_of_first_block=False):
        conv_entry(dst + ("ffc", "convl2l"), base + ".ffc.convl2l")
        conv_entry(dst + ("ffc", "convl2g"), base + ".ffc.convl2g")
        conv_entry(dst + ("ffc", "convg2l"), base + ".ffc.convg2l")
        g = dst + ("ffc", "convg2g")
        conv_entry(g + ("conv1",), base + ".ffc.convg2g.conv1.0")
        bn_entry(g + ("conv1_bn",), base + ".ffc.convg2g.conv1.1")
        conv_entry(g + ("fu", "conv"), base + ".ffc.convg2g.fu.conv_layer")
        bn_entry(g + ("fu", "bn"), base + ".ffc.convg2g.fu.bn")
        conv_entry(g + ("conv2",), base + ".ffc.convg2g.conv2")
        bn_entry(dst + ("bn_l",), base + ".bn_l")
        bn_entry(dst + ("bn_g",), base + ".bn_g")

    for b in range(n_blocks):
        base = f"model.{5 + b}"
        res_ffc((f"block{b}", "conv1"), base + ".conv1")
        res_ffc((f"block{b}", "conv2"), base + ".conv2")

    # upsampling: model.{5+n_blocks} is ConcatTupleLayer; then triplets
    # (ConvTranspose2d, BN, ReLU) flattened in nn.Sequential indexing
    idx = 5 + n_blocks + 1
    for i in range(n_down):
        put(params, (f"up{i}", "kernel"), _t_convT(sd[f"model.{idx}.weight"]))
        put(params, (f"up{i}", "bias"),
            jnp.asarray(np.asarray(sd[f"model.{idx}.bias"])))
        bn_entry((f"up{i}_bn",), f"model.{idx + 1}")
        idx += 3
    # final: ReflectionPad (idx), Conv7x7 (idx+1), Sigmoid
    conv_entry(("head",), f"model.{idx + 1}")

    return {"params": params, "batch_stats": stats}
