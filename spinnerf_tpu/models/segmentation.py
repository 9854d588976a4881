"""ADE20k segmentation models: dilated ResNet encoder + PPM decoder, and the
`resnet_pl` segmentation-perceptual loss built on them.

Parity: `lama/models/ade20k/` — the MIT scene-parsing ResNet with a 3-conv
stem (`resnet.py:95-160`), the dilate-8 encoder conversion (layer3/4 strides
become dilations 2/4, `base.py` ResnetDilated `_nostride_dilate`), the
`PPMDeepsup` pyramid-pooling decoder (`base.py:290-340`), and the ResNetPL
loss (`saicinpainting/training/losses/perceptual.py:88-113`): ImageNet-
normalize both images, run the frozen encoder, sum MSEs over the stage
feature maps.

The reference's SynchronizedBatchNorm (master/slave pipes,
`segm_lib/nn/modules/batchnorm.py:38`) has no TPU equivalent *because none
is needed*: under GSPMD a `jnp.mean` over a sharded batch axis IS the global
batch statistic — sync-BN falls out of the partitioner (tested in
`tests/test_segmentation.py::test_batchnorm_syncs_across_mesh`).

Weights: no pretrained ADE20k checkpoint ships in this container;
`convert_mit_encoder` loads the MIT torch `state_dict` layout when supplied.
Random-init still gives a frozen random-projection perceptual loss (the same
fallback as `models.lpips`).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)
NUM_ADE20K_CLASSES = 150


def _conv(features, kernel, *, stride=1, dilation=1, name=None):
    pad = (kernel - 1) // 2 * dilation
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   kernel_dilation=(dilation, dilation), padding=pad,
                   use_bias=False, name=name)


class BasicBlock(nn.Module):
    """ResNet-18/34 block (`resnet.py:24-55`)."""
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       name=name)
        h = nn.relu(bn("bn1")(_conv(self.planes, 3, stride=self.stride,
                                    dilation=self.dilation, name="conv1")(x)))
        h = bn("bn2")(_conv(self.planes, 3, dilation=self.dilation,
                            name="conv2")(h))
        if self.downsample:
            x = bn("bn_down")(nn.Conv(self.planes, (1, 1),
                                      strides=(self.stride, self.stride),
                                      use_bias=False, name="conv_down")(x))
        return nn.relu(x + h)


class Bottleneck(nn.Module):
    """ResNet-50/101 block, expansion 4 (`resnet.py:56-92`)."""
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       name=name)
        out = self.planes * 4
        h = nn.relu(bn("bn1")(nn.Conv(self.planes, (1, 1), use_bias=False,
                                      name="conv1")(x)))
        h = nn.relu(bn("bn2")(_conv(self.planes, 3, stride=self.stride,
                                    dilation=self.dilation, name="conv2")(h)))
        h = bn("bn3")(nn.Conv(out, (1, 1), use_bias=False, name="conv3")(h))
        if self.downsample:
            x = bn("bn_down")(nn.Conv(out, (1, 1),
                                      strides=(self.stride, self.stride),
                                      use_bias=False, name="conv_down")(x))
        return nn.relu(x + h)


_DEPTH_PLAN = {18: (BasicBlock, (2, 2, 2, 2), 1),
               34: (BasicBlock, (3, 4, 6, 3), 1),
               50: (Bottleneck, (3, 4, 6, 3), 4)}


class ResNetDilated(nn.Module):
    """MIT scene-parsing ResNet encoder, dilate-8.

    3-conv stem (64, 64, 128) + maxpool (`resnet.py:100-109`); four stages;
    with `dilate_scale=8` stage 3 keeps stride 1 with dilation 2 and stage 4
    dilation 4 (ResnetDilated conversion; each stage's first — formerly
    stride-2 — 3x3 conv gets dilate//2 per `_nostride_dilate`) so output
    stride is 8.
    Returns the four stage feature maps (`return_feature_maps=True` path).
    """
    depth: int = 50
    dilate_scale: int = 8

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_cls, layers, _ = _DEPTH_PLAN[self.depth]
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       name=name)
        h = nn.relu(bn("bn1")(_conv(64, 3, stride=2, name="conv1")(x)))
        h = nn.relu(bn("bn2")(_conv(64, 3, name="conv2")(h)))
        h = nn.relu(bn("bn3")(_conv(128, 3, name="conv3")(h)))
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        if self.dilate_scale == 8:
            strides, dilations = (1, 2, 1, 1), (1, 1, 2, 4)
        elif self.dilate_scale == 16:
            strides, dilations = (1, 2, 2, 1), (1, 1, 1, 2)
        else:
            strides, dilations = (1, 2, 2, 2), (1, 1, 1, 1)

        feats = []
        planes = (64, 128, 256, 512)
        in_ch = 128
        for s, (n_blocks, p) in enumerate(zip(layers, planes)):
            expansion = 4 if block_cls is Bottleneck else 1
            for b in range(n_blocks):
                stride = strides[s] if b == 0 else 1
                down = b == 0 and (stride != 1 or in_ch != p * expansion)
                # MIT's _nostride_dilate (`models/ade20k/base.py:423-436`):
                # the formerly-stride-2 3x3 conv (block 0 of a dilated
                # stage) gets dilation dilate//2; the rest get dilate
                dil = (dilations[s] // 2 if b == 0 and dilations[s] > 1
                       else dilations[s])
                h = block_cls(p, stride=stride, dilation=dil,
                              downsample=down,
                              name=f"layer{s + 1}_{b}")(h, train)
                in_ch = p * expansion
            feats.append(h)
        return feats


def adaptive_avg_pool(x, out_size: int):
    """Exact torch AdaptiveAvgPool2d with static shapes: cell (i, j) averages
    x[floor(iH/s):ceil((i+1)H/s)] — s is tiny (<=6) so the Python unroll is
    free under jit."""
    n, h, w, c = x.shape
    s = out_size
    rows = []
    for i in range(s):
        y0, y1 = (i * h) // s, -((-(i + 1) * h) // s)
        cols = []
        for j in range(s):
            x0, x1 = (j * w) // s, -((-(j + 1) * w) // s)
            cols.append(jnp.mean(x[:, y0:y1, x0:x1, :], axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)           # [N, s, s, C]


class PPMDecoder(nn.Module):
    """Pyramid-pooling segmentation head (`PPMDeepsup`, `base.py:290-340`):
    pool conv5 at scales (1,2,3,6), 1x1 conv to 512 + BN + ReLU, bilinear
    upsample back, concat with conv5, fused 3x3 conv -> class logits."""
    num_class: int = NUM_ADE20K_CLASSES
    pool_scales: Sequence[int] = (1, 2, 3, 6)

    @nn.compact
    def __call__(self, conv_out, train: bool = False, seg_size=None):
        conv5 = conv_out[-1]
        n, h, w, c = conv5.shape
        outs = [conv5]
        for k, scale in enumerate(self.pool_scales):
            p = adaptive_avg_pool(conv5, scale)
            p = nn.Conv(512, (1, 1), use_bias=False, name=f"ppm{k}_conv")(p)
            p = nn.relu(nn.BatchNorm(use_running_average=not train,
                                     name=f"ppm{k}_bn")(p))
            outs.append(jax.image.resize(p, (n, h, w, 512), "bilinear"))
        y = jnp.concatenate(outs, axis=-1)
        y = _conv(512, 3, name="fuse_conv")(y)
        y = nn.relu(nn.BatchNorm(use_running_average=not train,
                                 name="fuse_bn")(y))
        logits = nn.Conv(self.num_class, (1, 1), name="out")(y)
        if seg_size is not None:
            logits = jax.image.resize(
                logits, (n, seg_size[0], seg_size[1], self.num_class),
                "bilinear")
        return logits


class SegmentationModel(nn.Module):
    """Encoder + decoder = the reference's SegmentationModule
    (`base.py:200-211`). Returns per-pixel class logits at `seg_size`
    (defaults to the input resolution)."""
    depth: int = 50

    @nn.compact
    def __call__(self, x, train: bool = False, seg_size=None):
        feats = ResNetDilated(depth=self.depth, name="encoder")(x, train)
        return PPMDecoder(name="decoder")(
            feats, train, seg_size=seg_size or x.shape[1:3])


def imagenet_normalize(img):
    return (img - IMAGENET_MEAN) / IMAGENET_STD


def convert_mit_decoder(path):
    """Convert an MIT ade20k `ppm_deepsup` decoder `state_dict`
    (`ppm.{i}.{1,2}.*`, `conv_last.{0,1,4}.*`; `base.py:290-318`) into
    `PPMDecoder` flax variables. The deepsup auxiliary head
    (`cbr_deepsup`/`conv_last_deepsup`) is train-time only and ignored."""
    import torch
    sd = torch.load(path, map_location="cpu")
    sd = sd.get("state_dict", sd)
    sd = {k: np.asarray(v) for k, v in sd.items()}

    params, stats = {}, {}

    def put_conv(dst, src, bias=False):
        params[dst] = {"kernel": np.transpose(sd[src + ".weight"],
                                              (2, 3, 1, 0))}
        if bias:
            params[dst]["bias"] = sd[src + ".bias"]

    def put_bn(dst, src):
        params[dst] = {"scale": sd[src + ".weight"],
                       "bias": sd[src + ".bias"]}
        stats[dst] = {"mean": sd[src + ".running_mean"],
                      "var": sd[src + ".running_var"]}

    for k in range(4):                     # pool scales (1, 2, 3, 6)
        put_conv(f"ppm{k}_conv", f"ppm.{k}.1")
        put_bn(f"ppm{k}_bn", f"ppm.{k}.2")
    put_conv("fuse_conv", "conv_last.0")
    put_bn("fuse_bn", "conv_last.1")
    put_conv("out", "conv_last.4", bias=True)
    return {"params": params, "batch_stats": stats}


def load_segmentation_model(encoder_path=None, decoder_path=None, *,
                            depth: int = 50, seed: int = 0):
    """Assemble a `SegmentationModel` with whatever real MIT weights are
    available (explicit paths win; else `$SPINNERF_WEIGHTS_DIR` pickup; else
    seeded random init). Returns (model, variables, is_real) where is_real
    is True only when BOTH encoder and decoder weights were loaded."""
    import jax

    from spinnerf_tpu import weights as wreg
    if encoder_path is None and depth == 50:
        encoder_path = wreg.find("ade20k_resnet50")
    if decoder_path is None:
        decoder_path = wreg.find("ade20k_ppm_decoder")

    model = SegmentationModel(depth=depth)
    variables = jax.jit(model.init)(jax.random.PRNGKey(seed),
                                    jnp.zeros((1, 64, 64, 3)))
    params = dict(variables["params"])
    stats = dict(variables.get("batch_stats", {}))
    if encoder_path:
        enc = convert_mit_encoder(encoder_path, depth=depth)
        params["encoder"] = enc["params"]
        if "batch_stats" in enc:
            stats["encoder"] = enc["batch_stats"]
    if decoder_path:
        dec = convert_mit_decoder(decoder_path)
        params["decoder"] = dec["params"]
        stats["decoder"] = dec["batch_stats"]
    return (model, {"params": params, "batch_stats": stats},
            bool(encoder_path and decoder_path))


def make_resnet_pl(*, depth: int = 50, weights_path=None, seed: int = 0,
                   input_shape=(1, 64, 64, 3)):
    """Build the resnet_pl segmentation-perceptual loss
    (`perceptual.py:88-113`): loss(pred, target) = sum of stage-feature MSEs
    through the frozen dilated encoder, after ImageNet normalization.

    Returns (loss_fn, params). Jit-safe; params are frozen (caller never
    differentiates through them).
    """
    enc = ResNetDilated(depth=depth)
    if weights_path is None and depth == 50:
        from spinnerf_tpu import weights as wreg
        weights_path = wreg.find("ade20k_resnet50")
    if weights_path:
        params = convert_mit_encoder(weights_path, depth=depth)
    else:
        params = jax.jit(enc.init)(jax.random.PRNGKey(seed),
                                   jnp.zeros(input_shape))

    def loss_fn(pred, target):
        fp = enc.apply(params, imagenet_normalize(pred))
        ft = enc.apply(params, imagenet_normalize(
            jax.lax.stop_gradient(target)))
        total = 0.0
        for a, b in zip(fp, ft):   # ft already carries no gradient
            total = total + jnp.mean((a - b) ** 2)
        return total

    return loss_fn, params


def convert_mit_encoder(path, *, depth: int = 50):
    """Convert an MIT ade20k encoder `state_dict` (torch layout: conv1/bn1,
    conv2/bn2, conv3/bn3 stem + layerX.Y.{conv,bn}{1..3}[,downsample.{0,1}])
    into this module's flax variables."""
    import torch
    sd = torch.load(path, map_location="cpu")
    sd = sd.get("state_dict", sd)
    sd = {k: np.asarray(v) for k, v in sd.items()}

    params, stats = {}, {}

    def put_conv(dst, src):
        params[dst] = {"kernel": np.transpose(sd[src + ".weight"],
                                              (2, 3, 1, 0))}

    def put_bn(dst, src):
        params[dst] = {"scale": sd[src + ".weight"],
                       "bias": sd[src + ".bias"]}
        stats[dst] = {"mean": sd[src + ".running_mean"],
                      "var": sd[src + ".running_var"]}

    for i in (1, 2, 3):
        put_conv(f"conv{i}", f"conv{i}")
        put_bn(f"bn{i}", f"bn{i}")
    block_cls, layers, _ = _DEPTH_PLAN[depth]
    n_convs = 3 if block_cls is Bottleneck else 2
    for s, n_blocks in enumerate(layers):
        for b in range(n_blocks):
            base = f"layer{s + 1}.{b}"
            dst = f"layer{s + 1}_{b}"
            for ci in range(1, n_convs + 1):
                put_conv(f"{dst}/conv{ci}", f"{base}.conv{ci}")
                put_bn(f"{dst}/bn{ci}", f"{base}.bn{ci}")
            if f"{base}.downsample.0.weight" in sd:
                put_conv(f"{dst}/conv_down", f"{base}.downsample.0")
                put_bn(f"{dst}/bn_down", f"{base}.downsample.1")

    def nest(flat):
        tree = {}
        for key, leaf in flat.items():
            node = tree
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = leaf
        return tree

    return {"params": nest(params), "batch_stats": nest(stats)}


def segmentation_class_stats(seg_pred, seg_target, *, num_class: int):
    """Per-class pixel fractions + prediction agreement
    (parity: `SegmentationClassStats`, `evaluation/losses/base_loss.py`)."""
    out = {}
    agree = (seg_pred == seg_target)
    for c in range(num_class):
        m = seg_target == c
        frac = float(np.mean(m))
        if frac == 0:
            continue
        out[c] = {"target_frac": frac,
                  "agreement": float(np.mean(agree[m]))}
    return out


def segmentation_aware_scores(pred, target, seg_labels, *, num_class: int,
                              score_fn=None):
    """Score pred-vs-target restricted to each class's region of the target
    segmentation (parity: SegmentationAware{SSIM,LPIPS,FID} — the reference
    groups metric values by panoptic class; here any masked score_fn).

    Args:
      seg_labels: [H, W] int class map of the target.
      score_fn(pred, target, mask) -> float; defaults to masked L1.
    Returns {class_id: score} over classes present.
    """
    if score_fn is None:
        def score_fn(p, t, m):
            denom = max(float(m.sum()) * p.shape[-1], 1.0)
            return float(np.sum(np.abs(p - t) * m[..., None]) / denom)
    out = {}
    for c in range(num_class):
        m = (seg_labels == c).astype(np.float32)
        if m.sum() == 0:
            continue
        out[c] = score_fn(pred, target, m)
    return out
