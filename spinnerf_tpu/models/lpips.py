"""LPIPS perceptual distance in JAX (VGG16 variant).

The reference uses the `lpips` pip package with VGG features for the patch
perceptual loss (`DS_NeRF/run_nerf.py:970-974,1523-1561`) and a vendored copy
for LaMa evaluation (`lama/saicinpainting/evaluation/losses/lpips.py`).
Architecture (Zhang et al. 2018): scale inputs to [-1,1], ImageNet-ish shift/
scale, VGG16 conv features after relu{1_2,2_2,3_3,4_3,5_3}, channel-unit-
normalize, squared difference, learned non-negative 1x1 conv per layer,
spatial + layer sum.

Weights: this container has no pretrained VGG16 (zero egress, no torchvision).
`load_lpips()` therefore supports three sources, in order:
  1. explicit torch-format VGG16 `state_dict` path (torchvision layout) +
     LPIPS linear-head path (e.g. the LaMa-vendored
     `models/lpips_models/vgg.pth`, which carries ONLY the 5 linear heads);
  2. linear heads alone (VGG backbone falls back to seeded random init);
  3. nothing — fully seeded random init.
A fixed random VGG is a valid random-projection perceptual metric (features
are frozen; distances remain structure-sensitive), but is NOT numerically
LPIPS — callers needing paper-exact numbers must supply real weights.
"""
from __future__ import annotations

from typing import Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv plan: (out_channels, pool_before) per conv layer; feature taps
# after the relu of layers marked tap=True.
_VGG_PLAN = [
    # block 1
    (64, False, False), (64, False, True),
    # block 2
    (128, True, False), (128, False, True),
    # block 3
    (256, True, False), (256, False, False), (256, False, True),
    # block 4
    (512, True, False), (512, False, False), (512, False, True),
    # block 5
    (512, True, False), (512, False, False), (512, False, True),
]
FEATURE_CHANNELS = (64, 128, 256, 512, 512)

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class VGG16Features(nn.Module):
    """VGG16 conv trunk returning the five LPIPS feature maps.

    Convs run at HIGHEST precision: TPU convs default to bf16 multiplies,
    and LPIPS is a *metric* — fp32 keeps it comparable across backends (the
    VGG FLOPs are negligible next to a NeRF train step).
    """
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: [N, H, W, 3] already shift/scale normalized."""
        feats = []
        h = x.astype(self.compute_dtype)
        for i, (ch, pool, tap) in enumerate(_VGG_PLAN):
            if pool:
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
            h = nn.Conv(ch, (3, 3), padding=1, dtype=self.compute_dtype,
                        precision=jax.lax.Precision.HIGHEST,
                        name=f"conv_{i}")(h)
            h = nn.relu(h)
            if tap:
                feats.append(h.astype(jnp.float32))
        return feats


def _unit_normalize(f, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(f ** 2, axis=-1, keepdims=True))
    return f / (norm + eps)


def lpips_distance(vgg: VGG16Features, vgg_params, lin_weights: Sequence,
                   x, y):
    """LPIPS(x, y) per image.

    Args:
      lin_weights: list of [C_l] non-negative per-channel weights.
      x, y: [N, H, W, 3] (or [H, W, 3]) images in [0, 1].
    Returns: [N] distances (scalar if unbatched input).
    """
    squeeze = x.ndim == 3
    if squeeze:
        x, y = x[None], y[None]
    shift = jnp.asarray(_SHIFT)
    scale = jnp.asarray(_SCALE)

    def norm_input(img):
        img = img * 2.0 - 1.0                # [-1, 1]
        return (img - shift) / scale

    fx = vgg.apply(vgg_params, norm_input(x))
    fy = vgg.apply(vgg_params, norm_input(y))
    total = 0.0
    for f1, f2, w in zip(fx, fy, lin_weights):
        d = (_unit_normalize(f1) - _unit_normalize(f2)) ** 2   # [N,H,W,C]
        d = jnp.sum(d * jnp.asarray(w)[None, None, None, :], axis=-1)
        total = total + jnp.mean(d, axis=(1, 2))
    return total[0] if squeeze else total


def _torch_conv_to_flax(w):
    # torch [out, in, kh, kw] -> flax [kh, kw, in, out]
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def load_vgg_params_from_torch(path, vgg: VGG16Features):
    """Load a torchvision-format VGG16 `state_dict` (features.* keys)."""
    import torch
    sd = torch.load(path, map_location="cpu")
    if "state_dict" in sd:
        sd = sd["state_dict"]
    conv_keys = sorted(
        (k for k in sd if k.endswith(".weight") and sd[k].ndim == 4),
        key=lambda k: int(k.split(".")[1]) if k.split(".")[0] == "features"
        else 0)
    params = {"params": {}}
    for i, k in enumerate(conv_keys[:len(_VGG_PLAN)]):
        bias_k = k[:-len("weight")] + "bias"
        params["params"][f"conv_{i}"] = {
            "kernel": jnp.asarray(_torch_conv_to_flax(sd[k].numpy())),
            "bias": jnp.asarray(sd[bias_k].numpy()),
        }
    return params


def load_lin_weights_from_torch(path):
    """Load LPIPS linear heads (`lin{i}.model.1.weight` [1, C, 1, 1])."""
    import torch
    sd = torch.load(path, map_location="cpu")
    out = []
    for i in range(5):
        w = sd[f"lin{i}.model.1.weight"].numpy().reshape(-1)
        out.append(jnp.asarray(np.maximum(w, 0.0)))
    return out


def load_lpips_labeled(vgg_weights_path=None, lin_weights_path=None, **kw):
    """(lpips_fn, key): the key is "lpips" only when BOTH a real VGG16
    backbone and the real LPIPS linear heads back the metric; any random
    fallback (either piece) labels results "lpips_random_vgg" so a
    non-comparable number can never read as published LPIPS."""
    from spinnerf_tpu import weights as wreg
    vgg = vgg_weights_path or wreg.find("vgg16")
    lin = lin_weights_path or wreg.find("lpips_lin")
    key = "lpips" if (vgg and lin) else "lpips_random_vgg"
    return load_lpips(vgg, lin, **kw), key


def load_lpips(vgg_weights_path=None, lin_weights_path=None, *,
               seed: int = 0, compute_dtype=jnp.float32) -> Callable:
    """Build an `lpips(x, y) -> distance` callable (jittable).

    With no explicit paths, real weights dropped into
    `$SPINNERF_WEIGHTS_DIR` (see `spinnerf_tpu/weights.py`) are picked up
    automatically; otherwise seeded random init (NOT numerically LPIPS).
    """
    from spinnerf_tpu import weights as wreg
    if vgg_weights_path is None:
        vgg_weights_path = wreg.find("vgg16")
    if lin_weights_path is None:
        lin_weights_path = wreg.find("lpips_lin")
    vgg = VGG16Features(compute_dtype=compute_dtype)
    if vgg_weights_path is not None:
        vgg_params = load_vgg_params_from_torch(vgg_weights_path, vgg)
    else:
        vgg_params = vgg.init(jax.random.PRNGKey(seed),
                              jnp.zeros((1, 32, 32, 3)))
    if lin_weights_path is not None:
        lin = load_lin_weights_from_torch(lin_weights_path)
    else:
        lin = [jnp.full((c,), 1.0 / c) for c in FEATURE_CHANNELS]

    def pure(consts, x, y):
        vp, lw = consts
        return lpips_distance(vgg, vp, lw, x, y)

    def fn(x, y):
        return lpips_distance(vgg, vgg_params, lin, x, y)

    # `.pure`/`.consts`: the weight arrays can ride through an enclosing jit
    # as arguments instead of ~60 MB of embedded VGG constants (the
    # `make_train_step` consts convention)
    fn.pure = pure
    fn.consts = (vgg_params, tuple(lin))
    return fn
