"""InceptionV3 FID feature extractor (pool3, 2048-d), TPU-native.

Parity: `lama/saicinpainting/evaluation/losses/fid/inception.py` — the
pytorch-fid InceptionV3 variant the reference uses for FID and for
`ssim_fid100_f1` checkpoint selection (`evaluation/evaluator.py:112`). The
reference wraps torchvision's `inception_v3` with three TensorFlow-parity
patches (inception.py:171-323):

  * InceptionA/C and Mixed_7b (E_1): the pool branch uses average pooling
    with `count_include_pad=False` (padded zeros excluded from the mean);
  * Mixed_7c (E_2): the pool branch uses MAX pooling (a quirk of the
    original TF FID network, kept for bit-parity with published FID);
  * input is bilinearly resized to 299x299 (`align_corners=False`, which is
    `jax.image.resize`'s half-pixel convention) and scaled to [-1, 1]
    (inception.py:151-158).

TPU-first design: inference-only, NHWC, and every Conv+BN(eps=1e-3)+ReLU
`BasicConv2d` is folded into a single conv+bias at weight-conversion time
(`load_inception_params_from_torch`) — one fused MXU op per layer instead of
conv -> 4-param batchnorm -> relu. The params pytree mirrors torchvision's
module names (`Mixed_5b.branch1x1`, ...) so conversion is mechanical and
auditable.

No pretrained weights ship in this container; `random_inception_params`
gives an architecture-faithful random network (clearly NOT comparable to
published FID — see eval/inpainting.py for how this is surfaced).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_DN = ("NHWC", "HWIO", "NHWC")
_BN_EPS = 1e-3

# ---------------------------------------------------------------------------
# architecture spec: torchvision inception_v3 up to final average pooling
# ---------------------------------------------------------------------------

# conv spec: (branch name, c_in, c_out, (kh, kw), stride, ((ph, ph), (pw, pw)))
_V = ((0, 0), (0, 0))


def _a(cin, pool):
    return [("branch1x1", cin, 64, (1, 1), 1, _V),
            ("branch5x5_1", cin, 48, (1, 1), 1, _V),
            ("branch5x5_2", 48, 64, (5, 5), 1, ((2, 2), (2, 2))),
            ("branch3x3dbl_1", cin, 64, (1, 1), 1, _V),
            ("branch3x3dbl_2", 64, 96, (3, 3), 1, ((1, 1), (1, 1))),
            ("branch3x3dbl_3", 96, 96, (3, 3), 1, ((1, 1), (1, 1))),
            ("branch_pool", cin, pool, (1, 1), 1, _V)]


def _b(cin):
    return [("branch3x3", cin, 384, (3, 3), 2, _V),
            ("branch3x3dbl_1", cin, 64, (1, 1), 1, _V),
            ("branch3x3dbl_2", 64, 96, (3, 3), 1, ((1, 1), (1, 1))),
            ("branch3x3dbl_3", 96, 96, (3, 3), 2, _V)]


def _c(cin, c7):
    return [("branch1x1", cin, 192, (1, 1), 1, _V),
            ("branch7x7_1", cin, c7, (1, 1), 1, _V),
            ("branch7x7_2", c7, c7, (1, 7), 1, ((0, 0), (3, 3))),
            ("branch7x7_3", c7, 192, (7, 1), 1, ((3, 3), (0, 0))),
            ("branch7x7dbl_1", cin, c7, (1, 1), 1, _V),
            ("branch7x7dbl_2", c7, c7, (7, 1), 1, ((3, 3), (0, 0))),
            ("branch7x7dbl_3", c7, c7, (1, 7), 1, ((0, 0), (3, 3))),
            ("branch7x7dbl_4", c7, c7, (7, 1), 1, ((3, 3), (0, 0))),
            ("branch7x7dbl_5", c7, 192, (1, 7), 1, ((0, 0), (3, 3))),
            ("branch_pool", cin, 192, (1, 1), 1, _V)]


def _d(cin):
    return [("branch3x3_1", cin, 192, (1, 1), 1, _V),
            ("branch3x3_2", 192, 320, (3, 3), 2, _V),
            ("branch7x7x3_1", cin, 192, (1, 1), 1, _V),
            ("branch7x7x3_2", 192, 192, (1, 7), 1, ((0, 0), (3, 3))),
            ("branch7x7x3_3", 192, 192, (7, 1), 1, ((3, 3), (0, 0))),
            ("branch7x7x3_4", 192, 192, (3, 3), 2, _V)]


def _e(cin):
    return [("branch1x1", cin, 320, (1, 1), 1, _V),
            ("branch3x3_1", cin, 384, (1, 1), 1, _V),
            ("branch3x3_2a", 384, 384, (1, 3), 1, ((0, 0), (1, 1))),
            ("branch3x3_2b", 384, 384, (3, 1), 1, ((1, 1), (0, 0))),
            ("branch3x3dbl_1", cin, 448, (1, 1), 1, _V),
            ("branch3x3dbl_2", 448, 384, (3, 3), 1, ((1, 1), (1, 1))),
            ("branch3x3dbl_3a", 384, 384, (1, 3), 1, ((0, 0), (1, 1))),
            ("branch3x3dbl_3b", 384, 384, (3, 1), 1, ((1, 1), (0, 0))),
            ("branch_pool", cin, 192, (1, 1), 1, _V)]


# (kind, torchvision module name, conv specs)
BLOCKS = [
    ("conv", "Conv2d_1a_3x3", [(None, 3, 32, (3, 3), 2, _V)]),
    ("conv", "Conv2d_2a_3x3", [(None, 32, 32, (3, 3), 1, _V)]),
    ("conv", "Conv2d_2b_3x3", [(None, 32, 64, (3, 3), 1, ((1, 1), (1, 1)))]),
    ("maxpool", None, []),
    ("conv", "Conv2d_3b_1x1", [(None, 64, 80, (1, 1), 1, _V)]),
    ("conv", "Conv2d_4a_3x3", [(None, 80, 192, (3, 3), 1, _V)]),
    ("maxpool", None, []),
    ("A", "Mixed_5b", _a(192, 32)),
    ("A", "Mixed_5c", _a(256, 64)),
    ("A", "Mixed_5d", _a(288, 64)),
    ("B", "Mixed_6a", _b(288)),
    ("C", "Mixed_6b", _c(768, 128)),
    ("C", "Mixed_6c", _c(768, 160)),
    ("C", "Mixed_6d", _c(768, 160)),
    ("C", "Mixed_6e", _c(768, 192)),
    ("D", "Mixed_7a", _d(768)),
    ("E1", "Mixed_7b", _e(1280)),
    ("E2", "Mixed_7c", _e(2048)),
]

FEATURE_DIM = 2048


# ---------------------------------------------------------------------------
# forward (inference-only; params = folded conv {kernel HWIO, bias})
# ---------------------------------------------------------------------------

def _conv(x, p, stride, pad):
    y = lax.conv_general_dilated(x, p["kernel"], (stride, stride),
                                 list(pad), dimension_numbers=_DN)
    return jax.nn.relu(y + p["bias"])


def _maxpool(x, stride, pad=_V):
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, 3, 3, 1),
                             (1, stride, stride, 1),
                             [(0, 0), *pad, (0, 0)])


def _avgpool_nopad(x):
    """3x3 s1 p1 average pool, padded zeros EXCLUDED from the denominator
    (torch `count_include_pad=False`; the TF-parity patch at
    inception.py:221-225)."""
    window = ((1, 3, 3, 1), (1, 1, 1, 1), [(0, 0), (1, 1), (1, 1), (0, 0)])
    s = lax.reduce_window(x, 0.0, lax.add, *window)
    cnt = lax.reduce_window(jnp.ones_like(x[..., :1]), 0.0, lax.add, *window)
    return s / cnt


def _run_branch(x, p, specs, names):
    for name in names:
        spec = next(s for s in specs if s[0] == name)
        x = _conv(x, p[name], spec[4], spec[5])
    return x


def _block_a(x, p, specs):
    return jnp.concatenate([
        _run_branch(x, p, specs, ["branch1x1"]),
        _run_branch(x, p, specs, ["branch5x5_1", "branch5x5_2"]),
        _run_branch(x, p, specs,
                    ["branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3"]),
        _run_branch(_avgpool_nopad(x), p, specs, ["branch_pool"]),
    ], axis=-1)


def _block_b(x, p, specs):
    return jnp.concatenate([
        _run_branch(x, p, specs, ["branch3x3"]),
        _run_branch(x, p, specs,
                    ["branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3"]),
        _maxpool(x, 2),
    ], axis=-1)


def _block_c(x, p, specs):
    return jnp.concatenate([
        _run_branch(x, p, specs, ["branch1x1"]),
        _run_branch(x, p, specs,
                    ["branch7x7_1", "branch7x7_2", "branch7x7_3"]),
        _run_branch(x, p, specs, ["branch7x7dbl_1", "branch7x7dbl_2",
                                  "branch7x7dbl_3", "branch7x7dbl_4",
                                  "branch7x7dbl_5"]),
        _run_branch(_avgpool_nopad(x), p, specs, ["branch_pool"]),
    ], axis=-1)


def _block_d(x, p, specs):
    return jnp.concatenate([
        _run_branch(x, p, specs, ["branch3x3_1", "branch3x3_2"]),
        _run_branch(x, p, specs, ["branch7x7x3_1", "branch7x7x3_2",
                                  "branch7x7x3_3", "branch7x7x3_4"]),
        _maxpool(x, 2),
    ], axis=-1)


def _block_e(x, p, specs, pool_kind):
    b3 = _run_branch(x, p, specs, ["branch3x3_1"])
    b3 = jnp.concatenate([_run_branch(b3, p, specs, ["branch3x3_2a"]),
                          _run_branch(b3, p, specs, ["branch3x3_2b"])],
                         axis=-1)
    bd = _run_branch(x, p, specs, ["branch3x3dbl_1", "branch3x3dbl_2"])
    bd = jnp.concatenate([_run_branch(bd, p, specs, ["branch3x3dbl_3a"]),
                          _run_branch(bd, p, specs, ["branch3x3dbl_3b"])],
                         axis=-1)
    # E_2 (Mixed_7c) uses MAX pooling here — the TF FID network's quirk,
    # preserved by the reference (inception.py:299-303)
    pooled = (_maxpool(x, 1, ((1, 1), (1, 1))) if pool_kind == "max"
              else _avgpool_nopad(x))
    return jnp.concatenate([
        _run_branch(x, p, specs, ["branch1x1"]), b3, bd,
        _run_branch(pooled, p, specs, ["branch_pool"]),
    ], axis=-1)


def inception_pool3(params, images, *, resize_input=True,
                    normalize_input=True):
    """images: [N, H, W, 3] float32 in [0, 1] -> pool3 features [N, 2048].

    Mirrors `InceptionV3.forward` (inception.py:134-169) with
    output_blocks=[3]: resize to 299 (bilinear, half-pixel), scale to
    [-1, 1], run all blocks, global average pool.
    """
    x = images.astype(jnp.float32)
    if resize_input:
        # antialias=False: torch F.interpolate(bilinear, align_corners=False)
        # applies no antialias prefilter when downscaling; JAX's default
        # (True) would produce different pool3 features for inputs > 299px
        # and break FID comparability (inception.py:151-155)
        x = jax.image.resize(x, (x.shape[0], 299, 299, 3), "bilinear",
                             antialias=False)
    if normalize_input:
        x = 2.0 * x - 1.0
    for kind, name, specs in BLOCKS:
        if kind == "maxpool":
            x = _maxpool(x, 2)
        elif kind == "conv":
            x = _conv(x, params[name], specs[0][4], specs[0][5])
        elif kind == "A":
            x = _block_a(x, params[name], specs)
        elif kind == "B":
            x = _block_b(x, params[name], specs)
        elif kind == "C":
            x = _block_c(x, params[name], specs)
        elif kind == "D":
            x = _block_d(x, params[name], specs)
        elif kind == "E1":
            x = _block_e(x, params[name], specs, "avg")
        else:
            x = _block_e(x, params[name], specs, "max")
    return jnp.mean(x, axis=(1, 2))


# ---------------------------------------------------------------------------
# weights
# ---------------------------------------------------------------------------

def _fold_bn(w_oihw, gamma, beta, mean, var):
    """Fold inference BatchNorm(eps=1e-3) into the preceding conv."""
    scale = gamma / np.sqrt(var + _BN_EPS)
    kernel = np.transpose(w_oihw, (2, 3, 1, 0)) * scale
    return {"kernel": jnp.asarray(kernel, jnp.float32),
            "bias": jnp.asarray(beta - mean * scale, jnp.float32)}


def load_inception_params_from_torch(path):
    """Convert a torchvision-format `inception_v3` state_dict (the
    pytorch-fid `pt_inception-2015-12-05-*.pth` file uses this naming) into
    the folded params pytree. Keys: `<module>.conv.weight`,
    `<module>.bn.{weight,bias,running_mean,running_var}`."""
    import torch
    sd = torch.load(path, map_location="cpu")
    if "state_dict" in sd:
        sd = sd["state_dict"]

    def fold(prefix):
        g = lambda k: sd[f"{prefix}.{k}"].numpy().astype(np.float64)
        return _fold_bn(g("conv.weight"), g("bn.weight"), g("bn.bias"),
                        g("bn.running_mean"), g("bn.running_var"))

    params = {}
    for kind, name, specs in BLOCKS:
        if kind == "maxpool":
            continue
        if kind == "conv":
            params[name] = fold(name)
        else:
            params[name] = {s[0]: fold(f"{name}.{s[0]}") for s in specs}
    return params


def random_inception_params(seed: int = 0):
    """Architecture-faithful random folded weights (for tests and the
    documented no-weights fallback — NOT comparable to published FID)."""
    rng = np.random.RandomState(seed)
    def mk(cin, cout, kh, kw):
        fan_in = cin * kh * kw
        k = rng.randn(kh, kw, cin, cout).astype(np.float32) / np.sqrt(fan_in)
        return {"kernel": jnp.asarray(k),
                "bias": jnp.asarray(np.zeros(cout, np.float32))}
    params = {}
    for kind, name, specs in BLOCKS:
        if kind == "maxpool":
            continue
        if kind == "conv":
            _, cin, cout, (kh, kw), _, _ = specs[0]
            params[name] = mk(cin, cout, kh, kw)
        else:
            params[name] = {s[0]: mk(s[1], s[2], *s[3]) for s in specs}
    return params
