"""Image-quality metrics: PSNR, SSIM (MATLAB-convention), mask IoU/accuracy.

Parity targets:
- PSNR/SSIM/LPIPS eval CLI: `DS_NeRF/eval_metrics_script.py:20-62` and the
  MATLAB-equivalent masked SSIM in `DS_NeRF/eval_utils.py:38-118`.
- Segmentation pixel accuracy + IoU: `MVSeg/DS_NeRF/run_nerf.py:950-962`.

All metrics are pure jnp and jittable; masked variants take a binary mask to
restrict scoring to the inpainted region (the paper's masked-PSNR protocol).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def psnr(pred, target, mask=None, max_val: float = 1.0):
    """PSNR in dB; `mask` [H, W] restricts to masked pixels."""
    err = (pred - target) ** 2
    if mask is not None:
        m = mask[..., None] if err.ndim == mask.ndim + 1 else mask
        mse = jnp.sum(err * m) / jnp.maximum(jnp.sum(m * jnp.ones_like(err)), 1)
    else:
        mse = jnp.mean(err)
    return 10.0 * jnp.log10(max_val ** 2 / mse)


def _gaussian_kernel(size: int = 11, sigma: float = 1.5):
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    return jnp.outer(g, g)


def ssim(pred, target, *, max_val: float = 1.0, kernel_size: int = 11,
         sigma: float = 1.5, k1: float = 0.01, k2: float = 0.03,
         mask=None):
    """MATLAB-convention SSIM with an 11x11 gaussian window (sigma 1.5),
    'valid' padding, averaged over channels.

    Args:
      pred/target: [H, W, C] or [H, W] float images in [0, max_val].
      mask: optional [H, W] binary mask; the SSIM map is averaged only over
        valid windows whose center pixel is masked.
    """
    if pred.ndim == 2:
        pred = pred[..., None]
        target = target[..., None]
    kern = _gaussian_kernel(kernel_size, sigma)[..., None, None]  # [k,k,1,1]

    def filt(img):
        # depthwise 'valid' correlation per channel; HIGHEST precision is
        # required — TPU convs default to bf16, whose rounding turns the
        # E[x^2]-mu^2 variance terms into garbage (SSIM > 1)
        img = img.transpose(2, 0, 1)[..., None]                   # [C,H,W,1]
        out = jax.lax.conv_general_dilated(
            img, kern, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST)
        return out[..., 0].transpose(1, 2, 0)                     # [H',W',C]

    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    mu_p, mu_t = filt(pred), filt(target)
    mu_pp, mu_tt, mu_pt = mu_p * mu_p, mu_t * mu_t, mu_p * mu_t
    sig_p = filt(pred * pred) - mu_pp
    sig_t = filt(target * target) - mu_tt
    sig_pt = filt(pred * target) - mu_pt

    ssim_map = ((2 * mu_pt + c1) * (2 * sig_pt + c2) /
                ((mu_pp + mu_tt + c1) * (sig_p + sig_t + c2)))
    if mask is None:
        return jnp.mean(ssim_map)
    # crop the mask to EXACTLY the VALID-conv output extent (a symmetric
    # (k-1)//2 crop is one short for even kernel sizes)
    pad = (kernel_size - 1) // 2
    oh, ow = ssim_map.shape[0], ssim_map.shape[1]
    center = mask[pad:pad + oh, pad:pad + ow]
    center = center[..., None]
    return (jnp.sum(ssim_map * center) /
            jnp.maximum(jnp.sum(center * jnp.ones_like(ssim_map)), 1))


def mask_metrics(pred_mask, gt_mask):
    """Pixel accuracy and IoU of binary masks (MVSeg eval).

    Args: boolean/0-1 arrays of equal shape.
    Returns: dict(accuracy, iou).
    """
    p = pred_mask > 0.5
    g = gt_mask > 0.5
    inter = jnp.sum(p & g)
    union = jnp.sum(p | g)
    acc = jnp.mean((p == g).astype(jnp.float32))
    iou = inter / jnp.maximum(union, 1)
    return {"accuracy": acc, "iou": iou}


def to8b(x) -> np.ndarray:
    """Float [0,1] image -> uint8, NaN-safe (`run_nerf_helpers.py:18`)."""
    x = np.nan_to_num(np.asarray(x), nan=0.0)
    return (255 * np.clip(x, 0, 1)).astype(np.uint8)
