"""On-the-fly training-mask synthesis for the 2D inpainter.

Parity: `lama/saicinpainting/training/data/masks.py:22-332` — irregular
brush-stroke masks, rectangle masks, outpainting half-plane masks, the
"dumb area" center box, and the weighted `MixedMaskGenerator`. (The
segmentation- and superresolution-based generators need external models and
are out of scope for the TPU container.)

Pure numpy; each generator maps (height, width, rng) -> float mask [H, W]
with 1 = hole.
"""
from __future__ import annotations

import numpy as np


def irregular_mask(h, w, rng, *, max_angle=4.0, max_len=60, max_width=20,
                   min_times=0, max_times=10):
    """Random brush strokes (`make_random_irregular_mask:22-64` semantics)."""
    import cv2
    mask = np.zeros((h, w), np.float32)
    times = rng.randint(min_times, max_times + 1)
    for _ in range(times):
        x = rng.randint(w)
        y = rng.randint(h)
        for _ in range(1 + rng.randint(5)):
            angle = 0.01 + rng.uniform(0, max_angle)
            if rng.rand() < 0.5:
                angle = 2 * np.pi - angle
            length = 10 + rng.randint(max_len)
            width = 5 + rng.randint(max_width)
            x2 = np.clip(x + int(length * np.sin(angle)), 0, w - 1)
            y2 = np.clip(y + int(length * np.cos(angle)), 0, h - 1)
            cv2.line(mask, (x, y), (x2, y2), 1.0, width)
            x, y = x2, y2
    return mask


def rectangle_mask(h, w, rng, *, margin=10, bbox_min_size=30,
                   bbox_max_size=100, min_times=0, max_times=3):
    """Random axis-aligned boxes (`make_random_rectangle_mask:83-109`)."""
    mask = np.zeros((h, w), np.float32)
    bbox_max = min(bbox_max_size, h - margin * 2 - 1, w - margin * 2 - 1)
    bbox_min = min(bbox_min_size, bbox_max)
    times = rng.randint(min_times, max_times + 1)
    for _ in range(times):
        bh = rng.randint(bbox_min, bbox_max + 1)
        bw = rng.randint(bbox_min, bbox_max + 1)
        y = rng.randint(margin, max(h - margin - bh, margin) + 1)
        x = rng.randint(margin, max(w - margin - bw, margin) + 1)
        mask[y:y + bh, x:x + bw] = 1.0
    return mask


def outpainting_mask(h, w, rng, *, min_padding_percent=0.04,
                     max_padding_percent=0.25):
    """Mask one or more borders (`OutpaintingMaskGenerator:200-263`)."""
    mask = np.zeros((h, w), np.float32)
    sides = rng.choice(["left", "right", "top", "bottom"],
                       size=rng.randint(1, 5), replace=False)
    for side in sides:
        frac = rng.uniform(min_padding_percent, max_padding_percent)
        if side == "left":
            mask[:, : int(w * frac)] = 1.0
        elif side == "right":
            mask[:, w - int(w * frac):] = 1.0
        elif side == "top":
            mask[: int(h * frac)] = 1.0
        else:
            mask[h - int(h * frac):] = 1.0
    return mask


def dumb_area_mask(h, w, rng, *, min_ratio=0.1, max_ratio=0.5):
    """One centered box of random area ratio (`DumbAreaMaskGenerator`)."""
    mask = np.zeros((h, w), np.float32)
    ratio = rng.uniform(min_ratio, max_ratio)
    bh = int(h * np.sqrt(ratio))
    bw = int(w * np.sqrt(ratio))
    y = (h - bh) // 2
    x = (w - bw) // 2
    mask[y:y + bh, x:x + bw] = 1.0
    return mask


class MixedMaskGenerator:
    """Weighted mixture of mask generators (`MixedMaskGenerator:145-197`)."""

    DEFAULT = ((irregular_mask, 1.0), (rectangle_mask, 1.0),
               (outpainting_mask, 0.3))

    def __init__(self, generators_and_weights=DEFAULT, invert_proba=0.0):
        self.gens = [g for g, _ in generators_and_weights]
        w = np.array([w for _, w in generators_and_weights], np.float64)
        self.probs = w / w.sum()
        self.invert_proba = invert_proba

    def __call__(self, h, w, rng):
        gen = self.gens[rng.choice(len(self.gens), p=self.probs)]
        mask = gen(h, w, rng)
        if self.invert_proba > 0 and rng.rand() < self.invert_proba:
            mask = 1.0 - mask
        return mask
