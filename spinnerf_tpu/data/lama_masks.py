"""On-the-fly training-mask synthesis for the 2D inpainter.

Parity: `lama/saicinpainting/training/data/masks.py:22-332` — irregular
brush-stroke masks (line/circle/square draw methods), rectangle masks,
superresolution grid masks, outpainting half-plane masks, the "dumb area"
center box, a segmentation-driven generator, the `LinearRamp` difficulty
schedule, and the weighted `MixedMaskGenerator`. (The reference's
segmentation generator wraps a detectron2 panoptic model; here any
`segment_fn(image) -> label map` works — e.g. `models.segmentation`.)

Pure numpy; each generator maps (height, width, rng) -> float mask [H, W]
with 1 = hole.
"""
from __future__ import annotations

import numpy as np


class LinearRamp:
    """Linear schedule start_value -> end_value over [start_iter, end_iter]
    (`saicinpainting/utils.py:66-79`); ramps mask difficulty during training."""

    def __init__(self, start_value=0.0, end_value=1.0, start_iter=-1,
                 end_iter=0):
        self.start_value = start_value
        self.end_value = end_value
        self.start_iter = start_iter
        self.end_iter = end_iter

    def __call__(self, i):
        if i < self.start_iter:
            return self.start_value
        if i >= self.end_iter:
            return self.end_value
        part = (i - self.start_iter) / (self.end_iter - self.start_iter)
        return self.start_value * (1 - part) + self.end_value * part


def irregular_mask(h, w, rng, *, max_angle=4.0, max_len=60, max_width=20,
                   min_times=0, max_times=10, draw_method="line"):
    """Random brush strokes (`make_random_irregular_mask:22-64` semantics).

    draw_method: "line" | "circle" | "square" (`DrawMethod:16-19`); the
    reference's `squares_proba` mixture slot is `draw_method="square"`.
    """
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
            if draw_method == "line":
                cv2.line(mask, (x, y), (x2, y2), 1.0, width)
            elif draw_method == "circle":
                cv2.circle(mask, (x, y), radius=width, color=1.0,
                           thickness=-1)
            elif draw_method == "square":
                r = width // 2
                mask[max(y - r, 0):y + r, max(x - r, 0):x + r] = 1.0
            else:
                raise ValueError(f"unknown draw_method {draw_method!r}")
            x, y = x2, y2
    return mask


def squares_mask(h, w, rng, **kwargs):
    """Irregular walk stamping squares (the `squares_proba` mixture slot)."""
    return irregular_mask(h, w, rng, draw_method="square", **kwargs)


def superres_mask(h, w, rng, *, min_step=2, max_step=4, min_width=1,
                  max_width=3):
    """Periodic row/column stripe grid — the super-resolution mask
    (`make_random_superres_mask:118-133`): every `step`-th stripe of
    `width` pixels is a hole in both axes."""
    mask = np.zeros((h, w), np.float32)
    step_x = rng.randint(min_step, max_step + 1)
    width_x = rng.randint(min_width, min(step_x, max_width + 1))
    offset_x = rng.randint(step_x)
    step_y = rng.randint(min_step, max_step + 1)
    width_y = rng.randint(min_width, min(step_y, max_width + 1))
    offset_y = rng.randint(step_y)
    for dy in range(width_y):
        mask[offset_y + dy::step_y] = 1.0
    for dx in range(width_x):
        mask[:, offset_x + dx::step_x] = 1.0
    return mask


class SegmentationMaskGenerator:
    """Object mask from a segmentation model
    (`RandomSegmentationMaskGenerator:104-115`).

    The reference lazily builds a detectron2 panoptic `SegmentationMask`;
    here any `segment_fn(image [H,W,3] float) -> int label map [H,W]` plugs
    in (e.g. a jitted `models.segmentation` ADE20k forward). Picks one
    random non-background segment; falls back to `rectangle_mask` when the
    image yields no usable segment (or no image is given).
    """

    def __init__(self, segment_fn, *, min_area_frac=0.005,
                 max_area_frac=0.6):
        self.segment_fn = segment_fn
        self.min_area_frac = min_area_frac
        self.max_area_frac = max_area_frac

    def __call__(self, h, w, rng, image=None):
        if image is None:
            return rectangle_mask(h, w, rng)
        labels = np.asarray(self.segment_fn(image))
        ids, counts = np.unique(labels, return_counts=True)
        frac = counts / float(labels.size)
        ok = ids[(frac >= self.min_area_frac) & (frac <= self.max_area_frac)]
        ok = ok[ok != 0]  # 0 = background by convention
        if ok.size == 0:
            return rectangle_mask(h, w, rng)
        pick = ok[rng.randint(ok.size)]
        return (labels == pick).astype(np.float32)


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


class RampedGenerator:
    """Wrap a generator so named int/float kwargs ramp up with `iter_i`
    (the reference's `ramp_kwargs` on the irregular/rectangle generators,
    `masks.py:51-102`): each ramped kwarg scales from `coef*value` to
    `value` along a `LinearRamp`."""

    def __init__(self, gen, ramp: LinearRamp, ramped_kwargs: dict):
        self.gen = gen
        self.ramp = ramp
        self.ramped_kwargs = ramped_kwargs

    def __call__(self, h, w, rng, iter_i=None, **kwargs):
        coef = self.ramp(iter_i) if iter_i is not None else 1.0
        # int kwargs floor at 1 (the reference's `int(max(1, coef*v))`) —
        # a 0 max_len/max_width would crash the irregular generator
        scaled = {k: (max(1, int(v * coef)) if isinstance(v, int)
                      else v * coef)
                  for k, v in self.ramped_kwargs.items()}
        return self.gen(h, w, rng, **scaled, **kwargs)


class MixedMaskGenerator:
    """Weighted mixture of mask generators (`MixedMaskGenerator:252-316`).

    Generators are called as `gen(h, w, rng)` plus, when they accept them,
    `iter_i` (difficulty ramps) and `image` (segmentation-driven masks) —
    mirroring the reference's `__call__(img, iter_i, raw_image)` contract
    without requiring every generator to declare unused params.
    """

    DEFAULT = ((irregular_mask, 1.0), (rectangle_mask, 1.0),
               (outpainting_mask, 0.3))

    def __init__(self, generators_and_weights=DEFAULT, invert_proba=0.0):
        self.gens = [g for g, _ in generators_and_weights]
        w = np.array([w for _, w in generators_and_weights], np.float64)
        self.probs = w / w.sum()
        self.invert_proba = invert_proba

    def __call__(self, h, w, rng, iter_i=None, image=None):
        import inspect
        gen = self.gens[rng.choice(len(self.gens), p=self.probs)]
        kwargs = {}
        try:
            sig_params = inspect.signature(gen).parameters
        except (TypeError, ValueError):
            sig_params = {}
        if iter_i is not None and "iter_i" in sig_params:
            kwargs["iter_i"] = iter_i
        if image is not None and "image" in sig_params:
            kwargs["image"] = image
        mask = gen(h, w, rng, **kwargs)
        if self.invert_proba > 0 and rng.rand() < self.invert_proba:
            mask = 1.0 - mask
        return mask
