"""Inpainting evaluation harness.

Parity: `lama/saicinpainting/evaluation/evaluator.py:16-133` — per-image
scores grouped into mask-area bins (0-10%, 10-20%, ...), mean/std tables, and
the `ssim_fid100_f1` integral metric used as the training checkpoint monitor
(`evaluator.py:112`, trainer yaml:30): the harmonic mean of SSIM and a
normalized (100-point) Fréchet feature distance.

The Fréchet distance runs over a pluggable feature extractor:

* `InceptionFeatureExtractor` — InceptionV3 pool3 (`models/inception.py`),
  the reference's FID embedding. With real weights (drop
  `pt_inception.pth` into `$SPINNERF_WEIGHTS_DIR`, see
  `spinnerf_tpu/weights.py`) this is paper-exact FID; without, it runs an
  architecture-faithful random network and the result key is
  `fid_random_inception` so the number can never be mistaken for FID.
* `FeatureExtractor` — VGG16 global-average-pooled features; a documented
  alternative embedding (same Fréchet statistic, different network).
"""
from __future__ import annotations

from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

from spinnerf_tpu.eval import metrics as m


def frechet_distance(feats_a: np.ndarray, feats_b: np.ndarray) -> float:
    """Fréchet distance between Gaussians fit to two feature sets [N, D]."""
    import scipy.linalg
    mu1, mu2 = feats_a.mean(0), feats_b.mean(0)
    c1 = np.cov(feats_a, rowvar=False)
    c2 = np.cov(feats_b, rowvar=False)
    diff = mu1 - mu2
    covmean, _ = scipy.linalg.sqrtm(c1 @ c2, disp=False)
    if not np.isfinite(covmean).all():
        # rank-deficient product (N images << feature dim is the norm here):
        # retry with the standard diagonal offset (same trick as the
        # reference FID implementations)
        eps = 1e-6
        offset = np.eye(c1.shape[0]) * eps
        covmean, _ = scipy.linalg.sqrtm((c1 + offset) @ (c2 + offset),
                                        disp=False)
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    covmean = np.nan_to_num(covmean, nan=0.0, posinf=0.0, neginf=0.0)
    return float(diff @ diff + np.trace(c1) + np.trace(c2)
                 - 2 * np.trace(covmean))


class FeatureExtractor:
    """Global-average-pooled VGG16 features for Fréchet statistics (an
    alternative embedding — results are keyed `fid_vgg`, never `fid`)."""

    fid_key = "fid_vgg"

    def __init__(self, vgg_weights_path=None, seed: int = 0):
        if vgg_weights_path is None:
            from spinnerf_tpu import weights as wreg
            vgg_weights_path = wreg.find("vgg16")
        from spinnerf_tpu.models.lpips import VGG16Features, \
            load_vgg_params_from_torch
        self.net = VGG16Features()
        if vgg_weights_path:
            self.params = load_vgg_params_from_torch(vgg_weights_path,
                                                     self.net)
        else:
            self.params = self.net.init(jax.random.PRNGKey(seed),
                                        jnp.zeros((1, 64, 64, 3)))
        from spinnerf_tpu.models import lpips as lpips_lib
        shift = jnp.asarray(lpips_lib._SHIFT)
        scale = jnp.asarray(lpips_lib._SCALE)

        def _run(p, x):
            # VGG16Features expects LPIPS-normalized input ([0,1] -> [-1,1]
            # -> shift/scale) — raw images would put every activation
            # out-of-distribution for pretrained weights
            x = (x * 2.0 - 1.0 - shift) / scale
            return [f.mean(axis=(1, 2)) for f in self.net.apply(p, x)]

        self._apply = jax.jit(_run)

    def __call__(self, images: np.ndarray) -> np.ndarray:
        """images [N, H, W, 3] in [0,1] -> features [N, D]."""
        feats = self._apply(self.params, jnp.asarray(images))
        return np.concatenate([np.asarray(f) for f in feats], axis=-1)


class InceptionFeatureExtractor:
    """InceptionV3 pool3 features — the reference's FID embedding
    (`evaluation/losses/fid/inception.py`). `fid_key` marks results from
    random weights so they can't be read as comparable FID."""

    def __init__(self, weights_path=None, seed: int = 0, batch: int = 16):
        from spinnerf_tpu.models import inception as inc
        if weights_path is None:
            from spinnerf_tpu import weights as wreg
            weights_path = wreg.find("inception_fid")
        if weights_path:
            self.params = inc.load_inception_params_from_torch(weights_path)
            self.fid_key = "fid"
        else:
            self.params = inc.random_inception_params(seed)
            self.fid_key = "fid_random_inception"
        self.batch = batch
        self._apply = jax.jit(lambda p, x: inc.inception_pool3(p, x))

    def __call__(self, images: np.ndarray) -> np.ndarray:
        """images [N, H, W, 3] in [0,1] -> pool3 features [N, 2048]."""
        out = []
        for i in range(0, len(images), self.batch):
            x = np.asarray(images[i:i + self.batch], np.float32)
            n = len(x)
            if n < self.batch:    # pad the tail batch: one jit shape total
                x = np.concatenate(
                    [x, np.zeros((self.batch - n, *x.shape[1:]), x.dtype)])
            out.append(np.asarray(self._apply(self.params,
                                              jnp.asarray(x)))[:n])
        return np.concatenate(out, axis=0)


class InpaintingEvaluator:
    """Accumulates per-image scores; reports per-mask-area-bin tables."""

    def __init__(self, *, lpips_fn=None, feature_extractor=None,
                 bin_edges=(0.0, 0.1, 0.2, 0.3, 0.4, 1.01),
                 integral_fid_norm: float = 100.0, lpips_key: str = "lpips"):
        self.lpips_fn = lpips_fn
        # callers must pass "lpips_random_vgg" when the metric runs on
        # random weights (see models.lpips.load_lpips_labeled)
        self.lpips_key = lpips_key
        self.features = feature_extractor
        self.bin_edges = np.asarray(bin_edges)
        self.integral_fid_norm = integral_fid_norm
        self.rows = []
        self._feats_pred = []
        self._feats_gt = []

    def add(self, pred: np.ndarray, target: np.ndarray, mask: np.ndarray):
        """pred/target [H, W, 3] in [0,1]; mask [H, W] (1 = hole)."""
        area = float((mask > 0.5).mean())
        row = {
            "mask_area": area,
            "ssim": float(m.ssim(jnp.asarray(pred), jnp.asarray(target))),
            "psnr": float(m.psnr(jnp.asarray(pred), jnp.asarray(target))),
        }
        if self.lpips_fn is not None:
            row[self.lpips_key] = float(self.lpips_fn(jnp.asarray(pred),
                                                      jnp.asarray(target)))
        self.rows.append(row)
        if self.features is not None:
            self._feats_pred.append(pred)
            self._feats_gt.append(target)

    def evaluation_end(self) -> dict:
        """Mean/std per metric, overall and per mask-area bin, plus fid and
        the ssim_fid100_f1 integral score when a feature extractor is set."""
        if not self.rows:   # nothing scored (e.g. empty validation dir)
            return {"total": {"n": 0}}
        out = {"total": self._table(self.rows)}
        for lo, hi in zip(self.bin_edges[:-1], self.bin_edges[1:]):
            rows = [r for r in self.rows if lo <= r["mask_area"] < hi]
            if rows:
                out[f"mask_{lo:.0%}-{hi:.0%}"] = self._table(rows)
        if self.features is not None and self._feats_pred:
            fp = self.features(np.stack(self._feats_pred))
            fg = self.features(np.stack(self._feats_gt))
            fid = frechet_distance(fp, fg)
            ssim_mean = out["total"]["ssim"]["mean"]
            fid_score = max(0.0, 1.0 - fid / self.integral_fid_norm)
            denom = ssim_mean + fid_score
            # extractors label their statistic: "fid" only for real-weight
            # InceptionV3 pool3; random/VGG embeddings get distinct keys
            out["total"][getattr(self.features, "fid_key", "fid_vgg")] = fid
            out["total"]["ssim_fid100_f1"] = (
                2 * ssim_mean * fid_score / denom if denom > 0 else 0.0)
        return out

    @staticmethod
    def _table(rows):
        keys = [k for k in rows[0] if k != "mask_area"]
        return {k: {"mean": float(np.mean([r[k] for r in rows])),
                    "std": float(np.std([r[k] for r in rows]))}
                for k in keys} | {"n": len(rows)}
