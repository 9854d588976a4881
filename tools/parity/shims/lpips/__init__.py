"""lpips shim for running the unmodified reference without egress.

Two modes:

* Default: zero-valued LPIPS so the reference imports and instantiates
  (`DS_NeRF/run_nerf.py:36,970-974`) without downloading torchvision
  weights. Trajectory comparisons that disable `--lpips` never touch it;
  if it IS invoked, it contributes exactly 0.

* `SPINNERF_LPIPS_NPZ=<path>`: build the REAL metric from an exported
  weight dump (`tools/parity/export_lpips.py`) — the exact VGG16 trunk +
  linear heads our JAX `models/lpips.py` uses (seeded random backbone in
  this container; a frozen random projection is a valid perceptual
  metric). With the same arrays on both sides, the reference's patch-LPIPS
  term (`run_nerf.py:1523-1561`) and ours optimize the SAME function, so
  stage-5 trajectories are comparable with `--lpips` enabled.

The forward contract matches the pip `lpips` package: inputs in [-1, 1]
(`normalize=True` accepts [0, 1]), returns [N, 1, 1, 1].
"""
import os

import numpy as np
import torch
import torch.nn as nn


class _MatchedLPIPS(nn.Module):
    """VGG16-feature LPIPS rebuilt from the shared .npz dump."""

    def __init__(self, npz_path: str):
        super().__init__()
        d = np.load(npz_path)
        self.plan = d["plan"]  # [n_conv, 3] (channels, pool, tap)
        self.shift = torch.tensor(d["shift"]).view(1, 3, 1, 1)
        self.scale = torch.tensor(d["scale"]).view(1, 3, 1, 1)
        convs = []
        in_ch = 3
        for i, (ch, _pool, _tap) in enumerate(self.plan):
            conv = nn.Conv2d(in_ch, int(ch), 3, padding=1)
            conv.weight.data = torch.tensor(d[f"conv_{i}_kernel"])
            conv.bias.data = torch.tensor(d[f"conv_{i}_bias"])
            convs.append(conv)
            in_ch = int(ch)
        self.convs = nn.ModuleList(convs)
        self.lins = [torch.tensor(d[f"lin_{i}"]) for i in range(5)]
        for p in self.parameters():
            p.requires_grad = False

    def _features(self, x):
        feats = []
        h = (x - self.shift.to(x.device)) / self.scale.to(x.device)
        for i, (_ch, pool, tap) in enumerate(self.plan):
            if pool:
                h = torch.nn.functional.max_pool2d(h, 2, 2)
            h = torch.relu(self.convs[i](h))
            if tap:
                feats.append(h)
        return feats

    def forward(self, a, b):
        fa = self._features(a)
        fb = self._features(b)
        total = 0.0
        for f1, f2, w in zip(fa, fb, self.lins):
            n1 = f1 / (f1.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
            n2 = f2 / (f2.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
            d = (n1 - n2).pow(2)                              # [N, C, H, W]
            d = (d * w.to(d.device).view(1, -1, 1, 1)).sum(dim=1)
            total = total + d.mean(dim=(1, 2))                # [N]
        return total.view(-1, 1, 1, 1)


class LPIPS(nn.Module):
    def __init__(self, net="vgg", **kwargs):
        super().__init__()
        self.net = net
        npz = os.environ.get("SPINNERF_LPIPS_NPZ")
        self.impl = _MatchedLPIPS(npz) if npz else None

    def forward(self, a, b, normalize=False):
        if self.impl is None:
            return torch.zeros((a.shape[0], 1, 1, 1), dtype=a.dtype,
                               device=a.device)
        if normalize:  # [0,1] -> [-1,1] (pip-lpips contract)
            a = a * 2.0 - 1.0
            b = b * 2.0 - 1.0
        return self.impl(a, b)
