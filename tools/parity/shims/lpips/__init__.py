"""lpips shim: zero-valued LPIPS so the reference imports and instantiates
(`DS_NeRF/run_nerf.py:36,970-974`) without downloading torchvision weights
(no egress). Parity runs disable `--lpips`, so this loss is never part of a
compared trajectory; if it IS invoked, it contributes exactly 0.
"""
import torch
import torch.nn as nn


class LPIPS(nn.Module):
    def __init__(self, net="vgg", **kwargs):
        super().__init__()
        self.net = net

    def forward(self, a, b, normalize=False):
        return torch.zeros((1, 1, 1, 1), dtype=a.dtype, device=a.device)
