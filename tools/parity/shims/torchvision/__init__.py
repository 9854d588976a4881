"""torchvision shim: the reference imports it (`run_nerf_helpers.py:3`);
the only training-path use is `transforms.Resize` in the `--lpips` branch
(`run_nerf.py:1536-1538`), applied to a [1,3,H,W] tensor. Reproduce
torchvision's tensor-mode default (bilinear, align_corners=False, no
antialias); at `--lpips_render_factor 1` — the parity-harness setting —
the resize is the identity."""
__version__ = "0.0-shim"


class _Resize:
    def __init__(self, size, *a, **k):
        self.size = tuple(size) if not isinstance(size, int) else size

    def __call__(self, x):
        import torch.nn.functional as F
        if x.shape[-2:] == self.size:
            return x
        return F.interpolate(x, size=self.size, mode="bilinear",
                             align_corners=False)


class _TransformsModule:
    Resize = _Resize


transforms = _TransformsModule
