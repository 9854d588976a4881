"""Import the PyTorch reference (`/root/reference`) for CPU parity checks.

The reference pins CUDA at import (`DS_NeRF/run_nerf.py:39`
`torch.cuda.set_device(0)`); we neutralize that call before importing, add
shims for its unavailable pip deps (configargparse/lpips/torchvision/
tinycudann), and import its modules under a package-unique name so they don't
collide with ours. Nothing in /root/reference is modified or copied.
"""
from __future__ import annotations

import importlib.util
import os
import sys
from pathlib import Path

REFERENCE = Path(os.environ.get("SPINNERF_REFERENCE", "/root/reference"))
SHIMS = Path(__file__).parent / "shims"

_loaded: dict[str, object] = {}


def reference_available() -> bool:
    return (REFERENCE / "DS_NeRF" / "run_nerf.py").is_file()


def _neutralize_cuda():
    import torch
    if not torch.cuda.is_available():
        torch.cuda.set_device = lambda *a, **k: None
        torch.cuda.empty_cache = lambda *a, **k: None


def _patch_imageio():
    """The reference calls `imageio.imread(f, ignoregamma=True)`
    (`load_llff.py:137`); the kwarg was removed in imageio>=2.28. Accept and
    drop it so the unmodified reference runs against the modern package."""
    import imageio
    orig = imageio.imread

    def imread(uri, *args, **kwargs):
        kwargs.pop("ignoregamma", None)
        return orig(uri, *args, **kwargs)

    imageio.imread = imread


def load_reference(subdir: str = "DS_NeRF"):
    """Import `<subdir>/run_nerf.py` (+ its sibling modules) and return it.

    subdir: "DS_NeRF" or "MVSeg/DS_NeRF".
    """
    key = subdir
    if key in _loaded:
        return _loaded[key]
    _neutralize_cuda()
    _patch_imageio()
    root = REFERENCE / subdir
    if not root.is_dir():
        raise FileNotFoundError(root)

    # Shims first so missing pip deps resolve; reference dir next so its
    # sibling imports (run_nerf_helpers, load_llff, ...) resolve.
    for p in (str(SHIMS), str(root)):
        if p not in sys.path:
            sys.path.insert(0, p)

    # The two run_nerf.py variants share module names; purge sibling modules
    # so each variant gets its own copies.
    sibling_names = [
        "run_nerf", "run_nerf_helpers", "run_nerf_helpers_tcnn", "load_llff",
        "load_blender", "load_dtu", "load_nerd", "loss", "data", "activation",
        "correspondence_utils", "colmapUtils", "colmapUtils.read_write_model",
        "colmapUtils.read_write_dense", "utils", "utils.generate_renderpath",
    ]
    saved = {n: sys.modules.pop(n) for n in list(sys.modules) if n in sibling_names}
    try:
        import run_nerf  # noqa: F401
        mod = sys.modules["run_nerf"]
    finally:
        # keep this variant's modules importable under a prefixed alias
        for n in sibling_names:
            if n in sys.modules:
                sys.modules[f"_ref_{subdir.replace('/', '_')}.{n}"] = sys.modules[n]
        sys.path.remove(str(root))
        # leave shims on path (harmless), restore nothing: parity runs are
        # single-variant per process; cross-variant use must use subprocesses.
        del saved
    _loaded[key] = mod
    return mod
