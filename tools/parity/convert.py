"""Convert the reference's torch `NeRF` weights into `NeRFField` params.

Layer map (torch `DS_NeRF/run_nerf_helpers.py:74-127` -> flax
`spinnerf_tpu/models/fields.py::NeRFField`):

    pts_linears.{i}   -> trunk_{i}
    alpha_linear      -> sigma_head
    feature_linear    -> feature
    views_linears.0   -> view_0
    rgb_linear        -> rgb_head

torch Linear stores weight [out, in]; flax Dense kernel is [in, out], so
kernels are transposed. Both sides order the skip concat [pe, h] and the view
concat [feature, viewdir_pe], so no column permutations are needed.
"""
from __future__ import annotations

import numpy as np


def torch_nerf_to_flax(state_dict, depth: int = 8) -> dict:
    """Map a reference `NeRF` state_dict to `NeRFField` flax params."""
    def lin(name):
        w = np.asarray(state_dict[f"{name}.weight"].detach().cpu().numpy())
        b = np.asarray(state_dict[f"{name}.bias"].detach().cpu().numpy())
        return {"kernel": w.T.astype(np.float32), "bias": b.astype(np.float32)}

    params = {f"trunk_{i}": lin(f"pts_linears.{i}") for i in range(depth)}
    params["sigma_head"] = lin("alpha_linear")
    if any(k.startswith("feature_linear") for k in state_dict):
        params["feature"] = lin("feature_linear")
        params["view_0"] = lin("views_linears.0")
        params["rgb_head"] = lin("rgb_linear")
    else:  # use_viewdirs=False variant
        params["rgb_head"] = lin("output_linear")
    return {"params": params}


def flax_to_torch_nerf(params: dict, torch_model):
    """Inverse mapping: load `NeRFField` params into a torch `NeRF` in place."""
    import torch

    p = params["params"]

    def assign(name, entry):
        mod = torch_model
        for part in name.split("."):
            mod = getattr(mod, part) if not part.isdigit() else mod[int(part)]
        with torch.no_grad():
            mod.weight.copy_(torch.from_numpy(np.asarray(entry["kernel"]).T))
            mod.bias.copy_(torch.from_numpy(np.asarray(entry["bias"])))

    for i in range(torch_model.D):
        assign(f"pts_linears.{i}", p[f"trunk_{i}"])
    assign("alpha_linear", p["sigma_head"])
    if "feature" in p:
        assign("feature_linear", p["feature"])
        assign("views_linears.0", p["view_0"])
        assign("rgb_linear", p["rgb_head"])
    else:
        assign("output_linear", p["rgb_head"])
    return torch_model
