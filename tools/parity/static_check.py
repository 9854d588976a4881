"""Static (no-training) numerical parity vs the torch reference.

Loads the actual reference code (CPU torch), builds a randomly initialized
reference `NeRF`, converts its weights into our `NeRFField`, and compares on
identical inputs:

  1. ray generation            (`get_rays_np` vs `core.rays.get_rays`)
  2. positional encoding       (`Embedder` vs `models.embedding`)
  3. the MLP raw outputs       (weight-converted, fp32)
  4. compositing               (`raw2outputs` vs `core.rendering.composite`)
  5. hierarchical sampling     (`sample_pdf(det)` vs `core.sampling.sample_pdf`)
  6. full deterministic coarse+fine `render_rays` (perturb=0, noise=0)
  7. SigmaLoss                 (`loss.SigmaLoss` math vs `core.losses.sigma_loss`)

Every comparison returns a max-abs diff; `run_all` collects them into a dict.
The pytest wrapper (tests/test_reference_parity.py) asserts tolerances; the
CLI prints JSON for PARITY_RUN.md.
"""
from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from parity import refenv  # noqa: E402
from parity.convert import torch_nerf_to_flax  # noqa: E402


def _maxdiff(a, b):
    return float(np.max(np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64))))


def build_pair(seed: int = 0, multires: int = 10, multires_views: int = 4,
               depth: int = 8, width: int = 256):
    """Random-init torch NeRF + weight-converted NeRFField, fp32."""
    import torch

    helpers = sys.modules["run_nerf_helpers"]
    torch.manual_seed(seed)
    input_ch = 3 * (1 + 2 * multires)
    input_ch_views = 3 * (1 + 2 * multires_views)
    tnet = helpers.NeRF(D=depth, W=width, input_ch=input_ch,
                        input_ch_views=input_ch_views, skips=[4],
                        use_viewdirs=True).float()

    import jax.numpy as jnp  # noqa: F401
    from spinnerf_tpu.models.fields import NeRFField

    field = NeRFField(depth=depth, width=width, multires=multires,
                      multires_views=multires_views, use_viewdirs=True,
                      compute_dtype=np.float32)
    params = torch_nerf_to_flax(tnet.state_dict(), depth=depth)
    return tnet, field, params


def check_rays(ref):
    helpers = sys.modules["run_nerf_helpers"]
    from spinnerf_tpu.core import rays as jrays

    rng = np.random.RandomState(1)
    c2w = np.eye(4, dtype=np.float32)[:3]
    c2w[:3, :3] = _random_rotation(rng)
    c2w[:3, 3] = rng.randn(3)
    h, w, focal = 24, 32, 30.0
    ro_t, rd_t = helpers.get_rays_np(h, w, focal, c2w)
    ro_j, rd_j = jrays.get_rays(h, w, focal, c2w)
    return max(_maxdiff(ro_t, ro_j), _maxdiff(rd_t, rd_j))


def _random_rotation(rng):
    q, _ = np.linalg.qr(rng.randn(3, 3))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    return q.astype(np.float32)


def check_embedding(ref, multires=10):
    import torch
    helpers = sys.modules["run_nerf_helpers"]
    from spinnerf_tpu.models.embedding import positional_encoding

    embed, _ = helpers.get_embedder(multires)
    x = np.random.RandomState(2).randn(64, 3).astype(np.float32)
    ref_out = embed(torch.from_numpy(x)).numpy()
    our_out = positional_encoding(x, multires)
    return _maxdiff(ref_out, our_out)


def check_mlp(tnet, field, params, n=257):
    import torch
    helpers = sys.modules["run_nerf_helpers"]

    rng = np.random.RandomState(3)
    pts = rng.uniform(-2, 2, (n, 1, 3)).astype(np.float32)
    vd = rng.randn(n, 3).astype(np.float32)
    vd /= np.linalg.norm(vd, axis=-1, keepdims=True)

    embed, _ = helpers.get_embedder(10)
    embed_views, _ = helpers.get_embedder(4)
    with torch.no_grad():
        inp = torch.cat([
            embed(torch.from_numpy(pts.reshape(-1, 3))),
            embed_views(torch.from_numpy(vd)),
        ], -1)
        ref_raw = tnet(inp).numpy().reshape(n, 1, 4)
    our_raw = np.asarray(field.apply(params, pts, vd))
    return _maxdiff(ref_raw, our_raw)


def check_composite(ref, n=64, s=33):
    import torch
    helpers = sys.modules["run_nerf_helpers"]
    from spinnerf_tpu.core.rendering import composite

    rng = np.random.RandomState(4)
    raw = rng.randn(n, s, 4).astype(np.float32) * 2
    z = np.sort(rng.uniform(1, 6, (n, s)).astype(np.float32), axis=-1)
    rd = rng.randn(n, 3).astype(np.float32)
    rgb_t, disp_t, acc_t, w_t, depth_t, _ = helpers.raw2outputs(
        torch.from_numpy(raw), torch.from_numpy(z), torch.from_numpy(rd),
        raw_noise_std=0.0, white_bkgd=False)
    out = composite(raw, z, rd)
    return max(_maxdiff(rgb_t.numpy(), out.rgb),
               _maxdiff(disp_t.numpy(), out.disp),
               _maxdiff(acc_t.numpy(), out.acc),
               _maxdiff(w_t.numpy(), out.weights),
               _maxdiff(depth_t.numpy(), out.depth))


def check_sample_pdf(ref, n=32, bins=63, s=16):
    import torch
    helpers = sys.modules["run_nerf_helpers"]
    from spinnerf_tpu.core.sampling import sample_pdf

    rng = np.random.RandomState(5)
    b = np.sort(rng.uniform(1, 6, (n, bins)).astype(np.float32), axis=-1)
    w = rng.uniform(0, 1, (n, bins - 1)).astype(np.float32)
    ref_s = helpers.sample_pdf(torch.from_numpy(b), torch.from_numpy(w),
                               s, det=True).numpy()
    our_s = np.asarray(sample_pdf(None, b, w, s, det=True))
    return _maxdiff(ref_s, our_s)


def check_render_rays(ref, tnet, field, params, n=48, n_samples=32,
                      n_importance=32):
    """Deterministic coarse+fine render of identical rays through both stacks."""
    import torch
    helpers = sys.modules["run_nerf_helpers"]
    import jax
    from spinnerf_tpu.core import rays as jrays
    from spinnerf_tpu.core.rendering import RenderConfig, render_rays

    rng = np.random.RandomState(6)
    ro = rng.randn(n, 3).astype(np.float32)
    rd = rng.randn(n, 3).astype(np.float32)
    near, far = 1.0, 6.0

    # --- reference path ---
    embed, _ = helpers.get_embedder(10)
    embed_views, _ = helpers.get_embedder(4)

    def query(inputs, viewdirs, network_fn):
        flat = torch.reshape(inputs, [-1, 3])
        emb = embed(flat)
        if viewdirs is not None:
            d = viewdirs[:, None].expand(inputs.shape)
            emb = torch.cat([emb, embed_views(torch.reshape(d, [-1, 3]))], -1)
        out = network_fn(emb)
        return torch.reshape(out, list(inputs.shape[:-1]) + [out.shape[-1]])

    vd = rd / np.linalg.norm(rd, axis=-1, keepdims=True)
    packet = np.concatenate(
        [ro, rd, np.full((n, 1), near, np.float32),
         np.full((n, 1), far, np.float32), vd], -1)
    with torch.no_grad():
        ret = ref.render_rays(
            torch.from_numpy(packet), tnet, query, n_samples,
            perturb=0.0, N_importance=n_importance, network_fine=tnet,
            raw_noise_std=0.0, retraw=False)
    # --- our path ---
    batch = jrays.make_ray_batch(ro, rd, near, far)
    cfg = RenderConfig(n_samples=n_samples, n_importance=n_importance,
                       perturb=False, raw_noise_std=0.0)

    def field_fn(pts, viewdirs):
        return field.apply(params, pts, viewdirs)

    res = render_rays(jax.random.PRNGKey(0), batch, field_fn, cfg)
    return {
        "rgb": _maxdiff(ret["rgb_map"].numpy(), res.fine.rgb),
        "disp": _maxdiff(ret["disp_map"].numpy(), res.fine.disp),
        "acc": _maxdiff(ret["acc_map"].numpy(), res.fine.acc),
        "rgb0": _maxdiff(ret["rgb0"].numpy(), res.coarse.rgb),
    }


def check_sigma_loss(ref):
    import torch
    loss_mod = sys.modules["loss"]
    from spinnerf_tpu.core.losses import sigma_loss as our_sigma

    rng = np.random.RandomState(7)
    raw_sigma = np.abs(rng.randn(16, 24).astype(np.float32)) * 3
    # Reference math (loss.py:43): -exp(sigma[-1]) / (sum exp(sigma) + 1)
    t = torch.from_numpy(raw_sigma)
    ref_val = (-torch.exp(t[:, -1]) / (torch.sum(torch.exp(t), 1) + 1)).numpy()
    assert loss_mod is not None
    ours = np.asarray(our_sigma(raw_sigma))
    return _maxdiff(ref_val, ours)


def run_all():
    ref = refenv.load_reference("DS_NeRF")
    tnet, field, params = build_pair()
    report = {
        "ray_gen": check_rays(ref),
        "positional_encoding": check_embedding(ref),
        "mlp_raw": check_mlp(tnet, field, params),
        "composite": check_composite(ref),
        "sample_pdf_det": check_sample_pdf(ref),
        "sigma_loss": check_sigma_loss(ref),
    }
    report.update({f"render_rays_{k}": v
                   for k, v in check_render_rays(ref, tnet, field, params).items()})
    return report


if __name__ == "__main__":
    import json
    import os
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    print(json.dumps(run_all(), indent=2))
