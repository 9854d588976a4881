"""The single fused training step.

The reference renders 3-4 *separate* ray batches per iteration (clf batch,
masked batch with detached weights, inpainted-depth batch, sparse-depth batch
— `DS_NeRF/run_nerf.py:1454-1480`), each with its own chunked render call.
TPU-first redesign: all groups are concatenated into ONE ray batch and
rendered in a single pass — the MLP sees one [4B, S] point matmul instead of
four [B, S] ones (MXU-friendly), and the stop-gradient variant of the RGB map
comes for free from `core.rendering.composite` instead of a second render.

Loss terms (parity: `run_nerf.py:1482-1561`):
  clf    MSE outside the mask (+ coarse)
  rgb    MSE on inpainted RGB inside the mask, weights stop-gradiented
         (+ coarse); replaced by the 0.001 * mean(acc) suppression term in
         object-removal mode
  inp    MSE between rendered disparity and LaMa-inpainted disparity (+ coarse),
         NaN-guarded
  depth  COLMAP sparse-depth loss (plain/weighted/relative/normalized),
         weighted by depth_lambda
  sigma  optional URF sigma loss on the depth rays (`DS_NeRF/loss.py`)
  lpips  patch-perceptual loss — wired via an optional callable (stage 6)

Everything happens inside one jit; the optimizer update (Adam + exponential
decay) is part of the compiled graph. With a mesh, ray batches are sharded
over the ``data`` axis and GSPMD inserts the gradient psum.
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from spinnerf_tpu.core import losses, rendering, sampling
from spinnerf_tpu.core.rendering import RenderConfig
from spinnerf_tpu.data import raybank
from spinnerf_tpu.parallel import mesh as mesh_lib


class TrainConfig(NamedTuple):
    """Static training hyperparameters (hashable)."""
    render: RenderConfig = RenderConfig()
    n_rand: int = 1024
    prepare: bool = False
    masked_nerf: bool = False
    object_removal: bool = False
    no_geometry: bool = False
    use_coarse_loss: bool = True        # reference: not --no_coarse
    single_image: bool = False          # reference --no_batching sampler
    precrop_iters: int = 0
    precrop_frac: float = 0.5
    epoch_sampling: bool = True         # without-replacement epoch strides
    #                                     (`raybank.epoch_indices`) — the
    #                                     reference's shuffled-DataLoader
    #                                     semantics; False = uniform iid
    depth_supervision: bool = False     # --colmap_depth --depth_loss
    depth_with_rgb: bool = False        # --depth_with_rgb: no separate depth
    #                                     render; supervise the photometric
    #                                     batch's own rendered depth
    #                                     (`run_nerf.py:1478-1479`)
    depth_lambda: float = 0.1
    weighted_loss: bool = False
    relative_loss: bool = False
    normalize_depth: bool = False
    sigma_loss: bool = False
    sigma_lambda: float = 0.1
    semantic: bool = False              # MVSeg mode: BCE on composited logits
    clf_weight: float = 0.01
    distortion_weight: float = 0.0      # TPU extra: mip-360 regularizer
    remat_chunks: int = 32              # TPU extra: scan-chunked rematerialized
    #                                     field eval — measured +41% step
    #                                     throughput on v5e (0/1 disables)
    netchunk: int = 1024 * 64           # --netchunk: max points per network
    #                                     eval (`run_nerf.py:77-88` batchify);
    #                                     raises the remat chunk count when a
    #                                     fused batch would exceed it. The
    #                                     Pallas fused field satisfies it by
    #                                     construction (<=512-pt VMEM blocks).
    lrate: float = 5e-4
    lrate_decay: float = 250.0
    grad_clip: float | None = None
    share_coarse_fine: bool = False     # one set of weights for both passes


def _active_groups(cfg: TrainConfig, bank: raybank.RayBank):
    """Which pixel groups participate this run (static decision)."""
    if cfg.semantic:
        # MVSeg: one all-pixel RGB group + the BCE segmentation group
        # (`MVSeg/DS_NeRF/run_nerf.py:1279-1318`)
        groups = ["rgb"]
        if bank.groups.get("seg") is not None and bank.groups["seg"].count > 0:
            groups.append("seg")
        return groups
    groups = ["clf"]
    if not cfg.masked_nerf or cfg.object_removal:
        groups.append("rgb")
    if (not cfg.prepare and not cfg.object_removal and not cfg.no_geometry
            and bank.inp_depths is not None and bank.groups["inp"].count > 0):
        groups.append("inp")
    # an empty group would silently train on its zero-padding pixel
    # ((0,0) of view 0) — drop it instead
    groups = [g for g in groups if bank.groups[g].count > 0]
    if not groups:
        raise ValueError("no non-empty ray groups for this config/scene "
                         "(is the mask empty or all-covering?)")
    return groups


def _concat_batches(batches: list[dict]) -> dict:
    keys = set.intersection(*(set(b) for b in batches))
    return {k: jnp.concatenate([b[k] for b in batches]) for k in keys}


def make_train_step(model, cfg: TrainConfig, bank: raybank.RayBank,
                    tx: optax.GradientTransformation,
                    mesh=None, lpips_fn: Callable | None = None,
                    frozen_raw_fn: Callable | None = None,
                    fine_model=None):
    """Build the jitted train step.

    Args:
      model: a field module (`models.fields.NeRFField`-compatible apply).
      cfg: static TrainConfig.
      bank: RayBank (device arrays; passed through jit as a real argument —
        NEVER closed over. A closed-over bank is lowered as embedded module
        constants, which at statue scale (~GBs of images + index groups)
        blows up the serialized compile payload.)
      tx: optax optimizer (use `schedule.make_optimizer`).
      mesh: optional `jax.sharding.Mesh` for ray-batch data parallelism.
      lpips_fn: optional callable(params, key) -> scalar patch-LPIPS loss,
        traced into the same step when given. If it carries a `.consts`
        pytree of device arrays, it is called as `lpips_fn(consts, params,
        key)` and the consts ride through jit as arguments (same payload
        concern: LPIPS targets are full training images).
      frozen_raw_fn: optional frozen field `(pts, vd) -> raw`; its density
        (stop-gradiented) replaces the trained field's sigma — the NeRF_RGB /
        --alpha_model_path mode (`run_nerf_helpers.py:159-216`). Same
        optional `.consts` convention: called as `(consts, pts, vd)`.
      fine_model: optional separately-sized module for the fine pass
        (`--netdepth_fine/--netwidth_fine`, `run_nerf.py:417-420`); defaults
        to `model`.

    Returns:
      step(params, opt_state, key, step_idx) -> (params, opt_state, metrics)
    """
    groups = _active_groups(cfg, bank)
    use_depth = (cfg.depth_supervision and bank.depth_group is not None
                 and bank.depth_group.count > 0)
    b = cfg.n_rand
    rcfg = cfg.render

    fine_mod = fine_model if fine_model is not None else model

    # device arrays carried by the optional callables ride through jit as
    # arguments instead of being traced in as embedded constants
    lp_consts = getattr(lpips_fn, "consts", None)
    fr_consts = getattr(frozen_raw_fn, "consts", None)

    def _make_raw(fr_c):
        def _raw(mod, p, pts, vd):
            if frozen_raw_fn is None:
                return mod.apply(p, pts, vd)
            raw = (frozen_raw_fn(fr_c, pts, vd) if fr_c is not None
                   else frozen_raw_fn(pts, vd))
            frozen = jax.lax.stop_gradient(raw[..., 3:4])
            return mod.apply(p, pts, vd, frozen_sigma=frozen)
        return _raw

    def _make_apply(_raw):
        def _apply(mod, p, pts, vd):
            c = cfg.remat_chunks
            # engage only when chunks stay big enough to fill the MXU; tiny
            # scan-of-remat graphs are slower and have crashed XLA:CPU.
            # Fused-kernel fields do their own in-VMEM rematerialization —
            # scan-chunking them only adds launch overhead.
            # Table-backed fields (hash grids) are exempt too: every chunk's
            # backward accumulates a gradient for the FULL [L, T, F] table
            # (64 MB at 2^19), so a 32-chunk scan writes 32 full tables plus
            # re-pays the per-chunk Z-sort/prep — measured 357.9 -> 93.1
            # ms/step at log2_T=19 on v5e when the scan is skipped.
            if getattr(mod, "is_fused", False) or getattr(
                    mod, "scan_chunk_exempt", False):
                return _raw(mod, p, pts, vd)
            n = pts.shape[0]
            if cfg.netchunk and c >= 1 and n > cfg.netchunk * max(c, 1):
                # --netchunk bounds points per network eval: raise the chunk
                # count to the next divisor of n that honours it
                c = max(c, -(-n // cfg.netchunk))
                while n % c != 0 and c < n:
                    c += 1
            if c <= 1 or pts.shape[0] % c != 0 or pts.shape[0] // c < 64:
                return _raw(mod, p, pts, vd)
            ck = jax.checkpoint(lambda p_, x, d: _raw(mod, p_, x, d))
            b = pts.shape[0]
            xs = pts.reshape(c, b // c, *pts.shape[1:])
            ds = vd.reshape(c, b // c, vd.shape[-1])
            out = jax.lax.map(lambda xd: ck(p, xd[0], xd[1]), (xs, ds))
            return out.reshape(b, *out.shape[2:])
        return _apply

    def field_fns(_apply, params):
        def coarse(pts, vd):
            return _apply(model, params["coarse"], pts, vd)

        if cfg.share_coarse_fine or "fine" not in params:
            return coarse, coarse

        def fine(pts, vd):
            return _apply(fine_mod, params["fine"], pts, vd)
        return coarse, fine

    def loss_fn(params, bank, ext, key, step_idx):
        lp_c, fr_c = ext
        _apply = _make_apply(_make_raw(fr_c))
        keys = jax.random.split(key, len(groups) + 3)
        k_render, k_depth, k_lpips = keys[-3], keys[-2], keys[-1]

        batches, targets = [], []
        for k_g, name in zip(keys, groups):
            if cfg.single_image and name in ("clf", "rgb"):
                ba, tg = raybank.sample_single_image(
                    k_g, bank, b, step_idx,
                    precrop_iters=cfg.precrop_iters,
                    precrop_frac=cfg.precrop_frac)
            else:
                ba, tg = raybank.sample_group(
                    k_g, bank, name, b,
                    step=step_idx if cfg.epoch_sampling else None)
            batches.append(ba)
            targets.append(tg)
        if use_depth:
            depth_batch = raybank.sample_depth_group(
                k_depth, bank, b,
                step=step_idx if cfg.epoch_sampling else None)
            if not cfg.depth_with_rgb:
                batches.append({k: depth_batch[k]
                                for k in ("origins", "directions", "near",
                                          "far", "viewdirs")})

        fused = _concat_batches(batches)
        if mesh is not None:
            fused = mesh_lib.shard_batch(fused, mesh)

        coarse_fn, fine_fn = field_fns(_apply, params)
        res = rendering.render_rays(k_render, fused, coarse_fn, rcfg,
                                    fine_field_fn=fine_fn)
        fine, coarse = res.fine, res.coarse

        def seg(x, i):
            return x[i * b:(i + 1) * b]

        metrics = {}
        loss = jnp.float32(0.0)

        gi = {name: i for i, name in enumerate(groups)}

        # --- primary photometric group: 'clf' (outside-mask pixels) in the
        # DS-NeRF modes, 'rgb' (all pixels) in MVSeg mode ---
        i = gi["clf"] if "clf" in gi else gi["rgb"]
        tgt = targets[i]["rgb"]
        img_loss = losses.mse(seg(fine.rgb, i), tgt)
        metrics["psnr"] = losses.mse_to_psnr(img_loss)
        if cfg.use_coarse_loss and coarse is not None:
            img_loss = img_loss + losses.mse(seg(coarse.rgb, i), tgt)
        loss = loss + img_loss
        metrics["img_loss"] = img_loss

        # --- seg: MVSeg BCE on composited logits ---
        if "seg" in gi:
            i = gi["seg"]
            lbl = jnp.clip(targets[i]["label"], 0.0, 1.0)
            clf_loss = losses.bce_with_logits(seg(fine.prob, i), lbl)
            if cfg.use_coarse_loss and coarse is not None:
                clf_loss = clf_loss + losses.bce_with_logits(
                    seg(coarse.prob, i), lbl)
            loss = loss + cfg.clf_weight * clf_loss
            metrics["clf_loss"] = clf_loss

        # --- rgb ("complete"): masked supervision / object removal ---
        if "rgb" in gi and not cfg.semantic:
            i = gi["rgb"]
            if cfg.object_removal:
                acc_term = 0.001 * jnp.mean(seg(fine.acc, i))
                loss = loss + acc_term
                metrics["acc_loss"] = acc_term
            elif not cfg.masked_nerf:
                tgt = targets[i]["rgb"]
                m_loss = losses.mse(seg(fine.rgb_sg, i), tgt)
                if cfg.use_coarse_loss and coarse is not None:
                    m_loss = m_loss + losses.mse(seg(coarse.rgb_sg, i), tgt)
                loss = loss + m_loss
                metrics["masked_loss"] = m_loss

        # --- inp: disparity follows the inpainted depth prior ---
        if "inp" in gi:
            i = gi["inp"]
            tgt = targets[i]["inp_depth"]
            inp_loss = losses.mse(seg(fine.disp, i), tgt)
            if cfg.use_coarse_loss and coarse is not None:
                inp_loss = inp_loss + losses.mse(seg(coarse.disp, i), tgt)
            inp_loss = jnp.where(jnp.isnan(inp_loss), 0.0, inp_loss)
            loss = loss + inp_loss
            metrics["inp_loss"] = inp_loss

        # --- depth: COLMAP sparse supervision ---
        if use_depth:
            # --depth_with_rgb reuses the primary photometric batch's rendered
            # depth instead of rendering the depth rays (`run_nerf.py:
            # 1478-1479`: `depth_col = depth` of the clf render); the targets
            # and weights still come from the sparse-depth batch
            i = (gi["clf"] if "clf" in gi else gi["rgb"]) \
                if cfg.depth_with_rgb else len(groups)
            pred_depth = seg(fine.depth, i)
            d_loss = losses.depth_loss(
                pred_depth, depth_batch["depths"],
                ray_weights=depth_batch["weights"],
                weighted=cfg.weighted_loss, relative=cfg.relative_loss,
                normalize=cfg.normalize_depth,
                max_depth=bank.depth_group.max_depth)
            loss = loss + cfg.depth_lambda * d_loss
            metrics["depth_loss"] = d_loss

            if cfg.sigma_loss:
                # resample from near to the GT depth; density should spike at
                # the last sample (`DS_NeRF/loss.py:15-44`)
                t = jnp.linspace(0.0, 1.0, rcfg.n_samples)
                z = (depth_batch["near"][:, None] * (1 - t) +
                     depth_batch["depths"][:, None] * t)
                pts = sampling.ray_points(depth_batch["origins"],
                                          depth_batch["directions"], z)
                raw = fine_fn(pts, depth_batch["viewdirs"])
                s_loss = jnp.mean(losses.sigma_loss(jax.nn.relu(raw[..., 3])))
                loss = loss + cfg.sigma_lambda * s_loss
                metrics["sigma_loss"] = s_loss

        if cfg.distortion_weight > 0.0:
            dist = losses.distortion_loss(fine.weights, fine.z_vals)
            loss = loss + cfg.distortion_weight * dist
            metrics["distortion"] = dist

        if lpips_fn is not None:
            lp = (lpips_fn(lp_c, params, k_lpips) if lp_c is not None
                  else lpips_fn(params, k_lpips))
            # the reference enables the perceptual term after iter 300
            # (`run_nerf.py:1523`); gate smoothly with a 0/1 factor so the
            # graph stays static.
            start = getattr(lpips_fn, "start_iter", 0)
            if start > 0:
                lp = lp * (step_idx > start).astype(lp.dtype)
            loss = loss + lp
            metrics["lpips_loss"] = lp

        metrics["loss"] = loss
        return loss, metrics

    def train_step(params, opt_state, bank, ext, key, step_idx):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, bank, ext, key, step_idx)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    jitted = jax.jit(train_step, donate_argnums=(0, 1))

    def step(params, opt_state, key, step_idx):
        return jitted(params, opt_state, bank, (lp_consts, fr_consts),
                      key, step_idx)

    step.jitted = jitted     # the underlying jit fn, for lowering inspection
    return step


def init_params(model, key, *, share_coarse_fine: bool = False,
                n_importance: int = 64, fine_model=None):
    """Initialize {"coarse", "fine"} parameter trees.

    fine_model: optional separately-sized module for the fine pass
    (`--netdepth_fine/--netwidth_fine`); defaults to `model`.
    """
    pts = jnp.zeros((1, 2, 3))
    vd = jnp.zeros((1, 3))
    k1, k2 = jax.random.split(key)
    params: dict[str, Any] = {"coarse": model.init(k1, pts, vd)}
    if n_importance > 0 and not share_coarse_fine:
        params["fine"] = (fine_model or model).init(k2, pts, vd)
    return params
