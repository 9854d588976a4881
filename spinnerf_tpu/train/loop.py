"""Training orchestration: config -> scene -> ray bank -> fused step -> loop.

The TPU-native equivalent of the reference's `train()`
(`DS_NeRF/run_nerf.py:963-1703`): loads the scene, builds the fixed-shape ray
bank, compiles one fused train step, and runs the loop with the reference's
cadence hooks — periodic checkpoints (`i_weights`), spiral+test videos
(`i_video`), testset PSNR dumps (`i_testset`), console metrics (`i_print`),
and the `--prepare` disparity dump that stages LaMa guidance (`i_feat`,
`run_nerf.py:1599-1609`).
"""
from __future__ import annotations

import json
import time
from dataclasses import dataclass
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from spinnerf_tpu.config import Config
from spinnerf_tpu.core.rendering import RenderConfig
from spinnerf_tpu.data import colmap, llff, raybank
from spinnerf_tpu.eval import metrics as eval_metrics
from spinnerf_tpu.eval import render as eval_render
from spinnerf_tpu.models.fields import NeRFField
from spinnerf_tpu.parallel import mesh as mesh_lib
from spinnerf_tpu.train import checkpoints, schedule
from spinnerf_tpu.train.step import TrainConfig, init_params, make_train_step


@dataclass
class TrainState:
    params: dict
    opt_state: object
    step: int


def build_model(cfg: Config, semantic: bool = False, fine: bool = False):
    """Build the (coarse or fine) field for a Config.

    fine=True uses `--netdepth_fine/--netwidth_fine` (`run_nerf.py:417`);
    `--i_embed -1` selects the identity encoding — 0 PE octaves keep the raw
    xyz/dir inputs (`run_nerf_helpers.py:55-57`).
    """
    depth = cfg.netdepth_fine if fine else cfg.netdepth
    width = cfg.netwidth_fine if fine else cfg.netwidth
    multires = 0 if cfg.i_embed == -1 else cfg.multires
    multires_views = 0 if cfg.i_embed == -1 else cfg.multires_views
    if cfg.no_tcnn:
        # the fused Pallas kernel needs a real TPU, viewdirs, and no
        # frozen-sigma (NeRF_RGB) mode; otherwise use the flax field
        if (cfg.fused_mlp and cfg.use_viewdirs and not cfg.alpha_model_path
                and cfg.i_embed != -1 and depth != 5
                and jax.default_backend() not in ("cpu",)):
            from spinnerf_tpu.ops.fused_mlp import FusedMLPField
            return FusedMLPField(
                depth=depth, width=width,
                multires=multires, multires_views=multires_views,
                semantic=semantic,
                compute_dtype=jnp.dtype(cfg.compute_dtype))
        return NeRFField(
            depth=depth, width=width,
            multires=multires, multires_views=multires_views,
            use_viewdirs=cfg.use_viewdirs, semantic=semantic,
            compute_dtype=jnp.dtype(cfg.compute_dtype))
    # hash-grid default (reference defaults to NeRF_TCNN, `run_nerf.py:1144`)
    from spinnerf_tpu.models.hashgrid import HashGridField
    return HashGridField(semantic=semantic,
                         log2_table_size=cfg.log2_hashmap_size,
                         impl=cfg.hash_impl,
                         compute_dtype=jnp.dtype(cfg.compute_dtype))


def _scene_hash_calibration(bank, model):
    """Calibrate the windowed hash's index semantics from the ray bank:
    (Z-CDF segment boundaries, per-level shifted-morton dense boxes). A
    deterministic stratified pixel/depth grid over the training poses
    approximates the training-point density (any bounds/boxes are a VALID
    index function — miscalibration only raises window aliasing and
    collision load, never wrong results — so the NDC approximation of
    using world rays is fine)."""
    from spinnerf_tpu.models.hashgrid import (calibrate_dense_box,
                                              calibrate_page_bounds,
                                              level_resolutions)
    h, w, focal = bank.hwf
    poses = np.asarray(bank.poses)
    ys = np.linspace(0.5, h - 0.5, 24)
    xs = np.linspace(0.5, w - 0.5, 24)
    xx, yy = np.meshgrid(xs, ys)
    dirs = np.stack([(xx - w * 0.5) / focal, -(yy - h * 0.5) / focal,
                     -np.ones_like(xx)], -1)                # [24, 24, 3]
    ts = (np.linspace(bank.near, bank.far, 12, endpoint=False)
          + (bank.far - bank.near) / 24.0)
    pts = []
    for p in poses:
        rd = dirs @ p[:3, :3].T
        pts.append((p[:3, 3] + ts[:, None, None, None] * rd[None])
                   .reshape(-1, 3))
    x01 = np.clip((np.concatenate(pts) + model.bound) / (2.0 * model.bound),
                  0.0, 1.0)
    resolutions = level_resolutions(model.n_levels, model.base_res,
                                    model.finest_res_per_unit * model.bound)
    return (calibrate_page_bounds(x01, model.log2_table_size),
            calibrate_dense_box(x01, resolutions, model.log2_table_size))


def render_config(cfg: Config, *, train: bool) -> RenderConfig:
    return RenderConfig(
        n_samples=cfg.N_samples,
        n_importance=cfg.N_importance,
        perturb=bool(cfg.perturb) and train,
        lindisp=cfg.lindisp,
        raw_noise_std=cfg.raw_noise_std if train else 0.0,
        white_bkgd=cfg.white_bkgd,
        semantic=cfg.mvseg,
        only_object=cfg.object_removal and not train,
    )


def train_config(cfg: Config) -> TrainConfig:
    return TrainConfig(
        render=render_config(cfg, train=True),
        n_rand=cfg.N_rand,
        prepare=cfg.prepare,
        masked_nerf=cfg.masked_NeRF,
        object_removal=cfg.object_removal,
        no_geometry=cfg.no_geometry,
        use_coarse_loss=not cfg.no_coarse,
        single_image=cfg.no_batching,
        precrop_iters=cfg.precrop_iters,
        precrop_frac=cfg.precrop_frac,
        epoch_sampling=cfg.epoch_sampling,
        depth_supervision=cfg.colmap_depth and cfg.depth_loss,
        depth_with_rgb=cfg.depth_with_rgb,
        depth_lambda=cfg.depth_lambda,
        weighted_loss=cfg.weighted_loss,
        relative_loss=cfg.relative_loss,
        normalize_depth=cfg.normalize_depth,
        sigma_loss=cfg.sigma_loss,
        sigma_lambda=cfg.sigma_lambda,
        semantic=cfg.mvseg,
        clf_weight=cfg.clf_weight,
        distortion_weight=cfg.distortion_weight,
        netchunk=cfg.netchunk,
        lrate=cfg.lrate,
        lrate_decay=cfg.lrate_decay,
        grad_clip=cfg.grad_clip,
    )


class Trainer:
    """End-to-end DS-NeRF-style trainer on one scene."""

    def _persist_page_bounds(self, bounds, dense_box):
        """Pin the windowed hash's index semantics — Z-CDF segment
        boundaries AND per-level shifted-morton dense boxes — to the
        experiment.

        Calibration changes how table entries are indexed, so it must
        travel with the trained table. A sidecar `page_bounds.json` in
        the exp dir is the authority: written on the experiment's first
        run, read back (overriding the flag-derived value) on every resume
        — flipping --hash_region_calib, swapping the ray bank, or future
        changes to the calibration code can then never silently read a
        trained table under a different index map. A round-4 sidecar
        (no "dense_box" key) pins dense_box=None: tables trained before
        the shifted-morton regime keep their all-paged index.
        """
        import json
        legacy = self.exp_dir / "region_caps.json"
        if legacy.exists() and json.loads(legacy.read_text()).get(
                "region_caps") is not None:
            raise RuntimeError(
                f"{legacy} pins the retired per-region-capacity index "
                f"scheme; this build indexes by Z-CDF page bounds. Retrain "
                f"the experiment (or delete the sidecar if the checkpoints "
                f"are disposable).")
        path = self.exp_dir / "page_bounds.json"
        if path.exists():
            data = json.loads(path.read_text())
            saved = data["page_bounds"]
            saved = None if saved is None else tuple(int(c) for c in saved)
            saved_box = data.get("dense_box")
            saved_box = (None if saved_box is None else tuple(
                None if b is None else tuple(int(v) for v in b)
                for b in saved_box))
            if saved != bounds or saved_box != dense_box:
                self.log(
                    f"page_bounds: using the experiment's pinned value from "
                    f"{path.name} ({'calibrated' if saved else 'uniform'}); "
                    f"the flag-derived value differs and is ignored")
            return saved, saved_box
        path.write_text(json.dumps(
            {"page_bounds": None if bounds is None else list(bounds),
             "dense_box": None if dense_box is None else
             [None if b is None else list(b) for b in dense_box]}))
        return bounds, dense_box

    def __init__(self, cfg: Config, *, scene: llff.Scene | None = None,
                 mesh=None, lpips_fn=None, log=print):
        self.cfg = cfg
        self.log = log
        self.exp_dir = cfg.exp_dir()
        self.exp_dir.mkdir(parents=True, exist_ok=True)
        cfg.save()

        # --- data (dataset_type dispatch, `run_nerf.py:985-1112`) ---
        near = far = None
        if scene is not None:
            self.scene = scene
            self.i_train, self.i_test = llff.train_test_split(
                len(scene.images), n_gt=cfg.N_gt, train_gt=cfg.train_gt,
                llffhold=0 if cfg.llffhold >= 1000000 else cfg.llffhold,
                n_train=cfg.N_train,
                train_scene=cfg.train_scene, test_scene=cfg.test_scene)
        else:
            from spinnerf_tpu.data.dispatch import load_scene_for_config
            self.scene, self.i_train, self.i_test, near, far = \
                load_scene_for_config(cfg)

        depth_list = None
        if cfg.colmap_depth:
            from spinnerf_tpu.data import colmap_fast
            depth_list = colmap_fast.sparse_depth_for_views(
                Path(cfg.datadir) / "sparse" / "0", factor=cfg.factor,
                bd_scale=self.scene.scale)
        use_ndc = (cfg.ndc if cfg.dataset_type in ("llff", "nerd")
                   and not cfg.no_ndc else False)
        self.bank = raybank.build_raybank(
            self.scene, self.i_train, depth_list=depth_list,
            prepare=cfg.prepare, train_gt=cfg.train_gt,
            semantic=cfg.mvseg, ndc=use_ndc, near=near, far=far)

        # --- model + step ---
        self.model = build_model(cfg, semantic=cfg.mvseg)
        from spinnerf_tpu.models.hashgrid import HashGridField
        if isinstance(self.model, HashGridField):
            # ON BY DEFAULT: calibrate the windowed hash's Z-CDF segment
            # boundaries to this scene's ray-sample density. The uniform
            # default collapses any scene occupying a small fraction of
            # [-bound, bound]^3 (every real capture at the reference's
            # bound=100) onto a few segments — measured 15.9 dB vs the
            # 30.6 dB XOR control on the §4 harness (PARITY_RUN). The
            # bounds are part of the table's INDEX SEMANTICS, so the
            # experiment dir pins them: a resumed checkpoint reads the
            # table under the bounds it was trained with even if the flag,
            # the ray bank, or the calibration code changes
            # (`_persist_page_bounds`).
            bounds, dense_box = (_scene_hash_calibration(self.bank,
                                                         self.model)
                                 if cfg.hash_region_calib else (None, None))
            bounds, dense_box = self._persist_page_bounds(bounds, dense_box)
            if bounds is not None or dense_box is not None:
                self.model = self.model.clone(page_bounds=bounds,
                                              dense_box=dense_box)
        # the fine network may be sized separately (`run_nerf.py:417`)
        self.fine_model = self.model
        if (cfg.no_tcnn and (cfg.netdepth_fine != cfg.netdepth
                             or cfg.netwidth_fine != cfg.netwidth)):
            self.fine_model = build_model(cfg, semantic=cfg.mvseg, fine=True)
        self.tcfg = train_config(cfg)
        self.tx = schedule.make_optimizer(cfg.lrate, cfg.lrate_decay,
                                          cfg.grad_clip,
                                          table_wd=cfg.table_wd)
        if mesh is not None:
            self.mesh = mesh
        elif cfg.mesh_shape > 0:
            self.mesh = mesh_lib.make_mesh(
                jax.devices()[:cfg.mesh_shape])
        else:
            self.mesh = (mesh_lib.make_mesh()
                         if jax.device_count() > 1 else None)

        if lpips_fn is None and cfg.lpips and self.scene.masks is not None:
            from spinnerf_tpu.models.lpips import load_lpips
            from spinnerf_tpu.train.lpips_patch import make_patch_lpips_fn
            lpips_fn = make_patch_lpips_fn(
                self.model, self.scene, self.i_train,
                lpips=load_lpips(), render=render_config(cfg, train=False),
                fine_model=self.fine_model,
                near=self.bank.near, far=self.bank.far, ndc=self.bank.ndc,
                lpips_render_factor=cfg.lpips_render_factor,
                patch_len_factor=cfg.patch_len_factor,
                batch_size=cfg.lpips_batch_size)
        frozen_raw_fn = None
        if cfg.alpha_model_path:
            # NeRF_RGB mode: density comes, gradient-free, from a frozen
            # pretrained model (`--alpha_model_path`)
            frozen_ckpt = checkpoints.CheckpointManager(cfg.alpha_model_path)
            _, frozen = frozen_ckpt.restore()
            if frozen is None:
                raise FileNotFoundError(
                    f"no checkpoint under {cfg.alpha_model_path}")
            fparams = frozen["params"]
            if self.mesh is not None:
                fparams = jax.device_put(fparams,
                                         mesh_lib.replicated(self.mesh))
            fkey = "fine" if "fine" in fparams else "coarse"

            def frozen_raw_fn(p, pts, vd):
                return self.model.apply(p, pts, vd)
            # params flow through jit as arguments (`make_train_step`'s
            # consts convention), not embedded constants
            frozen_raw_fn.consts = fparams[fkey]
        self.step_fn = make_train_step(self.model, self.tcfg, self.bank,
                                       self.tx, mesh=self.mesh,
                                       lpips_fn=lpips_fn,
                                       frozen_raw_fn=frozen_raw_fn,
                                       fine_model=self.fine_model)

        key = jax.random.PRNGKey(cfg.seed)
        self.key, k_init = jax.random.split(key)
        params = init_params(self.model, k_init,
                             n_importance=cfg.N_importance,
                             fine_model=self.fine_model)
        opt_state = self.tx.init(params)
        self.state = TrainState(params=params, opt_state=opt_state, step=0)

        # --- resume ---
        self.ckpt = checkpoints.CheckpointManager(
            self.exp_dir, save_interval=cfg.i_weights)
        if cfg.ft_path:
            # --ft_path: explicit weights override the exp dir's own
            # checkpoint scan (`run_nerf.py:1151-1157`)
            step, restored = checkpoints.restore_from_path(
                cfg.ft_path, like={"params": params, "opt_state": opt_state})
            if step is None:
                raise FileNotFoundError(
                    f"--ft_path {cfg.ft_path}: no checkpoint found")
        elif not cfg.no_reload:
            step, restored = self.ckpt.restore(
                like={"params": params, "opt_state": opt_state})
        else:
            step, restored = None, None
        if step is not None:
            if restored.get("opt_state") is None:
                restored["opt_state"] = opt_state  # params-only dump
            if self.mesh is not None:
                # restored arrays come back committed to one device;
                # replicate over the mesh so sharded step/render jits
                # accept them
                restored = jax.device_put(
                    restored, mesh_lib.replicated(self.mesh))
            self.state = TrainState(params=restored["params"],
                                    opt_state=restored["opt_state"],
                                    step=step)
            self.log(f"resumed from checkpoint at step {step}")

    # --- rendering helpers ---------------------------------------------------

    def field_fns(self):
        params = self.state.params

        def coarse(pts, vd):
            return self.model.apply(params["coarse"], pts, vd)
        if "fine" not in params:
            return coarse, coarse

        def fine(pts, vd):
            return self.fine_model.apply(params["fine"], pts, vd)
        return coarse, fine

    def _frame_renderer(self, render_factor: int, maps=None):
        """Persistent jitted frame renderer (params are jit args): repeated
        video/testset hooks render with fresh weights, zero recompiles.

        maps: per-pixel outputs to fetch (see `eval_render.LIGHT_MAPS`) —
        the per-sample weights/z/alpha maps cost ~100x a light map in HBM
        and host-link traffic, so hooks request only what they read."""
        maps = None if maps is None else tuple(maps)
        cache = getattr(self, "_frame_renderers", None)
        if cache is None:
            cache = self._frame_renderers = {}
        if (render_factor, maps) not in cache:
            cache[(render_factor, maps)] = \
                eval_render.make_param_frame_renderer(
                    self.scene.hwf, self.model.apply,
                    render_config(self.cfg, train=False), near=self.bank.near,
                    far=self.bank.far, ndc=self.bank.ndc, chunk=self.cfg.chunk,
                    render_factor=render_factor, mesh=self.mesh, maps=maps,
                    fine_apply_fn=(None if self.fine_model is self.model
                                   else self.fine_model.apply))
        return cache[(render_factor, maps)]

    def render_poses_list(self, poses, *, render_factor=None, save_dir=None,
                          gt_images=None, save_alpha=False):
        rf = self.cfg.render_factor if render_factor is None else render_factor
        renderer = self._frame_renderer(
            rf, maps=eval_render.maps_for_save(save_dir, save_alpha))
        params = self.state.params
        return eval_render.render_path(
            jax.random.PRNGKey(0), poses, self.scene.hwf, None,
            render_config(self.cfg, train=False), near=self.bank.near,
            far=self.bank.far, ndc=self.bank.ndc, chunk=self.cfg.chunk,
            render_factor=rf, save_dir=save_dir,
            gt_images=gt_images, save_alpha=save_alpha,
            frame_fn=lambda k, c2w: renderer(params, k, c2w))

    # --- cadence hooks -------------------------------------------------------

    def _video_hook(self, step):
        rgbs, disps = self.render_poses_list(self.scene.render_poses,
                                             render_factor=self.cfg.render_factor)
        vdir = self.exp_dir / f"video_{step:06d}"
        vdir.mkdir(exist_ok=True)
        eval_render.write_video(vdir / "rgb.mp4", rgbs)
        eval_render.write_video(
            vdir / "disp.mp4", eval_render.normalize_disps_for_video(disps))
        self.log(f"[{step}] wrote spiral videos to {vdir}")

    def _testset_hook(self, step):
        if len(self.i_test) == 0:
            return
        tdir = self.exp_dir / f"testset_{step:06d}"
        rgbs, _ = self.render_poses_list(
            self.scene.poses[self.i_test], save_dir=tdir,
            gt_images=self.scene.images[self.i_test])
        if self.cfg.render_factor:
            # downsampled renders can't be compared to full-res GT
            # (reference computes test PSNR only at render_factor==0,
            # `run_nerf.py:1692-1696`)
            self.log(f"[{step}] testset rendered at 1/"
                     f"{self.cfg.render_factor} (no PSNR)")
            return
        ps = [float(eval_metrics.psnr(jnp.asarray(r),
                                      jnp.asarray(self.scene.images[t])))
              for r, t in zip(rgbs, self.i_test)]
        self.log(f"[{step}] testset PSNR mean {np.mean(ps):.2f}")
        with open(tdir / "psnr.json", "w") as f:
            json.dump({"per_view": ps, "mean": float(np.mean(ps))}, f)

    def _prepare_hook(self, step, out_dir=None):
        """Render every pose's disparity + downsampled mask into the LaMa
        staging layout (`run_nerf.py:1599-1609`)."""
        out = Path(out_dir) if out_dir else self.exp_dir / "lama_input"
        (out / "label").mkdir(parents=True, exist_ok=True)
        _, disps = self.render_poses_list(self.scene.poses,
                                          render_factor=self.cfg.render_factor)
        rf = max(self.cfg.render_factor, 1)
        import cv2
        for i, d in enumerate(disps):
            cv2.imwrite(str(out / f"img{i:0>3}.png"),
                        np.clip(np.nan_to_num(d) * 255, 0, 255).astype(np.uint8))
            if self.scene.masks is not None:
                m = np.abs(self.scene.masks[i])[::rf, ::rf]
                cv2.imwrite(str(out / "label" / f"img{i:0>3}.png"),
                            (np.clip(m, 0, 1) * 255).astype(np.uint8))
        self.log(f"[{step}] wrote LaMa guidance inputs to {out}")
        return out

    def _sanity_panel_hook(self, step):
        """3-panel render/prior/disparity debug image (`run_nerf.py:1581-1597`),
        written under <expdir>/test_renders/."""
        from spinnerf_tpu.utils.visualization import sanity_panel
        import numpy as np
        idx = int(np.random.RandomState(step).choice(self.i_train))
        rgbs, disps = self.render_poses_list(self.scene.poses[idx:idx + 1])
        out = self.exp_dir / "test_renders"
        out.mkdir(exist_ok=True)
        prior = (self.scene.inpainted_depths[idx]
                 if self.scene.inpainted_depths is not None
                 else np.zeros(self.scene.images[idx].shape[:2]))
        sanity_panel(rgbs[0], prior, disps[0],
                     out / f"{self.cfg.expname}_{step:06d}.png")

    def _mvseg_panel_hook(self, step):
        """MVSeg every-i_img sanity image: rendered rgb next to the sigmoid
        objectness map of one train view (`MVSeg/DS_NeRF/run_nerf.py:
        1334-1360`), written under <expdir>/test_renders/."""
        import numpy as np
        idx = int(np.random.RandomState(step).choice(self.i_train))
        renderer = self._frame_renderer(self.cfg.render_factor)
        maps = renderer(self.state.params, jax.random.PRNGKey(step),
                        jnp.asarray(self.scene.poses[idx]))
        out = self.exp_dir / "test_renders"
        out.mkdir(exist_ok=True)
        rgb = np.clip(maps["rgb"], 0, 1)
        prob = 1.0 / (1.0 + np.exp(-maps.get("prob", np.zeros(rgb.shape[:2]))))
        panel = np.concatenate([rgb, np.repeat(prob[..., None], 3, -1)],
                               axis=1)
        from spinnerf_tpu.eval.metrics import to8b
        import imageio.v2 as imageio
        imageio.imwrite(out / f"{self.cfg.expname}_seg_{step:06d}.png",
                        to8b(panel))

    def _batches_per_step(self) -> int:
        """Ray batches the fused step actually renders (active groups plus
        the sparse-depth batch when enabled) — the rays/s denominator."""
        from spinnerf_tpu.train.step import _active_groups
        n = len(_active_groups(self.tcfg, self.bank))
        if (self.tcfg.depth_supervision and not self.tcfg.depth_with_rgb
                and self.bank.depth_group is not None
                and self.bank.depth_group.count > 0):
            n += 1
        return n

    # --- main loop -----------------------------------------------------------

    def fit(self, n_iters: int | None = None, *, hooks: bool = True):
        cfg = self.cfg
        n_iters = cfg.N_iters if n_iters is None else n_iters
        state = self.state
        t0 = time.time()
        rays_done = 0
        control = None
        if hooks:
            from spinnerf_tpu.utils.live_control import LiveControl
            control = LiveControl(cfg, log=self.log)
        for i in range(state.step + 1, n_iters + 1):
            self.key, k = jax.random.split(self.key)
            state.params, state.opt_state, metrics = self.step_fn(
                state.params, state.opt_state, k, i)
            state.step = i
            rays_done += self.tcfg.n_rand * self._batches_per_step()

            if hooks:
                if cfg.i_print and i % cfg.i_print == 0:
                    if control is not None:
                        control.poll()
                    m = {k_: float(v) for k_, v in metrics.items()}
                    dt = time.time() - t0
                    self.log(f"[{i}/{n_iters}] loss {m['loss']:.4f} "
                             f"psnr {m['psnr']:.2f} "
                             f"({rays_done / max(dt, 1e-9):.0f} rays/s)")
                self.ckpt.maybe_save(i, state.params, state.opt_state)
                if cfg.i_video and i % cfg.i_video == 0 and i > 0:
                    self._video_hook(i)
                if cfg.i_testset and i % cfg.i_testset == 0 and i > 0:
                    self._testset_hook(i)
                # prepare mode dumps the LaMa staging every i_feat like the
                # reference (`run_nerf.py:1563,1599` — each dump overwrites);
                # also force one at the final step so a schedule where
                # n_iters isn't a multiple of i_feat still stages guidance
                if cfg.prepare and cfg.i_feat and (
                        (i % cfg.i_feat == 0 and i > 0) or i == n_iters):
                    self._prepare_hook(i)
                elif (not cfg.prepare and cfg.i_feat > 10
                        and i % cfg.i_feat == 0 and i > 0):
                    self._sanity_panel_hook(i)
                if (cfg.mvseg and cfg.i_img and i % cfg.i_img == 0
                        and i > 0):
                    self._mvseg_panel_hook(i)
        self.state = state
        if hooks:
            self.ckpt.wait()   # drain async orbax writes before returning
        return state
