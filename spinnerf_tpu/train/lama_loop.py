"""Host-side training loop for the 2D inpainter.

Parity: `lama/bin/train.py` + the Lightning Trainer wiring
(`saicinpainting/training/trainers/base.py`): iterate image batches with
on-the-fly mask synthesis, run the fused G+D step
(`train.lama_trainer.make_lama_train_step`), periodically write visualizer
grids (`training/visualizers/directory.py`), checkpoint (orbax; monitors the
`ssim_fid100_f1` integral metric like the reference's ModelCheckpoint,
trainer yaml:25-31), validate with the `InpaintingEvaluator`, and append a
metrics JSONL (the TensorBoardLogger equivalent that
`pipeline.lama_tools.report_from_logs` consumes).

TPU redesign: no Lightning, no DDP subprocesses — multi-chip is the `mesh`
argument (GSPMD shards the batch axis; the psum is XLA's).
"""
from __future__ import annotations

import json
import time
from pathlib import Path

import jax
import numpy as np

from spinnerf_tpu.data.lama_masks import MixedMaskGenerator
from spinnerf_tpu.models.discriminator import NLayerDiscriminator
from spinnerf_tpu.models.lama import FFCResNetGenerator
from spinnerf_tpu.train.lama_trainer import make_batch, make_lama_train_step


def load_image_dir(indir, *, max_images=None):
    """Load training images ([H, W, 3] float lists) from a directory tree,
    or from tar shards when `indir` contains `*.tar` (the webdataset-style
    feed — see `data.shards`)."""
    import cv2
    indir = Path(indir)
    shard_paths = (sorted(indir.glob("*.tar")) if indir.is_dir()
                   else ([indir] if indir.suffix == ".tar" else []))
    if shard_paths:
        from spinnerf_tpu.data import shards
        it = shards.iter_shard_images(shard_paths, shuffle_buffer=64)
        images = []
        for img in it:
            images.append(img)
            if max_images and len(images) >= max_images:
                break
        if not images:
            raise FileNotFoundError(f"no images in shards under {indir}")
        return images
    paths = sorted(p for p in Path(indir).rglob("*")
                   if p.suffix.lower() in (".png", ".jpg", ".jpeg")
                   and "_mask" not in p.stem)
    if max_images:
        paths = paths[:max_images]
    images = []
    for p in paths:
        img = cv2.imread(str(p))
        if img is None:
            continue
        images.append(cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
                      .astype(np.float32) / 255.0)
    if not images:
        raise FileNotFoundError(f"no images under {indir}")
    return images


def visualize_batch(images, masks, preds, out_path, *, max_items: int = 8):
    """One grid PNG per call: rows = samples, cols = [image | masked | pred |
    blended] (parity: `training/visualizers/directory.py` +
    `visualize_mask_and_images`)."""
    import cv2
    rows = []
    for i in range(min(len(images), max_items)):
        img, m, pred = images[i], masks[i], preds[i]
        masked = img * (1.0 - m)
        blended = pred * m + img * (1.0 - m)
        rows.append(np.concatenate([img, masked, pred, blended], axis=1))
    grid = np.clip(np.concatenate(rows, axis=0), 0, 1)
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    cv2.imwrite(str(out_path), cv2.cvtColor(
        (grid * 255).astype(np.uint8), cv2.COLOR_RGB2BGR))
    return out_path


def make_perceptual_fn(kind: str, *, weights_path=None):
    """Perceptual-loss factory for inpainter training: `resnet_pl` (the
    big-lama default — ADE20k dilated-ResNet features,
    `losses/perceptual.py:88-113`), `vgg` (plain VGG feature MSE), or
    `none`."""
    if kind == "none" or kind is None:
        return None
    if kind == "resnet_pl":
        from spinnerf_tpu.models.segmentation import make_resnet_pl
        loss_fn, _ = make_resnet_pl(weights_path=weights_path)
        return loss_fn
    if kind == "vgg":
        import jax.numpy as jnp
        from spinnerf_tpu.models.lpips import VGG16Features
        net = VGG16Features()
        params = jax.jit(net.init)(jax.random.PRNGKey(0),
                                   jnp.zeros((1, 32, 32, 3)))

        def loss_fn(pred, target):
            fp = net.apply(params, pred)
            ft = net.apply(params, jax.lax.stop_gradient(target))
            total = 0.0
            for a, b in zip(fp, ft):
                total = total + ((a - jax.lax.stop_gradient(b)) ** 2).mean()
            return total
        return loss_fn
    raise ValueError(f"unknown perceptual kind {kind}")


def train_inpainter(indir, exp_dir, *, n_steps: int = 1000,
                    batch_size: int = 8, crop: int = 256,
                    val_dir=None, gen_kwargs=None, disc_kwargs=None,
                    i_print: int = 50, i_vis: int = 250, i_ckpt: int = 500,
                    i_val: int = 0, seed: int = 0, mesh=None,
                    max_images=None, perceptual: str = "none",
                    perceptual_weights=None, log=print):
    """Train the FFC inpainter on an image directory. Returns final state.

    Writes `<exp_dir>/metrics.jsonl`, visualizer grids under
    `<exp_dir>/visualizations/`, and orbax checkpoints of
    {generator, discriminator, EMA} state.
    """
    from spinnerf_tpu.train.checkpoints import CheckpointManager

    exp_dir = Path(exp_dir)
    exp_dir.mkdir(parents=True, exist_ok=True)
    images = load_image_dir(indir, max_images=max_images)
    log(f"{len(images)} training images from {indir}")

    gen = FFCResNetGenerator(**(gen_kwargs or {}))
    disc = NLayerDiscriminator(**(disc_kwargs or {}))
    init_fn, step_fn = make_lama_train_step(
        gen, disc, mesh=mesh,
        perceptual_fn=make_perceptual_fn(perceptual,
                                         weights_path=perceptual_weights))
    key = jax.random.PRNGKey(seed)
    state = init_fn(key, image_shape=(batch_size, crop, crop, 3))

    ckpt = CheckpointManager(exp_dir, save_interval=i_ckpt)
    latest = ckpt.latest_step()
    if latest is not None:
        _, restored = ckpt.restore(
            latest, like={"params": state._asdict(), "opt_state": 0})
        state = type(state)(**restored["params"])
        log(f"resumed inpainter training from step {latest}")

    mask_gen = MixedMaskGenerator()
    rng = np.random.RandomState(seed)
    metrics_path = exp_dir / "metrics.jsonl"
    mfile = open(metrics_path, "a")
    # hoisted: a fresh jax.jit(gen.apply) per i_vis hit recompiles the
    # generator graph every visualization
    ema_apply = jax.jit(gen.apply)

    start = int(state.step)
    t_print = time.time()
    steps_since_print = 0
    for i in range(start, n_steps):
        idx = rng.choice(len(images), batch_size)
        crops, masks = make_batch([images[j] for j in idx], mask_gen, rng,
                                  crop=crop)
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, crops, masks, sub)
        steps_since_print += 1

        if i_print and (i % i_print == 0 or i == n_steps - 1):
            m = {k: float(v) for k, v in metrics.items()}
            dt = time.time() - t_print
            t_print = time.time()
            rate = batch_size * steps_since_print / dt
            steps_since_print = 0
            mfile.write(json.dumps({"step": i, **m}) + "\n")
            mfile.flush()
            log(f"[{i}/{n_steps}] g_total {m['g_total']:.4f} "
                f"d_total {m['d_total']:.4f} g_l1 {m['g_l1']:.4f} "
                f"({rate:.1f} img/s)")
        if i_vis and i % i_vis == 0:
            import jax.numpy as jnp
            masked = crops * (1.0 - masks)
            inp = jnp.asarray(np.concatenate([masked, masks], -1))
            preds = np.asarray(ema_apply(
                {"params": state.ema_params,
                 "batch_stats": state.gen_vars["batch_stats"]}, inp))
            visualize_batch(crops, masks, preds,
                            exp_dir / "visualizations" / f"step_{i:06d}.png")
        ckpt.maybe_save(i, state._asdict(), 0, force=(i == n_steps - 1))
        if i_val and val_dir and i and i % i_val == 0:
            res = validate_inpainter(gen, state, val_dir)
            mfile.write(json.dumps(
                {"step": i, "val": res["total"]}) + "\n")
            mfile.flush()
    ckpt.wait()
    mfile.close()
    return state


def validate_inpainter(gen, state, val_dir) -> dict:
    """Score the EMA generator on a LaMa eval-layout directory with the
    binned `InpaintingEvaluator` (the reference's validation_epoch_end)."""
    from spinnerf_tpu.eval.inpainting import InpaintingEvaluator
    from spinnerf_tpu.pipeline.inpaint2d import predict
    from spinnerf_tpu.pipeline.lama_tools import (_imread_mask, _imread_rgb,
                                                  load_eval_pairs)
    variables = {"params": state.ema_params,
                 "batch_stats": state.gen_vars["batch_stats"]}
    ev = InpaintingEvaluator()
    for ip, mp in load_eval_pairs(val_dir):
        img = _imread_rgb(ip)
        mask = _imread_mask(mp)
        pred = predict(gen, variables, img, mask)
        ev.add(pred * mask[..., None] + img * (1 - mask[..., None]),
               img, mask)
    return ev.evaluation_end()
