"""Adversarial trainer for the 2D inpainter (LaMa training, TPU-native).

Parity: `DefaultInpaintingTrainingModule` + Lightning DDP
(`lama/saicinpainting/training/trainers/{base,default}.py`): alternating
generator/discriminator Adam steps (1e-3 / 1e-4,
`configs/training/optimizers/default_optimizers.yaml`), generator EMA
(decay 0.999, `base.py:34-40,92-97`), the big-lama loss stack
(`train.lama_losses`), and on-the-fly mask synthesis (`data.lama_masks`).

TPU redesign: both optimizer phases run inside ONE jitted step (no Lightning,
no optimizer_idx alternation across host calls); batches shard over the data
mesh axis like the NeRF step — the NCCL-DDP equivalent is the GSPMD psum.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from spinnerf_tpu.data.lama_masks import MixedMaskGenerator
from spinnerf_tpu.models.discriminator import NLayerDiscriminator
from spinnerf_tpu.models.lama import FFCResNetGenerator
from spinnerf_tpu.parallel import mesh as mesh_lib
from spinnerf_tpu.train.lama_losses import (LamaLossWeights,
                                            discriminator_adversarial_loss,
                                            feature_matching_loss,
                                            generator_adversarial_loss,
                                            masked_l1, perceptual_loss,
                                            r1_gradient_penalty)


class LamaTrainState(NamedTuple):
    gen_vars: Any          # {"params", "batch_stats"}
    disc_vars: Any
    ema_params: Any        # EMA of generator params
    gen_opt: Any
    disc_opt: Any
    step: int


def make_lama_train_step(gen: FFCResNetGenerator, disc: NLayerDiscriminator,
                         *, weights: LamaLossWeights = LamaLossWeights(),
                         gen_lr: float = 1e-3, disc_lr: float = 1e-4,
                         ema_decay: float = 0.999, grad_clip: float = 1.0,
                         mesh=None, perceptual_fn=None):
    """Build (init_fn, step_fn) for adversarial inpainter training.

    step_fn(state, images [N,H,W,3], masks [N,H,W,1], key)
      -> (state, metrics). Both G and D update in the same compiled step.
    """
    gen_tx = optax.chain(optax.clip_by_global_norm(grad_clip),
                         optax.adam(gen_lr))
    disc_tx = optax.chain(optax.clip_by_global_norm(grad_clip),
                          optax.adam(disc_lr))

    def init_fn(key, image_shape=(1, 256, 256, 3)):
        k1, k2 = jax.random.split(key)
        x = jnp.zeros(image_shape[:3] + (4,))
        # jit the inits: the axon TPU backend rejects some ops dispatched
        # eagerly that compile fine inside a jitted graph
        gen_vars = jax.jit(lambda k: gen.init(k, x, train=True))(k1)
        disc_vars = jax.jit(
            lambda k: disc.init(k, jnp.zeros(image_shape), train=True))(k2)
        return LamaTrainState(
            gen_vars=gen_vars, disc_vars=disc_vars,
            # distinct buffers: the state is donated, and donating aliased
            # buffers twice is an error
            ema_params=jax.tree.map(jnp.copy, gen_vars["params"]),
            gen_opt=gen_tx.init(gen_vars["params"]),
            disc_opt=disc_tx.init(disc_vars["params"]),
            step=0)

    def forward_gen(gen_vars, images, masks, train):
        masked = images * (1.0 - masks)
        inp = jnp.concatenate([masked, masks], axis=-1)
        if train:
            pred, new_state = gen.apply(gen_vars, inp, train=True,
                                        mutable=["batch_stats"])
        else:
            pred, new_state = gen.apply(gen_vars, inp), {}
        blended = pred * masks + images * (1.0 - masks)
        return pred, blended, new_state

    def apply_disc(variables, x, train=False):
        if train:
            return disc.apply(variables, x, train=True,
                              mutable=["batch_stats"])
        return disc.apply(variables, x), {}

    def step_fn(state: LamaTrainState, images, masks, key):
        if mesh is not None:
            images = mesh_lib.shard_batch(images, mesh)
            masks = mesh_lib.shard_batch(masks, mesh)

        # ---- generator phase ----
        def gen_loss_fn(gen_params):
            gv = {"params": gen_params,
                  "batch_stats": state.gen_vars["batch_stats"]}
            # D, feature matching, and the perceptual loss all see the RAW
            # generator output (`trainers/default.py:96,120` uses
            # image_to_discriminator='predicted_image') — the blended
            # composite equals the real image outside the hole, which would
            # starve those losses of known-region signal
            pred, blended, new_gs = forward_gen(gv, images, masks, True)
            (fake_logits, fake_feats), _ = apply_disc(state.disc_vars, pred)
            (real_logits, real_feats), _ = apply_disc(state.disc_vars, images)

            l1 = masked_l1(pred, images, masks,
                           weight_known=weights.l1_known,
                           weight_missing=weights.l1_missing)
            adv = generator_adversarial_loss(fake_logits, masks)
            fm = feature_matching_loss(fake_feats, real_feats)
            loss = l1 + weights.adversarial * adv + \
                weights.feature_matching * fm
            metrics = {"g_l1": l1, "g_adv": adv, "g_fm": fm}
            if perceptual_fn is not None and weights.perceptual > 0:
                pl_ = perceptual_fn(pred, images)
                loss = loss + weights.perceptual * pl_
                metrics["g_perceptual"] = pl_
            metrics["g_total"] = loss
            return loss, (metrics, new_gs)

        (g_loss, (g_metrics, new_gs)), g_grads = jax.value_and_grad(
            gen_loss_fn, has_aux=True)(state.gen_vars["params"])
        g_updates, gen_opt = gen_tx.update(g_grads, state.gen_opt,
                                           state.gen_vars["params"])
        gen_params = optax.apply_updates(state.gen_vars["params"], g_updates)
        gen_vars = {"params": gen_params,
                    "batch_stats": new_gs.get(
                        "batch_stats", state.gen_vars["batch_stats"])}
        ema = jax.tree.map(lambda e, p: ema_decay * e + (1 - ema_decay) * p,
                           state.ema_params, gen_params)

        # ---- discriminator phase ----
        pred, _, _ = forward_gen(gen_vars, images, masks, False)
        fake_input = jax.lax.stop_gradient(pred)

        def disc_loss_fn(disc_params):
            dv = {"params": disc_params,
                  "batch_stats": state.disc_vars["batch_stats"]}
            (real_logits, _), new_ds = apply_disc(dv, images, True)
            (fake_logits, _), _ = apply_disc(
                {"params": disc_params,
                 "batch_stats": new_ds.get("batch_stats",
                                           state.disc_vars["batch_stats"])},
                fake_input)
            adv = discriminator_adversarial_loss(real_logits, fake_logits,
                                                 masks)
            gp = r1_gradient_penalty(
                lambda p, x: disc.apply(
                    {"params": p,
                     "batch_stats": state.disc_vars["batch_stats"]}, x),
                disc_params, images)
            loss = adv + weights.gp_coef * gp
            return loss, ({"d_adv": adv, "d_gp": gp, "d_total": loss}, new_ds)

        (d_loss, (d_metrics, new_ds)), d_grads = jax.value_and_grad(
            disc_loss_fn, has_aux=True)(state.disc_vars["params"])
        d_updates, disc_opt = disc_tx.update(d_grads, state.disc_opt,
                                             state.disc_vars["params"])
        disc_params = optax.apply_updates(state.disc_vars["params"], d_updates)
        disc_vars = {"params": disc_params,
                     "batch_stats": new_ds.get(
                         "batch_stats", state.disc_vars["batch_stats"])}

        metrics = {**g_metrics, **d_metrics}
        return LamaTrainState(gen_vars=gen_vars, disc_vars=disc_vars,
                              ema_params=ema, gen_opt=gen_opt,
                              disc_opt=disc_opt, step=state.step + 1), metrics

    return init_fn, jax.jit(step_fn, donate_argnums=(0,))


def make_batch(images, mask_gen: MixedMaskGenerator, rng, crop: int = 256):
    """Host-side batch assembly: random crops + synthesized masks.

    Args: images: list/array of [H, W, 3] float images.
    Returns (crops [N,c,c,3], masks [N,c,c,1]).
    """
    crops, masks = [], []
    for img in images:
        h, w = img.shape[:2]
        # +1: randint's upper bound is exclusive — h - crop is a valid origin
        y = rng.randint(0, max(h - crop + 1, 1))
        x = rng.randint(0, max(w - crop + 1, 1))
        patch = img[y:y + crop, x:x + crop]
        if patch.shape[:2] != (crop, crop):
            patch = np.pad(patch, ((0, crop - patch.shape[0]),
                                   (0, crop - patch.shape[1]), (0, 0)),
                           mode="reflect")
        crops.append(patch)
        masks.append(mask_gen(crop, crop, rng)[..., None])
    return np.stack(crops), np.stack(masks)
