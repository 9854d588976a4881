"""LaMa adversarial-training tests (tiny nets, CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spinnerf_tpu.data.lama_masks import (MixedMaskGenerator, dumb_area_mask,
                                          irregular_mask, outpainting_mask,
                                          rectangle_mask)
from spinnerf_tpu.models.discriminator import NLayerDiscriminator
from spinnerf_tpu.models.lama import FFCResNetGenerator
from spinnerf_tpu.train import lama_losses as L
from spinnerf_tpu.train.lama_trainer import make_batch, make_lama_train_step


def test_mask_generators(rng):
    for gen in (irregular_mask, rectangle_mask, outpainting_mask,
                dumb_area_mask):
        m = gen(64, 80, rng)
        assert m.shape == (64, 80)
        assert set(np.unique(m)).issubset({0.0, 1.0})
    mixed = MixedMaskGenerator()
    fracs = [mixed(64, 64, rng).mean() for _ in range(20)]
    assert max(fracs) > 0.01  # produces nonempty masks


def test_masked_l1_weights(rng):
    pred = jnp.zeros((1, 8, 8, 3))
    tgt = jnp.ones((1, 8, 8, 3))
    mask = jnp.zeros((1, 8, 8, 1)).at[:, :4].set(1.0)
    # only known region contributes with weight 10
    got = float(L.masked_l1(pred, tgt, mask, weight_known=10, weight_missing=0))
    np.testing.assert_allclose(got, 10 * 0.5, atol=1e-6)


def test_adversarial_losses_directions(rng):
    good = jnp.full((1, 4, 4, 1), 5.0)    # D confident real
    bad = jnp.full((1, 4, 4, 1), -5.0)
    mask = jnp.zeros((1, 16, 16, 1))
    # generator wants fake logits high
    assert float(L.generator_adversarial_loss(bad)) > \
        float(L.generator_adversarial_loss(good))
    # discriminator wants real high, fake low
    d_good = float(L.discriminator_adversarial_loss(good, bad, mask))
    d_bad = float(L.discriminator_adversarial_loss(bad, good, mask))
    assert d_good < d_bad


def test_discriminator_shapes(rng):
    disc = NLayerDiscriminator(ndf=8, n_layers=3)
    x = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    vs = disc.init(jax.random.PRNGKey(0), x)
    logits, feats = disc.apply(vs, x)
    assert logits.shape[0] == 2 and logits.shape[-1] == 1
    assert len(feats) == 4


@pytest.mark.slow
def test_lama_train_step_improves_l1(rng):
    gen = FFCResNetGenerator(ngf=8, n_blocks=1, max_features=32)
    disc = NLayerDiscriminator(ndf=8, n_layers=2)
    init_fn, step_fn = make_lama_train_step(gen, disc, gen_lr=2e-3)
    state = init_fn(jax.random.PRNGKey(0), (2, 32, 32, 3))

    # constant-color images: trivially learnable
    imgs = np.ones((2, 32, 32, 3), np.float32) * \
        np.array([0.2, 0.5, 0.8], np.float32)
    masks = np.zeros((2, 32, 32, 1), np.float32)
    masks[:, 8:24, 8:24] = 1.0
    imgs_j, masks_j = jnp.asarray(imgs), jnp.asarray(masks)

    first = None
    for i in range(30):
        state, m = step_fn(state, imgs_j, masks_j, jax.random.PRNGKey(i))
        if first is None:
            first = float(m["g_l1"])
    assert np.isfinite(float(m["g_total"]))
    assert float(m["g_l1"]) < first
    assert state.step == 30
    # EMA params differ from live params but share structure
    diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                        state.ema_params, state.gen_vars["params"])
    assert max(jax.tree.leaves(diff)) > 0


def test_make_batch(rng):
    imgs = [rng.rand(40, 50, 3).astype(np.float32) for _ in range(3)]
    crops, masks = make_batch(imgs, MixedMaskGenerator(), rng, crop=32)
    assert crops.shape == (3, 32, 32, 3)
    assert masks.shape == (3, 32, 32, 1)
