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
    hole = jnp.ones((1, 16, 16, 1))
    # generator wants fake logits high
    assert float(L.generator_adversarial_loss(bad)) > \
        float(L.generator_adversarial_loss(good))
    # discriminator wants real high everywhere, fake low INSIDE the hole
    d_good = float(L.discriminator_adversarial_loss(good, bad, hole))
    d_bad = float(L.discriminator_adversarial_loss(bad, good, hole))
    assert d_good < d_bad
    # mask-as-fake-target (`adversarial.py:131-138`): OUTSIDE the hole the
    # generator output is pixel-plausible, so D should call it real there
    no_hole = jnp.zeros((1, 16, 16, 1))
    assert float(L.discriminator_adversarial_loss(good, good, no_hole)) < \
        float(L.discriminator_adversarial_loss(good, bad, no_hole))


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


def test_new_mask_generators(rng):
    from spinnerf_tpu.data.lama_masks import (LinearRamp, RampedGenerator,
                                              SegmentationMaskGenerator,
                                              squares_mask, superres_mask)
    m = superres_mask(64, 80, rng)
    assert m.shape == (64, 80) and set(np.unique(m)) == {0.0, 1.0}
    # periodic stripes cover both axes: every row and every column hit
    assert (m.sum(0) > 0).mean() > 0.2 and (m.sum(1) > 0).mean() > 0.2
    m = squares_mask(64, 64, rng, max_times=5)
    assert m.shape == (64, 64)
    m = irregular_mask(64, 64, rng, draw_method="circle")
    assert m.shape == (64, 64)

    ramp = LinearRamp(start_value=0.0, end_value=1.0, start_iter=0,
                      end_iter=100)
    assert ramp(-5) == 0.0 and ramp(100) == 1.0 and ramp(50) == 0.5
    ramped = RampedGenerator(rectangle_mask, ramp,
                             {"max_times": 10, "bbox_max_size": 90})
    early = [ramped(64, 64, rng, iter_i=5).mean() for _ in range(10)]
    late = [ramped(64, 64, rng, iter_i=100).mean() for _ in range(10)]
    assert np.mean(late) > np.mean(early)  # difficulty ramps up

    def segment_fn(image):
        lab = np.zeros(image.shape[:2], np.int32)
        lab[10:30, 10:30] = 3
        return lab

    seg = SegmentationMaskGenerator(segment_fn)
    img = np.zeros((64, 64, 3), np.float32)
    m = seg(64, 64, rng, image=img)
    assert m[15, 15] == 1.0 and m[50, 50] == 0.0 and m.sum() == 400
    # no image -> rectangle fallback
    assert seg(64, 64, rng).shape == (64, 64)
    # mixed generator routes image= only to generators accepting it
    mixed = MixedMaskGenerator(((seg, 1.0), (superres_mask, 1.0)))
    for _ in range(5):
        assert mixed(64, 64, rng, iter_i=3, image=img).shape == (64, 64)


def test_tar_shard_stream(rng, tmp_path):
    import cv2
    from spinnerf_tpu.data import shards
    src = tmp_path / "imgs"
    src.mkdir()
    for i in range(7):
        img = (rng.rand(32, 40, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(src / f"im_{i}.png"), img)
    out = shards.write_tar_shards(src, tmp_path / "shards", shard_size=3)
    assert len(out) == 3  # 3+3+1
    imgs = list(shards.iter_shard_images(tmp_path / "shards",
                                         rng=np.random.RandomState(0)))
    assert len(imgs) == 7
    assert all(im.shape == (32, 40, 3) and im.dtype == np.float32
               for im in imgs)
    # shuffle-buffer + loop mode streams endlessly
    it = shards.iter_shard_images(out, rng=np.random.RandomState(1),
                                  shuffle_buffer=4, loop=True)
    got = [next(it) for _ in range(20)]
    assert len(got) == 20
    # the trainer's loader accepts a shard directory
    from spinnerf_tpu.train.lama_loop import load_image_dir
    pool = load_image_dir(tmp_path / "shards", max_images=5)
    assert len(pool) == 5
