"""Generator/discriminator zoo tests (pix2pixHD + FFC variants)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

# integration-heavy module: full-suite lane only (fast lane: -m 'not slow')
pytestmark = pytest.mark.slow

from spinnerf_tpu.models import generators as G


def test_multidilated_conv_shapes(rng):
    m = G.MultidilatedConv(8, dilation_num=3)
    x = jnp.asarray(rng.rand(1, 16, 20, 4).astype(np.float32))
    vs = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(vs, x)
    assert y.shape == (1, 16, 20, 8)
    # three dilation branches exist
    assert set(vs["params"]) == {"dil0", "dil1", "dil2"}


def test_resnet_block_residual(rng):
    blk = G.ResnetBlock(6)
    x = jnp.asarray(rng.rand(1, 12, 12, 6).astype(np.float32))
    vs = blk.init(jax.random.PRNGKey(0), x)
    # zero the second conv: the block must reduce to the identity
    # (fresh BN stats are mean 0 / var 1, so bn2(0) == 0)
    vs = {"params": {**vs["params"],
                     "conv2": jax.tree.map(jnp.zeros_like,
                                           vs["params"]["conv2"])},
          "batch_stats": vs["batch_stats"]}
    y = blk.apply(vs, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


@pytest.mark.parametrize("kind,extra", [
    ("ffc_resnet", dict(ngf=4, n_blocks=1, n_downsampling=1, max_features=8,
                        ratio_g=0.5)),
    ("pix2pixhd_global", dict(ngf=4, n_blocks=1, n_downsampling=1,
                              max_features=8)),
    ("pix2pixhd_multidilated", dict(ngf=4, n_blocks=1, n_downsampling=1,
                                    max_features=8)),
])
def test_generator_factory_forward(kind, extra, rng):
    gen = G.make_generator(kind, **extra)
    x = jnp.asarray(rng.rand(1, 16, 16, 4).astype(np.float32))
    vs = jax.jit(gen.init)(jax.random.PRNGKey(0), x)
    y = jax.jit(gen.apply)(vs, x)
    assert y.shape == (1, 16, 16, 3)
    assert np.all(np.isfinite(np.asarray(y)))


def test_global_generator_out_act_range(rng):
    gen = G.GlobalGenerator(ngf=4, n_blocks=1, n_downsampling=1,
                            max_features=8, out_act="tanh")
    x = jnp.asarray(rng.rand(1, 8, 8, 4).astype(np.float32)) * 10
    vs = gen.init(jax.random.PRNGKey(0), x)
    y = np.asarray(gen.apply(vs, x))
    assert y.min() >= -1.0 and y.max() <= 1.0


@pytest.mark.parametrize("kind,extra,n_feats", [
    ("pix2pixhd_nlayer", dict(ndf=4, n_layers=3), 4),
    ("pix2pixhd_nlayer_multidilated", dict(ndf=4, n_layers=3), 4),
    ("ffc_nlayer", dict(ndf=4, n_layers=3, ratio_g=0.5), 4),
])
def test_discriminator_factory_forward(kind, extra, n_feats, rng):
    disc = G.make_discriminator(kind, **extra)
    x = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32))
    vs = jax.jit(lambda k: disc.init(k, x))(jax.random.PRNGKey(0))
    logits, feats = disc.apply(vs, x)
    assert logits.shape[0] == 2 and logits.shape[-1] == 1
    assert logits.shape[1] < 32  # patch logits are downsampled
    assert len(feats) == n_feats
    assert np.all(np.isfinite(np.asarray(logits)))


def test_factories_reject_unknown():
    with pytest.raises(ValueError):
        G.make_generator("nope")
    with pytest.raises(ValueError):
        G.make_discriminator("nope")


def test_ffc_discriminator_trains_with_lama_step(rng):
    """The FFC discriminator slots into the adversarial train step."""
    from spinnerf_tpu.models.lama import FFCResNetGenerator
    from spinnerf_tpu.train.lama_trainer import make_lama_train_step
    gen = FFCResNetGenerator(ngf=4, n_blocks=1, n_downsampling=1,
                             max_features=8, ratio_g=0.5)
    disc = G.FFCNLayerDiscriminator(ndf=4, n_layers=2, ratio_g=0.5)
    init_fn, step_fn = make_lama_train_step(gen, disc)
    state = init_fn(jax.random.PRNGKey(0), (2, 16, 16, 3))
    imgs = jnp.asarray(rng.rand(2, 16, 16, 3).astype(np.float32))
    masks = jnp.zeros((2, 16, 16, 1)).at[:, 4:12, 4:12].set(1.0)
    state, m = step_fn(state, imgs, masks, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["g_total"]))
    assert np.isfinite(float(m["d_total"]))
