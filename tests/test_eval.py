"""Metric tests: PSNR/SSIM conventions, mask IoU."""
import numpy as np
import jax.numpy as jnp

from spinnerf_tpu.eval import metrics


def test_psnr_known_values(rng):
    a = jnp.zeros((16, 16, 3))
    b = jnp.full((16, 16, 3), 0.1)
    np.testing.assert_allclose(float(metrics.psnr(a, b)), 20.0, atol=1e-4)
    assert float(metrics.psnr(a, a)) > 80


def test_psnr_masked(rng):
    a = np.zeros((8, 8, 3), np.float32)
    b = a.copy()
    b[:4] += 0.5            # error only in the top half
    mask_top = np.zeros((8, 8), np.float32)
    mask_top[:4] = 1
    mask_bot = 1 - mask_top
    p_top = float(metrics.psnr(jnp.asarray(a), jnp.asarray(b),
                               jnp.asarray(mask_top)))
    p_bot = float(metrics.psnr(jnp.asarray(a), jnp.asarray(b),
                               jnp.asarray(mask_bot)))
    np.testing.assert_allclose(p_top, -20 * np.log10(0.5), atol=1e-3)
    assert p_bot > 80


def test_ssim_identity_and_noise(rng):
    img = rng.rand(32, 32, 3).astype(np.float32)
    assert float(metrics.ssim(jnp.asarray(img), jnp.asarray(img))) > 0.999
    noisy = np.clip(img + rng.randn(32, 32, 3) * 0.3, 0, 1).astype(np.float32)
    s = float(metrics.ssim(jnp.asarray(img), jnp.asarray(noisy)))
    assert 0.0 < s < 0.9


def test_ssim_against_skimage_if_available(rng):
    try:
        from skimage.metrics import structural_similarity as sk_ssim
    except ImportError:
        import pytest
        pytest.skip("skimage not available")
    img = rng.rand(48, 48).astype(np.float32)
    noisy = np.clip(img + rng.randn(48, 48) * 0.1, 0, 1).astype(np.float32)
    ours = float(metrics.ssim(jnp.asarray(img), jnp.asarray(noisy)))
    ref = sk_ssim(img, noisy, gaussian_weights=True, sigma=1.5,
                  use_sample_covariance=False, data_range=1.0)
    np.testing.assert_allclose(ours, ref, atol=0.02)


def test_mask_metrics(rng):
    gt = np.zeros((10, 10))
    gt[2:6, 2:6] = 1
    pred = np.zeros((10, 10))
    pred[2:6, 2:8] = 1
    m = metrics.mask_metrics(jnp.asarray(pred), jnp.asarray(gt))
    inter, union = 16, 24
    np.testing.assert_allclose(float(m["iou"]), inter / union, atol=1e-6)
    np.testing.assert_allclose(float(m["accuracy"]), 92 / 100, atol=1e-6)


def test_to8b_nan_safe():
    x = np.array([[np.nan, 0.5], [2.0, -1.0]])
    out = metrics.to8b(x)
    assert out.dtype == np.uint8
    assert out[0, 0] == 0 and out[0, 1] == 127
    assert out[1, 0] == 255 and out[1, 1] == 0


def test_sharded_frame_render_matches_single_device(rng):
    """Pixel-sharded frame rendering over the 8-device mesh must reproduce
    the single-device render (SURVEY §2.6: eval/render sharding)."""
    import jax
    import jax.numpy as jnp
    from spinnerf_tpu.core.rendering import RenderConfig
    from spinnerf_tpu.data import synthetic
    from spinnerf_tpu.eval import render as eval_render
    from spinnerf_tpu.models.fields import NeRFField
    from spinnerf_tpu.parallel import mesh as mesh_lib

    model = NeRFField(depth=2, width=32, multires=4, multires_views=2,
                      compute_dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 3)),
                        jnp.zeros((1, 3)))

    def field(pts, vd):
        return model.apply(params, pts, vd)

    cfg = RenderConfig(n_samples=8, n_importance=8, perturb=False,
                       raw_noise_std=0.0)
    c2w = jnp.asarray(synthetic.look_at_pose(
        np.array([3.0, 1.0, 1.5]))[:3, :4])
    kwargs = dict(near=1.0, far=7.0, chunk=1024)
    single = eval_render.make_frame_renderer((16, 24, 20.0), field, cfg,
                                             **kwargs)
    sharded = eval_render.make_frame_renderer((16, 24, 20.0), field, cfg,
                                              mesh=mesh_lib.make_mesh(),
                                              **kwargs)
    k = jax.random.PRNGKey(3)
    a = single(k, c2w)
    b = sharded(k, c2w)
    np.testing.assert_allclose(a["rgb"], b["rgb"], atol=1e-5)
    np.testing.assert_allclose(a["depth"], b["depth"], atol=1e-4)


def test_frame_renderer_maps_contract(rng):
    """The round-4 maps API (`eval/render.py`): a default renderer returns
    only the light per-pixel maps (the heavy [H,W,S] stacks are DCE'd inside
    the jit), requested heavy maps come back at full per-sample shape, and
    asking for a map the field doesn't produce raises up front."""
    import jax
    import jax.numpy as jnp
    import pytest
    from spinnerf_tpu.core.rendering import RenderConfig
    from spinnerf_tpu.data import synthetic
    from spinnerf_tpu.eval import render as eval_render
    from spinnerf_tpu.models.fields import NeRFField

    model = NeRFField(depth=2, width=32, multires=4, multires_views=2,
                      compute_dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 3)),
                        jnp.zeros((1, 3)))

    def field(pts, vd):
        return model.apply(params, pts, vd)

    cfg = RenderConfig(n_samples=8, n_importance=8, perturb=False,
                       raw_noise_std=0.0)
    h, w, s = 12, 16, 16          # fine pass sees n_samples + n_importance
    c2w = jnp.asarray(synthetic.look_at_pose(
        np.array([3.0, 1.0, 1.5]))[:3, :4])
    kwargs = dict(near=1.0, far=7.0, chunk=512)
    k = jax.random.PRNGKey(1)

    default = eval_render.make_frame_renderer((h, w, 20.0), field, cfg,
                                              **kwargs)(k, c2w)
    assert set(default) == set(eval_render.LIGHT_MAPS)
    assert default["rgb"].shape == (h, w, 3)
    assert default["disp"].shape == (h, w)

    heavy = eval_render.make_frame_renderer(
        (h, w, 20.0), field, cfg,
        maps=("rgb",) + eval_render.HEAVY_MAPS, **kwargs)(k, c2w)
    assert heavy["weights"].shape == (h, w, s)
    assert heavy["z_vals"].shape == (h, w, s)
    assert heavy["alpha"].shape == (h, w, s)
    # weights are the compositing measure: nonnegative, sum <= 1 per pixel
    assert float(heavy["weights"].min()) >= 0.0
    assert float(heavy["weights"].sum(-1).max()) <= 1.0 + 1e-4

    # prob is a semantic-head output; without cfg.semantic the renderer must
    # refuse at build/trace time, not KeyError downstream
    with pytest.raises(ValueError, match="prob"):
        eval_render.make_frame_renderer((h, w, 20.0), field, cfg,
                                        maps=("rgb", "prob"), **kwargs)(k, c2w)


def test_maps_for_save_contract():
    """`maps_for_save` is the single source of truth shared by render_path
    and Trainer.render_poses_list for the artifact-tree dump set
    (`run_nerf.py:231-295`)."""
    from spinnerf_tpu.eval.render import maps_for_save
    assert maps_for_save(None) == ("rgb", "disp")
    assert maps_for_save("/tmp/x") == ("rgb", "disp", "depth", "weights",
                                       "z_vals")
    assert maps_for_save("/tmp/x", save_alpha=True)[-1] == "alpha"
    assert maps_for_save(None, save_alpha=True) == ("rgb", "disp", "alpha")
