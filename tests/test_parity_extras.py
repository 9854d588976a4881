"""Parity extras: no_batching sampler, correspondences, checkpoint stripping,
frozen-sigma (alpha_model_path) training mode."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spinnerf_tpu.config import Config
from spinnerf_tpu.data import llff, raybank, synthetic
from spinnerf_tpu.train import checkpoints
from spinnerf_tpu.train.loop import Trainer
from spinnerf_tpu.utils import correspondence


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    return synthetic.make_scene(tmp_path_factory.mktemp("s"), n_views=5,
                                h=36, w=44, factor=1)


@pytest.fixture(scope="module")
def bank(scene_dir):
    sc = llff.load_scene(scene_dir, factor=1)
    return raybank.build_raybank(sc, np.arange(5))


def test_single_image_sampler_one_view(bank):
    key = jax.random.PRNGKey(0)
    batch, tgt = raybank.sample_single_image(key, bank, 128, 10)
    assert batch["origins"].shape == (128, 3)
    # all rays share one camera origin
    assert float(jnp.std(batch["origins"], axis=0).max()) < 1e-6


def test_single_image_precrop(bank):
    """During precrop, pixels stay in the central crop -> ray directions are
    less spread than full-frame sampling."""
    key = jax.random.PRNGKey(1)
    b_crop, _ = raybank.sample_single_image(key, bank, 256, 0,
                                            precrop_iters=100,
                                            precrop_frac=0.25)
    b_full, _ = raybank.sample_single_image(key, bank, 256, 200,
                                            precrop_iters=100,
                                            precrop_frac=0.25)
    spread_crop = float(jnp.std(b_crop["directions"], axis=0).sum())
    spread_full = float(jnp.std(b_full["directions"], axis=0).sum())
    assert spread_crop < 0.5 * spread_full


@pytest.mark.slow
def test_no_batching_trainer(scene_dir, tmp_path):
    cfg = Config(expname="nb", basedir=str(tmp_path), datadir=str(scene_dir),
                 factor=1, no_ndc=True, no_tcnn=True, no_batching=True,
                 precrop_iters=5, netdepth=2, netwidth=32, netdepth_fine=2,
                 netwidth_fine=32, multires=4,
                 multires_views=2, N_samples=8, N_importance=4, N_rand=64,
                 lrate=5e-3, i_print=1000, i_weights=0, i_video=0,
                 i_testset=0, i_feat=0, chunk=2048, compute_dtype="float32")
    tr = Trainer(cfg, log=lambda *a: None)
    st = tr.fit(n_iters=10, hooks=False)
    assert st.step == 10


def test_correspondence_on_analytic_plane():
    """Exact depths on the synthetic plane world: correspondences must map
    a pixel in A to the pixel in B seeing the same world point."""
    h, w, focal = 48, 60, 72.0
    views = []
    for th in (0.0, 0.8):
        pos = np.array([3.5 * np.cos(th), 3.5 * np.sin(th), 2.0])
        c2w = synthetic.look_at_pose(pos, target=(0, 0, 0.3))
        _, t, _ = synthetic.render_view(c2w, h, w, focal, with_ball=False)
        views.append((c2w, np.nan_to_num(t, posinf=100.0)))
    (c2w_a, d_a), (c2w_b, d_b) = views
    uv_b, valid = correspondence.reproject_correspondences(
        d_a, c2w_a, c2w_b, d_b, focal=focal, cx=w / 2, cy=h / 2,
        world_err_thresh=0.05)
    assert valid.sum() > 200
    # spot-check: world point of (u,v) in A == world point of uv_b in B
    ys, xs = np.where(valid)
    i = len(ys) // 2
    v0, u0 = ys[i], xs[i]
    dirs_a = np.array([(u0 - w / 2) / focal, -(v0 - h / 2) / focal, -1.0])
    wa = c2w_a[:3, 3] + c2w_a[:3, :3] @ dirs_a * d_a[v0, u0]
    ub, vb = uv_b[v0, u0]
    dirs_b = np.array([(ub - w / 2) / focal, -(vb - h / 2) / focal, -1.0])
    wb = c2w_b[:3, 3] + c2w_b[:3, :3] @ dirs_b * d_b[int(vb), int(ub)]
    np.testing.assert_allclose(wa, wb, atol=0.1)


def test_weight_argmax_depth():
    z = np.linspace(1, 4, 8)[None, None].repeat(2, 0).repeat(3, 1)
    w = np.zeros((2, 3, 8))
    w[..., 5] = 1.0
    d = correspondence.weight_argmax_depth(z, w)
    np.testing.assert_allclose(d, z[0, 0, 5])


@pytest.mark.slow
def test_strip_checkpoint(scene_dir, tmp_path):
    cfg = Config(expname="st", basedir=str(tmp_path), datadir=str(scene_dir),
                 factor=1, no_ndc=True, no_tcnn=True, netdepth=2, netwidth=32,
                 netdepth_fine=2, netwidth_fine=32, multires=4,
                 multires_views=2, N_samples=8, N_importance=4,
                 N_rand=32, i_weights=5, i_print=1000, i_video=0, i_testset=0,
                 i_feat=0, chunk=2048, compute_dtype="float32")
    tr = Trainer(cfg, log=lambda *a: None)
    tr.fit(n_iters=5, hooks=True)
    tr.ckpt.wait()
    step, out = checkpoints.strip_checkpoint(tr.exp_dir, tmp_path / "dist")
    assert step == 5 and out.exists()
    import orbax.checkpoint as ocp
    params = ocp.StandardCheckpointer().restore(out)
    assert "coarse" in params and "opt_state" not in params


@pytest.mark.slow
def test_alpha_model_path_frozen_sigma(scene_dir, tmp_path):
    """NeRF_RGB mode: with a frozen alpha model, density must not change
    during training while colors do."""
    base = dict(datadir=str(scene_dir), factor=1, no_ndc=True, no_tcnn=True,
                netdepth=2, netwidth=32, netdepth_fine=2, netwidth_fine=32,
                multires=4, multires_views=2,
                N_samples=8, N_importance=0, N_rand=64, lrate=1e-2,
                i_print=1000, i_video=0, i_testset=0, i_feat=0, chunk=2048,
                compute_dtype="float32")
    cfg_a = Config(expname="alpha", basedir=str(tmp_path), i_weights=5, **base)
    tr_a = Trainer(cfg_a, log=lambda *a: None)
    tr_a.fit(n_iters=5, hooks=True)
    tr_a.ckpt.wait()

    cfg_b = Config(expname="rgb", basedir=str(tmp_path), i_weights=0,
                   alpha_model_path=str(tr_a.exp_dir), **base)
    tr_b = Trainer(cfg_b, log=lambda *a: None)
    p0 = jax.tree.map(jnp.copy, tr_b.state.params)
    tr_b.fit(n_iters=10, hooks=False)
    p1 = tr_b.state.params

    def leaf_delta(tree_a, tree_b, name):
        a = tree_a["coarse"]["params"][name]["kernel"]
        b = tree_b["coarse"]["params"][name]["kernel"]
        return float(jnp.abs(a - b).max())

    assert leaf_delta(p0, p1, "rgb_head") > 0       # colors trained
    assert leaf_delta(p0, p1, "sigma_head") == 0.0  # density head untouched
