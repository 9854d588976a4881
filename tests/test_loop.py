"""Trainer orchestration e2e on the synthetic scene (tiny budgets)."""
import numpy as np
import jax.numpy as jnp
import pytest

from spinnerf_tpu.config import Config
from spinnerf_tpu.data import synthetic
from spinnerf_tpu.train.loop import Trainer


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    return synthetic.make_scene(tmp_path_factory.mktemp("scene"),
                                n_views=6, h=36, w=44, factor=1)


def tiny_config(scene_dir, tmp_path, **kw):
    base = dict(
        expname="t", basedir=str(tmp_path), datadir=str(scene_dir),
        factor=1, no_ndc=True, no_tcnn=True,
        netdepth=2, netwidth=32, netdepth_fine=2, netwidth_fine=32,
        multires=4, multires_views=2,
        N_samples=12, N_importance=6, N_rand=64,
        N_iters=40, lrate=5e-3, lrate_decay=250,
        colmap_depth=True, depth_loss=True,
        i_print=20, i_weights=0, i_video=0, i_testset=0, i_feat=0,
        chunk=2048, compute_dtype="float32", llffhold=1000000,
    )
    base.update(kw)
    return Config(**base)


def test_trainer_fits_and_improves(scene_dir, tmp_path):
    cfg = tiny_config(scene_dir, tmp_path)
    tr = Trainer(cfg, log=lambda *a: None)
    assert len(tr.i_train) == 6
    st = tr.fit(n_iters=40, hooks=False)
    assert st.step == 40

    # render a frame and compare against the no-ball target
    rgbs, disps = tr.render_poses_list(tr.scene.poses[:1])
    assert rgbs.shape == (1, 36, 44, 3)
    assert np.isfinite(rgbs).all()


def test_trainer_checkpoint_resume(scene_dir, tmp_path):
    cfg = tiny_config(scene_dir, tmp_path, expname="ck", i_weights=20)
    tr = Trainer(cfg, log=lambda *a: None)
    tr.fit(n_iters=20, hooks=True)
    tr.ckpt.wait()
    assert tr.ckpt.latest_step() == 20

    tr2 = Trainer(cfg, log=lambda *a: None)
    assert tr2.state.step == 20
    a = jnp.asarray(next(iter(
        tr.state.params["coarse"]["params"].values()))["kernel"])
    b = jnp.asarray(next(iter(
        tr2.state.params["coarse"]["params"].values()))["kernel"])
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_separate_fine_model_sizes(scene_dir, tmp_path):
    """--netdepth_fine/--netwidth_fine size the fine network independently
    (`run_nerf.py:417-420`): params differ in shape, training and rendering
    still run."""
    cfg = tiny_config(scene_dir, tmp_path, expname="finesz",
                      netdepth_fine=3, netwidth_fine=40)
    tr = Trainer(cfg, log=lambda *a: None)
    assert tr.fine_model is not tr.model
    ck = tr.state.params["coarse"]["params"]["trunk_0"]["kernel"]
    fk = tr.state.params["fine"]["params"]["trunk_0"]["kernel"]
    assert ck.shape[-1] == 32 and fk.shape[-1] == 40
    st = tr.fit(n_iters=4, hooks=False)
    assert st.step == 4
    rgbs, _ = tr.render_poses_list(tr.scene.poses[:1])
    assert np.isfinite(rgbs).all()


@pytest.mark.slow
def test_ft_path_loads_external_weights(scene_dir, tmp_path):
    """--ft_path: an explicit checkpoint path overrides the exp dir's own
    scan (`run_nerf.py:1151-1157`) — works for a foreign exp dir and for a
    stripped params-only dump."""
    from spinnerf_tpu.train import checkpoints

    cfg = tiny_config(scene_dir, tmp_path, expname="src", i_weights=20)
    tr = Trainer(cfg, log=lambda *a: None)
    tr.fit(n_iters=20, hooks=True)
    tr.ckpt.wait()

    def kernel(t):
        return np.asarray(jnp.asarray(next(iter(
            t.state.params["coarse"]["params"].values()))["kernel"]))

    # (a) foreign experiment dir
    cfg2 = tiny_config(scene_dir, tmp_path, expname="ft_a",
                       ft_path=str(tr.exp_dir))
    tr2 = Trainer(cfg2, log=lambda *a: None)
    assert tr2.state.step == 20
    np.testing.assert_allclose(kernel(tr2), kernel(tr))

    # (b) stripped params-only dump: params load, optimizer state is fresh
    _, dump = checkpoints.strip_checkpoint(tr.exp_dir, tmp_path / "strip")
    cfg3 = tiny_config(scene_dir, tmp_path, expname="ft_b",
                       ft_path=str(dump))
    tr3 = Trainer(cfg3, log=lambda *a: None)
    np.testing.assert_allclose(kernel(tr3), kernel(tr))

    # (c) missing path fails loudly
    cfg4 = tiny_config(scene_dir, tmp_path, expname="ft_c",
                       ft_path=str(tmp_path / "nope"))
    with pytest.raises(FileNotFoundError):
        Trainer(cfg4, log=lambda *a: None)


@pytest.mark.slow
def test_prepare_hook_writes_lama_staging(scene_dir, tmp_path):
    cfg = tiny_config(scene_dir, tmp_path, expname="prep", prepare=True)
    tr = Trainer(cfg, log=lambda *a: None)
    tr.fit(n_iters=5, hooks=False)
    out = tr._prepare_hook(5)
    imgs = sorted(out.glob("img*.png"))
    labels = sorted((out / "label").glob("img*.png"))
    assert len(imgs) == 6 and len(labels) == 6


@pytest.mark.slow
def test_testset_hook_writes_artifacts(scene_dir, tmp_path):
    cfg = tiny_config(scene_dir, tmp_path, expname="ts", N_gt=2)
    tr = Trainer(cfg, log=lambda *a: None)
    assert len(tr.i_test) == 2 and len(tr.i_train) == 4
    tr.fit(n_iters=3, hooks=False)
    tr._testset_hook(3)
    tdir = tr.exp_dir / "testset_000003"
    assert (tdir / "psnr.json").exists()
    assert len(list((tdir / "rgb").glob("*.png"))) == 2
    assert len(list((tdir / "pose").glob("*.txt"))) == 2
    assert (tdir / "intrinsics.txt").exists()


def test_mesh_shape_limits_devices(scene_dir, tmp_path):
    """`--mesh_shape N` trains on the first N devices of the 8-device mesh."""
    from spinnerf_tpu.config import Config
    from spinnerf_tpu.train.loop import Trainer
    cfg = Config(expname="mesh2", basedir=str(tmp_path), datadir=str(scene_dir),
                 factor=1, no_ndc=True, no_tcnn=True, netdepth=2, netwidth=32,
                 multires=4, multires_views=2, N_samples=8, N_importance=0,
                 N_rand=64, i_print=1000, i_weights=0, i_video=0, i_testset=0,
                 i_feat=0, chunk=2048, compute_dtype="float32", mesh_shape=2)
    tr = Trainer(cfg, log=lambda *a: None)
    assert tr.mesh is not None and tr.mesh.devices.size == 2
    tr.fit(n_iters=2, hooks=False)


@pytest.mark.slow
def test_prepare_cadence_fires_in_loop(scene_dir, tmp_path):
    """`--prepare` stages LaMa guidance from INSIDE the fit loop on the
    i_feat cadence and at the final step (`run_nerf.py:1563,1599`) — not
    only via the explicit pipeline call."""
    cfg = tiny_config(scene_dir, tmp_path, expname="prepc", prepare=True,
                      i_feat=3)
    tr = Trainer(cfg, log=lambda *a: None)
    tr.fit(n_iters=4)   # fires at i=3 (cadence) and i=4 (final step)
    out = tr.exp_dir / "lama_input"
    assert sorted(out.glob("img*.png")), "in-loop prepare dump missing"


@pytest.mark.slow
def test_page_bounds_pinned_to_experiment(scene_dir, tmp_path):
    """Calibrated Z-CDF page bounds are part of the hash table's index
    semantics: the experiment dir pins them in page_bounds.json, and a
    resumed Trainer reads the table under the PINNED bounds even when
    --hash_region_calib is flipped off (round-3 advisor finding: the
    index map was silently re-derived)."""
    import json
    cfg = tiny_config(scene_dir, tmp_path, expname="caps", no_tcnn=False,
                      log2_hashmap_size=13, hash_impl="win_xla",
                      hash_region_calib=True, i_weights=2)
    tr = Trainer(cfg, log=lambda *a: None)
    sidecar = tr.exp_dir / "page_bounds.json"
    assert sidecar.exists()
    data = json.loads(sidecar.read_text())
    assert data["page_bounds"] == (None if tr.model.page_bounds is None
                                   else list(tr.model.page_bounds))
    # round-5: the shifted-morton dense boxes are pinned alongside
    assert data["dense_box"] == (None if tr.model.dense_box is None
                                 else [None if b is None else list(b)
                                       for b in tr.model.dense_box])
    tr.fit(n_iters=2, hooks=True)
    tr.ckpt.wait()

    # resume with the flag OFF: the pinned caps still apply
    cfg2 = tiny_config(scene_dir, tmp_path, expname="caps", no_tcnn=False,
                       log2_hashmap_size=13, hash_impl="win_xla",
                       hash_region_calib=False, i_weights=2)
    tr2 = Trainer(cfg2, log=lambda *a: None)
    assert tr2.state.step == 2
    assert tr2.model.page_bounds == tr.model.page_bounds
    assert tr2.model.dense_box == tr.model.dense_box

    # a fresh experiment with the flag off pins the uniform (None) value
    cfg3 = tiny_config(scene_dir, tmp_path, expname="caps_u", no_tcnn=False,
                       log2_hashmap_size=13, hash_impl="win_xla",
                       hash_region_calib=False)
    tr3 = Trainer(cfg3, log=lambda *a: None)
    assert tr3.model.page_bounds is None
    assert tr3.model.dense_box is None
    assert json.loads(
        (tr3.exp_dir / "page_bounds.json").read_text())["page_bounds"] is None

    # a ROUND-4 sidecar (no dense_box key) pins dense_box=None: tables
    # trained before the shifted-morton regime keep their all-paged index
    legacy_dir = tr.exp_dir.parent / "caps_legacy"
    legacy_dir.mkdir()
    legacy = {"page_bounds": data["page_bounds"]}
    (legacy_dir / "page_bounds.json").write_text(json.dumps(legacy))
    cfg4 = tiny_config(scene_dir, tmp_path, expname="caps_legacy",
                       no_tcnn=False, log2_hashmap_size=13,
                       hash_impl="win_xla", hash_region_calib=True)
    tr4 = Trainer(cfg4, log=lambda *a: None)
    assert tr4.model.page_bounds == tr.model.page_bounds
    assert tr4.model.dense_box is None
