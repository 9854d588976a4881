"""Dataset-type dispatch: blender/dtu train end-to-end, view-split overrides.

Parity: the reference's dataset if-chain (`DS_NeRF/run_nerf.py:985-1112`)
and the `--train_scene/--test_scene` split overrides (`:1001-1012`).
"""
import json

import numpy as np
import pytest

from spinnerf_tpu.config import Config
from spinnerf_tpu.data import blender, llff
from spinnerf_tpu.train.loop import Trainer


def test_split_test_scene_override():
    i_train, i_test = llff.train_test_split(10, llffhold=2,
                                            test_scene=[3, 7])
    assert list(i_test) == [3, 7]
    assert list(i_train) == list(range(10))  # llff keeps holdout in train


def test_split_negative_test_scene_means_empty():
    _, i_test = llff.train_test_split(10, llffhold=2, test_scene=[-1])
    assert len(i_test) == 0


def test_split_train_scene_excludes_test():
    i_train, i_test = llff.train_test_split(
        10, train_scene=[0, 1, 2, 3], test_scene=[2, 9])
    assert list(i_train) == [0, 1, 3]
    assert list(i_test) == [2, 9]


@pytest.fixture(scope="module")
def blender_dir(tmp_path_factory):
    import cv2
    d = tmp_path_factory.mktemp("blender_e2e")
    rng = np.random.RandomState(0)
    for split, n in (("train", 4), ("val", 2), ("test", 2)):
        frames = []
        for i in range(n):
            name = f"r_{i}"
            img = (rng.rand(24, 24, 4) * 255).astype(np.uint8)
            (d / split).mkdir(exist_ok=True)
            cv2.imwrite(str(d / split / f"{name}.png"),
                        cv2.cvtColor(img, cv2.COLOR_RGBA2BGRA))
            pose = np.asarray(blender.pose_spherical(i * 45.0, -30.0, 4.0))
            frames.append({"file_path": f"{split}/{name}",
                           "transform_matrix": pose.tolist()})
        json.dump({"camera_angle_x": 0.6911, "frames": frames},
                  open(d / f"transforms_{split}.json", "w"))
    return d


@pytest.mark.slow
def test_blender_trains_end_to_end(blender_dir, tmp_path):
    cfg = Config(
        expname="bl", basedir=str(tmp_path), datadir=str(blender_dir),
        dataset_type="blender", white_bkgd=True, testskip=1,
        no_tcnn=True, netdepth=2, netwidth=32, netdepth_fine=2, netwidth_fine=32,
        multires=4, multires_views=2,
        N_samples=8, N_importance=4, N_rand=64, N_iters=8, lrate=5e-3,
        i_print=0, i_weights=0, i_video=0, i_testset=0, i_feat=0,
        chunk=2048, compute_dtype="float32")
    tr = Trainer(cfg, log=lambda *a: None)
    # i_split contract: 4 train frames, the 2 test frames hold out
    assert list(tr.i_train) == [0, 1, 2, 3]
    assert list(tr.i_test) == [6, 7]
    # blender bounds (`run_nerf.py:1071-1072`)
    assert tr.bank.near == pytest.approx(2.0)
    assert tr.bank.far == pytest.approx(6.0)
    st = tr.fit(n_iters=8, hooks=False)
    assert st.step == 8
    rgbs, _ = tr.render_poses_list(tr.scene.poses[tr.i_test][:1])
    assert np.isfinite(rgbs).all()


@pytest.fixture(scope="module")
def dtu_dir(tmp_path_factory):
    import cv2
    rng = np.random.RandomState(1)
    d = tmp_path_factory.mktemp("dtu_e2e") / "scan"
    (d / "image").mkdir(parents=True)
    cams = {}
    f = 300.0
    k = np.array([[f, 0, 16.0], [0, f, 12.0], [0, 0, 1.0]])
    for i in range(4):
        img = (rng.rand(24, 32, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(d / "image" / f"{i:06d}.png"), img)
        q, _ = np.linalg.qr(rng.randn(3, 3))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        t = 0.3 * rng.randn(3) + np.array([0, 0, 2.0])
        p4 = np.eye(4)
        p4[:3] = k @ np.concatenate([q, t[:, None]], 1)
        cams[f"world_mat_{i}"] = p4
    np.savez(d / "cameras.npz", **cams)
    return d


def test_dtu_trains_end_to_end(dtu_dir, tmp_path):
    cfg = Config(
        expname="dtu", basedir=str(tmp_path), datadir=str(dtu_dir),
        dataset_type="dtu", test_scene=[0],
        no_tcnn=True, netdepth=2, netwidth=32, netdepth_fine=2, netwidth_fine=32,
        multires=4, multires_views=2,
        N_samples=8, N_importance=4, N_rand=64, N_iters=8, lrate=5e-3,
        i_print=0, i_weights=0, i_video=0, i_testset=0, i_feat=0,
        chunk=2048, compute_dtype="float32")
    tr = Trainer(cfg, log=lambda *a: None)
    # dtu default split excludes test views from training (`run_nerf.py:1051`)
    assert list(tr.i_test) == [0]
    assert 0 not in tr.i_train
    # dtu bounds (`run_nerf.py:1058-1059`)
    assert tr.bank.near == pytest.approx(0.1)
    assert tr.bank.far == pytest.approx(5.0)
    st = tr.fit(n_iters=8, hooks=False)
    assert st.step == 8


def test_unknown_dataset_type_raises(tmp_path):
    cfg = Config(expname="x", basedir=str(tmp_path), datadir=str(tmp_path),
                 dataset_type="nonsense")
    with pytest.raises(ValueError, match="dataset_type"):
        Trainer(cfg, log=lambda *a: None)


def test_mvseg_mode_loads_raw_masks(tmp_path):
    """MVSeg trains the semantic head on RAW masks; the 5x5 x5 inpainting
    dilation (`DS_NeRF/load_llff.py:158`) must NOT apply in mvseg mode
    (`MVSeg/DS_NeRF/load_llff.py:132-147` has none) — dilated blobs are
    multi-view inconsistent and the BCE lift cannot converge on them."""
    from spinnerf_tpu.data import synthetic
    from spinnerf_tpu.data.dispatch import load_scene_for_config
    scene_dir = synthetic.make_scene(tmp_path, n_views=4, h=40, w=50,
                                     factor=1, mask_views=[0, 1, 2, 3])
    cfg = Config(datadir=str(scene_dir), factor=1, dataset_type="llff")

    cfg.mvseg = True
    raw, *_ = load_scene_for_config(cfg)
    cfg.mvseg = False
    dil, *_ = load_scene_for_config(cfg)

    raw_frac = float((raw.masks[0] > 0.5).mean())
    dil_frac = float((dil.masks[0] > 0.5).mean())
    assert raw_frac < 0.2, raw_frac          # the ball silhouette
    assert dil_frac > raw_frac * 1.5         # removal stage keeps dilation

    # and mvseg must see the RAW photographs (the object still present),
    # never the stage-5 `lama_images/` substitution: with the object
    # removed from the density field the semantic lift paints the labels
    # onto the background at per-view parallax offsets
    cfg.mvseg = True
    raw2, *_ = load_scene_for_config(cfg)
    diff = np.abs(np.asarray(raw2.images[0]) - np.asarray(dil.images[0]))
    assert float(diff.max()) > 0.1           # ball present vs inpainted-away
