"""Blender/DTU loader tests on generated fixtures."""
import json
import numpy as np
import pytest

from spinnerf_tpu.data import blender, dtu


@pytest.fixture(scope="module")
def blender_dir(tmp_path_factory):
    import cv2
    d = tmp_path_factory.mktemp("blender")
    rng = np.random.RandomState(0)
    for split, n in (("train", 4), ("val", 2), ("test", 2)):
        frames = []
        for i in range(n):
            name = f"r_{i}"
            img = (rng.rand(32, 32, 4) * 255).astype(np.uint8)
            (d / split).mkdir(exist_ok=True)
            cv2.imwrite(str(d / split / f"{name}.png"),
                        cv2.cvtColor(img, cv2.COLOR_RGBA2BGRA))
            if split == "train":
                (d / split / "mask").mkdir(exist_ok=True)
                m = np.zeros((32, 32), np.uint8)
                m[8:16, 8:16] = 255
                cv2.imwrite(str(d / split / "mask" / f"m_{name}.png"), m)
            pose = np.asarray(blender.pose_spherical(i * 45.0, -30.0, 4.0))
            frames.append({"file_path": f"{split}/{name}",
                           "transform_matrix": pose.tolist()})
        json.dump({"camera_angle_x": 0.6911, "frames": frames},
                  open(d / f"transforms_{split}.json", "w"))
    return d


def test_blender_loader(blender_dir):
    imgs, poses, rposes, hwf, i_split, masks, objects = \
        blender.load_blender_data(blender_dir, testskip=1)
    assert imgs.shape == (8, 32, 32, 4)
    assert poses.shape == (8, 4, 4)
    assert rposes.shape == (40, 4, 4)
    assert [len(s) for s in i_split] == [4, 2, 2]
    h, w, focal = hwf
    np.testing.assert_allclose(focal, 0.5 * 32 / np.tan(0.5 * 0.6911),
                               rtol=1e-5)
    # train views have masks, others -1
    assert (masks[0] >= 0).any() and masks[0].max() == 1
    assert masks[4].min() == -1

    white = blender.composite_white(imgs)
    assert white.shape == (8, 32, 32, 3)


def test_blender_half_res(blender_dir):
    imgs, poses, _, (h, w, focal), _, masks, _ = \
        blender.load_blender_data(blender_dir, half_res=True)
    assert imgs.shape[1:3] == (16, 16)
    assert (h, w) == (16, 16)


def test_pose_spherical_geometry():
    """Spherical poses sit at the given radius and look at the origin."""
    for th in (0.0, 90.0, 123.0):
        p = np.asarray(blender.pose_spherical(th, -30.0, 4.0))
        pos = p[:3, 3]
        np.testing.assert_allclose(np.linalg.norm(pos), 4.0, rtol=1e-6)
        backward = p[:3, 2]
        np.testing.assert_allclose(backward, pos / 4.0, atol=1e-6)


def test_dtu_projection_decomposition(rng):
    """decompose(K [R|t]) must recover K (up to scale) and camera center."""
    for _ in range(5):
        f = rng.uniform(300, 800)
        k = np.array([[f, 0, 64.0], [0, f, 48.0], [0, 0, 1.0]])
        q, _ = np.linalg.qr(rng.randn(3, 3))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        center = rng.randn(3) * 2
        t = -q @ center
        p = k @ np.concatenate([q, t[:, None]], axis=1)
        k2, c2w = dtu.decompose_projection(p)
        np.testing.assert_allclose(k2, k, rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(c2w[:3, 3], center, atol=1e-6)
        # rotation orthonormal, right-handed
        r = c2w[:3, :3]
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-6)
        assert np.linalg.det(r) > 0


def test_dtu_loader(tmp_path, rng):
    import cv2
    d = tmp_path / "dtu"
    (d / "image").mkdir(parents=True)
    cams = {}
    f = 500.0
    k = np.array([[f, 0, 20.0], [0, f, 15.0], [0, 0, 1.0]])
    for i in range(3):
        img = (rng.rand(30, 40, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(d / "image" / f"{i:06d}.png"), img)
        q, _ = np.linalg.qr(rng.randn(3, 3))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        t = rng.randn(3)
        p4 = np.eye(4)
        p4[:3] = k @ np.concatenate([q, t[:, None]], 1)
        cams[f"world_mat_{i}"] = p4
    np.savez(d / "cameras.npz", **cams)
    images, poses, (h, w, focal) = dtu.load_dtu_data(d)
    assert images.shape == (3, 30, 40, 3)
    assert poses.shape == (3, 3, 4)
    np.testing.assert_allclose(focal, f, rtol=1e-5)
