"""COLMAP IO: binary round-trips and geometric consistency."""
import numpy as np
import pytest

from spinnerf_tpu.data import colmap


def test_qvec_rotmat_roundtrip(rng):
    for _ in range(10):
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        r = colmap.qvec_to_rotmat(q)
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-10)
        np.testing.assert_allclose(colmap.rotmat_to_qvec(r), q, atol=1e-8)


def _tiny_model(rng):
    cameras = {1: colmap.Camera(1, "SIMPLE_PINHOLE", 64, 48,
                                np.array([50.0, 32.0, 24.0]))}
    images = {}
    for i in (1, 2):
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        images[i] = colmap.Image(
            i, q, rng.randn(3), 1, f"im{i}.png",
            rng.rand(5, 2) * 32, np.array([1, 2, -1, 3, -1], np.int64))
    points = {
        j: colmap.Point3D(j, rng.randn(3), (rng.rand(3) * 255).astype(np.uint8),
                          float(rng.rand()), np.array([1, 2], np.int32),
                          np.array([0, 1], np.int32))
        for j in (1, 2, 3)
    }
    return cameras, images, points


def test_binary_roundtrip(tmp_path, rng):
    cameras, images, points = _tiny_model(rng)
    colmap.write_cameras_binary(cameras, tmp_path / "cameras.bin")
    colmap.write_images_binary(images, tmp_path / "images.bin")
    colmap.write_points3d_binary(points, tmp_path / "points3D.bin")

    c2, i2, p2 = colmap.read_model(tmp_path)
    assert c2[1].model == "SIMPLE_PINHOLE" and c2[1].width == 64
    np.testing.assert_allclose(c2[1].params, cameras[1].params)
    for k in images:
        np.testing.assert_allclose(i2[k].qvec, images[k].qvec)
        np.testing.assert_allclose(i2[k].xys, images[k].xys)
        np.testing.assert_array_equal(i2[k].point3d_ids, images[k].point3d_ids)
        assert i2[k].name == images[k].name
    for k in points:
        np.testing.assert_allclose(p2[k].xyz, points[k].xyz)
        np.testing.assert_array_equal(p2[k].image_ids, points[k].image_ids)


def test_cam_world_inverse(rng):
    q = rng.randn(4)
    q /= np.linalg.norm(q)
    im = colmap.Image(1, q, rng.randn(3), 1, "x", np.zeros((0, 2)),
                      np.zeros(0, np.int64))
    np.testing.assert_allclose(im.world_to_cam() @ im.cam_to_world(),
                               np.eye(4), atol=1e-10)


def test_dense_array_roundtrip(tmp_path, rng):
    arr = rng.rand(7, 9).astype(np.float32)
    colmap.write_dense_array(arr, tmp_path / "d.bin")
    got = colmap.read_dense_array(tmp_path / "d.bin")
    np.testing.assert_allclose(got, arr)


def test_poses_bounds_from_model_roundtrip(tmp_path):
    """Deleting poses_bounds.npy and regenerating it from the COLMAP model
    must reproduce the same cameras (up to the shared world transform)."""
    from spinnerf_tpu.data import synthetic, llff
    from spinnerf_tpu.pipeline.poses import gen_poses

    scene_dir = synthetic.make_scene(tmp_path / "s", n_views=5, h=40, w=50)
    orig = np.load(scene_dir / "poses_bounds.npy")
    (scene_dir / "poses_bounds.npy").unlink()
    gen_poses(scene_dir)
    regen = np.load(scene_dir / "poses_bounds.npy")
    assert regen.shape == orig.shape

    # camera orientations/centers identical (bounds differ slightly: the
    # generator uses the full depth map, the exporter the sparse points)
    po = orig[:, :-2].reshape(-1, 3, 5)
    pr = regen[:, :-2].reshape(-1, 3, 5)
    np.testing.assert_allclose(pr[:, :, :4], po[:, :, :4], atol=1e-5)
    lo, hi = orig[:, -2:].T
    lo2, hi2 = regen[:, -2:].T
    assert (lo2 > lo * 0.8).all() and (hi2 < hi * 1.3).all()


def test_text_model_readers_with_zero_point_image(tmp_path):
    """COLMAP text export: a registered image with NO 2D points has an
    EMPTY second line — the header/points pairing must stay in sync."""
    from spinnerf_tpu.data import colmap
    (tmp_path / "cameras.txt").write_text(
        "# Camera list\n"
        "1 SIMPLE_PINHOLE 64 48 50.0 32.0 24.0\n")
    (tmp_path / "images.txt").write_text(
        "# Image list\n"
        "1 1.0 0.0 0.0 0.0 0.1 0.2 0.3 1 a.png\n"
        "\n"                                     # zero points
        "2 1.0 0.0 0.0 0.0 0.4 0.5 0.6 1 b.png\n"
        "10.0 20.0 7 30.0 40.0 -1\n")
    (tmp_path / "points3D.txt").write_text(
        "# 3D point list\n"
        "7 1.0 2.0 3.0 255 0 0 0.5 2 0\n")
    cams = colmap.read_cameras_text(tmp_path / "cameras.txt")
    assert cams[1].width == 64
    imgs = colmap.read_images_text(tmp_path / "images.txt")
    assert len(imgs) == 2
    assert imgs[1].name == "a.png" and len(imgs[1].point3d_ids) == 0
    assert imgs[2].name == "b.png"
    np.testing.assert_allclose(imgs[2].xys, [[10.0, 20.0], [30.0, 40.0]])
    assert list(imgs[2].point3d_ids) == [7, -1]
    pts = colmap.read_points3d_text(tmp_path / "points3D.txt")
    assert pts[7].error == 0.5
