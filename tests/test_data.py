"""Synthetic scene -> loader -> ray bank integration tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spinnerf_tpu.data import colmap, llff, raybank, synthetic


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("scene")
    return synthetic.make_scene(d, n_views=6, h=40, w=50, factor=1, seed=0)


@pytest.fixture(scope="module")
def scene(scene_dir):
    return llff.load_scene(scene_dir, factor=1)


def test_scene_shapes(scene):
    assert scene.images.shape == (6, 40, 50, 3)
    assert scene.poses.shape == (6, 3, 4)
    assert scene.masks.shape == (6, 40, 50)
    assert scene.inpainted_depths.shape == (6, 40, 50)
    assert scene.render_poses.shape[1:] == (3, 4)
    assert 0 <= scene.i_holdout < 6
    assert scene.near < scene.far


def test_poses_roundtrip_through_llff_format(scene_dir, scene):
    """Cameras written by the generator must come back as valid look-at poses:
    orthonormal rotation, looking roughly at the scene center."""
    for c2w in scene.poses:
        r = c2w[:3, :3]
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-4)
        # camera backward axis (col 2) points away from origin-ish target
        to_cam = c2w[:3, 3] / np.linalg.norm(c2w[:3, 3])
        assert np.dot(r[:, 2], to_cam) > 0.5


def test_colmap_depth_consistent_with_ray_geometry(scene_dir):
    """Sparse COLMAP depths must match actual plane-hit distances along the
    NeRF rays. Uses a non-recentered load so the plane stays at z = 0
    (uniform world rescale keeps it there; recentering would move it)."""
    from spinnerf_tpu.core import rays as ray_lib
    sc = llff.load_scene(scene_dir, factor=1, recenter=False)
    dl = colmap.sparse_depth_for_views(scene_dir / "sparse" / "0", factor=1,
                                       bd_scale=sc.scale)
    h, w, focal = sc.hwf
    v = 0
    d = dl[v]
    assert len(d["depth"]) > 50
    ro, rd = ray_lib.get_rays_at_coords(h, w, focal,
                                        jnp.asarray(sc.poses[v]),
                                        jnp.asarray(d["coord"]))
    t_plane = -np.asarray(ro)[:, 2] / np.asarray(rd)[:, 2]
    np.testing.assert_allclose(d["depth"], t_plane, rtol=0.05)
    assert (d["weight"] > 0).all() and (d["weight"] <= 2.0).all()


def test_mask_semantics_lpips_mode(scene_dir):
    sc = llff.load_scene(scene_dir, factor=1, lpips_mode=True, lpips_reserve=2)
    keep = len(sc.images) - 2
    for i in range(len(sc.images)):
        m = sc.masks[i]
        if i == keep:
            assert m.max() > 0 and m.min() >= 0
        else:
            assert m.min() < 0  # flipped negative = excluded from masked MSE


def test_raybank_groups_and_sampling(scene_dir, scene):
    dl = colmap.sparse_depth_for_views(scene_dir / "sparse" / "0", factor=1,
                                       bd_scale=scene.scale)
    bank = raybank.build_raybank(scene, np.arange(6), depth_list=dl)
    n_pix = 6 * 40 * 50
    g = bank.groups
    assert g["clf"].count + g["inp"].count == n_pix
    assert g["rgb"].count == g["inp"].count  # all masks positive here
    assert bank.depth_group.count > 100

    key = jax.random.PRNGKey(0)
    batch, tgt = raybank.sample_group(key, bank, "clf", 256)
    assert batch["origins"].shape == (256, 3)
    # clf group must contain only unmasked pixels
    np.testing.assert_array_equal(np.asarray(tgt["label"]), 0.0)

    batch, tgt = raybank.sample_group(key, bank, "rgb", 256)
    assert (np.asarray(tgt["label"]) == 1.0).all()

    db = raybank.sample_depth_group(key, bank, 128)
    assert db["depths"].shape == (128,)
    assert (np.asarray(db["weights"]) > 0).all()


def test_rays_for_pixels_matches_get_rays(scene):
    from spinnerf_tpu.core import rays as ray_lib
    h, w, focal = scene.hwf
    poses = jnp.asarray(scene.poses)
    ro_full, rd_full = ray_lib.get_rays(h, w, focal, poses[2])
    view = jnp.full((10,), 2, jnp.int32)
    ys = jnp.asarray(np.arange(10, dtype=np.float32))
    xs = jnp.asarray(np.arange(10, dtype=np.float32) * 2)
    ro, rd = raybank.rays_for_pixels(poses, scene.hwf, view, xs, ys)
    np.testing.assert_allclose(np.asarray(rd),
                               np.asarray(rd_full)[np.arange(10), np.arange(10) * 2],
                               atol=1e-5)


def test_prepare_mode_uses_raw_images(scene_dir):
    sc_prep = llff.load_scene(scene_dir, factor=1, prepare=True)
    sc_fit = llff.load_scene(scene_dir, factor=1, prepare=False)
    # prepare loads the with-ball originals; fit loads lama (no-ball) images —
    # they must differ inside the mask region
    m = sc_prep.masks[0] > 0
    assert np.abs(sc_prep.images[0][m] - sc_fit.images[0][m]).max() > 0.1


def test_train_test_split_ngt():
    i_train, i_test = llff.train_test_split(100, n_gt=40)
    assert len(i_test) == 40 and len(i_train) == 60
    assert set(i_test) == set(range(40))
    i_train, i_test = llff.train_test_split(100, n_gt=40, train_gt=True)
    assert len(i_train) == 40 and len(i_test) == 100


def test_make_scene_n_gt_object_removed_views(tmp_path):
    """n_gt writes the SPIn-NeRF quantitative layout (`README.md:27-31`):
    the first n_gt views are object-removed GT photographs (no ball pixels
    differ from the lama_images analytic no-ball render), yet still carry a
    label/ hole mask; training views keep the object."""
    import cv2
    d = synthetic.make_scene(tmp_path / "s", n_views=6, h=40, w=50,
                             factor=1, n_gt=2, mask_views=[2, 4])
    img = cv2.imread(str(d / "images" / "view000.png"))
    nb = cv2.imread(str(d / "images" / "lama_images" / "view000.png"))
    assert np.array_equal(img, nb)           # GT view == object-removed
    img3 = cv2.imread(str(d / "images" / "view002.png"))
    nb3 = cv2.imread(str(d / "images" / "lama_images" / "view002.png"))
    assert not np.array_equal(img3, nb3)     # training view keeps the ball
    # GT views always get a hole mask; training masks follow mask_views
    labels = {p.name for p in (d / "images" / "label").iterdir()}
    assert {"view000.png", "view001.png", "view002.png",
            "view004.png"} == labels
    m0 = cv2.imread(str(d / "images" / "label" / "view000.png"), 0)
    assert m0.max() == 255 and m0.min() == 0  # a real hole, not empty

    # the loader's N_gt split then makes these the test set
    scene = llff.load_scene(d, factor=1)
    i_train, i_test = llff.train_test_split(len(scene.images), n_gt=2)
    assert list(i_test) == [0, 1] and list(i_train) == [2, 3, 4, 5]


def test_epoch_sampling_full_coverage():
    """`epoch_indices` visits every ray exactly once per epoch and shifts
    batch phase across epochs (the reference's shuffled-DataLoader
    semantics, `run_nerf.py:1337-1413`, statelessly)."""
    import jax.numpy as jnp
    from spinnerf_tpu.data.raybank import epoch_indices
    count, b = 1000, 128
    steps_per_epoch = -(-count // b)
    seen = []
    for s in range(2 * steps_per_epoch):
        seen.append(np.asarray(epoch_indices(s, b, count)))
    flat = np.concatenate(seen)
    # first epoch: positions 0..999 each exactly once
    first = flat[:count]
    assert sorted(first.tolist()) == list(range(count))
    # second epoch too
    second = flat[count:2 * count]
    assert sorted(second.tolist()) == list(range(count))
    # and the epochs are phase-shifted (not identical order)
    assert not np.array_equal(first, second)


def test_sample_group_epoch_vs_iid(scene_dir):
    """sample_group(step=...) draws deterministic epoch batches; step=None
    keeps the iid path."""
    import jax
    from spinnerf_tpu.data import llff, raybank
    scene = llff.load_scene(str(scene_dir), factor=1)
    bank = raybank.build_raybank(scene, np.arange(len(scene.images)),
                                 prepare=True)
    k = jax.random.PRNGKey(0)
    b1, t1 = raybank.sample_group(k, bank, "rgb", 64, step=3)
    b2, t2 = raybank.sample_group(jax.random.PRNGKey(9), bank, "rgb", 64,
                                  step=3)
    # epoch sampling ignores the key: same step -> same batch
    np.testing.assert_array_equal(np.asarray(t1["rgb"]),
                                  np.asarray(t2["rgb"]))
    b3, _ = raybank.sample_group(k, bank, "rgb", 64, step=4)
    assert not np.array_equal(np.asarray(b1["origins"]),
                              np.asarray(b3["origins"]))
