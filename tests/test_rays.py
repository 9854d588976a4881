"""Ray-generation oracles: independent numpy implementations of the standard
NeRF/LLFF camera model, cross-checked against `spinnerf_tpu.core.rays`."""
import numpy as np
import jax.numpy as jnp

from spinnerf_tpu.core import rays


def np_get_rays(H, W, focal, c2w):
    i, j = np.meshgrid(np.arange(W, dtype=np.float32),
                       np.arange(H, dtype=np.float32), indexing="xy")
    dirs = np.stack([(i - W * 0.5) / focal, -(j - H * 0.5) / focal,
                     -np.ones_like(i)], -1)
    rays_d = np.sum(dirs[..., None, :] * c2w[:3, :3], -1)
    rays_o = np.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d


def random_pose(rng):
    # random rotation via QR + random translation
    q, _ = np.linalg.qr(rng.randn(3, 3))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    t = rng.randn(3, 1)
    return np.concatenate([q, t], axis=1).astype(np.float32)


def test_get_rays_matches_numpy_oracle(rng):
    H, W, focal = 12, 17, 20.0
    for _ in range(5):
        c2w = random_pose(rng)
        ro_np, rd_np = np_get_rays(H, W, focal, c2w)
        ro, rd = rays.get_rays(H, W, focal, jnp.asarray(c2w))
        np.testing.assert_allclose(np.asarray(ro), ro_np, atol=1e-5)
        np.testing.assert_allclose(np.asarray(rd), rd_np, atol=1e-5)


def test_get_rays_at_coords_matches_full_grid(rng):
    H, W, focal = 9, 11, 15.0
    c2w = random_pose(rng)
    ro_full, rd_full = rays.get_rays(H, W, focal, jnp.asarray(c2w))
    # coords are (x, y) = (col, row)
    coords = np.stack([rng.randint(0, W, 20), rng.randint(0, H, 20)],
                      axis=-1).astype(np.float32)
    ro, rd = rays.get_rays_at_coords(H, W, focal, jnp.asarray(c2w),
                                     jnp.asarray(coords))
    rows = coords[:, 1].astype(int)
    cols = coords[:, 0].astype(int)
    np.testing.assert_allclose(np.asarray(rd),
                               np.asarray(rd_full)[rows, cols], atol=1e-5)
    np.testing.assert_allclose(np.asarray(ro),
                               np.asarray(ro_full)[rows, cols], atol=1e-5)


def test_ndc_rays_near_plane_maps_to_minus_one(rng):
    """After the NDC warp, a ray starting on the near plane has o_z = -1."""
    H, W, focal = 8, 8, 10.0
    c2w = np.eye(3, 4, dtype=np.float32)
    ro, rd = rays.get_rays(H, W, focal, jnp.asarray(c2w))
    ndc_o, ndc_d = rays.ndc_rays(H, W, focal, 1.0, ro, rd)
    np.testing.assert_allclose(np.asarray(ndc_o[..., 2]), -1.0, atol=1e-5)
    # o + d lands on z = +1 (the far plane at infinity)
    np.testing.assert_allclose(np.asarray(ndc_o[..., 2] + ndc_d[..., 2]),
                               1.0, atol=1e-5)


def test_make_ray_batch_shapes(rng):
    ro = jnp.asarray(rng.randn(4, 5, 3).astype(np.float32))
    rd = jnp.asarray(rng.randn(4, 5, 3).astype(np.float32))
    batch = rays.make_ray_batch(ro, rd, near=2.0, far=6.0)
    assert batch["origins"].shape == (20, 3)
    assert batch["near"].shape == (20,)
    norms = np.linalg.norm(np.asarray(batch["viewdirs"]), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
