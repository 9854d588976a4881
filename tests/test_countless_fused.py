"""Tests: COUNTLESS 2x mode-downsampling and fused.ply(.vis) round-trip."""
import numpy as np
import pytest

from spinnerf_tpu.data.colmap_fused import (FusedPointCloud, read_fused,
                                            write_fused)
from spinnerf_tpu.utils.countless import (countless2d, countless2d_jax,
                                          downsample_mask)


def _mode2x2(img):
    h, w = img.shape
    out = np.empty((h // 2, w // 2), img.dtype)
    for i in range(h // 2):
        for j in range(w // 2):
            blk = img[2 * i:2 * i + 2, 2 * j:2 * j + 2].ravel()
            a, b, c, d = blk
            # countless: majority among a,b,c if any pair matches, else d
            if a == b or a == c:
                out[i, j] = a
            elif b == c:
                out[i, j] = b
            else:
                out[i, j] = d
    return out


def test_countless_matches_mode_semantics():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 4, (64, 64), np.uint8)
    assert np.array_equal(countless2d(img), _mode2x2(img))


def test_countless_handles_zeros_and_uint8_max():
    rng = np.random.RandomState(1)
    img = rng.choice([0, 1, 255], (32, 32)).astype(np.uint8)
    assert np.array_equal(countless2d(img), _mode2x2(img))


def test_countless_odd_shapes_edge_pad():
    rng = np.random.RandomState(2)
    img = rng.randint(0, 3, (33, 31), np.uint8)
    out = countless2d(img)
    assert out.shape == (17, 16)


def test_countless_jax_matches_numpy():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 5, (48, 48), np.int32)
    assert np.array_equal(np.asarray(countless2d_jax(img)), countless2d(img))


def test_downsample_mask_factor4():
    mask = np.zeros((64, 64), np.uint8)
    mask[8:40, 8:40] = 1
    out = downsample_mask(mask, 4)
    assert out.shape == (16, 16)
    assert out[4, 4] == 1 and out[0, 0] == 0
    with pytest.raises(ValueError):
        downsample_mask(mask, 3)


def test_fused_ply_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    n = 100
    counts = rng.randint(0, 5, n)
    pc = FusedPointCloud(
        positions=rng.randn(n, 3).astype(np.float32),
        normals=rng.randn(n, 3).astype(np.float32),
        colors=rng.randint(0, 255, (n, 3), np.uint8),
        vis_offsets=np.concatenate(([0], np.cumsum(counts))),
        vis_flat=rng.randint(0, 40, counts.sum(), np.uint32))

    write_fused(pc, tmp_path / "fused.ply")
    rt = read_fused(tmp_path / "fused.ply")

    np.testing.assert_array_equal(rt.positions, pc.positions)
    np.testing.assert_array_equal(rt.normals, pc.normals)
    np.testing.assert_array_equal(rt.colors, pc.colors)
    np.testing.assert_array_equal(rt.vis_offsets, pc.vis_offsets)
    np.testing.assert_array_equal(rt.vis_flat, pc.vis_flat)
    assert len(rt.visible_image_idxs(1)) == counts[1]


def test_countless_negative_labels():
    """-1 labels (excluded-view marker) must survive mode-downsampling —
    a plain +1 sentinel shift collides them with 'no match'."""
    from spinnerf_tpu.utils.countless import countless2d
    img = np.array([[-1, -1], [5, 7]], np.int64)
    assert countless2d(img)[0, 0] == -1
    img2 = np.array([[-1, 3], [3, 7]], np.int32)
    assert countless2d(img2)[0, 0] == 3
