"""Native COLMAP parser: build, exact parity with the Python reader, and the
columnar sparse-depth fast path."""
import numpy as np
import pytest

from spinnerf_tpu.data import colmap, colmap_fast, synthetic


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    return synthetic.make_scene(tmp_path_factory.mktemp("s"), n_views=6,
                                h=60, w=80, n_points=2000)


@pytest.fixture(scope="module")
def built():
    try:
        colmap_fast.build_native()
    except Exception as e:
        pytest.skip(f"native toolchain unavailable: {e}")
    assert colmap_fast.native_available()


def test_native_matches_python_reader(scene_dir, built):
    sp = scene_dir / "sparse" / "0"
    pc, pi, pp = colmap.read_model(sp)
    nc, ni, npts = colmap_fast.read_model(sp)
    assert pc.keys() == nc.keys()
    for k in pc:
        assert nc[k].model == pc[k].model
        np.testing.assert_array_equal(nc[k].params, pc[k].params)
    assert pi.keys() == ni.keys()
    for k in pi:
        np.testing.assert_array_equal(ni[k].qvec, pi[k].qvec)
        np.testing.assert_array_equal(ni[k].tvec, pi[k].tvec)
        np.testing.assert_array_equal(ni[k].xys, pi[k].xys)
        np.testing.assert_array_equal(ni[k].point3d_ids, pi[k].point3d_ids)
        assert ni[k].name == pi[k].name
    assert pp.keys() == npts.keys()
    for k in pp:
        np.testing.assert_array_equal(npts[k].xyz, pp[k].xyz)
        assert npts[k].error == pp[k].error
        np.testing.assert_array_equal(npts[k].image_ids, pp[k].image_ids)
        np.testing.assert_array_equal(npts[k].point2d_idxs, pp[k].point2d_idxs)


def test_columnar_sparse_depth_matches(scene_dir, built):
    sp = scene_dir / "sparse" / "0"
    a = colmap.sparse_depth_for_views(sp, factor=2.0, bd_scale=1.5)
    b = colmap_fast.sparse_depth_for_views(sp, factor=2.0, bd_scale=1.5)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        assert len(x["depth"]) == len(y["depth"])
        np.testing.assert_allclose(np.sort(x["depth"]), np.sort(y["depth"]),
                                   rtol=1e-12)
        np.testing.assert_allclose(x["weight"].sum(), y["weight"].sum(),
                                   rtol=1e-9)


def test_truncated_file_raises(built, tmp_path):
    from spinnerf_tpu.native import colmap_native as cn
    with pytest.raises(ValueError, match="truncated|corrupt"):
        cn.parse_points(b"\x10\x00\x00\x00\x00\x00\x00\x00short")
    with pytest.raises(ValueError, match="truncated|corrupt"):
        cn.parse_images(b"\x01\x00\x00\x00\x00\x00\x00\x00xx")


def test_native_rejects_corrupt_models():
    """Corrupt counts / truncation must raise ValueError, never crash."""
    pytest.importorskip("spinnerf_tpu.native.colmap_native")
    from spinnerf_tpu.native import colmap_native as cn
    import struct
    huge = struct.pack("<Q", 1 << 60)
    for fn in (cn.parse_cameras, cn.parse_images, cn.parse_points):
        with pytest.raises(ValueError):
            fn(huge)
        with pytest.raises(ValueError):
            fn(b"\x03")   # truncated header
    # image record with absurd 2D-point count
    rec = struct.pack("<Q", 1) + struct.pack("<i", 1) + b"\x00" * 56 + \
        struct.pack("<i", 1) + b"a.png\x00" + struct.pack("<Q", 1 << 50)
    with pytest.raises(ValueError):
        cn.parse_images(rec)


def test_native_non_utf8_image_name():
    """A latin-1 filename byte must raise, not segfault (Py_BuildValue s#)."""
    pytest.importorskip("spinnerf_tpu.native.colmap_native")
    from spinnerf_tpu.native import colmap_native as cn
    import struct
    rec = struct.pack("<Q", 1) + struct.pack("<i", 1) + b"\x00" * 56 + \
        struct.pack("<i", 1) + b"caf\xe9.png\x00" + struct.pack("<Q", 0)
    with pytest.raises((ValueError, UnicodeDecodeError)):
        cn.parse_images(rec)
