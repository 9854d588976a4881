"""Fast COLMAP model reading via the native C++ parser, with transparent
fallback to the pure-Python readers in `data.colmap`.

The native module returns raw little-endian buffers; numpy views them
zero-copy. Same output types as `colmap.read_model`.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np

from spinnerf_tpu.data import colmap as _py


def native_available() -> bool:
    try:
        from spinnerf_tpu.native import colmap_native  # noqa: F401
        return True
    except ImportError:
        return False


def build_native():
    from spinnerf_tpu.native.build import build
    build(verbose=False)


_MODEL_NAMES = {mid: name for mid, (name, _) in _py.CAMERA_MODELS.items()}


def read_cameras_binary(path):
    from spinnerf_tpu.native import colmap_native as cn
    rows = cn.parse_cameras(Path(path).read_bytes())
    out = {}
    for cam_id, model_id, width, height, params in rows:
        out[cam_id] = _py.Camera(cam_id, _MODEL_NAMES[model_id], width,
                                 height, np.frombuffer(params, "<f8").copy())
    return out


def read_images_binary(path):
    from spinnerf_tpu.native import colmap_native as cn
    rows = cn.parse_images(Path(path).read_bytes())
    out = {}
    for img_id, qvec, tvec, cam_id, name, xys, ids in rows:
        out[img_id] = _py.Image(
            img_id, np.frombuffer(qvec, "<f8").copy(),
            np.frombuffer(tvec, "<f8").copy(), cam_id, name,
            np.frombuffer(xys, "<f8").reshape(-1, 2).copy(),
            np.frombuffer(ids, "<i8").copy())
    return out


def read_points3d_binary(path):
    from spinnerf_tpu.native import colmap_native as cn
    ids_b, xyz_b, rgb_b, err_b, off_b, trk_b = cn.parse_points(
        Path(path).read_bytes())
    ids = np.frombuffer(ids_b, "<i8")
    xyz = np.frombuffer(xyz_b, "<f8").reshape(-1, 3)
    rgb = np.frombuffer(rgb_b, np.uint8).reshape(-1, 3)
    err = np.frombuffer(err_b, "<f8")
    offsets = np.frombuffer(off_b, "<i8")
    tracks = np.frombuffer(trk_b, "<i4").reshape(-1, 2)
    out = {}
    for i, pid in enumerate(ids):
        t = tracks[offsets[i]:offsets[i + 1]]
        out[int(pid)] = _py.Point3D(int(pid), xyz[i].copy(), rgb[i].copy(),
                                    float(err[i]), t[:, 0].copy(),
                                    t[:, 1].copy())
    return out


def read_model(sparse_dir):
    """Drop-in for `colmap.read_model`: native when built, Python otherwise."""
    sparse_dir = Path(sparse_dir)
    if not native_available() or not (sparse_dir / "cameras.bin").exists():
        return _py.read_model(sparse_dir)
    return (read_cameras_binary(sparse_dir / "cameras.bin"),
            read_images_binary(sparse_dir / "images.bin"),
            read_points3d_binary(sparse_dir / "points3D.bin"))


# --- columnar fast path -------------------------------------------------------
# Building one Python object per 3D point erases the native parser's win; the
# hot consumer (`sparse_depth_for_views`) only needs columns. This path keeps
# everything as numpy arrays end to end.

def read_points_columns(path):
    """points3D.bin -> dict of columns: ids [N], xyz [N,3], error [N]."""
    from spinnerf_tpu.native import colmap_native as cn
    ids_b, xyz_b, rgb_b, err_b, _, _ = cn.parse_points(Path(path).read_bytes())
    return {
        "ids": np.frombuffer(ids_b, "<i8"),
        "xyz": np.frombuffer(xyz_b, "<f8").reshape(-1, 3),
        "error": np.frombuffer(err_b, "<f8"),
    }


def sparse_depth_for_views(sparse_dir, *, factor: float = 1.0,
                           bd_scale: float = 1.0, bounds=None):
    """Vectorized drop-in for `colmap.sparse_depth_for_views` (native parse +
    columnar math; no per-point Python objects)."""
    sparse_dir = Path(sparse_dir)
    if not native_available() or not (sparse_dir / "points3D.bin").exists():
        return _py.sparse_depth_for_views(sparse_dir, factor=factor,
                                          bd_scale=bd_scale, bounds=bounds)
    images = read_images_binary(sparse_dir / "images.bin")
    cols = read_points_columns(sparse_dir / "points3D.bin")
    err_mean = float(cols["error"].mean()) if len(cols["error"]) else 1.0

    # id -> row lookup table (ids are dense-ish small ints in COLMAP)
    max_id = int(cols["ids"].max()) if len(cols["ids"]) else 0
    lut = np.full(max_id + 2, -1, np.int64)
    lut[cols["ids"]] = np.arange(len(cols["ids"]))

    img_ids = sorted(images, key=lambda i: images[i].name)
    out = []
    for view_idx, iid in enumerate(img_ids):
        im = images[iid]
        pid = im.point3d_ids
        valid = (pid >= 0) & (pid <= max_id)
        rows = np.where(valid)[0]
        pr = lut[pid[rows]]
        rows = rows[pr >= 0]
        pr = pr[pr >= 0]
        if len(rows) == 0:
            out.append({"depth": np.zeros(0), "coord": np.zeros((0, 2)),
                        "weight": np.zeros(0)})
            continue
        xyz = cols["xyz"][pr]
        err = cols["error"][pr]
        w2c = im.world_to_cam()
        z = (xyz @ w2c[2, :3].T + w2c[2, 3]) * bd_scale
        if bounds is not None:
            lo, hi = np.asarray(bounds[view_idx]) * bd_scale
            inb = (z >= lo) & (z <= hi)
        else:
            inb = z > 0
        weight = 2.0 * np.exp(-((err / err_mean) ** 2))
        out.append({"depth": z[inb], "coord": im.xys[rows][inb] / factor,
                    "weight": weight[inb]})
    return out
