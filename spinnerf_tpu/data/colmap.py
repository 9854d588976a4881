"""COLMAP sparse-model IO, written against the public COLMAP binary/text
format specification (src/colmap/scene/reconstruction_io.cc upstream).

Covers what the pipeline needs (the reference's equivalent surface is
`DS_NeRF/colmapUtils/read_write_model.py` and `read_write_dense.py`):
cameras/images/points3D in binary and text form, quaternion<->rotation
helpers, dense depth/normal map arrays, and the derived products used for
training — per-view sparse depth with reprojection-error weights
(`load_colmap_depth` parity, `DS_NeRF/load_llff.py:448-501`) and the
poses_bounds.npy exporter (`imgs2poses.py:58-91` parity).

Vectorized where the format allows: fixed-stride payloads (points3D tracks,
per-image 2D points) are decoded with numpy frombuffer instead of per-record
struct unpacking.
"""
from __future__ import annotations

import os
import struct
from dataclasses import dataclass
from pathlib import Path

import numpy as np

# camera model id -> (name, #params). Public COLMAP enumeration.
CAMERA_MODELS = {
    0: ("SIMPLE_PINHOLE", 3),
    1: ("PINHOLE", 4),
    2: ("SIMPLE_RADIAL", 4),
    3: ("RADIAL", 5),
    4: ("OPENCV", 8),
    5: ("OPENCV_FISHEYE", 8),
    6: ("FULL_OPENCV", 12),
    7: ("FOV", 5),
    8: ("SIMPLE_RADIAL_FISHEYE", 4),
    9: ("RADIAL_FISHEYE", 5),
    10: ("THIN_PRISM_FISHEYE", 12),
}
CAMERA_MODEL_IDS = {name: mid for mid, (name, _) in CAMERA_MODELS.items()}


@dataclass
class Camera:
    id: int
    model: str
    width: int
    height: int
    params: np.ndarray  # [num_params] float64


@dataclass
class Image:
    id: int
    qvec: np.ndarray        # [4] (w, x, y, z)
    tvec: np.ndarray        # [3]
    camera_id: int
    name: str
    xys: np.ndarray         # [N, 2] keypoint pixel coords
    point3d_ids: np.ndarray  # [N] int64, -1 = no triangulation

    def rotmat(self) -> np.ndarray:
        return qvec_to_rotmat(self.qvec)

    def world_to_cam(self) -> np.ndarray:
        """[4,4] world->camera matrix."""
        m = np.eye(4)
        m[:3, :3] = self.rotmat()
        m[:3, 3] = self.tvec
        return m

    def cam_to_world(self) -> np.ndarray:
        """[4,4] camera->world matrix (inverse of the stored pose)."""
        r = self.rotmat()
        m = np.eye(4)
        m[:3, :3] = r.T
        m[:3, 3] = -r.T @ self.tvec
        return m


@dataclass
class Point3D:
    id: int
    xyz: np.ndarray         # [3]
    rgb: np.ndarray         # [3] uint8
    error: float
    image_ids: np.ndarray   # [track_len]
    point2d_idxs: np.ndarray  # [track_len]


def qvec_to_rotmat(q) -> np.ndarray:
    """Rotation matrix from a (w, x, y, z) quaternion."""
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def rotmat_to_qvec(r) -> np.ndarray:
    """(w, x, y, z) quaternion from a rotation matrix (Shepperd's method)."""
    k = np.array([
        [r[0, 0] - r[1, 1] - r[2, 2], 0, 0, 0],
        [r[0, 1] + r[1, 0], r[1, 1] - r[0, 0] - r[2, 2], 0, 0],
        [r[0, 2] + r[2, 0], r[1, 2] + r[2, 1], r[2, 2] - r[0, 0] - r[1, 1], 0],
        [r[2, 1] - r[1, 2], r[0, 2] - r[2, 0], r[1, 0] - r[0, 1],
         r[0, 0] + r[1, 1] + r[2, 2]],
    ]) / 3.0
    vals, vecs = np.linalg.eigh(k)
    q = vecs[[3, 0, 1, 2], np.argmax(vals)]
    return -q if q[0] < 0 else q


# --- binary readers ---------------------------------------------------------

def read_cameras_binary(path) -> dict[int, Camera]:
    cameras = {}
    with open(path, "rb") as f:
        (n,) = struct.unpack("<Q", f.read(8))
        for _ in range(n):
            cam_id, model_id, width, height = struct.unpack("<iiQQ", f.read(24))
            name, n_params = CAMERA_MODELS[model_id]
            params = np.frombuffer(f.read(8 * n_params), dtype="<f8")
            cameras[cam_id] = Camera(cam_id, name, width, height, params.copy())
    return cameras


def read_images_binary(path) -> dict[int, Image]:
    images = {}
    with open(path, "rb") as f:
        (n,) = struct.unpack("<Q", f.read(8))
        for _ in range(n):
            img_id = struct.unpack("<i", f.read(4))[0]
            qvec = np.frombuffer(f.read(32), dtype="<f8").copy()
            tvec = np.frombuffer(f.read(24), dtype="<f8").copy()
            (cam_id,) = struct.unpack("<i", f.read(4))
            name = b""
            while (c := f.read(1)) != b"\x00":
                name += c
            (n_pts,) = struct.unpack("<Q", f.read(8))
            rec = np.frombuffer(f.read(24 * n_pts),
                                dtype=[("xy", "<f8", 2), ("id3d", "<i8")])
            images[img_id] = Image(img_id, qvec, tvec, cam_id,
                                   name.decode("utf-8"),
                                   rec["xy"].copy(), rec["id3d"].copy())
    return images


def read_points3d_binary(path) -> dict[int, Point3D]:
    points = {}
    with open(path, "rb") as f:
        (n,) = struct.unpack("<Q", f.read(8))
        for _ in range(n):
            pt_id, = struct.unpack("<q", f.read(8))
            xyz = np.frombuffer(f.read(24), dtype="<f8").copy()
            rgb = np.frombuffer(f.read(3), dtype=np.uint8).copy()
            (error,) = struct.unpack("<d", f.read(8))
            (track_len,) = struct.unpack("<Q", f.read(8))
            track = np.frombuffer(f.read(8 * track_len),
                                  dtype=[("img", "<i4"), ("idx", "<i4")])
            points[pt_id] = Point3D(pt_id, xyz, rgb, error,
                                    track["img"].copy(), track["idx"].copy())
    return points


# --- binary writers (round-trip support, used by tests and staging) ---------

def write_cameras_binary(cameras: dict[int, Camera], path):
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(cameras)))
        for cam in cameras.values():
            model_id = CAMERA_MODEL_IDS[cam.model]
            f.write(struct.pack("<iiQQ", cam.id, model_id, cam.width, cam.height))
            f.write(np.asarray(cam.params, dtype="<f8").tobytes())


def write_images_binary(images: dict[int, Image], path):
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(images)))
        for im in images.values():
            f.write(struct.pack("<i", im.id))
            f.write(np.asarray(im.qvec, dtype="<f8").tobytes())
            f.write(np.asarray(im.tvec, dtype="<f8").tobytes())
            f.write(struct.pack("<i", im.camera_id))
            f.write(im.name.encode("utf-8") + b"\x00")
            f.write(struct.pack("<Q", len(im.xys)))
            rec = np.empty(len(im.xys), dtype=[("xy", "<f8", 2), ("id3d", "<i8")])
            rec["xy"] = im.xys
            rec["id3d"] = im.point3d_ids
            f.write(rec.tobytes())


def write_points3d_binary(points: dict[int, Point3D], path):
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(points)))
        for pt in points.values():
            f.write(struct.pack("<q", pt.id))
            f.write(np.asarray(pt.xyz, dtype="<f8").tobytes())
            f.write(np.asarray(pt.rgb, dtype=np.uint8).tobytes())
            f.write(struct.pack("<d", pt.error))
            f.write(struct.pack("<Q", len(pt.image_ids)))
            rec = np.empty(len(pt.image_ids), dtype=[("img", "<i4"), ("idx", "<i4")])
            rec["img"] = pt.image_ids
            rec["idx"] = pt.point2d_idxs
            f.write(rec.tobytes())


# --- text readers (COLMAP's alternative export format) ----------------------

def read_cameras_text(path) -> dict[int, Camera]:
    cameras = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            cam_id, model = int(parts[0]), parts[1]
            cameras[cam_id] = Camera(cam_id, model, int(parts[2]),
                                     int(parts[3]),
                                     np.array([float(p) for p in parts[4:]]))
    return cameras


def read_images_text(path) -> dict[int, Image]:
    images = {}
    with open(path) as f:
        # an image with zero 2D points has an EMPTY second line — keep
        # blank lines so the header/points 2-line pairing stays in sync
        lines = [l.strip() for l in f if not l.startswith("#")]
    for header, data in zip(lines[0::2], lines[1::2]):
        p = header.split()
        img_id = int(p[0])
        qvec = np.array([float(x) for x in p[1:5]])
        tvec = np.array([float(x) for x in p[5:8]])
        cam_id = int(p[8])
        name = p[9]
        d = data.split()
        xys = np.array(d, dtype=np.float64).reshape(-1, 3)[:, :2] \
            if d else np.zeros((0, 2))
        ids = np.array(d[2::3], dtype=np.int64) if d else np.zeros(0, np.int64)
        images[img_id] = Image(img_id, qvec, tvec, cam_id, name, xys, ids)
    return images


def read_points3d_text(path) -> dict[int, Point3D]:
    points = {}
    with open(path) as f:
        lines = f.readlines()
    for line in lines:
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        p = line.split()
        pt_id = int(p[0])
        xyz = np.array(p[1:4], dtype=np.float64)
        rgb = np.array(p[4:7], dtype=np.uint8)
        error = float(p[7])
        track = np.array(p[8:], dtype=np.int64).reshape(-1, 2)
        points[pt_id] = Point3D(pt_id, xyz, rgb, error,
                                track[:, 0].astype(np.int32),
                                track[:, 1].astype(np.int32))
    return points


def read_model(sparse_dir):
    """Read a sparse model dir, preferring binary, falling back to text."""
    sparse_dir = Path(sparse_dir)
    if (sparse_dir / "cameras.bin").exists():
        return (read_cameras_binary(sparse_dir / "cameras.bin"),
                read_images_binary(sparse_dir / "images.bin"),
                read_points3d_binary(sparse_dir / "points3D.bin"))
    return (read_cameras_text(sparse_dir / "cameras.txt"),
            read_images_text(sparse_dir / "images.txt"),
            read_points3d_text(sparse_dir / "points3D.txt"))


# --- dense-reconstruction array IO (COLMAP .bin depth/normal maps) ----------

def read_dense_array(path) -> np.ndarray:
    """Read a COLMAP dense depth/normal map: ASCII 'w&h&c&' header then
    float32 data in column-major channel order."""
    with open(path, "rb") as f:
        header = b""
        amps = 0
        while amps < 3:
            c = f.read(1)
            if not c:
                raise ValueError(
                    f"{path}: truncated/invalid dense-array header")
            header += c
            if c == b"&":
                amps += 1
        w, h, c = (int(x) for x in header.decode().split("&")[:3])
        data = np.frombuffer(f.read(), dtype="<f4")
    return data.reshape(c, h, w).transpose(1, 2, 0).squeeze()


def write_dense_array(arr: np.ndarray, path):
    arr = np.atleast_3d(np.asarray(arr, dtype="<f4"))
    h, w, c = arr.shape
    with open(path, "wb") as f:
        f.write(f"{w}&{h}&{c}&".encode())
        f.write(arr.transpose(2, 0, 1).tobytes())


# --- derived products -------------------------------------------------------

def camera_focal_hw(cam: Camera):
    """(focal, height, width) assuming a shared-focal pinhole-style model."""
    return float(cam.params[0]), cam.height, cam.width


def poses_bounds_from_model(sparse_dir, perc=(0.1, 99.9)):
    """Build the LLFF `poses_bounds.npy` array [N, 17] from a sparse model.

    Per view: 3x5 matrix ([down, right, backward] axis convention — i.e. the
    c2w columns permuted to [-y, x, z] of the COLMAP frame — with the hwf
    column appended) plus (close, far) z-depth percentiles of the points seen
    by that view. Parity: `imgs2poses.py:58-91`.
    """
    cameras, images, points = read_model(sparse_dir)
    img_ids = sorted(images, key=lambda i: images[i].name)
    focal_hw = {cid: camera_focal_hw(c) for cid, c in cameras.items()}

    pts = {pid: p.xyz for pid, p in points.items()}
    rows = []
    for iid in img_ids:
        im = images[iid]
        c2w = im.cam_to_world()
        f, h, w = focal_hw[im.camera_id]
        # LLFF stores [down, right, backward | t | hwf]. COLMAP's camera c2w
        # columns are (right, down, forward), so down = +y, backward = -z.
        m = np.concatenate(
            [c2w[:3, 1:2], c2w[:3, 0:1], -c2w[:3, 2:3], c2w[:3, 3:4],
             np.array([[h], [w], [f]])], axis=1)
        # z-depths of this view's triangulated points
        w2c = im.world_to_cam()
        vis = [pts[pid] for pid in im.point3d_ids if pid != -1 and pid in pts]
        if vis:
            xyz = np.stack(vis)
            z = (xyz @ w2c[2, :3].T) + w2c[2, 3]
            close, far = np.percentile(z, perc[0]), np.percentile(z, perc[1])
        else:
            close, far = 0.1, 100.0
        rows.append(np.concatenate([m.ravel(), [close, far]]))
    return np.stack(rows), [images[i].name for i in img_ids]


def sparse_depth_for_views(sparse_dir, *, factor: float = 1.0,
                           bd_scale: float = 1.0, bounds: np.ndarray | None = None):
    """Per-view sparse depth supervision from the triangulated points.

    For every keypoint with a 3D track: z-depth in the camera frame (scaled by
    `bd_scale`), pixel coordinate (divided by `factor`), and confidence weight
    `2 * exp(-(err / mean_err)^2)`. Points outside the view's [close, far]
    bounds are dropped. Parity: `load_colmap_depth` (`load_llff.py:448-501`).

    Returns:
      list (per view, sorted by image name) of dicts with keys
      "depth" [K], "coord" [K, 2], "weight" [K].
    """
    cameras, images, points = read_model(sparse_dir)
    img_ids = sorted(images, key=lambda i: images[i].name)

    errors = np.array([p.error for p in points.values()])
    err_mean = float(errors.mean()) if len(errors) else 1.0

    out = []
    for view_idx, iid in enumerate(img_ids):
        im = images[iid]
        w2c = im.world_to_cam()
        valid = im.point3d_ids != -1
        ids = im.point3d_ids[valid]
        xys = im.xys[valid]
        keep = np.array([pid in points for pid in ids], dtype=bool)
        ids, xys = ids[keep], xys[keep]
        if len(ids) == 0:
            out.append({"depth": np.zeros(0), "coord": np.zeros((0, 2)),
                        "weight": np.zeros(0)})
            continue
        xyz = np.stack([points[pid].xyz for pid in ids])
        err = np.array([points[pid].error for pid in ids])
        z = ((xyz @ w2c[2, :3].T) + w2c[2, 3]) * bd_scale
        if bounds is not None:
            lo, hi = np.asarray(bounds[view_idx], np.float64) * bd_scale
            inb = (z >= lo) & (z <= hi)
        else:
            inb = z > 0
        weight = 2.0 * np.exp(-((err / err_mean) ** 2))
        out.append({"depth": z[inb], "coord": xys[inb] / factor,
                    "weight": weight[inb]})
    return out
