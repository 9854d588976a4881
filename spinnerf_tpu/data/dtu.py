"""DTU and NeRD dataset loading.

Parity:
- DTU (`DS_NeRF/load_dtu.py:6-71`): `cameras.npz` of `world_mat_<i>`
  projection matrices P = K [R | t], decomposed into intrinsics + NeRF-frame
  c2w; images from `image/`.
- NeRD (`DS_NeRF/load_nerd.py:244-326`): LLFF layout plus `masks/` and (when
  present) object images; reuses the LLFF pose math.
"""
from __future__ import annotations

from pathlib import Path

import cv2
import numpy as np

from spinnerf_tpu.data import llff


def decompose_projection(p: np.ndarray):
    """P [3,4] -> (K [3,3] normalized, c2w [3,4] NeRF convention).

    RQ-decompose the left 3x3 into K (upper triangular, positive diagonal)
    and R (world->cam rotation); camera center c = -R^T K^-1 ... computed via
    the null space. The NeRF frame flips y/z of the OpenCV camera axes.
    """
    m = p[:3, :3]
    # RQ decomposition via QR of the flipped matrix
    rev = np.eye(3)[::-1]
    q, r = np.linalg.qr((rev @ m).T)
    k = rev @ r.T @ rev
    rot = rev @ q.T
    # positive diagonal of K
    sgn = np.diag(np.sign(np.diag(k)))
    k = k @ sgn
    rot = sgn @ rot
    if np.linalg.det(rot) < 0:
        rot = -rot
        k = -k
    k = k / k[2, 2]
    t = np.linalg.inv(k) @ p[:3, 3]
    # camera center in world coords
    center = -rot.T @ t
    # OpenCV cam axes (x right, y down, z forward) -> NeRF (x right, y up, -z)
    r_nerf = np.stack([rot[0], -rot[1], -rot[2]], axis=0).T  # c2w rotation
    c2w = np.concatenate([r_nerf, center[:, None]], axis=1)
    return k, c2w.astype(np.float32)


def load_dtu_data(basedir):
    """Returns (images [N,H,W,3], poses [N,3,4], (H, W, focal))."""
    basedir = Path(basedir)
    cams = np.load(basedir / "cameras.npz")
    img_files = sorted((basedir / "image").glob("*"))
    images, poses, focals = [], [], []
    for i, f in enumerate(img_files):
        img = cv2.cvtColor(cv2.imread(str(f)), cv2.COLOR_BGR2RGB)
        images.append(img.astype(np.float32) / 255.0)
        p = cams[f"world_mat_{i}"][:3, :4]
        k, c2w = decompose_projection(p)
        poses.append(c2w)
        focals.append((k[0, 0] + k[1, 1]) / 2.0)
    images = np.stack(images)
    h, w = images.shape[1:3]
    return images, np.stack(poses), (h, w, float(np.mean(focals)))


def load_nerd_data(basedir, factor=8, recenter=True, bd_factor=0.75,
                   spherify=False):
    """NeRD layout: LLFF scene + `masks/` dir. Returns (images, poses, bds,
    render_poses, i_holdout, masks, objects)."""
    scene = llff.load_scene(basedir, factor=factor, recenter=recenter,
                            bd_factor=bd_factor, spherify=spherify,
                            prepare=True, mask_subdir="masks",
                            dilate_iterations=0, load_inpainted=False)
    h, w = scene.images.shape[1:3]
    objects = None
    obj_dir = Path(basedir) / (f"images_{factor}" if factor != 1
                               else "images") / "objects"
    if obj_dir.exists():
        objs = []
        for f in sorted(obj_dir.glob("*.png")):
            o = cv2.cvtColor(cv2.imread(str(f)), cv2.COLOR_BGR2RGB)
            objs.append(o.astype(np.float32) / 255.0)
        objects = np.stack(objs) if objs else None
    return (scene.images, scene.poses, scene.bounds, scene.render_poses,
            scene.i_holdout, scene.masks, objects)
