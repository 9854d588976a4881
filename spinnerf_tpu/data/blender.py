"""Blender-synthetic (NeRF transforms_*.json) scene loading.

Parity: `DS_NeRF/load_blender.py:36-107` — per-split transforms JSON,
camera_angle_x -> focal, optional half-res, `mask/m_*.png` object masks and
`object/o_*.png` object images (the SPIn-NeRF variant), and the canonical
40-pose spherical render path.
"""
from __future__ import annotations

import json
from pathlib import Path

import cv2
import numpy as np


def _trans_t(t):
    m = np.eye(4)
    m[2, 3] = t
    return m


def _rot_phi(phi):
    m = np.eye(4)
    m[1, 1] = m[2, 2] = np.cos(phi)
    m[1, 2] = -np.sin(phi)
    m[2, 1] = np.sin(phi)
    return m


def _rot_theta(th):
    m = np.eye(4)
    m[0, 0] = m[2, 2] = np.cos(th)
    m[0, 2] = -np.sin(th)
    m[2, 0] = np.sin(th)
    return m


def pose_spherical(theta_deg, phi_deg, radius):
    """c2w on a sphere looking at the origin (blender convention)."""
    c2w = _trans_t(radius)
    c2w = _rot_phi(phi_deg / 180.0 * np.pi) @ c2w
    c2w = _rot_theta(theta_deg / 180.0 * np.pi) @ c2w
    flip = np.array([[-1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1.0]])
    return flip @ c2w


def load_blender_data(basedir, half_res: bool = False, testskip: int = 1,
                      load_masks: bool = True):
    """Returns (images [N,H,W,4], poses [N,4,4], render_poses, (H,W,focal),
    i_split, masks, objects)."""
    basedir = Path(basedir)
    splits = ["train", "val", "test"]
    metas = {s: json.load(open(basedir / f"transforms_{s}.json"))
             for s in splits if (basedir / f"transforms_{s}.json").exists()}

    all_imgs, all_poses, counts = [], [], [0]
    masks, objects = [], []
    for s in splits:
        if s not in metas:
            counts.append(counts[-1])
            continue
        meta = metas[s]
        skip = 1 if s == "train" or testskip == 0 else testskip
        for frame in meta["frames"][::skip]:
            fp = basedir / (frame["file_path"] + ".png")
            img = cv2.imread(str(fp), cv2.IMREAD_UNCHANGED)
            if img.shape[2] == 4:
                img = cv2.cvtColor(img, cv2.COLOR_BGRA2RGBA)
            else:
                img = cv2.cvtColor(img, cv2.COLOR_BGR2RGBA)
            all_imgs.append(img.astype(np.float32) / 255.0)
            all_poses.append(np.array(frame["transform_matrix"], np.float32))

            if load_masks:
                name = Path(frame["file_path"]).name
                mdir = fp.parent / "mask" / f"m_{name}.png"
                odir = fp.parent / "object" / f"o_{name}.png"
                h, w = img.shape[:2]
                if mdir.exists():
                    m = cv2.imread(str(mdir), cv2.IMREAD_GRAYSCALE)
                    masks.append((m > 127).astype(np.float32))
                else:
                    masks.append(-np.ones((h, w), np.float32))
                if odir.exists():
                    o = cv2.imread(str(odir), cv2.IMREAD_UNCHANGED)
                    objects.append(o.astype(np.float32) / 255.0)
                else:
                    objects.append(np.zeros((h, w, 3), np.float32))
        counts.append(len(all_imgs))

    imgs = np.stack(all_imgs)
    poses = np.stack(all_poses)
    i_split = [np.arange(counts[i], counts[i + 1]) for i in range(3)]

    h, w = imgs.shape[1:3]
    camera_angle_x = float(next(iter(metas.values()))["camera_angle_x"])
    focal = 0.5 * w / np.tan(0.5 * camera_angle_x)

    render_poses = np.stack(
        [pose_spherical(a, -30.0, 4.0)
         for a in np.linspace(-180, 180, 41)[:-1]]).astype(np.float32)

    if half_res:
        h, w, focal = h // 2, w // 2, focal / 2.0
        imgs = np.stack([cv2.resize(i, (w, h), interpolation=cv2.INTER_AREA)
                         for i in imgs])
        if load_masks and masks:
            masks = [cv2.resize(m, (w, h), interpolation=cv2.INTER_NEAREST)
                     for m in masks]
            objects = [cv2.resize(o, (w, h), interpolation=cv2.INTER_AREA)
                       for o in objects]

    masks = np.stack(masks) if load_masks and masks else None
    objects = np.stack(objects) if load_masks and objects else None
    return imgs, poses, render_poses, (h, w, focal), i_split, masks, objects


def composite_white(images):
    """RGBA -> RGB over white (the `--white_bkgd` path, `run_nerf.py:1074-1078`)."""
    return images[..., :3] * images[..., 3:] + (1.0 - images[..., 3:])
