"""Mask refinement: shrink object masks to true occlusions by multi-view
reprojection through NeRF depth.

Reference algorithm (`mask_refinement.py:29-224`): for every masked pixel of a
source view, candidate surface depths are the render's z-samples with
significant alpha at/behind the rendered depth; each candidate is unprojected
to world and reprojected into target views. If the target pixel is unmasked
and its surface depth agrees (relative error < distance_thresh), the target's
surface is projected back into the source frame, a source neighbor-disparity
consistency check runs, and on success the pixel is un-masked with the target
color/disparity pasted in. (The reference iterates pixels in Python with a
per-pixel cache and — seemingly unintentionally — only uses target view 0 for
src > 0, `mask_refinement.py:168`; here every (src, tgt) pair runs, fully
vectorized over pixels x candidate samples.)

Camera model: NeRF-convention c2w poses (camera looks -z, y up) and the
z-sample parameterization of `core.rays` (z_val multiplies the pixel dir with
dz = -1), so depth == -z_cam of the surface point.
"""
from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

import numpy as np


@dataclass
class ViewDump:
    """Per-view render products (the `render_path` savedir contract)."""
    image: np.ndarray     # [H, W, 3] float in [0,1]
    mask: np.ndarray      # [H, W] binary
    z: np.ndarray         # [H, W, S] sample depths
    alpha: np.ndarray     # [H, W, S]
    depth: np.ndarray     # [H, W] rendered depth
    disp: np.ndarray      # [H, W] rendered disparity
    c2w: np.ndarray       # [4, 4] NeRF-convention camera-to-world


def load_view_dumps(render_dir, masks) -> list[ViewDump]:
    """Load the artifact tree written by `eval.render.render_path`."""
    import cv2
    render_dir = Path(render_dir)
    n = len(list((render_dir / "rgb").glob("*.png")))
    out = []
    for i in range(n):
        img = cv2.cvtColor(cv2.imread(str(render_dir / "rgb" / f"{i:06d}.png")),
                           cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
        out.append(ViewDump(
            image=img,
            mask=(np.abs(masks[i]) > 0.5).astype(np.float32),
            z=np.load(render_dir / "z" / f"{i:06d}.npy"),
            alpha=np.load(render_dir / "alpha" / f"{i:06d}.npy"),
            depth=np.load(render_dir / "depth" / f"{i:06d}.npy"),
            disp=np.load(render_dir / "disp" / f"{i:06d}.npy"),
            c2w=np.loadtxt(render_dir / "pose" / f"{i:06d}.txt"),
        ))
    return out


def _pix_to_world(u, v, z, c2w, focal, cx, cy):
    """Unproject pixel (u, v) at z-depth z (NeRF param) to world. Shapes
    broadcast; returns [..., 3]."""
    dirs = np.stack([(u - cx) / focal, -(v - cy) / focal,
                     -np.ones_like(u)], axis=-1)
    return c2w[:3, 3] + (dirs * z[..., None]) @ c2w[:3, :3].T


def _world_to_pix(pts, c2w, focal, cx, cy):
    """Project world points into a camera. Returns (u, v, zdepth)."""
    rel = pts - c2w[:3, 3]
    cam = rel @ c2w[:3, :3]          # R^T @ rel, batched
    z = -cam[..., 2]
    u = cx + focal * cam[..., 0] / np.maximum(z, 1e-9)
    v = cy - focal * cam[..., 1] / np.maximum(z, 1e-9)
    return u, v, z


def refine_view(src: ViewDump, targets: list[ViewDump], *, focal, cx, cy,
                alpha_thresh: float = 0.1, distance_thresh: float = 0.01):
    """Refine one source view against target views.

    Returns (image, mask, disp) — copies with refined pixels updated.
    """
    h, w = src.mask.shape
    img = src.image.copy()
    mask = src.mask.copy()
    disp = src.disp.copy()

    ys, xs = np.where(mask > 0.5)
    if len(ys) == 0:
        return img, mask, disp
    s = src.z.shape[-1]

    # candidate surface depths per masked pixel: significant alpha at/behind
    # the rendered depth (`mask_refinement.py:71-78`)
    z_pix = src.z[ys, xs]                       # [P, S]
    a_pix = src.alpha[ys, xs]                   # [P, S]
    a_max = a_pix.max(axis=-1, keepdims=True)
    cand = (a_pix >= alpha_thresh * a_max) & (z_pix >= src.depth[ys, xs, None])

    u_a = xs.astype(np.float64)[:, None].repeat(s, 1)
    v_a = ys.astype(np.float64)[:, None].repeat(s, 1)
    world = _pix_to_world(u_a, v_a, z_pix.astype(np.float64), src.c2w,
                          focal, cx, cy)        # [P, S, 3]

    for tgt in targets:
        if tgt is src:
            continue
        u_b, v_b, z_b = _world_to_pix(world, tgt.c2w, focal, cx, cy)
        ui = np.clip(u_b.astype(np.int64), 0, w - 1)
        vi = np.clip(v_b.astype(np.int64), 0, h - 1)
        in_bounds = (u_b >= 0) & (u_b < w) & (v_b >= 0) & (v_b < h) & (z_b > 0)

        tgt_unmasked = tgt.mask[vi, ui] < 0.5
        tgt_surf_z = 1.0 / np.maximum(tgt.disp[vi, ui], 1e-9)
        agree = np.abs(z_b - tgt_surf_z) / np.maximum(z_b, 1e-9) < distance_thresh
        valid = cand & in_bounds & tgt_unmasked & agree        # [P, S]

        has = valid.any(axis=-1)
        if not has.any():
            continue
        first = np.argmax(valid, axis=-1)                      # [P]
        pi = np.where(has)[0]
        si = first[pi]

        # project the target's surface point back into the source frame
        tw = _pix_to_world(u_b[pi, si], v_b[pi, si], tgt_surf_z[pi, si],
                           tgt.c2w, focal, cx, cy)
        _, _, proj_z = _world_to_pix(tw, src.c2w, focal, cx, cy)

        # source neighbor-disparity consistency against the LIVE disp map
        # (`mask_refinement.py:195-205` reads src_disp as it is updated)
        pads = np.pad(disp, 1, mode="edge")
        neigh = np.stack([pads[dy:dy + h, dx:dx + w]
                          for dy in (0, 1, 2) for dx in (0, 1, 2)
                          if not (dy == 1 and dx == 1)], axis=0)  # [8, H, W]
        nd = np.abs(1.0 / np.maximum(proj_z, 1e-9)
                    - neigh[:, ys[pi], xs[pi]]).min(axis=0)
        ok = nd < distance_thresh
        pi = pi[ok]
        if len(pi) == 0:
            continue
        si = si[ok]
        proj_z = proj_z[ok]

        # re-refinement gate (`mask_refinement.py:194`): update while still
        # masked, OR when a later target sees a CLOSER agreeing surface
        # than the one already pasted (src_disp < 1/z_val)
        cand_disp = 1.0 / np.maximum(proj_z, 1e-9)
        keep = (mask[ys[pi], xs[pi]] > 0.5) | (disp[ys[pi], xs[pi]] < cand_disp)
        pi, si, cand_disp = pi[keep], si[keep], cand_disp[keep]
        if len(pi) == 0:
            continue

        img[ys[pi], xs[pi]] = tgt.image[vi[pi, si], ui[pi, si]]
        mask[ys[pi], xs[pi]] = 0.0
        disp[ys[pi], xs[pi]] = cand_disp

    return img, mask, disp


def refine_all(dumps: list[ViewDump], *, focal, cx, cy,
               alpha_thresh: float = 0.1, distance_thresh: float = 0.01,
               out_dir=None, names=None):
    """Refine every view; optionally write the reference's output layout
    (`refined_images_mv_bootstrapped/{,label/}` + `refined_disp_...`)."""
    results = []
    for i, src in enumerate(dumps):
        results.append(refine_view(src, dumps, focal=focal, cx=cx, cy=cy,
                                   alpha_thresh=alpha_thresh,
                                   distance_thresh=distance_thresh))
    if out_dir is not None:
        import cv2
        out_dir = Path(out_dir)
        (out_dir / "refined_images" / "label").mkdir(parents=True,
                                                     exist_ok=True)
        (out_dir / "refined_disp").mkdir(parents=True, exist_ok=True)
        for i, (img, mask, disp) in enumerate(results):
            name = names[i] if names else f"{i:06d}.png"
            cv2.imwrite(str(out_dir / "refined_images" / name),
                        cv2.cvtColor((img * 255).astype(np.uint8),
                                     cv2.COLOR_RGB2BGR))
            cv2.imwrite(str(out_dir / "refined_images" / "label" / name),
                        (mask * 255).astype(np.uint8))
            cv2.imwrite(str(out_dir / "refined_disp" / name),
                        (np.clip(disp, 0, 1) * 255).astype(np.uint8))
    return results
