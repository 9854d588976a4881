"""Visualization helpers: sigma-vs-depth plots, keypoint overlays, sanity
panels, HTML galleries.

Reference equivalents: `visualize_sigma` (`run_nerf_helpers.py:420-425`),
keypoint viz (`DS_NeRF/utils/visualization.py:8`), the 3-panel i_feat sanity
image (`run_nerf.py:1581-1597`), and the dominate-based HTML galleries
(`DS_NeRF/utils/generate_html.py`) — plain-string templated here.
"""
from __future__ import annotations

import html
from pathlib import Path

import numpy as np


def visualize_sigma(sigma, z_vals, filename):
    """Plot density along one ray (the --render_test_ray mode output)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    plt.figure()
    plt.plot(np.asarray(z_vals), np.asarray(sigma))
    plt.xlabel("z_vals")
    plt.ylabel("sigma")
    plt.savefig(filename)
    plt.close()


def draw_keypoints(image, coords, radius: int = 2, color=(255, 0, 0)):
    """Overlay keypoints on a float image. coords are (x, y)."""
    import cv2
    img = (np.clip(np.asarray(image), 0, 1) * 255).astype(np.uint8).copy()
    for x, y in np.asarray(coords):
        cv2.circle(img, (int(x), int(y)), radius, color, -1)
    return img.astype(np.float32) / 255.0


def sanity_panel(rgb, inpainted_depth, disp, filename):
    """The reference's per-i_feat 3-panel debug image (render / inpainted
    depth prior / rendered disparity)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, axes = plt.subplots(1, 3, figsize=(12, 4), dpi=150)
    axes[0].imshow(np.clip(np.asarray(rgb), 0, 1))
    axes[0].set_title("render")
    axes[1].imshow(np.asarray(inpainted_depth))
    axes[1].set_title("inpainted depth")
    axes[2].imshow(np.nan_to_num(np.asarray(disp)))
    axes[2].set_title("disparity")
    for ax in axes:
        ax.axis("off")
    fig.savefig(filename, bbox_inches="tight")
    plt.close(fig)


def write_gallery(out_path, rows, title: str = "spinnerf results"):
    """Write a self-contained HTML image gallery.

    Args:
      rows: list of (label, [image paths relative to out_path's dir]).
    """
    out_path = Path(out_path)
    parts = [f"<!doctype html><html><head><meta charset='utf-8'>"
             f"<title>{html.escape(title)}</title>"
             "<style>body{font-family:sans-serif;background:#111;color:#eee}"
             "img{max-height:220px;margin:4px;border-radius:4px}"
             "h2{margin:12px 4px 2px}</style></head><body>"
             f"<h1>{html.escape(title)}</h1>"]
    for label, paths in rows:
        parts.append(f"<h2>{html.escape(str(label))}</h2><div>")
        for p in paths:
            parts.append(f"<img src='{html.escape(str(p))}' "
                         f"title='{html.escape(str(p))}'>")
        parts.append("</div>")
    parts.append("</body></html>")
    out_path.write_text("".join(parts))
    return out_path
