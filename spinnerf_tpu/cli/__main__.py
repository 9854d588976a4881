"""Command-line entry: `python -m spinnerf_tpu.cli <command> [flags]`.

Commands mirror the reference's separately-launched programs (SURVEY §0):
  train    DS-NeRF training / --prepare pass (`DS_NeRF/run_nerf.py`)
  render   render-only modes (`--render_only` equivalents)
  eval     PSNR/SSIM/LPIPS over two image dirs (`eval_metrics_script.py`)
  poses    COLMAP -> poses_bounds.npy export (`imgs2poses.py`)
  synth    generate the synthetic test scene

All accept `--config <file>` with the reference's config.txt syntax.
"""
from __future__ import annotations

import sys


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return 0
    cmd, rest = argv[0], argv[1:]

    if cmd == "train":
        from spinnerf_tpu.config import load_config
        from spinnerf_tpu.train.loop import Trainer
        cfg = load_config(rest)
        tr = Trainer(cfg)
        tr.fit()
        return 0

    if cmd == "render":
        from spinnerf_tpu.config import load_config
        from spinnerf_tpu.train.loop import Trainer
        cfg = load_config(rest)
        cfg.no_reload = False
        tr = Trainer(cfg)
        start = tr.state.step
        if cfg.render_test:
            poses, name = tr.scene.poses[tr.i_test], "test"
            gt = tr.scene.images[tr.i_test]
        elif cfg.render_train:
            poses, name = tr.scene.poses[tr.i_train], "train"
            gt = tr.scene.images[tr.i_train]
        else:
            poses, name, gt = tr.scene.render_poses, "path", None
        out = tr.exp_dir / f"renderonly_{name}_{start:06d}"
        rgbs, disps = tr.render_poses_list(poses, save_dir=out, gt_images=gt,
                                           save_alpha=True)
        from spinnerf_tpu.eval import render as eval_render
        eval_render.write_video(out / "rgb.mp4", rgbs)
        eval_render.write_video(out / "disp.mp4",
                                eval_render.normalize_disps_for_video(disps))
        print(f"wrote {len(rgbs)} frames to {out}")
        return 0

    if cmd == "eval":
        from spinnerf_tpu.eval.cli import eval_dirs
        return eval_dirs(rest)

    if cmd == "poses":
        import numpy as np
        from pathlib import Path

        from spinnerf_tpu.data import colmap
        scene = Path(rest[0])
        arr, names = colmap.poses_bounds_from_model(scene / "sparse" / "0")
        np.save(scene / "poses_bounds.npy", arr)
        print(f"wrote poses_bounds.npy for {len(names)} views")
        return 0

    if cmd == "synth":
        from spinnerf_tpu.data import synthetic
        out = synthetic.make_scene(rest[0])
        print(f"synthetic scene written to {out}")
        return 0

    print(f"unknown command: {cmd}", file=sys.stderr)
    return 2


if __name__ == "__main__":
    sys.exit(main())
