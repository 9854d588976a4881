"""CLI-level tests: train then the render-only modes (`spinnerf render`,
the `--render_only` equivalents of `DS_NeRF/run_nerf.py:1167-1220`)."""
import numpy as np
import pytest

# integration-heavy module: full-suite lane only (fast lane: -m 'not slow')
pytestmark = pytest.mark.slow

from spinnerf_tpu.cli.__main__ import main as cli_main
from spinnerf_tpu.data import synthetic


@pytest.fixture(scope="module")
def trained_exp(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli_render")
    scene = synthetic.make_scene(tmp / "scene", n_views=5, h=32, w=40,
                                 factor=1)
    args = [
        "--expname", "cli", "--basedir", str(tmp / "logs"),
        "--datadir", str(scene), "--factor", "1",
        "--no_ndc", "True", "--no_tcnn", "True",
        "--netdepth", "2", "--netwidth", "32",
        "--multires", "4", "--multires_views", "2",
        "--N_samples", "8", "--N_importance", "4", "--N_rand", "64",
        "--N_iters", "12", "--i_print", "1000", "--i_weights", "10",
        "--i_video", "0", "--i_testset", "0", "--i_feat", "0",
        "--chunk", "2048", "--compute_dtype", "float32", "--N_gt", "1",
    ]
    assert cli_main(["train"] + args) == 0
    return tmp, args


def test_render_test_mode(trained_exp):
    tmp, args = trained_exp
    assert cli_main(["render"] + args + ["--render_only", "True",
                                         "--render_test", "True"]) == 0
    outs = list((tmp / "logs" / "cli").glob("renderonly_test_*"))
    assert outs, "no renderonly_test dir written"
    # per-frame artifact dump contract (rgb/disp/depth/... subdirs)
    assert list((outs[0] / "rgb").glob("*.png"))
    assert (outs[0] / "rgb.mp4").exists()


def test_render_path_mode(trained_exp):
    tmp, args = trained_exp
    assert cli_main(["render"] + args + ["--render_only", "True"]) == 0
    outs = list((tmp / "logs" / "cli").glob("renderonly_path_*"))
    assert outs and (outs[0] / "disp.mp4").exists()


def test_render_mypath_mode(trained_exp):
    """--render_mypath: circular path around a held-out view
    (`run_nerf.py:1124-1127,1176`)."""
    tmp, args = trained_exp
    assert cli_main(["render"] + args + ["--render_only", "True",
                                         "--render_mypath", "True"]) == 0
    outs = list((tmp / "logs" / "cli").glob("renderonly_mypath_*"))
    assert outs, "no renderonly_mypath dir written"
    frames = list((outs[0] / "rgb").glob("*.png"))
    assert len(frames) == 40  # one orbit of 40 poses around the anchor


def test_render_test_ray_mode(trained_exp):
    tmp, args = trained_exp
    assert cli_main(["render"] + args + ["--render_only", "True",
                                         "--render_test_ray", "True"]) == 0
    outs = list((tmp / "logs" / "cli").glob("renderonly_ray_*"))
    assert outs and (outs[0] / "rays.png").exists()
