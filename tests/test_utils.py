"""Aux-subsystem tests: live control, debug checks, gallery, render paths."""
import json
import numpy as np
import jax.numpy as jnp
import pytest

from spinnerf_tpu.config import Config
from spinnerf_tpu.utils import debug, live_control, renderpath, visualization


def test_live_control_applies_mutable_keys(tmp_path):
    cfg = Config(expname="lc", basedir=str(tmp_path), render_factor=0)
    lc = live_control.LiveControl(cfg, tmp_path / "control.json",
                                  log=lambda *a: None)
    assert lc.poll() == {}  # no file yet
    (tmp_path / "control.json").write_text(
        json.dumps({"render_factor": 4, "white_bkgd": True, "lrate": 9.0}))
    applied = lc.poll()
    assert applied == {"render_factor": 4, "white_bkgd": True}
    assert cfg.render_factor == 4 and cfg.white_bkgd is True
    assert cfg.lrate != 9.0            # immutable key rejected
    assert lc.poll() == {}             # unchanged file -> no reapply


def test_live_control_bad_json(tmp_path):
    cfg = Config(expname="lc2", basedir=str(tmp_path))
    lc = live_control.LiveControl(cfg, tmp_path / "c.json", log=lambda *a: None)
    (tmp_path / "c.json").write_text("{not json")
    assert lc.poll() == {}


def test_check_finite():
    good = {"a": jnp.ones(3), "b": {"c": jnp.zeros(2)}}
    assert debug.check_finite(good) == []
    bad = {"a": jnp.array([1.0, np.nan]), "b": jnp.array([np.inf])}
    with pytest.raises(FloatingPointError):
        debug.check_finite(bad, "bad")
    rows = debug.check_finite(bad, raise_error=False)
    assert len(rows) == 2


def test_gallery(tmp_path):
    out = visualization.write_gallery(
        tmp_path / "g.html", [("row1", ["a.png", "b.png"])], title="t<>t")
    text = out.read_text()
    assert "a.png" in text and "t&lt;&gt;t" in text


def test_generate_renderpath():
    pose = np.eye(3, 4, dtype=np.float32)[None]
    out = renderpath.generate_renderpath(pose, focal=2.0, n=12)
    assert out.shape == (12, 3, 4)
    for m in out:
        r = m[:3, :3]
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)


def test_keypoint_overlay(rng):
    img = rng.rand(20, 30, 3).astype(np.float32)
    out = visualization.draw_keypoints(img, [(5, 5), (10, 15)])
    assert out.shape == img.shape
    assert out[5, 5, 0] > 0.9  # red dot
