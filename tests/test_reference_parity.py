"""Measured numerical parity against the actual torch reference (CPU).

Imports the real `/root/reference` code through `tools/parity/refenv` (with
shims for its unavailable pip deps), converts randomly initialized reference
`NeRF` weights into `NeRFField`, and asserts the two stacks agree on identical
inputs. System-level (trained) parity lives in PARITY_RUN.md via
`tools/parity/compare.py`; this test pins the static core.
"""
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

torch = pytest.importorskip("torch")
from parity import refenv  # noqa: E402

pytestmark = pytest.mark.skipif(
    not refenv.reference_available(), reason="reference repo not present")


@pytest.fixture(scope="module")
def env():
    from parity import static_check
    ref = refenv.load_reference("DS_NeRF")
    tnet, field, params = static_check.build_pair()
    return static_check, ref, tnet, field, params


def test_ray_generation(env):
    sc, ref, *_ = env
    assert sc.check_rays(ref) < 5e-6


def test_positional_encoding(env):
    sc, ref, *_ = env
    assert sc.check_embedding(ref) < 5e-6


def test_mlp_weight_converted_raw(env):
    sc, ref, tnet, field, params = env
    assert sc.check_mlp(tnet, field, params) < 5e-6


def test_composite_matches_raw2outputs(env):
    sc, ref, *_ = env
    assert sc.check_composite(ref) < 5e-6


def test_sample_pdf_deterministic(env):
    sc, ref, *_ = env
    assert sc.check_sample_pdf(ref) < 1e-4


def test_sigma_loss(env):
    sc, ref, *_ = env
    assert sc.check_sigma_loss(ref) < 5e-6


def test_full_render_rays_coarse_fine(env):
    sc, ref, tnet, field, params = env
    d = sc.check_render_rays(ref, tnet, field, params)
    assert d["rgb"] < 2e-4
    assert d["rgb0"] < 2e-4
    assert d["acc"] < 2e-4
    assert d["disp"] < 5e-3  # 1/depth amplifies fp32 noise on near-empty rays
