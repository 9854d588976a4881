"""Real-weights golden gate.

Every perceptual/learned component runs a documented random-init fallback in
this zero-egress container. These tests activate automatically when real
checkpoints are dropped into `$SPINNERF_WEIGHTS_DIR` (layout:
`spinnerf_tpu/weights.py`) and assert activation-level parity of the torch
converters on the REAL weights — turning "converter verified on random torch
assemblies" into "converter verified on the model users run".

Without the directory, every test here skips (visible in `pytest -rs`).
"""
import numpy as np
import pytest
import jax.numpy as jnp

from spinnerf_tpu import weights as wreg

torch = pytest.importorskip("torch")


def _need(name):
    path = wreg.find(name)
    if path is None:
        pytest.skip(f"drop {wreg.WELL_KNOWN[name][0]} into "
                    f"${wreg.ENV_VAR} to activate this golden test")
    return path


# ---------------------------------------------------------------------------
# VGG16 (LPIPS backbone, VGG feature extractor)
# ---------------------------------------------------------------------------

def test_vgg16_activation_parity():
    """Converted flax VGG16 matches a torch conv stack assembled directly
    from the real state_dict (no torchvision needed: `features.*` holds the
    full conv plan)."""
    import torch.nn.functional as F
    from spinnerf_tpu.models.lpips import (VGG16Features, _VGG_PLAN,
                                           load_vgg_params_from_torch)
    path = _need("vgg16")
    sd = torch.load(path, map_location="cpu")
    if "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k: v.float() for k, v in sd.items()}
    conv_keys = sorted((k for k in sd if k.startswith("features.")
                        and k.endswith(".weight") and sd[k].ndim == 4),
                       key=lambda k: int(k.split(".")[1]))
    assert len(conv_keys) >= len(_VGG_PLAN)

    x = np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        h = torch.from_numpy(x.transpose(0, 3, 1, 2))
        taps = []
        for k, (ch, pool, tap) in zip(conv_keys, _VGG_PLAN):
            if pool:
                h = F.max_pool2d(h, 2, 2)
            b = sd[k[:-len("weight")] + "bias"]
            h = F.relu(F.conv2d(h, sd[k], b, padding=1))
            if tap:
                taps.append(h.numpy().transpose(0, 2, 3, 1))

    vgg = VGG16Features()
    params = load_vgg_params_from_torch(path, vgg)
    got = vgg.apply(params, jnp.asarray(x))
    assert len(got) == len(taps)
    for g, w in zip(got, taps):
        np.testing.assert_allclose(np.asarray(g), w, atol=1e-4, rtol=1e-4)


def test_lpips_real_weights_sanity():
    """Real LPIPS: zero on identical images, monotone in distortion, and in
    the published scale (order 1e-1 for visible noise)."""
    from spinnerf_tpu.models.lpips import load_lpips
    _need("vgg16")
    _need("lpips_lin")
    fn = load_lpips()   # registry pickup
    rng = np.random.RandomState(1)
    img = jnp.asarray(rng.rand(48, 48, 3).astype(np.float32))
    d0 = float(fn(img, img))
    small = jnp.clip(img + 0.02 * rng.randn(48, 48, 3).astype(np.float32),
                     0, 1)
    big = jnp.clip(img + 0.3 * rng.randn(48, 48, 3).astype(np.float32), 0, 1)
    assert d0 < 1e-5
    assert d0 < float(fn(img, small)) < float(fn(img, big))
    assert 1e-3 < float(fn(img, big)) < 2.0


# ---------------------------------------------------------------------------
# InceptionV3 FID
# ---------------------------------------------------------------------------

def test_inception_real_weights_parity():
    """Real pt_inception weights through the converter match the torch FID
    mirror (test_inception.TorchFIDInception loads torchvision-format keys),
    and the extractor claims the `fid` key only here."""
    from spinnerf_tpu.eval.inpainting import InceptionFeatureExtractor
    from spinnerf_tpu.models import inception as inc
    from tests.test_inception import TorchFIDInception
    path = _need("inception_fid")

    sd = torch.load(path, map_location="cpu")
    if "state_dict" in sd:
        sd = sd["state_dict"]
    model = TorchFIDInception().eval()
    missing, unexpected = model.load_state_dict(sd, strict=False)
    assert not missing, missing[:5]

    params = inc.load_inception_params_from_torch(path)
    x = np.random.RandomState(2).rand(2, 96, 96, 3).astype(np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(inc.inception_pool3(params, jnp.asarray(x),
                                         resize_input=False,
                                         normalize_input=False))
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=5e-3)

    assert InceptionFeatureExtractor().fid_key == "fid"


# ---------------------------------------------------------------------------
# big-lama generator
# ---------------------------------------------------------------------------

def test_big_lama_checkpoint_converts_and_runs():
    """The real big-lama checkpoint flows through `convert_big_lama` (every
    generator tensor consumed) and produces an in-range inpainting that
    actually uses the image: output must correlate with the input far better
    than a random-init generator's."""
    from spinnerf_tpu.pipeline.inpaint2d import load_generator
    path = _need("big_lama")
    gen, variables = load_generator(path)
    rng = np.random.RandomState(3)
    img = rng.rand(1, 64, 64, 3).astype(np.float32)
    mask = np.zeros((1, 64, 64, 1), np.float32)
    mask[:, 20:40, 20:40] = 1
    x = jnp.asarray(np.concatenate([img * (1 - mask), mask], axis=-1))
    out = np.asarray(gen.apply(variables, x))
    assert out.shape == (1, 64, 64, 3)
    assert np.isfinite(out).all()
    known = (mask[0, ..., 0] == 0)
    err = np.abs(out[0] - img[0])[known].mean()
    assert err < 0.15, f"known-region reconstruction error {err:.3f}"


# ---------------------------------------------------------------------------
# ADE20k encoder (resnet_pl perceptual loss)
# ---------------------------------------------------------------------------

def test_ade20k_encoder_converts_and_runs():
    from spinnerf_tpu.models.segmentation import make_resnet_pl
    _need("ade20k_resnet50")
    loss_fn, params = make_resnet_pl(depth=50)   # registry pickup
    rng = np.random.RandomState(4)
    a = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    b = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    assert float(loss_fn(a, a)) < 1e-8
    assert float(loss_fn(a, b)) > 0


def test_ade20k_full_model_converts_and_runs():
    """Encoder + ppm decoder weights assemble into a SegmentationModel whose
    logits are finite and whose argmax produces plausible class diversity."""
    import jax.numpy as jnp2
    from spinnerf_tpu.models.segmentation import load_segmentation_model
    _need("ade20k_resnet50")
    _need("ade20k_ppm_decoder")
    model, variables, is_real = load_segmentation_model()
    assert is_real
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.rand(1, 96, 96, 3).astype(np.float32))
    logits = model.apply(variables, x)
    assert logits.shape[-1] == 150 and bool(jnp2.isfinite(logits).all())
