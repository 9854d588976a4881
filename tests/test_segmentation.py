"""ADE20k segmentation model + resnet_pl loss tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

# integration-heavy module: full-suite lane only (fast lane: -m 'not slow')
pytestmark = pytest.mark.slow

from spinnerf_tpu.models import segmentation as S


def test_adaptive_avg_pool_matches_torch(rng):
    import torch
    x = rng.rand(2, 13, 17, 5).astype(np.float32)   # awkward sizes
    for s in (1, 2, 3, 6):
        got = np.asarray(S.adaptive_avg_pool(jnp.asarray(x), s))
        want = torch.nn.AdaptiveAvgPool2d(s)(
            torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
        np.testing.assert_allclose(got, want.numpy(), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("depth,expansion", [(18, 1), (50, 4)])
def test_resnet_dilated_strides(depth, expansion, rng):
    enc = S.ResNetDilated(depth=depth)
    x = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    vs = jax.jit(enc.init)(jax.random.PRNGKey(0), x)
    feats = enc.apply(vs, x)
    assert len(feats) == 4
    # dilate-8: stage 1 at /4, stages 2-4 all at /8
    assert feats[0].shape == (1, 16, 16, 64 * expansion)
    for f, ch in zip(feats[1:], (128, 256, 512)):
        assert f.shape == (1, 8, 8, ch * expansion)


def test_segmentation_model_logits(rng):
    mdl = S.SegmentationModel(depth=18)
    x = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
    vs = jax.jit(mdl.init)(jax.random.PRNGKey(0), x)
    logits = mdl.apply(vs, x)
    assert logits.shape == (1, 32, 32, S.NUM_ADE20K_CLASSES)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_resnet_pl_loss_properties(rng):
    loss_fn, _ = S.make_resnet_pl(depth=18, input_shape=(1, 32, 32, 3))
    a = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
    b = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
    assert float(loss_fn(a, a)) == pytest.approx(0.0, abs=1e-9)
    assert float(loss_fn(a, b)) > 0
    g = jax.grad(lambda p: loss_fn(p, b))(a)
    assert float(jnp.abs(g).max()) > 0  # differentiable wrt pred
    # target side is stop-gradient
    gt = jax.grad(lambda t: loss_fn(a, t))(b)
    assert float(jnp.abs(gt).max()) == 0


def test_convert_mit_encoder_roundtrip(tmp_path, rng):
    """Synthesize a torch state_dict in the MIT ade20k layout with the right
    shapes, convert, and run the encoder."""
    import torch
    enc = S.ResNetDilated(depth=18)
    x = jnp.zeros((1, 32, 32, 3))
    ref = jax.jit(enc.init)(jax.random.PRNGKey(0), x)

    sd = {}

    def walk(tree, prefix):
        for k, v in tree.items():
            name = k.replace("_", ".", 1) if k.startswith("layer") else k
            path = f"{prefix}{name}" if not prefix else f"{prefix}.{name}"
            if isinstance(v, dict):
                walk(v, path)
            else:
                sd_key = {"kernel": ".weight", "scale": ".weight",
                          "bias": ".bias", "mean": ".running_mean",
                          "var": ".running_var"}[path.rsplit(".", 1)[-1]]
                base = path.rsplit(".", 1)[0]
                leaf = path.rsplit(".", 1)[-1]
                shape = np.asarray(v).shape
                # centered, well-scaled fakes so activations stay finite
                # through 18 layers (all-positive weights would blow up)
                if leaf == "kernel":
                    fan_in = shape[0] * shape[1] * shape[2]
                    arr = (rng.randn(*shape) / np.sqrt(fan_in)).astype(
                        np.float32)
                    arr = np.transpose(arr, (3, 2, 0, 1))   # HWIO -> OIHW
                elif leaf in ("scale", "var"):
                    arr = np.ones(shape, np.float32)
                else:
                    arr = np.zeros(shape, np.float32)
                sd[base + sd_key] = torch.from_numpy(arr)

    walk(ref["params"], "")
    walk(ref["batch_stats"], "")
    # the walk above emits conv_down/bn_down under their flax names; redo
    # the downsample renames the converter expects
    sd = {k.replace(".conv_down.", ".downsample.0.")
           .replace(".bn_down.", ".downsample.1."): v for k, v in sd.items()}
    path = tmp_path / "enc.pth"
    torch.save(sd, path)

    vars_ = S.convert_mit_encoder(path, depth=18)
    # same tree structure as a fresh init
    assert jax.tree.structure(vars_["params"]) == \
        jax.tree.structure(ref["params"])
    feats = enc.apply(vars_, jnp.asarray(
        rng.rand(1, 32, 32, 3).astype(np.float32)))
    assert len(feats) == 4
    assert all(np.all(np.isfinite(np.asarray(f))) for f in feats)


def test_segmentation_class_stats():
    seg_t = np.zeros((8, 8), np.int32)
    seg_t[:4] = 3
    seg_p = seg_t.copy()
    seg_p[0] = 5   # disagree on 8 of 32 class-3 pixels
    stats = S.segmentation_class_stats(seg_p, seg_t, num_class=10)
    assert set(stats) == {0, 3}
    assert stats[3]["target_frac"] == pytest.approx(0.5)
    assert stats[3]["agreement"] == pytest.approx(0.75)
    assert stats[0]["agreement"] == 1.0


def test_segmentation_aware_scores(rng):
    pred = rng.rand(8, 8, 3).astype(np.float32)
    target = pred.copy()
    target[:4] += 0.5   # class-1 region differs, class-0 identical
    seg = np.zeros((8, 8), np.int32)
    seg[:4] = 1
    scores = S.segmentation_aware_scores(pred, target, seg, num_class=2)
    assert scores[0] == pytest.approx(0.0, abs=1e-7)
    assert scores[1] == pytest.approx(0.5, abs=1e-5)


def test_batchnorm_syncs_across_mesh():
    """SyncBatchNorm parity: under GSPMD a batch-sharded BN computes the
    GLOBAL batch statistic — the reference needs master/slave pipes for this
    (`segm_lib/nn/modules/batchnorm.py:38`); here it falls out of the
    partitioner."""
    import flax.linen as nn
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    bn = nn.BatchNorm(use_running_average=False, momentum=0.0)
    x = np.random.RandomState(0).rand(8, 4, 4, 3).astype(np.float32) * 5

    vs = bn.init(jax.random.PRNGKey(0), jnp.asarray(x))

    def step(vs, x):
        y, new_vs = bn.apply(vs, x, mutable=["batch_stats"])
        return y, new_vs["batch_stats"]

    y1, stats1 = jax.jit(step)(vs, jnp.asarray(x))

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    y8, stats8 = jax.jit(step)(vs, xs)

    np.testing.assert_allclose(np.asarray(y1), np.asarray(y8),
                               rtol=1e-5, atol=1e-6)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
        stats1, stats8)
