"""LaMa FFC generator tests: shapes, FFT correctness, torch weight-conversion
parity (against torch primitives assembled in this test, not reference code)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spinnerf_tpu.models import lama


def test_fourier_unit_shapes_and_linearity(rng):
    fu = lama.FourierUnit(8)
    x = jnp.asarray(rng.randn(2, 16, 16, 8).astype(np.float32))
    vs = fu.init(jax.random.PRNGKey(0), x)
    y = fu.apply(vs, x)
    assert y.shape == (2, 16, 16, 8)
    # remove BN+relu nonlinearity check; instead: determinism
    np.testing.assert_array_equal(np.asarray(fu.apply(vs, x)), np.asarray(y))


def test_generator_shapes(rng):
    gen = lama.FFCResNetGenerator(n_blocks=2, ngf=8, max_features=64)
    x = jnp.asarray(rng.rand(1, 64, 64, 4).astype(np.float32))
    vs = gen.init(jax.random.PRNGKey(0), x)
    y = gen.apply(vs, x)
    assert y.shape == (1, 64, 64, 3)
    assert (np.asarray(y) >= 0).all() and (np.asarray(y) <= 1).all()


@pytest.mark.slow
def test_generator_jit_and_odd_sizes(rng):
    gen = lama.FFCResNetGenerator(n_blocks=1, ngf=8, max_features=32)
    x = jnp.asarray(rng.rand(1, 40, 56, 4).astype(np.float32))  # mult of 8
    vs = gen.init(jax.random.PRNGKey(0), x)
    y = jax.jit(lambda v, a: gen.apply(v, a))(vs, x)
    assert y.shape == (1, 40, 56, 3)


# --- torch parity for the conversion-critical pieces ------------------------

torch = pytest.importorskip("torch")


def test_conv_transpose_matches_torch(rng):
    """TorchConvTranspose + _t_convT must reproduce torch's
    ConvTranspose2d(k=3, s=2, p=1, output_padding=1) bit-for-bit."""
    tconv = torch.nn.ConvTranspose2d(6, 4, kernel_size=3, stride=2,
                                     padding=1, output_padding=1)
    x = rng.randn(2, 6, 10, 12).astype(np.float32)
    with torch.no_grad():
        want = tconv(torch.from_numpy(x)).numpy()

    mod = lama.TorchConvTranspose(4)
    params = {"params": {
        "kernel": lama._t_convT(tconv.weight.detach().numpy()),
        "bias": jnp.asarray(tconv.bias.detach().numpy()),
    }}
    got = mod.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    got = np.asarray(got).transpose(0, 3, 1, 2)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_reflect_conv_matches_torch(rng):
    tconv = torch.nn.Conv2d(5, 7, 3, padding=1, padding_mode="reflect",
                            bias=False)
    x = rng.randn(1, 5, 9, 11).astype(np.float32)
    with torch.no_grad():
        want = tconv(torch.from_numpy(x)).numpy()

    y = lama.reflect_pad(jnp.asarray(x.transpose(0, 2, 3, 1)), 1)
    got = jax.lax.conv_general_dilated(
        y, lama._t_conv(tconv.weight.detach().numpy()),
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               atol=1e-5)


def test_fourier_unit_matches_torch_assembly(rng):
    """FourierUnit vs the same math done with torch primitives: rfft2 ->
    interleaved re/im channels -> 1x1 conv -> BN(eval) -> relu -> irfft2."""
    c = 4
    conv = torch.nn.Conv2d(2 * c, 2 * c, 1, bias=False)
    bn = torch.nn.BatchNorm2d(2 * c).eval()
    with torch.no_grad():
        bn.running_mean.copy_(torch.from_numpy(rng.randn(2 * c).astype(np.float32) * 0.1))
        bn.running_var.copy_(torch.from_numpy(rng.rand(2 * c).astype(np.float32) + 0.5))
        bn.weight.copy_(torch.from_numpy(rng.rand(2 * c).astype(np.float32) + 0.5))
        bn.bias.copy_(torch.from_numpy(rng.randn(2 * c).astype(np.float32) * 0.1))

    x = rng.randn(1, c, 12, 16).astype(np.float32)
    with torch.no_grad():
        xt = torch.from_numpy(x)
        f = torch.fft.rfftn(xt, dim=(-2, -1), norm="ortho")
        f = torch.stack((f.real, f.imag), dim=-1)
        f = f.permute(0, 1, 4, 2, 3).contiguous()
        f = f.view(1, -1, 12, 9)
        f = torch.relu(bn(conv(f)))
        f = f.view(1, c, 2, 12, 9).permute(0, 1, 3, 4, 2).contiguous()
        f = torch.complex(f[..., 0], f[..., 1])
        want = torch.fft.irfftn(f, s=(12, 16), dim=(-2, -1),
                                norm="ortho").numpy()

    fu = lama.FourierUnit(c)
    variables = {
        "params": {"conv": {"kernel": lama._t_conv(conv.weight.detach().numpy())},
                   "bn": {"scale": jnp.asarray(bn.weight.detach().numpy()),
                          "bias": jnp.asarray(bn.bias.detach().numpy())}},
        "batch_stats": {"bn": {"mean": jnp.asarray(bn.running_mean.numpy()),
                               "var": jnp.asarray(bn.running_var.numpy())}},
    }
    got = fu.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               atol=2e-4)


def _tiny_torch_big_lama_state_dict(rng, ngf=8, n_blocks=18, n_down=3):
    """Construct a torch state_dict with big-lama's exact key layout but tiny
    channel counts, to exercise `convert_big_lama` end-to-end."""
    sd = {}

    def conv(prefix, cin, cout, k, bias=False):
        sd[prefix + ".weight"] = torch.from_numpy(
            rng.randn(cout, cin, k, k).astype(np.float32) * 0.1)
        if bias:
            sd[prefix + ".bias"] = torch.from_numpy(
                rng.randn(cout).astype(np.float32) * 0.1)

    def bn(prefix, c):
        sd[prefix + ".weight"] = torch.from_numpy(rng.rand(c).astype(np.float32) + 0.5)
        sd[prefix + ".bias"] = torch.from_numpy(rng.randn(c).astype(np.float32) * 0.1)
        sd[prefix + ".running_mean"] = torch.from_numpy(rng.randn(c).astype(np.float32) * 0.1)
        sd[prefix + ".running_var"] = torch.from_numpy(rng.rand(c).astype(np.float32) + 0.5)

    # stem model.1: local only, 4 -> ngf
    conv("model.1.ffc.convl2l", 4, ngf, 7)
    bn("model.1.bn_l", ngf)
    # downs model.2..4
    cin = ngf
    for i in range(n_down):
        cout = ngf * 2 ** (i + 1)
        if i == n_down - 1:
            g = int(cout * 0.75)
            conv(f"model.{2+i}.ffc.convl2l", cin, cout - g, 3)
            conv(f"model.{2+i}.ffc.convl2g", cin, g, 3)
            bn(f"model.{2+i}.bn_l", cout - g)
            bn(f"model.{2+i}.bn_g", g)
        else:
            conv(f"model.{2+i}.ffc.convl2l", cin, cout, 3)
            bn(f"model.{2+i}.bn_l", cout)
        cin = cout

    feats = cin
    g = int(feats * 0.75)
    l = feats - g
    for b in range(n_blocks):
        for cv in ("conv1", "conv2"):
            p = f"model.{5+b}.{cv}"
            conv(p + ".ffc.convl2l", l, l, 3)
            conv(p + ".ffc.convl2g", l, g, 3)
            conv(p + ".ffc.convg2l", g, l, 3)
            conv(p + ".ffc.convg2g.conv1.0", g, g // 2, 1)
            bn(p + ".ffc.convg2g.conv1.1", g // 2)
            conv(p + ".ffc.convg2g.fu.conv_layer", g, g, 1)
            bn(p + ".ffc.convg2g.fu.bn", g)
            conv(p + ".ffc.convg2g.conv2", g // 2, g, 1)
            bn(p + ".bn_l", l)
            bn(p + ".bn_g", g)

    idx = 5 + n_blocks + 1
    cin = feats
    for i in range(n_down):
        cout = cin // 2
        sd[f"model.{idx}.weight"] = torch.from_numpy(
            rng.randn(cin, cout, 3, 3).astype(np.float32) * 0.1)
        sd[f"model.{idx}.bias"] = torch.from_numpy(
            rng.randn(cout).astype(np.float32) * 0.1)
        bn(f"model.{idx+1}", cout)
        idx += 3
        cin = cout
    conv(f"model.{idx+1}", ngf, 3, 7, bias=True)
    return sd


def test_convert_big_lama_layout(rng):
    """Converted params must drop into the generator and run."""
    sd = _tiny_torch_big_lama_state_dict(rng)
    variables = lama.convert_big_lama(sd)
    gen = lama.FFCResNetGenerator(ngf=8, n_blocks=18, max_features=1024)
    x = jnp.asarray(rng.rand(1, 32, 32, 4).astype(np.float32))
    # init to discover the expected structure, then ensure converted trees
    # match leaf-for-leaf in shape
    ref = gen.init(jax.random.PRNGKey(0), x)
    ref_shapes = jax.tree.map(lambda a: a.shape, ref)
    got_shapes = jax.tree.map(lambda a: a.shape, variables)
    assert ref_shapes == got_shapes, "converted param tree mismatch"
    y = gen.apply(variables, x)
    assert y.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(y)).all()
