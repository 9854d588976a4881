"""InceptionV3 FID extractor: architecture/converter parity against a torch
mirror of the pytorch-fid network assembled IN THIS TEST (torchvision is not
installed; the mirror reimplements `torchvision.models.inception_v3`'s
modules with the FID patches from
`lama/saicinpainting/evaluation/losses/fid/inception.py:171-323`, with
state_dict keys matching torchvision naming so the converter sees the real
format)."""
import numpy as np
import pytest
import jax.numpy as jnp

from spinnerf_tpu.models import inception as inc

torch = pytest.importorskip("torch")
import torch.nn as nn
import torch.nn.functional as F


class BasicConv2d(nn.Module):
    def __init__(self, cin, cout, **kw):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, bias=False, **kw)
        self.bn = nn.BatchNorm2d(cout, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)), inplace=True)


class InceptionA(nn.Module):
    def __init__(self, cin, pool_features):
        super().__init__()
        self.branch1x1 = BasicConv2d(cin, 64, kernel_size=1)
        self.branch5x5_1 = BasicConv2d(cin, 48, kernel_size=1)
        self.branch5x5_2 = BasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = BasicConv2d(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = BasicConv2d(cin, pool_features, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        # FID patch: count_include_pad=False (inception.py:221-225)
        bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1,
                                           count_include_pad=False))
        return torch.cat([b1, b5, bd, bp], 1)


class InceptionB(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3 = BasicConv2d(cin, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = BasicConv2d(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        return torch.cat([self.branch3x3(x), bd,
                          F.max_pool2d(x, 3, stride=2)], 1)


class InceptionC(nn.Module):
    def __init__(self, cin, c7):
        super().__init__()
        self.branch1x1 = BasicConv2d(cin, 192, kernel_size=1)
        self.branch7x7_1 = BasicConv2d(cin, c7, kernel_size=1)
        self.branch7x7_2 = BasicConv2d(c7, c7, kernel_size=(1, 7),
                                       padding=(0, 3))
        self.branch7x7_3 = BasicConv2d(c7, 192, kernel_size=(7, 1),
                                       padding=(3, 0))
        self.branch7x7dbl_1 = BasicConv2d(cin, c7, kernel_size=1)
        self.branch7x7dbl_2 = BasicConv2d(c7, c7, kernel_size=(7, 1),
                                          padding=(3, 0))
        self.branch7x7dbl_3 = BasicConv2d(c7, c7, kernel_size=(1, 7),
                                          padding=(0, 3))
        self.branch7x7dbl_4 = BasicConv2d(c7, c7, kernel_size=(7, 1),
                                          padding=(3, 0))
        self.branch7x7dbl_5 = BasicConv2d(c7, 192, kernel_size=(1, 7),
                                          padding=(0, 3))
        self.branch_pool = BasicConv2d(cin, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
            self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1,
                                           count_include_pad=False))
        return torch.cat([b1, b7, bd, bp], 1)


class InceptionD(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3_1 = BasicConv2d(cin, 192, kernel_size=1)
        self.branch3x3_2 = BasicConv2d(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = BasicConv2d(cin, 192, kernel_size=1)
        self.branch7x7x3_2 = BasicConv2d(192, 192, kernel_size=(1, 7),
                                         padding=(0, 3))
        self.branch7x7x3_3 = BasicConv2d(192, 192, kernel_size=(7, 1),
                                         padding=(3, 0))
        self.branch7x7x3_4 = BasicConv2d(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3_2(self.branch3x3_1(x))
        b7 = self.branch7x7x3_4(self.branch7x7x3_3(self.branch7x7x3_2(
            self.branch7x7x3_1(x))))
        return torch.cat([b3, b7, F.max_pool2d(x, 3, stride=2)], 1)


class InceptionE(nn.Module):
    def __init__(self, cin, pool_kind):
        super().__init__()
        self.pool_kind = pool_kind
        self.branch1x1 = BasicConv2d(cin, 320, kernel_size=1)
        self.branch3x3_1 = BasicConv2d(cin, 384, kernel_size=1)
        self.branch3x3_2a = BasicConv2d(384, 384, kernel_size=(1, 3),
                                        padding=(0, 1))
        self.branch3x3_2b = BasicConv2d(384, 384, kernel_size=(3, 1),
                                        padding=(1, 0))
        self.branch3x3dbl_1 = BasicConv2d(cin, 448, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = BasicConv2d(384, 384, kernel_size=(1, 3),
                                           padding=(0, 1))
        self.branch3x3dbl_3b = BasicConv2d(384, 384, kernel_size=(3, 1),
                                           padding=(1, 0))
        self.branch_pool = BasicConv2d(cin, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        if self.pool_kind == "max":
            # FID patch E_2 (inception.py:299-303)
            bp = F.max_pool2d(x, 3, stride=1, padding=1)
        else:
            bp = F.avg_pool2d(x, 3, stride=1, padding=1,
                              count_include_pad=False)
        return torch.cat([b1, b3, bd, self.branch_pool(bp)], 1)


class TorchFIDInception(nn.Module):
    """torchvision `inception_v3` feature trunk with the pytorch-fid patches;
    attribute names match torchvision so state_dict keys are format-exact."""

    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = BasicConv2d(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = BasicConv2d(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = BasicConv2d(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = BasicConv2d(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = BasicConv2d(80, 192, kernel_size=3)
        self.Mixed_5b = InceptionA(192, 32)
        self.Mixed_5c = InceptionA(256, 64)
        self.Mixed_5d = InceptionA(288, 64)
        self.Mixed_6a = InceptionB(288)
        self.Mixed_6b = InceptionC(768, 128)
        self.Mixed_6c = InceptionC(768, 160)
        self.Mixed_6d = InceptionC(768, 160)
        self.Mixed_6e = InceptionC(768, 192)
        self.Mixed_7a = InceptionD(768)
        self.Mixed_7b = InceptionE(1280, "avg")
        self.Mixed_7c = InceptionE(2048, "max")

    def forward(self, x):
        x = self.Conv2d_1a_3x3(x)
        x = self.Conv2d_2a_3x3(x)
        x = self.Conv2d_2b_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        x = self.Conv2d_3b_1x1(x)
        x = self.Conv2d_4a_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        for name in ["Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a",
                     "Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e",
                     "Mixed_7a", "Mixed_7b", "Mixed_7c"]:
            x = getattr(self, name)(x)
        return x.mean(dim=(2, 3))


def _randomize_bn(model, rng):
    """Non-trivial running stats so the fold is actually exercised."""
    with torch.no_grad():
        for mod in model.modules():
            if isinstance(mod, nn.BatchNorm2d):
                c = mod.num_features
                mod.running_mean.copy_(torch.from_numpy(
                    rng.randn(c).astype(np.float32) * 0.05))
                mod.running_var.copy_(torch.from_numpy(
                    rng.rand(c).astype(np.float32) * 0.5 + 0.5))
                mod.weight.copy_(torch.from_numpy(
                    rng.rand(c).astype(np.float32) * 0.5 + 0.75))
                mod.bias.copy_(torch.from_numpy(
                    rng.randn(c).astype(np.float32) * 0.05))


@pytest.fixture(scope="module")
def converted(tmp_path_factory):
    torch.manual_seed(0)
    model = TorchFIDInception().eval()
    _randomize_bn(model, np.random.RandomState(0))
    path = tmp_path_factory.mktemp("inc") / "fid_inception.pth"
    torch.save(model.state_dict(), str(path))
    params = inc.load_inception_params_from_torch(str(path))
    return model, params


def test_pool3_matches_torch(converted):
    """End-to-end 2048-d pool3 features match the torch assembly (no resize
    so both sides see identical pixels; 96px keeps CPU time sane)."""
    model, params = converted
    x = np.random.RandomState(1).rand(2, 96, 96, 3).astype(np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(inc.inception_pool3(params, jnp.asarray(x),
                                         resize_input=False,
                                         normalize_input=False))
    assert got.shape == (2, inc.FEATURE_DIM)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)


def test_resize_matches_torch_interpolate():
    """The 299px input resize must match torch F.interpolate(bilinear,
    align_corners=False) with NO antialiasing — FID comparability depends
    on it for any input larger than 299px (inception.py:151-155)."""
    import jax
    import torch.nn.functional as F
    x = np.random.RandomState(4).rand(1, 64, 80, 3).astype(np.float32)
    with torch.no_grad():
        want = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                             size=(299, 299), mode="bilinear",
                             align_corners=False).numpy()
    got = np.asarray(jax.image.resize(jnp.asarray(x), (1, 299, 299, 3),
                                      "bilinear", antialias=False))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=1e-5)
    # and downscaling (the FID-relevant direction)
    y = np.random.RandomState(5).rand(1, 512, 384, 3).astype(np.float32)
    with torch.no_grad():
        want = F.interpolate(torch.from_numpy(y.transpose(0, 3, 1, 2)),
                             size=(299, 299), mode="bilinear",
                             align_corners=False).numpy()
    got = np.asarray(jax.image.resize(jnp.asarray(y), (1, 299, 299, 3),
                                      "bilinear", antialias=False))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=1e-5)


def test_normalize_and_resize_semantics():
    """resize_input=True resizes any input to 299 and normalize maps
    [0,1]->[-1,1] (inception.py:151-158); the random-params path runs it."""
    p = inc.random_inception_params(0)
    x = jnp.asarray(np.random.RandomState(2).rand(1, 40, 56, 3)
                    .astype(np.float32))
    f = inc.inception_pool3(p, x)
    assert f.shape == (1, 2048) and bool(jnp.isfinite(f).all())


def test_random_params_deterministic():
    a = inc.random_inception_params(3)
    b = inc.random_inception_params(3)
    assert float(jnp.abs(a["Mixed_7c"]["branch_pool"]["kernel"]
                         - b["Mixed_7c"]["branch_pool"]["kernel"]).max()) == 0
