"""Inpainter tooling tests: evaluate_predicts / side_by_side /
analyze_errors / inner features / AOT export / log reports / train loop."""
import json

import numpy as np
import pytest

from spinnerf_tpu.pipeline import lama_tools


@pytest.fixture()
def eval_dataset(tmp_path, rng):
    """A tiny LaMa eval-layout dataset + a prediction dir."""
    import cv2
    data = tmp_path / "data"
    pred = tmp_path / "pred"
    data.mkdir()
    pred.mkdir()
    for i in range(3):
        img = (rng.rand(32, 40, 3) * 255).astype(np.uint8)
        mask = np.zeros((32, 40), np.uint8)
        mask[8:20, 10:25] = 255
        cv2.imwrite(str(data / f"im{i}_crop000.png"), img)
        cv2.imwrite(str(data / f"im{i}_crop000_mask000.png"), mask)
        noisy = np.clip(img.astype(np.int32) + 10, 0, 255).astype(np.uint8)
        cv2.imwrite(str(pred / f"im{i}_crop000_mask000.png"), noisy)
    return data, pred


def test_load_eval_pairs_and_find_prediction(eval_dataset):
    data, pred = eval_dataset
    pairs = lama_tools.load_eval_pairs(data)
    assert len(pairs) == 3
    for ip, mp in pairs:
        assert "_mask" in mp.stem and "_mask" not in ip.stem
        assert lama_tools._find_prediction(pred, mp).exists()


def test_evaluate_predicts_writes_tsv(eval_dataset, tmp_path):
    data, pred = eval_dataset
    out = tmp_path / "report" / "metrics.tsv"
    results = lama_tools.evaluate_predicts(data, pred, out)
    assert out.exists()
    body = out.read_text()
    assert "ssim_mean" in body and "psnr_mean" in body
    assert results["total"]["n"] == 3
    assert 0 < results["total"]["ssim"]["mean"] <= 1
    rows = json.loads((out.parent / "metrics.tsv.per_image.json").read_text())
    assert len(rows) == 3 and all("name" in r for r in rows)


def test_side_by_side_concatenates(eval_dataset, tmp_path):
    import cv2
    data, pred = eval_dataset
    out = lama_tools.side_by_side(data, [pred, pred], tmp_path / "sbs",
                                  max_n=2)
    sheets = sorted(out.glob("*.png"))
    assert len(sheets) == 2
    sheet = cv2.imread(str(sheets[0]))
    assert sheet.shape == (32, 40 * 3, 3)  # GT + 2 predictions


def test_analyze_errors(eval_dataset, tmp_path):
    data, pred = eval_dataset
    out = tmp_path / "errors"
    lama_tools.analyze_errors(data, pred, out, worst_k=2)
    assert (out / "metrics.tsv").exists()
    assert (out / "report.html").exists()
    assert len(list(out.glob("worst_ssim_*.png"))) == 2
    rows = json.loads((out / "per_image.json").read_text())
    ssims = [r["ssim"] for r in rows]
    assert ssims == sorted(ssims)  # worst (lowest ssim) first


def test_predict_inner_features(eval_dataset, tmp_path, monkeypatch):
    data, _ = eval_dataset
    # tiny generator instead of big-lama
    from spinnerf_tpu.models.lama import FFCResNetGenerator
    import jax
    import jax.numpy as jnp

    def tiny_loader(checkpoint_path=None, **kw):
        gen = FFCResNetGenerator(ngf=4, n_blocks=1, n_downsampling=1,
                                 max_features=8, ratio_g=0.5)
        return gen, gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 4)))

    import spinnerf_tpu.pipeline.inpaint2d as inp
    monkeypatch.setattr(inp, "load_generator", tiny_loader)
    out = lama_tools.predict_inner_features(data, tmp_path / "feats",
                                            n_channels=4)
    assert len(list(out.glob("*_features.npy"))) == 3
    assert len(list(out.glob("*_features.png"))) == 3
    z = np.load(sorted(out.glob("*_features.npy"))[0])
    assert z.ndim == 3  # [h, w, c] latent


def test_export_generator_roundtrip(tmp_path, monkeypatch):
    from spinnerf_tpu.models.lama import FFCResNetGenerator
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    def tiny_loader(checkpoint_path=None, **kw):
        gen = FFCResNetGenerator(ngf=4, n_blocks=1, n_downsampling=1,
                                 max_features=8, ratio_g=0.5)
        return gen, gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 4)))

    import spinnerf_tpu.pipeline.inpaint2d as inp
    monkeypatch.setattr(inp, "load_generator", tiny_loader)
    out = lama_tools.export_generator(tmp_path / "gen.stablehlo",
                                      input_shape=(1, 16, 16, 4))
    blob = out.read_bytes()
    assert len(blob) > 0
    restored = jexport.deserialize(blob)
    y = restored.call(jnp.zeros((1, 16, 16, 4)))
    assert y.shape == (1, 16, 16, 3)
    assert np.all(np.isfinite(np.asarray(y)))


def test_report_from_logs(tmp_path):
    p = tmp_path / "metrics.jsonl"
    with open(p, "w") as f:
        for i in range(5):
            f.write(json.dumps({"step": i, "g_total": 1.0 - 0.1 * i}) + "\n")
    rep = lama_tools.report_from_logs(p)
    assert rep["g_total"]["first"] == pytest.approx(1.0)
    assert rep["g_total"]["last"] == pytest.approx(0.6)
    assert rep["g_total"]["n"] == 5
    txt = lama_tools.format_report(rep)
    assert "g_total" in txt and "step" in txt


@pytest.mark.slow
def test_train_inpainter_smoke(tmp_path, rng):
    """2-step end-to-end inpainter training run: metrics JSONL, visualizer
    grid, and a resumable checkpoint all appear."""
    import cv2
    indir = tmp_path / "imgs"
    indir.mkdir()
    for i in range(2):
        cv2.imwrite(str(indir / f"im{i}.png"),
                    (rng.rand(48, 48, 3) * 255).astype(np.uint8))
    from spinnerf_tpu.train.lama_loop import train_inpainter
    exp = tmp_path / "exp"
    state = train_inpainter(
        indir, exp, n_steps=2, batch_size=2, crop=32,
        gen_kwargs=dict(ngf=4, n_blocks=1, n_downsampling=1, max_features=8,
                        ratio_g=0.5),
        disc_kwargs=dict(ndf=4, n_layers=2),
        i_print=1, i_vis=1, i_ckpt=1, log=lambda *a: None)
    assert int(state.step) == 2
    lines = (exp / "metrics.jsonl").read_text().strip().splitlines()
    assert len(lines) >= 2
    assert "g_total" in json.loads(lines[0])
    assert len(list((exp / "visualizations").glob("*.png"))) >= 1
    from spinnerf_tpu.train.checkpoints import CheckpointManager
    assert CheckpointManager(exp).latest_step() is not None
