"""Full-pipeline smoke test on the synthetic scene (tiny budgets, CPU).

Runs mvseg -> prepare -> LaMa guidance -> fit -> eval through
`pipeline.stages.run_pipeline` and checks the on-disk contract at each
boundary (the reference's directory API, `README.md:32-51,108-133`).
"""
import json
import numpy as np
import pytest

from spinnerf_tpu.config import Config
from spinnerf_tpu.data import synthetic
from spinnerf_tpu.pipeline import stages


@pytest.mark.slow
def test_full_pipeline_smoke(tmp_path):
    scene_dir = synthetic.make_scene(tmp_path / "scene", n_views=5,
                                     h=32, w=40, factor=1,
                                     mask_views=[0, 1, 2, 3, 4])
    # remove the pre-made guidance products; the pipeline must recreate them
    import shutil
    shutil.rmtree(scene_dir / "images" / "lama_images")
    shutil.rmtree(scene_dir / "images" / "depth")

    cfg = Config(
        expname="pipe", basedir=str(tmp_path / "logs"),
        datadir=str(scene_dir), factor=1, no_ndc=True, no_tcnn=True,
        netdepth=2, netwidth=32, netdepth_fine=2, netwidth_fine=32,
        multires=4, multires_views=2,
        N_samples=8, N_importance=4, N_rand=64,
        lrate=5e-3, lrate_decay=250,
        i_print=10000, i_weights=0, i_video=0, i_testset=0, i_feat=1,
        chunk=2048, compute_dtype="float32", render_factor=1,
        N_gt=1, lpips_render_factor=2, patch_len_factor=2,
        lpips_batch_size=1, mask_dilate_iters=1,
    )
    trainer, results = stages.run_pipeline(
        cfg, mvseg_iters=10, prepare_iters=10, fit_iters=10,
        refine=False, log=lambda *a: None)

    img_dir = scene_dir / "images"
    assert (img_dir / "depth").exists()
    assert len(list((img_dir / "depth").glob("*.png"))) == 5
    assert (img_dir / "lama_images").exists()
    assert len(list((img_dir / "lama_images").glob("*.png"))) == 5
    assert (img_dir / "label").exists()

    assert "summary" in results
    assert np.isfinite(results["summary"]["psnr"])
    # masked PSNR is only reported for test views whose mask has a hole
    # (and must then be finite — never inf from an empty mask)
    if "masked_psnr" in results["summary"]:
        assert np.isfinite(results["summary"]["masked_psnr"])

    out = tmp_path / "logs" / "pipe" / "pipeline_results.json"
    assert json.loads(out.read_text())["summary"] == results["summary"]
    # every stage reports its wall-clock
    assert set(results["stage_seconds"]) == {
        "mvseg", "prepare", "inpaint_guidance", "fit", "eval"}
    assert all(t >= 0 for t in results["stage_seconds"].values())
