"""MVSeg (multiview segmentation) e2e: lift sparse masks to all views."""
import numpy as np
import jax.numpy as jnp
import pytest

# integration-heavy module: full-suite lane only (fast lane: -m 'not slow')
pytestmark = pytest.mark.slow

from spinnerf_tpu.config import Config
from spinnerf_tpu.data import synthetic, llff
from spinnerf_tpu.pipeline import mvseg
from spinnerf_tpu.train.loop import Trainer


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    # masks only on 3 of 6 views; exact GT for all views in label_full
    return synthetic.make_scene(tmp_path_factory.mktemp("scene"),
                                n_views=6, h=36, w=44, factor=1,
                                mask_views=[0, 2, 4],
                                gt_mask_subdir="label_full")


@pytest.fixture(scope="module")
def trainer(scene_dir, tmp_path_factory):
    cfg = Config(
        expname="mv", basedir=str(tmp_path_factory.mktemp("logs")),
        datadir=str(scene_dir), factor=1, no_ndc=True, no_tcnn=True,
        mvseg=True, masks_gt_subdir="label_full",
        netdepth=2, netwidth=48, netdepth_fine=2, netwidth_fine=48,
        multires=4, multires_views=2,
        N_samples=12, N_importance=6, N_rand=128,
        lrate=5e-3, lrate_decay=250, clf_weight=0.3, mask_dilate_iters=0,
        i_print=1000, i_weights=0, i_video=0, i_testset=0, i_feat=0,
        chunk=4096, compute_dtype="float32", llffhold=1000000,
    )
    tr = Trainer(cfg, log=lambda *a: None)
    tr.fit(n_iters=300, hooks=False)
    return tr


def test_mvseg_bank_and_metrics(trainer):
    assert "seg" in trainer.bank.groups
    n_pix = 6 * 36 * 44
    assert trainer.bank.groups["seg"].count == 3 * 36 * 44  # labeled views only
    assert trainer.bank.groups["rgb"].count == n_pix


def test_mvseg_clf_loss_present(trainer):
    import jax
    key = jax.random.PRNGKey(0)
    st = trainer.state
    _, _, m = trainer.step_fn(jax.tree.map(jnp.copy, st.params),
                              trainer.tx.init(st.params), key, 0)
    assert "clf_loss" in m and np.isfinite(float(m["clf_loss"]))


def test_mask_rendering_on_labeled_views(trainer):
    """Rendered masks on views WITH input masks must closely match GT —
    exercising the full BCE -> prob-composite -> threshold path."""
    masks = mvseg.render_masks(trainer, trainer.scene.poses[[0, 2]])
    m = mvseg.evaluate_masks(masks, trainer.scene.masks_gt[[0, 2]])
    assert m["iou"] > 0.6, m
    assert m["accuracy"] > 0.95, m


def test_mask_lifting_to_unlabeled_views(trainer):
    """Views with NO input mask: at this toy budget (tiny model, 300 steps,
    36x44 images) the geometry is too coarse for accurate 3D lifting — the
    reference budget is 4000 iters on megapixel images — so assert only that
    the lifted prediction is sane (mostly-background accuracy). Full lifting
    quality is validated in the TPU-scale pipeline run."""
    unlabeled = [1, 3, 5]
    masks = mvseg.render_masks(trainer, trainer.scene.poses[unlabeled])
    m = mvseg.evaluate_masks(masks, trainer.scene.masks_gt[unlabeled])
    assert m["accuracy"] > 0.75, m


def test_post_opening_removes_specks():
    m = np.zeros((20, 20), np.float32)
    m[5:15, 5:15] = 1
    m[0, 0] = 1  # speck
    out = mvseg.post_opening(m)
    assert out[0, 0] == 0
    assert out[7:13, 7:13].all()


def test_object_removed_render(trainer):
    rgbs = mvseg.render_object_removed(trainer, trainer.scene.poses[:1])
    assert rgbs.shape == (1, 36, 44, 3)
    assert np.isfinite(rgbs).all()


def test_mask_filter_whites_out_background(trainer):
    """mask_filter gates the render by sigmoid(prob)*acc > 0.5 and sends the
    rest to white (`MVSeg/DS_NeRF/run_nerf.py:194-197`)."""
    plain = mvseg.render_object_removed(trainer, trainer.scene.poses[:1])
    filt = mvseg.render_object_removed(trainer, trainer.scene.poses[:1],
                                       mask_filter=True)
    assert filt.shape == plain.shape
    # every pixel is either exactly white or the plain render
    white = np.all(filt == 1.0, axis=-1)
    same = np.all(np.isclose(filt, plain, atol=1e-6), axis=-1)
    assert (white | same).all()
    assert white.any(), "nothing was filtered to white"


def test_export_masks_writes_dataset_layout(trainer, scene_dir):
    out_dir, masks = mvseg.export_masks(trainer, out_subdir="label_lifted",
                                        opening=True)
    files = sorted(out_dir.glob("*.png"))
    assert len(files) == 6
    assert out_dir.name == "label_lifted"
    # written masks should load back through the scene loader
    sc = llff.load_scene(scene_dir, factor=1, mask_subdir="label_lifted",
                         dilate_iterations=0)
    assert sc.masks.shape == (6, 36, 44)


def test_mvseg_i_img_panel_hook(trainer):
    """`--i_img` cadence writes the rgb|prob sanity image
    (`MVSeg/DS_NeRF/run_nerf.py:1334-1360`)."""
    trainer.cfg.i_img = 2
    try:
        trainer.fit(n_iters=trainer.state.step + 3)
    finally:
        trainer.cfg.i_img = 0
    panels = list((trainer.exp_dir / "test_renders").glob("mv_seg_*.png"))
    assert panels, "no mvseg sanity panel written"
