"""Inpainter tooling: evaluate predictions, side-by-side sheets, error
analysis, inner-feature dumps, AOT export, and training-log reports.

Parity targets (`lama/bin/`): `evaluate_predicts.py` (score a directory of
precomputed predictions against image/mask pairs, TSV table out),
`side_by_side.py` (comparison sheets across several predictors),
`analyze_errors.py` (worst-case mining + per-mask-area-bin breakdown),
`predict_inner_features.py` (dump generator latents per image),
`to_jit.py` (serialize the generator for deployment — here `jax.export`
StableHLO instead of TorchScript), and `report_from_tb.py` (summarize
training logs — here the metrics JSONL the trainers write).

All tools consume the LaMa eval-dataset layout: `<stem>.png` images with
`<stem>_mask*.png` masks beside them (`saicinpainting/evaluation/data.py`),
predictions named after the mask file in a separate directory.
"""
from __future__ import annotations

import json
from pathlib import Path

import numpy as np

IMG_SUFFIXES = (".png", ".jpg", ".jpeg")


def _imread_rgb(path) -> np.ndarray:
    import cv2
    img = cv2.imread(str(path))
    if img is None:
        raise FileNotFoundError(path)
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0


def _imread_mask(path) -> np.ndarray:
    import cv2
    m = cv2.imread(str(path), cv2.IMREAD_GRAYSCALE)
    if m is None:
        raise FileNotFoundError(path)
    return (m.astype(np.float32) / 255.0 > 0.5).astype(np.float32)


def _imwrite_rgb(path, img) -> None:
    import cv2
    cv2.imwrite(str(path), cv2.cvtColor(
        (np.clip(img, 0, 1) * 255).astype(np.uint8), cv2.COLOR_RGB2BGR))


def load_eval_pairs(datadir):
    """Enumerate (image_path, mask_path) pairs in a LaMa eval dataset dir.

    Masks are `<imgstem>_mask*.png`; one image may have several masks
    (parity: `InpaintingDataset`, `evaluation/data.py:65-96`).
    """
    datadir = Path(datadir)
    masks = sorted(p for p in datadir.iterdir()
                   if p.suffix.lower() in IMG_SUFFIXES and "_mask" in p.stem)
    pairs = []
    for mp in masks:
        stem = mp.stem[:mp.stem.index("_mask")]
        for suf in IMG_SUFFIXES:
            ip = datadir / (stem + suf)
            if ip.exists():
                pairs.append((ip, mp))
                break
    return pairs


def _find_prediction(predictdir, mask_path):
    """Predictions are named after the mask file (LaMa convention) or the
    image stem (our `inpaint_directory` convention)."""
    predictdir = Path(predictdir)
    stem = mask_path.stem
    img_stem = stem[:stem.index("_mask")] if "_mask" in stem else stem
    for cand in (stem, img_stem):
        for suf in IMG_SUFFIXES:
            p = predictdir / (cand + suf)
            if p.exists():
                return p
    raise FileNotFoundError(
        f"no prediction for {mask_path.name} in {predictdir}")


def score_predictions(datadir, predictdir, *, lpips_fn=None,
                      feature_extractor=None, lpips_key="lpips"):
    """Score a directory of precomputed predictions.

    Returns (results dict from `InpaintingEvaluator.evaluation_end`,
    per-image rows). Parity: `bin/evaluate_predicts.py`.
    """
    from spinnerf_tpu.eval.inpainting import InpaintingEvaluator
    ev = InpaintingEvaluator(lpips_fn=lpips_fn, lpips_key=lpips_key,
                             feature_extractor=feature_extractor)
    names = []
    for ip, mp in load_eval_pairs(datadir):
        img = _imread_rgb(ip)
        mask = _imread_mask(mp)
        pred = _imread_rgb(_find_prediction(predictdir, mp))
        if pred.shape != img.shape:
            import cv2
            pred = cv2.resize(pred, (img.shape[1], img.shape[0]),
                              interpolation=cv2.INTER_AREA)
        ev.add(pred, img, mask)
        names.append(mp.name)
    results = ev.evaluation_end()
    rows = [dict(r, name=n) for r, n in zip(ev.rows, names)]
    return results, rows


def write_results_tsv(results: dict, outpath) -> Path:
    """Flatten the binned results dict into the reference's TSV table shape
    (groups x metrics, mean/std columns)."""
    outpath = Path(outpath)
    outpath.parent.mkdir(parents=True, exist_ok=True)
    metric_names = sorted({k for tbl in results.values()
                           for k in tbl if isinstance(tbl[k], dict)})
    lines = ["group\tn\t" + "\t".join(
        f"{k}_mean\t{k}_std" for k in metric_names)]
    for group, tbl in results.items():
        cells = [group, str(tbl.get("n", ""))]
        for k in metric_names:
            if isinstance(tbl.get(k), dict):
                cells += [f"{tbl[k]['mean']:.4f}", f"{tbl[k]['std']:.4f}"]
            else:
                cells += ["", ""]
        lines.append("\t".join(cells))
    scalars = {k: v for k, v in results.get("total", {}).items()
               if isinstance(v, float)}
    for k, v in scalars.items():
        lines.append(f"{k}\t\t{v:.4f}")
    outpath.write_text("\n".join(lines) + "\n")
    return outpath


def evaluate_predicts(datadir, predictdir, outpath, *, lpips_fn=None,
                      feature_extractor=None, lpips_key="lpips") -> dict:
    """Score + write the TSV table (parity: `bin/evaluate_predicts.py`)."""
    results, rows = score_predictions(datadir, predictdir, lpips_fn=lpips_fn,
                                      feature_extractor=feature_extractor,
                                      lpips_key=lpips_key)
    write_results_tsv(results, outpath)
    with open(str(outpath) + ".per_image.json", "w") as f:
        json.dump(rows, f, indent=2)
    return results


def _mask_outline(img, mask):
    """GT panel with the mask region shaded red (the reference's
    `visualize_mask_and_images` mask-on-first-panel behavior)."""
    out = img.copy()
    m = mask > 0.5
    out[m] = 0.6 * out[m] + 0.4 * np.array([1.0, 0.0, 0.0])
    return out


def side_by_side(datadir, predictdirs, outdir, *, max_n: int = 100,
                 black: bool = False, seed: int = 0) -> Path:
    """Comparison sheets: [GT+mask | pred_1 | pred_2 | ...] per example
    (parity: `bin/side_by_side.py`)."""
    outdir = Path(outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    pairs = load_eval_pairs(datadir)
    if len(pairs) > max_n:
        rng = np.random.RandomState(seed)
        pairs = [pairs[i] for i in
                 sorted(rng.choice(len(pairs), max_n, replace=False))]
    for ip, mp in pairs:
        img = _imread_rgb(ip)
        mask = _imread_mask(mp)
        first = img * (1.0 - mask[..., None]) if black \
            else _mask_outline(img, mask)
        panels = [first]
        for pd in predictdirs:
            pred = _imread_rgb(_find_prediction(pd, mp))
            if pred.shape != img.shape:
                import cv2
                pred = cv2.resize(pred, (img.shape[1], img.shape[0]),
                                  interpolation=cv2.INTER_AREA)
            panels.append(pred)
        _imwrite_rgb(outdir / mp.name, np.concatenate(panels, axis=1))
    return outdir


def analyze_errors(datadir, predictdir, outdir, *, worst_k: int = 10,
                   sort_by: str = "ssim", lpips_fn=None) -> dict:
    """Worst-case mining: score everything, write per-mask-area-bin tables,
    and dump side-by-side sheets + an HTML gallery of the `worst_k` examples
    (parity: `bin/analyze_errors.py`, distilled)."""
    from spinnerf_tpu.utils.visualization import write_gallery
    outdir = Path(outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    results, rows = score_predictions(datadir, predictdir, lpips_fn=lpips_fn)
    write_results_tsv(results, outdir / "metrics.tsv")

    ascending = sort_by in ("ssim", "psnr")  # low = bad for similarity scores
    rows_sorted = sorted(rows, key=lambda r: r[sort_by],
                         reverse=not ascending)
    worst = rows_sorted[:worst_k]
    by_mask = {mp.name: (ip, mp) for ip, mp in load_eval_pairs(datadir)}
    sheet_paths = []
    for r in worst:
        ip, mp = by_mask[r["name"]]
        img = _imread_rgb(ip)
        mask = _imread_mask(mp)
        pred = _imread_rgb(_find_prediction(predictdir, mp))
        if pred.shape != img.shape:
            import cv2
            pred = cv2.resize(pred, (img.shape[1], img.shape[0]),
                              interpolation=cv2.INTER_AREA)
        name = f"worst_{sort_by}_{r[sort_by]:.4f}_{r['name']}"
        _imwrite_rgb(outdir / name,
                     np.concatenate([_mask_outline(img, mask), pred], axis=1))
        sheet_paths.append(name)
    write_gallery(outdir / "report.html",
                  [(f"worst {worst_k} by {sort_by}", sheet_paths)],
                  title=f"error analysis: {predictdir}")
    with open(outdir / "per_image.json", "w") as f:
        json.dump(rows_sorted, f, indent=2)
    return results


def predict_inner_features(indir, outdir, *, checkpoint_path=None,
                           n_channels: int = 16) -> Path:
    """Run the generator front on each image/mask pair and dump the latent
    feature maps: raw `.npy` + a channel-grid PNG per image
    (parity: `bin/predict_inner_features.py`)."""
    from spinnerf_tpu.pipeline.inpaint2d import (load_generator,
                                                 pad_to_modulo)
    import jax.numpy as jnp
    outdir = Path(outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    import jax
    gen, variables = load_generator(checkpoint_path)
    front = jax.jit(lambda v, x: gen.apply(v, x,
                                           method=lambda m, y: m.front(y)))
    for ip, mp in load_eval_pairs(indir):
        img = _imread_rgb(ip)
        mask = _imread_mask(mp)
        img_p, _ = pad_to_modulo(img)
        m_p, _ = pad_to_modulo(mask)
        m_p = m_p[..., None]
        inp = jnp.asarray(np.concatenate([img_p * (1 - m_p), m_p], -1)[None])
        z_l, z_g = front(variables, inp)
        z = np.asarray(z_l if z_g is None
                       else jnp.concatenate([z_l, z_g], axis=-1))[0]
        np.save(outdir / f"{mp.stem}_features.npy", z)
        k = min(n_channels, z.shape[-1])
        cols = int(np.ceil(np.sqrt(k)))
        h, w = z.shape[:2]
        grid = np.zeros((cols * h, cols * w), np.float32)
        for i in range(k):
            ch = z[..., i]
            lo, hi = ch.min(), ch.max()
            ch = (ch - lo) / max(hi - lo, 1e-8)
            r, c = divmod(i, cols)
            grid[r * h:(r + 1) * h, c * w:(c + 1) * w] = ch
        _imwrite_rgb(outdir / f"{mp.stem}_features.png",
                     np.repeat(grid[..., None], 3, axis=-1))
    return outdir


def export_generator(outpath, *, checkpoint_path=None,
                     input_shape=(1, 512, 512, 4)) -> Path:
    """AOT-serialize the jitted generator forward as StableHLO bytes
    (`jax.export`) — the deployment artifact the reference produces with
    TorchScript in `bin/to_jit.py`. Reload with
    `jax.export.deserialize(blob).call(x)`."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport
    from spinnerf_tpu.pipeline.inpaint2d import load_generator
    gen, variables = load_generator(checkpoint_path)

    def forward(x):
        return gen.apply(variables, x)

    exp = jexport.export(jax.jit(forward))(
        jax.ShapeDtypeStruct(input_shape, jnp.float32))
    outpath = Path(outpath)
    outpath.parent.mkdir(parents=True, exist_ok=True)
    outpath.write_bytes(exp.serialize())
    return outpath


def report_from_logs(jsonl_path, *, keys=None) -> dict:
    """Summarize a metrics JSONL (one dict per step) into first/last/min/max
    per metric (parity: `bin/report_from_tb.py` over our log format)."""
    rows = []
    with open(jsonl_path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    if not rows:
        return {}
    out = {}
    names = keys or sorted({k for r in rows for k in r
                            if isinstance(r[k], (int, float))})
    for k in names:
        vals = [r[k] for r in rows if k in r]
        if not vals:
            continue
        out[k] = {"first": vals[0], "last": vals[-1],
                  "min": min(vals), "max": max(vals), "n": len(vals)}
    return out


def format_report(report: dict) -> str:
    lines = [f"{'metric':<24}{'first':>12}{'last':>12}"
             f"{'min':>12}{'max':>12}{'n':>8}"]
    for k, v in report.items():
        lines.append(f"{k:<24}{v['first']:>12.5g}{v['last']:>12.5g}"
                     f"{v['min']:>12.5g}{v['max']:>12.5g}{v['n']:>8d}")
    return "\n".join(lines)
