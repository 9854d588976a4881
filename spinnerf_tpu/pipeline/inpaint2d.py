"""2D inpainting stage: LaMa inference + the SPIn-NeRF multiscale refiner.

Reference surface (`lama/bin/predict.py:38-107` +
`saicinpainting/evaluation/refinement.py`):
- plain prediction: pad image/mask to a multiple of 8, concat masked RGB with
  the mask, one generator forward, blend `pred * mask + image * (1 - mask)`;
- refined prediction: an image/mask pyramid (<=3 scales, min side 512, pixel
  budget 1.8 MP), and per scale an inner optimization — the generator is split
  front/rear, the front's latent pair (z_l, z_g) is optimized with Adam
  (15 iters, lr 2e-3) against a downscaled-L1 match to the previous scale's
  result (`refinement.py:90-189`); SPIn-NeRF's patch additionally dilates the
  mask 5x5 x5 inside `_infer` (`refinement.py:125-132`).

TPU redesign: the inner optimization is an optax loop over jitted value_and_
grad of the rear network — latents are device arrays, the 15-step loop runs
without host round-trips. Directory IO reproduces the LaMa_test_images ->
output contract the NeRF stages consume.
"""
from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from spinnerf_tpu.models import lama


def pad_to_modulo(img: np.ndarray, mod: int = 8):
    """Reflect-pad H/W up to multiples of `mod`
    (parity: `saicinpainting/evaluation/data.py:29`)."""
    h, w = img.shape[:2]
    ph = (mod - h % mod) % mod
    pw = (mod - w % mod) % mod
    pad = [(0, ph), (0, pw)] + [(0, 0)] * (img.ndim - 2)
    return np.pad(img, pad, mode="symmetric"), (h, w)


def dilate_mask(mask: np.ndarray, kernel: int = 5, iterations: int = 5):
    import cv2
    return cv2.dilate(mask.astype(np.uint8),
                      np.ones((kernel, kernel), np.uint8),
                      iterations=iterations).astype(np.float32)


def _area_resize(img, h, w):
    import cv2
    out = cv2.resize(np.asarray(img), (w, h), interpolation=cv2.INTER_AREA)
    return out


class Inpainter:
    """Jit-cached inference wrapper around an FFC generator.

    `jax.jit(gen.apply)` built per call recompiles the 18-block graph for
    EVERY image (~17 s on v5e); one Inpainter per (gen, variables) pair
    compiles once per input shape. The latent-refinement optimizer step is
    cached per pyramid-level shape signature the same way.
    """

    def __init__(self, gen: lama.FFCResNetGenerator, variables):
        self.gen = gen
        self.variables = variables
        # variables are jit ARGUMENTS (not closure constants): updating the
        # weights — e.g. scoring successive EMA snapshots during training —
        # must not trigger a recompile
        self._full = jax.jit(gen.apply)
        self._front = jax.jit(
            lambda v, inp: gen.apply(v, inp,
                                     method=lambda m, x: m.front(x)))
        self._rear = jax.jit(
            lambda v, z: gen.apply(v, z,
                                   method=lambda m, z_: m.rear(z_)))
        self._steps = {}

    def full(self, inp):
        return self._full(self.variables, inp)

    def front(self, inp):
        return self._front(self.variables, inp)

    def rear(self, z):
        return self._rear(self.variables, z)

    def refine_step(self, *, h, w, ph, pw, lr):
        """Jitted Adam step on the latents against the previous-scale
        reference, cached on the static shape signature."""
        key = (h, w, ph, pw, lr)
        if key in self._steps:
            return self._steps[key]
        gen = self.gen
        fy, fx = h // ph, w // pw
        tx = optax.adam(lr)

        def loss_fn(z, variables, ref, m_ref, image, m_full):
            pred = gen.apply(variables, z,
                             method=lambda m, z_: m.rear(z_))[0, :h, :w]
            pd = pred[: ph * fy, : pw * fx]
            pd = pd.reshape(ph, fy, pw, fx, 3).mean(axis=(1, 3))
            hole = jnp.sum(jnp.abs(pd - ref) * m_ref) / \
                jnp.maximum(jnp.sum(m_ref), 1.0)
            # full-res known-region anchor (`refinement.py:78-87` _l1_loss):
            # without it the latent walk drifts the prediction outside the
            # hole, and the blend against the untouched surround seams
            known = (1.0 - m_full)
            anchor = jnp.sum(jnp.abs(pred - image) * known) / \
                jnp.maximum(jnp.sum(known), 1.0)
            return hole + anchor

        @jax.jit
        def step(z, opt_state, variables, ref, m_ref, image, m_full):
            loss, grads = jax.value_and_grad(loss_fn)(z, variables, ref,
                                                      m_ref, image, m_full)
            updates, opt_state = tx.update(grads, opt_state)
            return optax.apply_updates(z, updates), opt_state, loss

        self._steps[key] = (step, tx)
        return self._steps[key]


_INPAINTER_CACHE: list = []   # [(gen_id, Inpainter)] — keep last few


def _inpainter_for(gen, variables) -> Inpainter:
    """Jit-cache per generator; refresh `variables` (a jit argument, so new
    weights of the same shapes reuse the compiled graphs)."""
    for gid, inp in _INPAINTER_CACHE:
        if gid == id(gen):
            inp.variables = variables
            return inp
    inp = Inpainter(gen, variables)
    _INPAINTER_CACHE.append((id(gen), inp))
    del _INPAINTER_CACHE[:-4]   # bound compiled-graph retention
    return inp


def predict(gen: lama.FFCResNetGenerator, variables, image: np.ndarray,
            mask: np.ndarray, *, inpainter: Inpainter | None = None
            ) -> np.ndarray:
    """Plain single-forward inpainting.

    Args: image [H, W, 3] float in [0,1]; mask [H, W] (1 = hole).
    Returns: inpainted [H, W, 3].
    """
    inpainter = inpainter or _inpainter_for(gen, variables)
    img_p, (h, w) = pad_to_modulo(image)
    mask_p, _ = pad_to_modulo(mask)
    mask_p = (mask_p > 0.5).astype(np.float32)[..., None]
    masked = img_p * (1.0 - mask_p)
    inp = jnp.asarray(np.concatenate([masked, mask_p], -1)[None])
    # jit: the axon TPU backend rejects some of these ops dispatched eagerly
    # (op-by-op); under jit the whole graph compiles fine
    pred = np.asarray(inpainter.full(inp))[0]
    out = pred * mask_p + img_p * (1.0 - mask_p)
    return out[:h, :w]


def _build_pyramid(image, mask, *, min_side: int = 512,
                   px_budget: float = 1.8e6, max_scales: int = 3):
    """Image/mask pyramid, smallest first (`refinement.py:192-243`):
    cap the finest level at px_budget, then downscale x2 while both sides
    stay >= min_side, up to max_scales levels."""
    h, w = image.shape[:2]
    if h * w > px_budget:
        ratio = np.sqrt(px_budget / (h * w))
        h, w = int(h * ratio), int(w * ratio)
        image = _area_resize(image, h, w)
        mask = _area_resize(mask, h, w)
    levels = [(image, (mask > 0.5).astype(np.float32))]
    for _ in range(max_scales - 1):
        h, w = levels[-1][0].shape[:2]
        if min(h, w) < 2 * min_side:
            break
        im = _area_resize(levels[-1][0], h // 2, w // 2)
        mk = _area_resize(levels[-1][1], h // 2, w // 2)
        levels.append((im, (mk > 0.5).astype(np.float32)))
    return levels[::-1]


def refine_predict(gen: lama.FFCResNetGenerator, variables,
                   image: np.ndarray, mask: np.ndarray, *,
                   n_iters: int = 15, lr: float = 2e-3,
                   min_side: int = 512, px_budget: float = 1.8e6,
                   max_scales: int = 3, mask_dilate_iters: int = 5,
                   inpainter: Inpainter | None = None) -> np.ndarray:
    """Multiscale latent-refined inpainting (`refine_predict`,
    `refinement.py:245-309`, single-device).

    Returns the inpainted image at the pyramid's finest resolution.
    """
    inpainter = inpainter or _inpainter_for(gen, variables)
    levels = _build_pyramid(image, mask, min_side=min_side,
                            px_budget=px_budget, max_scales=max_scales)

    def forward(img_l, mask_l):
        img_p, (h, w) = pad_to_modulo(img_l)
        m_p, _ = pad_to_modulo(mask_l)
        m_p = (m_p > 0.5).astype(np.float32)[..., None]
        inp = jnp.asarray(
            np.concatenate([img_p * (1 - m_p), m_p], -1)[None])
        return inp, m_p, (h, w)

    prev = None   # previous-scale refined result (np [h, w, 3])
    for level, (img_l, mask_l) in enumerate(levels):
        if mask_dilate_iters > 0:
            mask_l = dilate_mask(mask_l, iterations=mask_dilate_iters)
        inp, m_p, (h, w) = forward(img_l, mask_l)

        z = inpainter.front(inp)
        if prev is None or n_iters <= 0:
            pred = np.asarray(inpainter.rear(z))[0]
        else:
            ph, pw = prev.shape[:2]
            ref = jnp.asarray(prev)
            # downscale mask to the reference scale — from the UNPADDED
            # region (the mod-8 padding would shift the loss window near
            # the right/bottom edges)
            m_ref = _area_resize(m_p[:h, :w, 0], ph, pw) > 1e-6
            m_ref_j = jnp.asarray(m_ref.astype(np.float32))[..., None]
            img_j = jnp.asarray(img_l)
            m_full_j = jnp.asarray(m_p[:h, :w])

            step, tx = inpainter.refine_step(h=h, w=w, ph=ph, pw=pw, lr=lr)
            opt_state = tx.init(z)
            for _ in range(n_iters):
                z, opt_state, _ = step(z, opt_state, inpainter.variables,
                                       ref, m_ref_j, img_j, m_full_j)
            pred = np.asarray(inpainter.rear(z))[0]

        out = pred[:h, :w] * m_p[:h, :w] + img_l * (1 - m_p[:h, :w])
        prev = out
    return prev


def load_generator(checkpoint_path=None, **kwargs):
    """Build the big-lama generator; load converted torch weights when a
    checkpoint is given, else seeded random init (architecture-functional)."""
    gen = lama.FFCResNetGenerator(**kwargs)
    if checkpoint_path is None:
        from spinnerf_tpu import weights as wreg
        checkpoint_path = wreg.find("big_lama")
    if checkpoint_path is not None:
        import torch
        ckpt = torch.load(checkpoint_path, map_location="cpu")
        sd = ckpt.get("state_dict", ckpt)
        gen_sd = {k: v for k, v in sd.items()
                  if k.startswith(("generator.", "model."))}
        variables = lama.convert_big_lama(gen_sd)
    else:
        x = jnp.zeros((1, 64, 64, 4))
        variables = jax.jit(gen.init)(jax.random.PRNGKey(0), x)
    return gen, variables


def inpaint_directory(in_dir, out_dir, *, checkpoint_path=None,
                      refine: bool = False, inpainter: Inpainter | None = None,
                      **refine_kwargs):
    """LaMa predict-CLI parity: read `<in_dir>/img*.png` +
    `<in_dir>/label/img*.png` masks, write inpainted `<out_dir>/<name>.png`
    (`bin/predict.py:60-101` with the SPIn-NeRF staging names).

    Pass `inpainter` to reuse compiled graphs (and a loaded checkpoint)
    across multiple directories — e.g. the pipeline's disparity + RGB passes.
    """
    import cv2
    in_dir, out_dir = Path(in_dir), Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    if inpainter is None:
        gen, variables = load_generator(checkpoint_path)
        inpainter = Inpainter(gen, variables)  # compile once for the dir
    gen, variables = inpainter.gen, inpainter.variables

    images = sorted(p for p in in_dir.iterdir()
                    if p.suffix.lower() in (".png", ".jpg", ".jpeg")
                    and "_mask" not in p.stem)
    for p in images:
        img = cv2.cvtColor(cv2.imread(str(p)), cv2.COLOR_BGR2RGB)
        img = img.astype(np.float32) / 255.0
        # mask layouts: label/<name>.png (SPIn-NeRF staging) or the LaMa
        # eval-dataset convention <name>_mask*.png next to the image
        mp = in_dir / "label" / (p.stem + ".png")
        if not mp.exists():
            mp = next(iter(sorted(in_dir.glob(p.stem + "_mask*"))),
                      in_dir / (p.stem + "_mask.png"))
        m = cv2.imread(str(mp), cv2.IMREAD_GRAYSCALE)
        if m is None:
            raise FileNotFoundError(mp)
        m = (m.astype(np.float32) / 255.0 > 0.5).astype(np.float32)
        if m.shape != img.shape[:2]:
            m = cv2.resize(m, (img.shape[1], img.shape[0]),
                           interpolation=cv2.INTER_NEAREST)
        if refine:
            out = refine_predict(gen, variables, img, m,
                                 inpainter=inpainter, **refine_kwargs)
        else:
            out = predict(gen, variables, img, m, inpainter=inpainter)
        if out.shape[:2] != img.shape[:2]:
            out = _area_resize(out, img.shape[0], img.shape[1])
        cv2.imwrite(str(out_dir / (p.stem + ".png")),
                    cv2.cvtColor((np.clip(out, 0, 1) * 255).astype(np.uint8),
                                 cv2.COLOR_RGB2BGR))
    return out_dir
