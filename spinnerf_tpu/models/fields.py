"""Radiance fields as flax modules.

One configurable `NeRFField` replaces the reference's four model classes
(`NeRF`, `NeRF_RGB`, the MVSeg 5-channel fork, and — together with
`models.hashgrid` — `NeRF_TCNN`):

- ``semantic=True`` adds an objectness-logit head (MVSeg's 5th channel,
  `MVSeg/DS_NeRF/run_nerf_helpers_tcnn.py:50,99-113`).
- ``frozen_sigma_fn`` reproduces `NeRF_RGB` (`run_nerf_helpers.py:159-216`):
  density comes, gradient-free, from a frozen alpha model while this field
  supplies color.

TPU-first choices: activations are computed in a configurable `compute_dtype`
(bfloat16 by default — the 256-wide MLP is MXU-bound) with float32 params and
float32 accumulation via `preferred_element_type` inside flax Dense; heads
(sigma/rgb/semantic) are emitted in float32 for compositing stability.
"""
from __future__ import annotations

from typing import Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from spinnerf_tpu.models.embedding import positional_encoding


class NeRFField(nn.Module):
    """The classic 8x256 NeRF MLP with skip connections and a view branch.

    Architecture parity (`DS_NeRF/run_nerf_helpers.py:74-127`): `depth` trunk
    layers of `width`, skip-concat of the encoded position after layer
    `skips[i]`; sigma head off the trunk; feature layer + one width/2 view
    layer -> rgb head. Raw output channel order is [rgb(3), sigma(1), logit?].
    """
    depth: int = 8
    width: int = 256
    skips: Sequence[int] = (4,)
    multires: int = 10          # positional-encoding octaves for xyz
    multires_views: int = 4     # octaves for view dirs (use_viewdirs=True)
    use_viewdirs: bool = True
    semantic: bool = False      # add objectness-logit head (MVSeg)
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, pts, viewdirs=None, frozen_sigma=None):
        """Evaluate the field.

        Args:
          pts: [..., 3] world-space sample positions.
          viewdirs: [..., 3] unit view directions broadcastable to pts[..., :3]
            minus the sample axis — i.e. [B, 3] against pts [B, S, 3].
          frozen_sigma: optional [..., 1] precomputed density (NeRF_RGB mode);
            already stop-gradiented by the caller.
        Returns:
          raw [..., 4 (+1 if semantic)] float32.
        """
        dtype = self.compute_dtype
        pe = positional_encoding(pts, self.multires).astype(dtype)

        h = pe
        for i in range(self.depth):
            h = nn.Dense(self.width, dtype=dtype, name=f"trunk_{i}")(h)
            h = nn.relu(h)
            if i in self.skips:
                h = jnp.concatenate([pe, h], axis=-1)

        if frozen_sigma is not None:
            sigma = frozen_sigma.astype(jnp.float32)
        else:
            sigma = nn.Dense(1, dtype=dtype, name="sigma_head")(h).astype(jnp.float32)

        heads = []
        if self.semantic:
            heads.append(
                nn.Dense(1, dtype=dtype, name="semantic_head")(h).astype(jnp.float32))

        if self.use_viewdirs:
            if viewdirs is None:
                raise ValueError("use_viewdirs=True requires viewdirs")
            feat = nn.Dense(self.width, dtype=dtype, name="feature")(h)
            vd = jnp.broadcast_to(viewdirs[..., None, :], pts.shape[:-1] + (3,))
            ve = positional_encoding(vd, self.multires_views).astype(dtype)
            h = jnp.concatenate([feat, ve], axis=-1)
            h = nn.relu(nn.Dense(self.width // 2, dtype=dtype, name="view_0")(h))
            rgb = nn.Dense(3, dtype=dtype, name="rgb_head")(h).astype(jnp.float32)
        else:
            rgb = nn.Dense(3, dtype=dtype, name="rgb_head")(h).astype(jnp.float32)

        return jnp.concatenate([rgb, sigma] + heads, axis=-1)


def make_field_fn(model: nn.Module, params,
                  frozen_sigma_fn: Callable | None = None):
    """Bind a field module + params into the `(pts, viewdirs) -> raw` closure
    consumed by `core.rendering.render_rays`.

    `frozen_sigma_fn`, when given, is evaluated under stop_gradient and its
    sigma replaces the field's own (NeRF_RGB semantics,
    `run_nerf_helpers.py:201-203`).
    """
    def field_fn(pts, viewdirs):
        frozen = None
        if frozen_sigma_fn is not None:
            frozen = jax.lax.stop_gradient(frozen_sigma_fn(pts, viewdirs)[..., 3:4])
        return model.apply(params, pts, viewdirs, frozen_sigma=frozen)
    return field_fn
