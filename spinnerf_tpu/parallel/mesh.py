"""Device-mesh and sharding helpers: ray-batch data parallelism over ICI.

The reference has no NeRF-side multi-device support at all (it pins cuda:0,
`DS_NeRF/run_nerf.py:38-39`); its only distribution is NCCL DDP for LaMa
training. The TPU-native scaling axis here (SURVEY §2.6) is the flattened ray
dimension:

- training: shard each sampled ray batch over the ``data`` mesh axis; params
  stay replicated; XLA/GSPMD inserts the gradient psum over ICI.
- rendering: shard a frame's pixels the same way.

Everything goes through `jax.sharding.NamedSharding` + sharding constraints
inside jit — no explicit collectives, so the same code runs on 1 chip, a v4-8
slice, or multi-slice (GSPMD partitions DCN the same way).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices=None, axis: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    devices = jax.devices() if devices is None else devices
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for [B, ...] arrays: leading dim split over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree, mesh: Mesh):
    """Constrain every leaf's leading dim onto the data axis (inside jit)."""
    s = NamedSharding(mesh, P(DATA_AXIS))

    def f(x):
        return jax.lax.with_sharding_constraint(x, s)
    return jax.tree.map(f, tree)


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
