"""Learning-rate schedules and optimizer construction.

Parity: the reference decays Adam's lr manually each step as
`lrate * 0.1^(step / (lrate_decay * 1000))` (`DS_NeRF/run_nerf.py:1615-1622`)
with Adam betas (0.9, 0.999). Expressed here as an optax schedule so the
update rule lives inside the jitted step.
"""
from __future__ import annotations

import optax


def exponential_lr(lrate: float, lrate_decay: float) -> optax.Schedule:
    """Continuous exponential decay: lr(step) = lrate * 0.1^(step / (decay*1000)).

    lrate_decay <= 0 means NO decay (a decay of 0 must not collapse the
    schedule to 0.1^step).
    """
    if lrate_decay <= 0:
        return optax.constant_schedule(lrate)
    return optax.exponential_decay(
        init_value=lrate,
        transition_steps=max(int(lrate_decay * 1000), 1),
        decay_rate=0.1,
        staircase=False,
    )


def make_optimizer(lrate: float, lrate_decay: float,
                   grad_clip: float | None = None,
                   table_wd: float = 0.0) -> optax.GradientTransformation:
    """Adam with the reference's exponential decay; optional global-norm clip
    (not in the reference NeRF trainer, but standard for bf16 stability).

    table_wd > 0 adds L2 decay to hash-TABLE params only (leaf path contains
    "table"), applied before Adam (L2-through-Adam, not AdamW): the few-view
    regularizer for hash grids whose table dwarfs the scene's pixel count.
    Default 0 keeps exact reference-optimizer parity."""
    tx = optax.adam(exponential_lr(lrate, lrate_decay), b1=0.9, b2=0.999)
    if table_wd > 0.0:
        def table_mask(params):
            def walk(tree, in_table=False):
                if isinstance(tree, dict):
                    return {k: walk(v, in_table or "table" in str(k).lower())
                            for k, v in tree.items()}
                return in_table
            return walk(params)
        tx = optax.chain(
            optax.masked(optax.add_decayed_weights(table_wd), table_mask), tx)
    if grad_clip is not None:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx
