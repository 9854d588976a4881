"""Benchmark: fused-train-step throughput in rays/sec/chip.

Measures the flagship configuration (bf16 MLP field, 64+64 samples, four
supervision groups fused into one render — the statue-f2 stage-5 workload
shape) on whatever accelerator JAX exposes, and prints ONE JSON line.

Baseline: the reference repo publishes no numbers (BASELINE.md); its A6000
training loop runs ~4 chunked renders of 1024 rays each per iteration at
roughly 5-7 it/s for this config (measured figures for DS-NeRF-style
coarse+fine 64+64 torch pipelines on A6000-class GPUs), i.e. ~25k target
rays/s. vs_baseline is computed against that 25k rays/s estimate until the
reference can be timed on real hardware.
"""
import json
import sys
import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import tempfile

    from spinnerf_tpu.core.rendering import RenderConfig
    from spinnerf_tpu.data import colmap, llff, raybank, synthetic
    from spinnerf_tpu.models.fields import NeRFField
    from spinnerf_tpu.train import schedule
    from spinnerf_tpu.train.step import (TrainConfig, init_params,
                                         make_train_step)

    n_rand = 1024

    with tempfile.TemporaryDirectory() as d:
        scene_dir = synthetic.make_scene(d, n_views=8, h=160, w=200, factor=1)
        scene = llff.load_scene(scene_dir, factor=1)
        depth_list = colmap.sparse_depth_for_views(
            scene_dir / "sparse" / "0", factor=1, bd_scale=scene.scale)
        bank = raybank.build_raybank(scene, np.arange(8),
                                     depth_list=depth_list)

    # 8x256 MLP flagship. On a real TPU the field runs the Pallas fused
    # encode+MLP kernel (ops/fused_mlp.py: PE computed in-kernel, weight-grads
    # only, VMEM-resident activations — 1.6x over the XLA schedule on v5e);
    # off-TPU it falls back to the flax field. (The hash-grid field is
    # functional but gather-bound on TPU; see models/hashgrid.py notes.)
    if jax.default_backend() != "cpu":
        from spinnerf_tpu.ops.fused_mlp import FusedMLPField
        model = FusedMLPField()
    else:
        model = NeRFField()
    rcfg = RenderConfig(n_samples=64, n_importance=64, perturb=True,
                        raw_noise_std=1.0)
    tcfg = TrainConfig(render=rcfg, n_rand=n_rand, depth_supervision=True,
                       lrate=0.01, lrate_decay=10)
    tx = schedule.make_optimizer(tcfg.lrate, tcfg.lrate_decay)
    params = init_params(model, jax.random.PRNGKey(0), n_importance=64)
    opt_state = tx.init(params)
    step = make_train_step(model, tcfg, bank, tx)

    # groups: clf + rgb + inp + depth = 4 ray groups per iteration
    rays_per_step = n_rand * 4

    key = jax.random.PRNGKey(1)
    # warmup / compile
    for i in range(3):
        key, k = jax.random.split(key)
        params, opt_state, metrics = step(params, opt_state, k, i)
    jax.block_until_ready(metrics["loss"])

    n_steps = 100
    t0 = time.perf_counter()
    for i in range(n_steps):
        key, k = jax.random.split(key)
        params, opt_state, metrics = step(params, opt_state, k, i)
    jax.block_until_ready(metrics["loss"])
    dt = time.perf_counter() - t0

    rays_per_sec = rays_per_step * n_steps / dt
    baseline = 25000.0  # est. reference A6000 target-rays/s (see docstring)
    print(json.dumps({
        "metric": "fused_train_step_rays_per_sec_per_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / baseline, 3),
    }))
    print(f"# {n_steps} steps in {dt:.2f}s = {n_steps/dt:.1f} it/s, "
          f"loss={float(metrics['loss']):.4f}, "
          f"psnr={float(metrics['psnr']):.2f}", file=sys.stderr)


if __name__ == "__main__":
    main()
