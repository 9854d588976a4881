"""Benchmark: fused-train-step throughput in rays/sec/chip (+MFU, hash-grid).

Measures the flagship configuration (bf16 MLP field, 64+64 samples, four
supervision groups fused into one render — the statue-f2 stage-5 workload
shape) on whatever accelerator JAX exposes, and prints ONE JSON line. The
line's required keys are metric/value/unit/vs_baseline (flagship rays/s);
`extra` carries the rest of the suite:

  mfu                      achieved fraction of bf16 matmul peak for the
                           flagship step (XLA cost_analysis FLOPs / wall)
  step_ms                  flagship step wall-clock
  hashgrid14_rays_per_sec  hash-grid field step, log2_hashmap_size=14
                           (impl="auto": windowed encode since round 3 —
                           it beats the dense one-hot kernel at any table
                           over one window)
  hashgrid19_rays_per_sec  hash-grid field step at the reference default
                           2^19 (`DS_NeRF/run_nerf_helpers_tcnn.py:24`),
                           via the Z-curve windowed encode
                           (ops/hash_encode_win.py): one 2-key lax.sort
                           amortized over all 16 levels + O(window) MXU
                           gathers — the sort cost that killed per-level
                           sorted gathers (72 ms/level) drops to ~2 ms
                           total, and the dense kernel's O(T)/point cost
                           (3.5 s/step at 2^19) disappears.

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

# per-chip dense bf16 matmul peak, FLOP/s
_PEAK = {
    "TPU v5 lite": 197e12,
    "TPU v5": 459e12,
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,
}


def _peak_flops(device) -> float:
    kind = getattr(device, "device_kind", "")
    for k, v in _PEAK.items():
        if kind.startswith(k):
            return v
    return 197e12


def _time_step(step, params, opt_state, n_steps, key):
    import jax
    for i in range(3):
        key, k = jax.random.split(key)
        params, opt_state, metrics = step(params, opt_state, k, i)
    jax.block_until_ready(metrics["loss"])
    t0 = time.perf_counter()
    for i in range(n_steps):
        key, k = jax.random.split(key)
        params, opt_state, metrics = step(params, opt_state, k, i)
    jax.block_until_ready(metrics["loss"])
    return (time.perf_counter() - t0) / n_steps, metrics


def main():
    import jax
    import numpy as np

    import tempfile

    from spinnerf_tpu.core.rendering import RenderConfig
    from spinnerf_tpu.data import colmap, llff, raybank, synthetic
    from spinnerf_tpu.models.fields import NeRFField
    from spinnerf_tpu.train import schedule
    from spinnerf_tpu.train.step import (TrainConfig, init_params,
                                         make_train_step)

    n_rand = 1024
    rays_per_step = n_rand * 4    # clf + rgb + inp + depth groups
    on_tpu = jax.default_backend() != "cpu"

    with tempfile.TemporaryDirectory() as d:
        scene_dir = synthetic.make_scene(d, n_views=8, h=160, w=200, factor=1)
        scene = llff.load_scene(scene_dir, factor=1)
        depth_list = colmap.sparse_depth_for_views(
            scene_dir / "sparse" / "0", factor=1, bd_scale=scene.scale)
        bank = raybank.build_raybank(scene, np.arange(8),
                                     depth_list=depth_list)

    rcfg = RenderConfig(n_samples=64, n_importance=64, perturb=True,
                        raw_noise_std=1.0)
    tcfg = TrainConfig(render=rcfg, n_rand=n_rand, depth_supervision=True,
                       lrate=0.01, lrate_decay=10)
    tx = schedule.make_optimizer(tcfg.lrate, tcfg.lrate_decay)

    def build_step(model):
        params = init_params(model, jax.random.PRNGKey(0), n_importance=64)
        return make_train_step(model, tcfg, bank, tx), params, tx.init(params)

    # --- flagship: 8x256 MLP. On a real TPU the field runs the Pallas fused
    # encode+MLP kernel (ops/fused_mlp.py: PE computed in-kernel, weight-grads
    # only, VMEM-resident activations — 1.6x over the XLA schedule on v5e);
    # off-TPU it falls back to the flax field.
    if on_tpu:
        from spinnerf_tpu.ops.fused_mlp import FusedMLPField
        model = FusedMLPField()
    else:
        model = NeRFField()
    step, params, opt_state = build_step(model)

    # MFU: analytic matmul FLOPs of the field evaluations (XLA cost_analysis
    # cannot see inside the Pallas fused kernel, so counting is done from the
    # architecture). fwd = 2*MAC/point; training ~3x fwd (activation-grad
    # chain + weight grads). Sampling/compositing are not matmuls and are
    # excluded — standard MFU convention.
    def _mlp_macs(depth=8, width=256, in_ch=63, views_ch=27):
        macs = in_ch * width                      # input layer
        macs += (depth - 2) * width * width       # plain hidden layers
        macs += (width + in_ch) * width           # skip layer (at 4)
        macs += width * 1 + width * width         # alpha head + feature
        macs += (width + views_ch) * (width // 2) # view branch
        macs += (width // 2) * 3                  # rgb head
        return macs

    pts_per_step = rays_per_step * (rcfg.n_samples            # coarse net
                                    + rcfg.n_samples + rcfg.n_importance)
    flops = 3 * 2 * _mlp_macs() * pts_per_step

    dt, metrics = _time_step(step, params, opt_state, 100,
                             jax.random.PRNGKey(1))
    rays_per_sec = rays_per_step / dt
    extra = {"step_ms": round(dt * 1000, 2)}
    if flops:
        extra["mfu"] = round(flops / dt / _peak_flops(jax.devices()[0]), 4)
        extra["step_tflops"] = round(flops / 1e12, 4)

    # --- hash-grid field (reference default model): a mid-size table (2^14)
    # and the reference-default 2^19, both through impl="auto" (the Z-curve
    # windowed encode — see module docstring).
    from spinnerf_tpu.models.hashgrid import HashGridField
    for log2t, steps in ((14, 50), (19, 50)) if on_tpu else ((14, 3),):
        hstep, hparams, hopt = build_step(
            HashGridField(log2_table_size=log2t))
        hdt, _ = _time_step(hstep, hparams, hopt, steps, jax.random.PRNGKey(2))
        extra[f"hashgrid{log2t}_rays_per_sec"] = round(rays_per_step / hdt, 1)
        extra[f"hashgrid{log2t}_step_ms"] = round(hdt * 1000, 1)
        if log2t == 19 and on_tpu:
            # ISSUED-matmul utilization — deliberately NOT named "mfu":
            # almost all MXU work is the windowed one-hot GATHER formulation
            # (per point-corner-level: a [128,64]x[64,B] row gather =>
            # 128*64 MACs counted as issued, 2 floats of it useful), not
            # the tiny MLP heads. It measures how hard the encode drives
            # the MXU; rays/s vs the flagship is the only honest efficiency
            # metric for the hash grid. fwd per point: 8 corners * L levels
            # * 8192 MACs; training ~= 3x fwd.
            gather_macs = 8 * 16 * 128 * 64
            mlp_macs = (32 * 64 + 64 * 16) + (31 * 64 + 64 * 64 + 64 * 3)
            hflops = 3 * 2 * (gather_macs + mlp_macs) * pts_per_step
            extra["hashgrid19_mxu_issued_util"] = round(
                hflops / hdt / _peak_flops(jax.devices()[0]), 4)

    baseline = 25000.0  # est. reference A6000 target-rays/s (see docstring)
    print(json.dumps({
        "metric": "fused_train_step_rays_per_sec_per_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / baseline, 3),
        "extra": extra,
    }))
    print(f"# flagship {1/dt:.1f} it/s, loss={float(metrics['loss']):.4f}, "
          f"psnr={float(metrics['psnr']):.2f}, extra={extra}", file=sys.stderr)


if __name__ == "__main__":
    main()
