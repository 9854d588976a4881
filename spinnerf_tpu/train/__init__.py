from spinnerf_tpu.train import schedule, step, loop, checkpoints  # noqa: F401
