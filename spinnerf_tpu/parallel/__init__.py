from spinnerf_tpu.parallel import mesh  # noqa: F401
