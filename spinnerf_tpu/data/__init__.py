from spinnerf_tpu.data import colmap, llff, raybank  # noqa: F401
