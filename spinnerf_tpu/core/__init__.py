from spinnerf_tpu.core import rays, rendering, sampling, losses  # noqa: F401
