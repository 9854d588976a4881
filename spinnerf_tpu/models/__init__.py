from spinnerf_tpu.models import embedding, fields  # noqa: F401
