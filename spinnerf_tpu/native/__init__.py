"""Native (C++) host-side runtime components.

Build in-place with:  python -m spinnerf_tpu.native.build
The extension is optional — `data.colmap_fast` falls back to the pure-Python
readers when it is absent.
"""
