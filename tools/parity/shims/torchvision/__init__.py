"""torchvision shim: the reference imports it (`run_nerf_helpers.py:3`) but
never uses it on the training path. Empty module satisfies the import."""
__version__ = "0.0-shim"
