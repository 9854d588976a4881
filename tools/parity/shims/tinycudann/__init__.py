"""tinycudann shim: satisfies `import tinycudann as tcnn`
(`run_nerf_helpers_tcnn.py:9`). Parity runs pass `--no_tcnn`, so these are
never constructed; constructing one raises to fail loudly."""


class _Unavailable:
    def __init__(self, *args, **kwargs):
        raise RuntimeError(
            "tinycudann shim: NeRF_TCNN requires CUDA tinycudann; "
            "run the reference with --no_tcnn for CPU parity checks.")


class Encoding(_Unavailable):
    pass


class Network(_Unavailable):
    pass


class NetworkWithInputEncoding(_Unavailable):
    pass
