"""spinnerf_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of SPIn-NeRF.

SPIn-NeRF (CVPR 2023) removes objects from captured 3D scenes and inpaints the
hole view-consistently. The reference implementation
(SamsungLabs/SPIn-NeRF) is a multi-stage PyTorch/CUDA pipeline; this package
re-designs the same capabilities TPU-first:

- ``core``     pure-functional volume rendering: ray generation, stratified +
               inverse-CDF sampling, alpha compositing, loss terms.
- ``models``   field networks (MLP NeRF, hash-grid NeRF, semantic heads) as
               flax modules; LaMa FFC inpainter graph.
- ``data``     COLMAP/LLFF/Blender loaders and fixed-shape ray banks.
- ``parallel`` `jax.sharding` mesh layer: ray-batch data parallelism over ICI.
- ``train``    single fused jitted train step, schedules, checkpoints.
- ``eval``     PSNR/SSIM/LPIPS metrics and sharded full-frame rendering.
- ``ops``      Pallas TPU kernels for the hot paths.
- ``pipeline`` the staged SPIn-NeRF pipeline (mvseg -> prepare -> inpaint -> fit).

Everything under jit uses static shapes and explicit PRNG key threading.
"""

__version__ = "0.1.0"
