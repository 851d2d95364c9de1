"""fisr_tpu — TPU-native joint video frame interpolation + super-resolution framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the FISR reference
(AAAI 2020, "Deep Joint Frame Interpolation and Super-Resolution with a
Multi-scale Temporal Loss"): FISRnet (3-level coarse-to-fine joint VFI+SR
U-Net stack), a PWC-Net optical-flow estimator with cost-volume and dense
bilinear warping, the multi-scale temporal training loss, and patch-parallel
4K inference — all designed TPU-first (NHWC bf16 compute / f32 params,
pjit/shard_map over device meshes, Pallas kernels for the hot ops).
"""

__version__ = "0.1.0"
