"""fsnet_tpu — a TPU-native (JAX/XLA/Pallas/pjit) self-supervised monocular depth
estimation framework with the capabilities of the FSNet reference
(Owen-Liuyuxuan/FSNet), re-designed TPU-first.

Package layout (mirrors the reference's layer responsibilities, not its code):

- ``fsnet_tpu.utils``      — config & builder DI kernel (ref ``vision_base/utils``)
- ``fsnet_tpu.ops``        — pure-jnp + Pallas compute kernels (geometry, warping, SSIM,
                             fisheye camera model, deformable conv, metrics)
- ``fsnet_tpu.models``     — flax.linen backbones / heads / meta-architectures
- ``fsnet_tpu.data``       — host-side data pipeline (datasets, augmentations, loader)
- ``fsnet_tpu.parallel``   — mesh / sharding helpers (DP over ICI, reference DDP/NCCL)
- ``fsnet_tpu.runtime``    — jitted train/eval steps, optimizers, checkpointing, export
- ``fsnet_tpu.evaluation`` — dataset evaluators (KITTI Eigen, KITTI-360, fisheye, ...)
"""

__version__ = "0.1.0"
