"""dusty_gan_tpu — a TPU-native JAX framework for noise-aware LiDAR scan GANs.

A ground-up re-design of the capabilities of kazuto1011/dusty-gan
("Learning to Drop Points for LiDAR Scan Synthesis", IROS 2021) for TPU
hardware: JAX/XLA/Pallas compute, pjit/shard_map data parallelism over
device meshes, bf16 compute with fp32 state, and explicit PRNG discipline.

Layout convention: images are NHWC (TPU-native), point clouds are (B, N, 3).
The PyTorch reference uses NCHW; converters live in
``dusty_gan_tpu.utils.torch_import``.
"""

__version__ = "0.1.0"
