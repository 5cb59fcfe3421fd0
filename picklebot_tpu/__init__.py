"""picklebot-tpu: a TPU-native (JAX/XLA/Pallas/pjit) video-classification
framework with the capabilities of hbfreed/Picklebot.

Layers:
  core/      functional pytree module system, initializers, dtype policy
  ops/       conv / norm / attention / SE / bottleneck primitives
             (+ ops/pallas: first-party TPU kernels)
  models/    MobileNet3D, MobileNet2D+LSTM, MoViNet-A2 (+ streaming),
             MobileViT V1 (3D), MobileViT V2
  data/      CSV annotations + video decode + bucketed padding pipeline
  train/     losses, optimizers (incl. 8-bit AdamW), train loop, checkpoints,
             metrics
  parallel/  device mesh + shard_map data-parallel training step
  utils/     config system, profiling
"""

__version__ = "0.1.0"
