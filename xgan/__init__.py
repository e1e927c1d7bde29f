"""xgan — a TPU-native (JAX/XLA/Pallas/pjit) GAN-augmentation framework.

Re-implements the full capability surface of the reference PyTorch pipeline
``harlanljones/gan-enhanced-pneumonia-classifier`` (see SURVEY.md) with a
TPU-first design:

- NHWC layouts, bfloat16 compute on the MXU, fp32 parameters and statistics.
- Whole train steps (including the WGAN-GP gradient-penalty double-backward)
  compiled into single XLA programs.
- Data parallelism via ``jax.sharding.Mesh`` + NamedSharding; BatchNorm under
  DP is cross-replica (sync-BN) for free because batch statistics are global
  reductions under jit.
- A device-resident uint8 data path: the decoded dataset lives in HBM and is
  gathered/normalized/augmented on device each step (no per-step H2D copies).

Package layout:
    xgan.ops       conv / conv-transpose / batchnorm primitives + Pallas kernels
    xgan.models    DCGAN, CGAN, WGAN-GP, ResNet-50, VGG-16 (flax.linen)
    xgan.data      RSNA metadata, image store, device pipeline, curriculum mixer
    xgan.train     jitted train/eval steps and epoch orchestration
    xgan.parallel  device mesh and sharding helpers
    xgan.io_       checkpoints, metrics JSON (reference-schema compatible), figures
    xgan.utils     misc (dirs, timers)
"""

__version__ = "0.1.0"
