"""condmdi_tpu — TPU-native motion in-betweening diffusion framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
setarehc/diffusion-motion-inbetweening (CondMDI): denoising-diffusion human
motion generation with flexible keyframe in-betweening, re-architected for
TPU hardware (static shapes, `lax.scan` samplers, pjit data parallelism,
Pallas attention kernels) instead of the reference's eager PyTorch loops.

Layout (mirrors SURVEY.md layer map, bottom-up):
  geometry/   L0 quaternion / rot6d / skeleton-FK primitives
  data/       L2-L3 HumanML3D 263-dim codec, feature layout, datasets
  diffusion/  L4 schedules, Gaussian diffusion math, scan samplers
  models/     L5 MDM transformer, temporal UNet (AdaGN), DiT denoisers
  ops/        Pallas TPU kernels (fused attention, ...)
  parallel/   mesh construction + sharding rules
  training/   L8 train loop, keyframe mask generator, EMA
  sampling/   L9 synthesize / conditional_synthesis / edit entry points
  evals/      L10 metrics + evaluation harness
  utils/      config cards, checkpointing, logging
"""

__version__ = "0.1.0"
