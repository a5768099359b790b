"""condmdi_tpu — TPU-native motion in-betweening diffusion framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
setarehc/diffusion-motion-inbetweening (CondMDI): denoising-diffusion human
motion generation with flexible keyframe in-betweening, re-architected for
TPU hardware (static shapes, `lax.scan` samplers, pjit data parallelism,
Pallas attention kernels) instead of the reference's eager PyTorch loops.

Layout (mirrors SURVEY.md layer map, bottom-up):
  geometry/   L0 quaternion / rot6d / skeleton-FK primitives
  data/       L2-L3 HumanML3D 263-dim codec, feature layout, datasets
              (HumanML3D/KIT/AMASS/a2m/synthetic), converters, vectorizers
  diffusion/  L4 schedules + respacing, Gaussian diffusion math, DDPM/DDIM/
              PLMS scan samplers, timestep samplers
  models/     L5 MDM transformer, temporal UNet (AdaGN), DiT denoisers, CFG,
              SMPL LBS + Rotation2xyz, CLIP text tower
  ops/        Pallas TPU kernels (fused attention) + int8 quantized ops
  parallel/   mesh construction, DP/FSDP sharding, multi-host init
  training/   L8 jitted train step, keyframe mask generator, EMA, train CLI
  sampling/   L9 synthesize / conditional / edit CLIs + GMD guidance pack
  evals/      L10 metrics, T2M/ST-GCN evaluators, eval harness + CLI
  utils/      config cards, Orbax + torch checkpoint converters, KV logger
  viz/        stick-figure rendering, SMPLify fitting, mesh export
  serving.py  precompiled-bucket micro-batching inference server
"""

__version__ = "0.1.0"


def _honor_jax_platforms_env() -> None:
    """Make an explicit `JAX_PLATFORMS=cpu` actually select CPU.

    This image's axon TPU plugin pins `jax.config.jax_platforms="axon,cpu"`
    at interpreter start (sitecustomize → axon.register), and jax's config
    beats the env var — so `JAX_PLATFORMS=cpu python -m condmdi_tpu...`
    would silently run on the TPU (or hang if another process holds it).
    If the user asked for a non-axon platform set, enforce it in-process,
    which is the authoritative path (same recipe as tests/conftest.py).
    """
    import os

    env = os.environ.get("JAX_PLATFORMS", "")
    if env and "axon" not in env and "proxy" not in env:
        import jax

        try:
            if jax.config.jax_platforms != env:
                jax.config.update("jax_platforms", env)
        except Exception:
            pass


_honor_jax_platforms_env()
