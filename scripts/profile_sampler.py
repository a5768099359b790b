"""Capture a JAX/XLA profiler trace of the sampling hot loop.

Usage:
  python scripts/profile_sampler.py [--steps 50] [--batch 32] [--out /tmp/trace]

Writes an xplane trace viewable in TensorBoard / Perfetto — the TPU-native
replacement for the reference's wall-time-only logger.profile scopes
(diffusion/logger.py:306-334).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


import argparse


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--frames", type=int, default=196)
    ap.add_argument("--latent_dim", type=int, default=512)
    ap.add_argument("--out", default="/tmp/condmdi_trace")
    ap.add_argument("--dtype", choices=("bf16", "f32"), default="bf16",
                    help="bf16 matches bench.py's serving precision")
    ap.add_argument("--precision_mode", choices=("float", "int8"), default="float",
                    help="int8 profiles the quantized serving path (QConv)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from condmdi_tpu.diffusion import (
        DiffusionConfig,
        DiffusionSchedule,
        get_named_beta_schedule,
    )
    from condmdi_tpu.diffusion.sampling import SamplerConfig, ddpm_sample_loop
    from condmdi_tpu.models.unet import MDM_UNET

    B, T, F = args.batch, args.frames, 263
    model = MDM_UNET(
        njoints=F, latent_dim=args.latent_dim, dim_mults=(2, 2, 2, 2),
        keyframe_conditioned=True, pad_frames_to=224,
        precision_mode=args.precision_mode,
    )
    rng = np.random.default_rng(0)
    x = jnp.zeros((B, T, F))
    y = {"text_embed": jnp.zeros((B, 512))}
    obs = jnp.zeros((B, T, F))
    om = jnp.zeros((B, T, F), bool)
    params = model.init(jax.random.key(0), x, jnp.zeros((B,), jnp.int32), y,
                        obs_x0=obs, obs_mask=om)
    if args.dtype == "bf16":  # mirror bench.py's serving precision
        params = jax.tree_util.tree_map(
            lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
            params,
        )
    sched = DiffusionSchedule.create(get_named_beta_schedule("cosine", args.steps))
    act_dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    @jax.jit
    def run(params, key):
        def denoise(x_t, t):
            out = model.apply(
                params, x_t.astype(act_dtype), t, y,
                obs_x0=obs.astype(act_dtype), obs_mask=om,
            )
            return out.astype(x_t.dtype)

        return ddpm_sample_loop(
            denoise, sched, DiffusionConfig(), (B, T, F), key,
            sampler=SamplerConfig(),
        )

    out = run(params, jax.random.key(0))
    jax.block_until_ready(out)

    with jax.profiler.trace(args.out):
        out = run(params, jax.random.key(1))
        jax.block_until_ready(out)
    print(f"trace written to {args.out}")


if __name__ == "__main__":
    main()
