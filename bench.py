"""Benchmark: 196-frame samples/sec/chip, 1000-step DDPM.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Default model (the headline): CondMDI's keyframe-conditioned UNet-XL — the
paper's flagship conditional model on its own benchmark task — in the int8
serving path (same checkpoint; QConv quantizes in-graph). Measured ≈7.2
samples/s/chip ≈ 26× baseline. The int8 path is quality-gated against bf16:
  (1) whole-sampler DDIM trajectory closeness int8-vs-bf16
      (tests/test_quant.py::TestInt8WholeSampler), and
  (2) keyframe-error delta vs bf16 on a synthetic-trained conditional
      checkpoint (tests/test_int8_gate.py; numbers in BENCH_NOTES.md).
`BENCH_MODEL` overrides: `unet` = the same model in bf16 (≈4.8 ≈ 17×),
`mdm` = the MDM transformer encoder north-star config (Pallas fused
attention, ≈7.5 ≈ 27×), `mdm_int8`. `BENCH_BATCH` overrides batch (64).

Baseline derivation: the reference's paper eval (eval_humanml_condmdi wo_mm:
1000 samples × 20 replications of 196-frame 1000-step DDPM sampling) takes
~20 h on one A100-class GPU (README.md:238) → ≈ 0.278 samples/sec/GPU
including evaluator overhead; sampling dominates (this folds evaluator
overhead into the denominator, so treat vs_baseline as an upper-bound-style
anchor — sampling itself dominates that 20 h).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

BASELINE_SAMPLES_PER_SEC = 20000.0 / (20 * 3600.0)  # ≈ 0.278


def main() -> None:
    import jax

    # persistent compilation cache: the 1000-step scan costs ~20 min to
    # compile cold on the remote TPU compiler; cache hits make reruns fast
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from condmdi_tpu.diffusion import (
        DiffusionConfig,
        DiffusionSchedule,
        get_named_beta_schedule,
    )
    from condmdi_tpu.diffusion.sampling import SamplerConfig, ddpm_sample_loop

    B = int(os.environ.get("BENCH_BATCH", "64"))
    which = os.environ.get("BENCH_MODEL", "unet_int8")
    T, F = 196, 263
    STEPS = 1000

    rng = np.random.default_rng(0)
    x = jnp.zeros((B, T, F))
    t0 = jnp.zeros((B,), jnp.int32)
    y = {"text_embed": jnp.asarray(rng.standard_normal((B, 512)).astype(np.float32))}

    if which.startswith("mdm"):
        from condmdi_tpu.models.mdm import MDM

        model = MDM(
            njoints=F, latent_dim=512, ff_size=1024, num_layers=8, num_heads=4,
            precision_mode="int8" if which == "mdm_int8" else "float",
        )
        params = model.init(jax.random.key(0), x, t0, y)
        obs_x0 = obs_mask = None
        label = "MDM transformer encoder (Pallas fused attention)" + (
            " int8" if which == "mdm_int8" else ""
        )
    else:
        from condmdi_tpu.models.unet import MDM_UNET

        model = MDM_UNET(
            njoints=F, latent_dim=512, dim_mults=(2, 2, 2, 2),
            keyframe_conditioned=True, pad_frames_to=224,
            precision_mode="int8" if which == "unet_int8" else "float",
        )
        obs_x0 = jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32) * 0.1)
        obs_mask = jnp.zeros((B, T, F), bool).at[:, ::10, :].set(True)
        params = model.init(jax.random.key(0), x, t0, y, obs_x0=obs_x0, obs_mask=obs_mask)
        label = "CondMDI UNet-XL keyframe-conditioned" + (
            " int8 serving path (bf16-parity gated)" if which == "unet_int8" else " bf16"
        )

    # bf16 params + activations: TPU-native precision for inference
    params = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p, params
    )

    sched = DiffusionSchedule.create(get_named_beta_schedule("cosine", STEPS))
    dcfg = DiffusionConfig()

    @jax.jit
    def run(params, y, obs_x0, obs_mask, key):
        def denoise(x_t, t):
            kw = {}
            if obs_x0 is not None:
                kw = dict(obs_x0=obs_x0.astype(jnp.bfloat16), obs_mask=obs_mask)
            out = model.apply(params, x_t.astype(jnp.bfloat16), t, y, **kw)
            return out.astype(jnp.float32)

        return ddpm_sample_loop(
            denoise, sched, dcfg, (B, T, F), key, sampler=SamplerConfig()
        )

    # warmup/compile
    out = run(params, y, obs_x0, obs_mask, jax.random.key(0))
    jax.block_until_ready(out)

    n_runs = 2
    start = time.perf_counter()
    for i in range(n_runs):
        out = run(params, y, obs_x0, obs_mask, jax.random.key(i + 1))
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - start

    samples_per_sec = (B * n_runs) / elapsed
    print(
        json.dumps(
            {
                "metric": f"196-frame samples/sec/chip (1000-step DDPM, {label})",
                "value": round(samples_per_sec, 4),
                "unit": "samples/sec/chip",
                "vs_baseline": round(samples_per_sec / BASELINE_SAMPLES_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
