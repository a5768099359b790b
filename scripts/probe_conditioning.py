"""Diagnose the sampling-time keyframe-conditioning failure on the retrain.

The 100k retrain logs keyframes_mse=0.0005 in TRAINING (the model copies
observed keyframes through the denoiser almost perfectly) yet the protocol
keyframe error at sampling is ~1.9 — worse than the 1.68 zero-prediction
baseline. This probes each link of the chain on CPU:

  A. single-step denoise with obs (training-style q_sample x_t):
     predicted-x0 MSE at observed frames, with EMA vs raw params,
     random_frames (train scheme) vs benchmark_sparse (eval scheme) masks.
  B. observation sensitivity: same forward with the obs mask zeroed;
     if the output barely moves, the conditioning input is dead at eval.
  C. full sampler (ddpm, g=1): keyframe-frame MSE of the final sample in
     normalized model space (isolates the harness's joint-space conversion).

Usage: JAX_PLATFORMS=cpu python scripts/probe_conditioning.py \
           --model_path save/synthetic_unet_m/ckpt_000100000
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", default="save/synthetic_unet_m/ckpt_000100000")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--t_probe", type=int, default=50)
    ap.add_argument("--skip_sampler", action="store_true")
    args_cli = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from condmdi_tpu.data.convert import rel_to_abs3d
    from condmdi_tpu.data.dataset import DatasetConfig, SyntheticMotionDataset, collate
    from condmdi_tpu.diffusion.sampling import SamplerConfig
    from condmdi_tpu.models.text import HashTextEncoder
    from condmdi_tpu.sampling.pipeline import SamplePipeline
    from condmdi_tpu.sampling.synthesize import load_model_for_sampling
    from condmdi_tpu.training.keyframes import get_keyframes_mask
    from condmdi_tpu.utils.config import EvalArgs, parse_args

    B = args_cli.batch

    def load(use_ema: bool):
        a = parse_args(EvalArgs, [
            "--model_path", args_cli.model_path,
            "--use_ema", "true" if use_ema else "false",
        ])
        return load_model_for_sampling(a), a

    (model, params_ema, sched, dcfg), a = load(True)
    (_, params_raw, _, _), _ = load(False)
    T = a.num_frames

    enc = HashTextEncoder()
    cfg_abs = DatasetConfig(max_motion_length=T, abs_3d=True, split="test")
    cfg_rel = DatasetConfig(max_motion_length=T, abs_3d=False, split="test")
    ds_abs = SyntheticMotionDataset(cfg_abs, size=B, seed=1)
    ds_rel = SyntheticMotionDataset(cfg_rel, size=B, seed=1)
    batch_abs = collate([ds_abs[i] for i in range(B)], T, enc)
    batch_rel = collate([ds_rel[i] for i in range(B)], T, enc)

    motion_abs = jnp.asarray(batch_abs["motion"])
    motion_via_rel = rel_to_abs3d(
        jnp.asarray(batch_rel["motion"]), ds_rel.stats, ds_abs.stats
    )
    conv_gap = float(jnp.abs(motion_abs - motion_via_rel).max())
    print(f"[space] max |ds_abs motion - rel_to_abs3d(ds_rel motion)| = {conv_gap:.4f}")

    time_mask = jnp.asarray(batch_abs["time_mask"])
    lengths = jnp.asarray(batch_abs["lengths"])
    y = {"text_embed": jnp.asarray(batch_abs["text_embed"])}

    masks = {}
    for name, mode in (("random_frames", "random_frames"),
                       ("benchmark_sparse", "benchmark_sparse")):
        m = get_keyframes_mask(
            jax.random.key(0), lengths, T, edit_mode=mode,
            trans_length=10, feature_mode="pos_rot_vel", n_keyframes=5,
        ) & time_mask[..., None]
        masks[name] = m
        print(f"[mask] {name}: frames/sample = "
              f"{np.asarray(m.any(-1).sum(1)).mean():.1f}, "
              f"features/frame = {np.asarray(m.sum(-1).max()):d}")

    t = jnp.full((B,), args_cli.t_probe, jnp.int32)
    rng = jax.random.key(7)
    noise = jax.random.normal(rng, motion_abs.shape, motion_abs.dtype)
    from condmdi_tpu.diffusion.gaussian import q_sample

    x_t = q_sample(sched, motion_abs, t, noise)

    def probe(params, tag):
        for mname, m in masks.items():
            x0_hat = model.apply(params, x_t, t, y, obs_x0=motion_abs, obs_mask=m)
            x0_hat0 = model.apply(
                params, x_t, t, y, obs_x0=jnp.zeros_like(motion_abs),
                obs_mask=jnp.zeros_like(m),
            )
            mf = m.any(-1)[..., None]  # keyframe frames, all features
            def mse_at(z):
                d = (z - motion_abs) ** 2
                return float((d * mf).sum() / (mf.sum() * d.shape[-1] / m.shape[-1] + 1e-9))
            kf_mse = float((((x0_hat - motion_abs) ** 2) * m).sum() / m.sum())
            kf_mse_frame = mse_at(x0_hat)
            sens = float(jnp.abs(x0_hat - x0_hat0).mean())
            print(f"[A/B {tag} {mname}] kf-feature mse={kf_mse:.5f} "
                  f"kf-frame mse={kf_mse_frame:.5f} |cond - uncond|={sens:.5f}")

    probe(params_ema, "ema")
    probe(params_raw, "raw")

    if args_cli.skip_sampler:
        return

    # C: full sampler, normalized-space keyframe error
    for tag, params in (("ema", params_ema), ("raw", params_raw)):
        def apply_fn(x, tt, yy, **kw):
            return model.apply(params, x, tt, yy, **kw)
        pipe = SamplePipeline(apply_fn, sched, dcfg, SamplerConfig(method="ddpm"))
        m = masks["benchmark_sparse"]
        sample = pipe.sample(
            jax.random.key(3), motion_abs.shape, y,
            guidance_param=1.0, obs_x0=motion_abs, obs_mask=m,
        )
        mf = m.any(-1)
        d = jnp.square(sample - motion_abs).mean(-1)
        kf = float((d * mf).sum() / mf.sum())
        rest = float((d * (~mf & time_mask)).sum() / (~mf & time_mask).sum())
        print(f"[C {tag}] sampler normalized kf-frame mse={kf:.4f} "
              f"non-kf-frame mse={rest:.4f}")


if __name__ == "__main__":
    main()
