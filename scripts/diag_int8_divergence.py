"""Diagnose the int8_static wo_mm NaN (round-4 battery leg 4 crash).

Reproduces the eval protocol's int8_static sampling at small batch with the
DDPM trajectory returned, and reports max|pred_xstart| every N steps for
  * bf16/f32 (control),
  * int8 dynamic,
  * int8_static (calibrated exactly like evals.run),
at the protocol guidance (2.5) and at 1.0 — to localize whether static
activation-scale clipping under CFG extrapolation drives x_t to inf.

Usage: JAX_PLATFORMS=cpu python scripts/diag_int8_divergence.py \
           [--ckpt save/synthetic_unet_m/ckpt_000100000] [--batch 2]
"""
from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from condmdi_tpu.diffusion.sampling import SamplerConfig
    from condmdi_tpu.evals.common import load_eval_datasets
    from condmdi_tpu.models.text import make_text_encoder
    from condmdi_tpu.sampling.pipeline import SamplePipeline
    from condmdi_tpu.sampling.synthesize import load_model_for_sampling
    from condmdi_tpu.training.keyframes import get_keyframes_mask
    from condmdi_tpu.utils.config import EvalArgs, parse_args

    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="save/synthetic_unet_m/ckpt_000100000")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--modes", default="float,int8,int8_static")
    ap.add_argument("--guidances", default="2.5,1.0")
    cli = ap.parse_args()

    base_argv = [
        "--model_path", cli.ckpt, "--edit_mode", "benchmark_sparse",
        "--num_samples", "32", "--use_ema", "true",
    ]

    for pmode in cli.modes.split(","):
        args = parse_args(EvalArgs, base_argv + (
            ["--precision_mode", pmode] if pmode != "float" else []
        ))
        args.keyframe_conditioned = True
        T = args.num_frames
        B = 32
        model, params, sched, dcfg = load_model_for_sampling(args)
        enc = make_text_encoder(args)
        ds_rel, ds_abs, gt_batches, _ = load_eval_datasets(args, T, B, enc)
        b0 = gt_batches[0]

        if pmode in ("int8_static", "int8_prequant"):
            from condmdi_tpu.ops.quant import calibrate_act_scales

            x0_cal = jnp.asarray(b0["motion"])
            params = calibrate_act_scales(
                model, params, sched, x0_cal,
                {"text_embed": jnp.asarray(b0["text_embed"])},
                obs_x0=x0_cal, obs_mask=jnp.ones(x0_cal.shape, bool),
            )
            amaxes = {
                "/".join(p): float(v)
                for p, v in _flatten(params.get("act_scale", {}))
            }
            lo = sorted(amaxes.items(), key=lambda kv: kv[1])[:5]
            hi = sorted(amaxes.items(), key=lambda kv: -kv[1])[:5]
            print(f"[{pmode}] calibrated act amax: min5={lo} max5={hi}")

        def apply_fn(x, t, y, **kw):
            return model.apply(params, x, t, y, **kw)

        pipe = SamplePipeline(
            apply_fn, sched, dcfg,
            SamplerConfig(method="ddpm", return_trajectory=True),
        )

        Bs = cli.batch
        from condmdi_tpu.evals.harness import rel_to_abs3d

        motion_rel = jnp.asarray(b0["motion"][:Bs])
        motion_abs = rel_to_abs3d(motion_rel, ds_rel.stats, ds_abs.stats)
        lengths = jnp.asarray(b0["lengths"][:Bs])
        mask_rng, sample_rng = jax.random.split(jax.random.key(10))
        obs_mask = get_keyframes_mask(
            mask_rng, lengths, T, edit_mode="benchmark_sparse",
            trans_length=args.transition_length,
        )
        obs_mask = obs_mask & jnp.asarray(b0["time_mask"][:Bs])[..., None]
        y = {"text_embed": jnp.asarray(b0["text_embed"][:Bs])}

        for g in [float(s) for s in cli.guidances.split(",")]:
            sample, traj = pipe.sample(
                sample_rng, (Bs, T, motion_rel.shape[-1]), y,
                guidance_param=g, obs_x0=motion_abs, obs_mask=obs_mask,
            )
            traj = np.asarray(traj)  # [S, B, T, F] pred_xstart per step
            S = traj.shape[0]
            marks = [0, S // 8, S // 4, S // 2, 3 * S // 4, S - 1]
            prof = {
                int(m): float(np.max(np.abs(traj[m]))) for m in marks
            }
            fin = bool(np.isfinite(np.asarray(sample)).all())
            print(
                f"[{pmode}] g={g} final_finite={fin} "
                f"max|x0hat| by step (0=t=T-1): {prof} "
                f"max|final|={float(np.max(np.abs(np.asarray(sample)))) if fin else float('inf'):.3f}"
            )


def _flatten(tree, prefix=()):
    out = []
    if isinstance(tree, dict):
        for k, v in tree.items():
            out += _flatten(v, prefix + (k,))
    else:
        out.append((prefix, np.asarray(tree).max()))
    return out


if __name__ == "__main__":
    main()
