"""Mixed-step int8 experiment: which sampler steps must stay float?

The round-4 protocol gate showed pure int8_static sampling damages
conditioning quality (keyframe error +31% at g1.0 over 1000 DDPM steps).
Hypothesis (diffusion-quantization folklore): quantization noise in a FEW
of the steps dominates the end-metric damage — keep those steps in the
float path and the rest int8, retaining most of the 1.7× serving speedup.

Runs the protocol's generate_eval_batch on one batch with:
  float            — control,
  int8             — every step quantized (current int8_static),
  int8_last{K}f    — float when t < K (the END of the reverse process),
  int8_first{K}f   — float when t >= T-K (the START, x_t ~ N(0,1)),
for each K in --k_list, and reports keyframe / trajectory error vs GT.

Usage (TPU, ~minutes): python scripts/mixed_int8_exp.py \
    [--ckpt save/synthetic_unet_m/ckpt_000100000] [--batch 32] \
    [--k_list 10,50,100,250]
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import os

    # each (kind, K) pair is a distinct XLA program — persistent cache so
    # the float/int8 legs reuse the protocol runs' compiles and reruns of
    # this script are cheap
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

    import jax
    import jax.numpy as jnp

    from condmdi_tpu.diffusion.sampling import SamplerConfig
    from condmdi_tpu.evals.common import load_eval_datasets
    from condmdi_tpu.evals.harness import EvalConfig, generate_eval_batch
    from condmdi_tpu.models.text import make_text_encoder
    from condmdi_tpu.ops.quant import calibrate_act_scales_trajectory
    from condmdi_tpu.sampling.pipeline import SamplePipeline
    from condmdi_tpu.sampling.synthesize import load_model_for_sampling
    from condmdi_tpu.training.keyframes import get_keyframes_mask
    from condmdi_tpu.utils.config import EvalArgs, parse_args
    from condmdi_tpu.utils.seed import seed_all

    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="save/synthetic_unet_m/ckpt_000100000")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--k_list", default="50,250")
    ap.add_argument("--guidance", type=float, default=1.0)
    ap.add_argument("--out", default="", help="write rows as JSON here")
    ap.add_argument("--skip_pc", default="false",
                    help="skip the int8_static_pc row (one fewer ~20-min "
                         "remote compile when the round's chip-time is short)")
    ap.add_argument("--skip_first", default="false",
                    help="skip the int8_firstKf rows (the K=50 screening "
                         "showed a float HEAD is useless: 1.035 vs pure "
                         "int8's 1.028 keyframe error — only the float "
                         "TAIL matters)")
    cli = ap.parse_args()
    k_list = [int(s) for s in cli.k_list.split(",") if s]

    base_argv = [
        "--model_path", cli.ckpt, "--edit_mode", "benchmark_sparse",
        "--num_samples", "32", "--use_ema", "true",
        "--precision_mode", "int8_static",
    ]
    args = parse_args(EvalArgs, base_argv)
    args.keyframe_conditioned = True
    seed_all(args.seed)
    T = args.num_frames
    B = 32

    model8, params, sched, dcfg = load_model_for_sampling(args)
    # float twin sharing the same params tree (clone, NOT create_model from
    # CLI defaults — the checkpoint's args.json decides the architecture)
    modelf = model8.clone(precision_mode="float")

    enc = make_text_encoder(args)
    ds_rel, ds_abs, gt_batches, _ = load_eval_datasets(args, T, B, enc)
    b0 = gt_batches[0]

    # calibrate exactly like evals.run (trajectory calibration)
    from condmdi_tpu.data.convert import rel_to_abs3d

    motion_rel = jnp.asarray(b0["motion"])
    motion_abs = rel_to_abs3d(motion_rel, ds_rel.stats, ds_abs.stats)
    cal_mask = get_keyframes_mask(
        jax.random.key(args.seed), jnp.asarray(b0["lengths"]), T,
        edit_mode="benchmark_sparse", trans_length=args.transition_length,
    ) & jnp.asarray(b0["time_mask"])[..., None]
    cal_kw = dict(
        guidance_param=cli.guidance, obs_x0=motion_abs, obs_mask=cal_mask,
        seed=args.seed,
    )
    params = calibrate_act_scales_trajectory(
        model8, params, sched, dcfg, motion_rel.shape,
        {"text_embed": jnp.asarray(b0["text_embed"])}, **cal_kw,
    )
    # per-channel static-scale twin (fold-into-weights dequant) — its
    # act_scale collection is per-Cin vectors, so it calibrates separately
    # (the calibration itself runs a full trajectory: skip with --skip_pc)
    model_pc = params_pc = None
    if cli.skip_pc != "true":
        model_pc = model8.clone(precision_mode="int8_static_pc")
        params_pc = calibrate_act_scales_trajectory(
            model_pc, {"params": params["params"]}, sched, dcfg,
            motion_rel.shape,
            {"text_embed": jnp.asarray(b0["text_embed"])}, **cal_kw,
        )

    Bs = cli.batch
    batch = {k: (v[:Bs] if hasattr(v, "__getitem__") and not isinstance(v, dict)
                 and len(v) == B else v) for k, v in b0.items()}

    cfg = EvalConfig(
        edit_mode="benchmark_sparse",
        transition_length=args.transition_length,
        guidance_param=cli.guidance,
        keyframe_conditioned=True,
        replication_times=1,
    )

    def make_apply(kind, K=0):
        if kind == "float":
            return lambda x, t, y, **kw: modelf.apply(params, x, t, y, **kw)
        if kind == "int8":
            return lambda x, t, y, **kw: model8.apply(params, x, t, y, **kw)
        if kind == "int8_pc":
            return lambda x, t, y, **kw: model_pc.apply(params_pc, x, t, y, **kw)
        if kind == "int8_lastKf":  # float branch when t < K
            def apply_fn(x, t, y, **kw):
                return jax.lax.cond(
                    t[0] < K,
                    lambda: modelf.apply(params, x, t, y, **kw),
                    lambda: model8.apply(params, x, t, y, **kw),
                )
            return apply_fn
        if kind == "int8_firstKf":  # float branch when t >= T-K
            def apply_fn(x, t, y, **kw):
                return jax.lax.cond(
                    t[0] >= sched.num_timesteps - K,
                    lambda: modelf.apply(params, x, t, y, **kw),
                    lambda: model8.apply(params, x, t, y, **kw),
                )
            return apply_fn
        raise ValueError(kind)

    def run_one(kind, K=0):
        pipe = SamplePipeline(
            make_apply(kind, K), sched, dcfg, SamplerConfig(method="ddpm")
        )
        out = generate_eval_batch(
            pipe, batch, jax.random.key(123), cfg, ds_abs.stats, ds_rel.stats,
        )
        from condmdi_tpu.evals import metrics as M

        kf = M.calculate_keyframe_error(out.keyframe_error, out.num_keyframes)
        tr = M.calculate_trajectory_error(out.dist_error, out.num_keyframes)
        fin = bool(np.isfinite(out.motions_rel).all())
        row = dict(kind=kind, K=K, keyframe_error=float(kf),
                   traj_error_mean=float(np.ravel(tr)[-1]), finite=fin)
        print(f"[{kind:>13}] K={K:>4} keyframe_err={row['keyframe_error']:.4f} "
              f"traj_mean_err={row['traj_error_mean']:.4f} finite={fin}",
              flush=True)
        return row

    import json

    rows = []

    def record(kind, K=0):
        rows.append(run_one(kind, K))
        if cli.out:
            # incremental write: a crash preserves completed rows
            Path(cli.out).write_text(json.dumps(dict(
                ckpt=cli.ckpt, batch=cli.batch, guidance=cli.guidance,
                num_samples=32, sampler="ddpm_1000", rows=rows,
            ), indent=1))

    record("float")
    record("int8")
    if cli.skip_pc != "true":
        record("int8_pc")
    for K in k_list:
        record("int8_lastKf", K)
        if cli.skip_first != "true":
            record("int8_firstKf", K)


if __name__ == "__main__":
    main()
