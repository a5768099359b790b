"""GMD two-stage conditioned evaluation CLI (reference eval/eval_humanml_condition.py).

Protocol: per replication, for every test batch
  stage 1 — the TRAJECTORY model (4-dim rot/x/z/y features) is sampled with
            gradient guidance (CondKeyLocations) toward 5 GT pelvis-xz
            keyframes per sample;
  stage 2 — the MOTION model imputes the generated root channels
            (get_inpainting_motion_from_traj, reference condition.py:294);
then score matching / R-precision / FID / diversity / skating plus the
trajectory-error vector [traj_fail_20cm, traj_fail_50cm, kps_fail_20cm,
kps_fail_50cm, kps_mean_err] (reference eval_humanml_condition.py:36-87).

Usage:
  python -m condmdi_tpu.evals.run_condition --model_path save/motion/ckpt_... \
      --traj_model_path save/traj/ckpt_... --eval_mode debug|wo_mm
Empty model paths run random-init models (protocol smoke; the report meta
records it).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from condmdi_tpu.evals.common import (
    EVAL_MODES,
    load_eval_datasets,
    load_evaluator,
    load_word_vectorizer,
    print_summary,
    write_report_meta,
)

N_TARGET_KEYFRAMES = 5


def _gt_keyframe_targets(gt_joints, lengths, rng):
    """Per-sample targets: 5 random GT pelvis positions (xz observed)."""
    B, T = gt_joints.shape[:2]
    target = np.zeros((B, T, 22, 3), np.float32)
    mask = np.zeros((B, T, 22, 3), bool)
    for i in range(B):
        L = max(int(lengths[i]), N_TARGET_KEYFRAMES)
        idx = rng.choice(L, N_TARGET_KEYFRAMES, replace=False)
        target[i, idx, 0] = gt_joints[i, idx, 0]
        mask[i, idx, 0, 0] = True
        mask[i, idx, 0, 2] = True
    return target, mask


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from condmdi_tpu.data.convert import abs3d_to_rel, rel_to_abs3d, sample_to_motion
    from condmdi_tpu.diffusion.sampling import SamplerConfig
    from condmdi_tpu.evals import metrics as M
    from condmdi_tpu.evals.harness import EvalConfig, GeneratedBatch, compute_kps_error, evaluation
    from condmdi_tpu.models.text import encoder_name, make_text_encoder
    from condmdi_tpu.sampling.gmd import two_stage_generate
    from condmdi_tpu.sampling.pipeline import SamplePipeline
    from condmdi_tpu.sampling.synthesize import load_model_for_sampling
    from condmdi_tpu.utils.config import EvalArgs, parse_args, replace_args
    from condmdi_tpu.utils.seed import seed_all

    args = parse_args(EvalArgs, argv)
    # reference parity: every eval entry pins the global RNGs (fixseed,
    # eval_humanml_condmdi.py:461) — the data layer's crop/text choice uses
    # the global numpy/python RNGs, so unseeded runs are not reproducible.
    seed_all(args.seed)

    args.keyframe_conditioned = False  # GMD models are not keyframe-concat models
    args.abs_3d = True  # GMD guidance operates on abs-root features
    mode = EVAL_MODES.get(args.eval_mode, EVAL_MODES["wo_mm"])

    T = args.num_frames
    B = 32

    motion_model, motion_params, sched, dcfg = load_model_for_sampling(args)

    traj_args = replace_args(
        args, traj_only=True, model_path=args.traj_model_path, arch="unet"
    )
    traj_model, traj_params, traj_sched, traj_dcfg = load_model_for_sampling(traj_args)

    def motion_apply(x, t, y, **kw):
        return motion_model.apply(motion_params, x, t, y, **kw)

    def traj_apply(x, t, y, **kw):
        return traj_model.apply(traj_params, x, t, y, **kw)

    sampler = SamplerConfig(method="ddpm")  # guidance needs the DDPM loop
    motion_pipe = SamplePipeline(motion_apply, sched, dcfg, sampler)
    traj_pipe = SamplePipeline(traj_apply, traj_sched, traj_dcfg, sampler)

    enc = make_text_encoder(args)
    ds_rel, ds_abs, gt_batches, synthetic_data = load_eval_datasets(args, T, B, enc)

    cfg = EvalConfig(
        replication_times=mode["replication_times"],
        run_mm=False,  # reference protocol computes trajectory diversity instead
        max_frames=T,
        batch_size=B,
        keyframe_conditioned=False,
    )

    vec = load_word_vectorizer()
    evaluator, evaluator_source = load_evaluator()
    abs_stats, rel_stats = ds_abs.stats, ds_rel.stats

    def generate_batch(batch, key, np_rng):
        motion_rel = jnp.asarray(batch["motion"])
        motion_abs = rel_to_abs3d(motion_rel, rel_stats, abs_stats)
        gt_joints = np.asarray(sample_to_motion(motion_abs, abs_stats))
        target, target_mask = _gt_keyframe_targets(
            gt_joints, batch["lengths"], np_rng
        )
        y = {"text_embed": jnp.asarray(batch["text_embed"])}
        _, sample = two_stage_generate(
            traj_pipe, motion_pipe, None, key, B, T,
            traj_stats=abs_stats, motion_stats=abs_stats,
            y_traj=y, y_motion=y,
            classifier_scale=args.classifier_scale,
            impute_until=1 if args.impute_until is None else args.impute_until,
            target=jnp.asarray(target), target_mask=jnp.asarray(target_mask),
        )
        cur_joints = np.asarray(sample_to_motion(sample, abs_stats))
        kf_frames = target_mask.any(axis=(2, 3))
        dist_error, num_kf = compute_kps_error(cur_joints, gt_joints, kf_frames, traj_only=True)
        keyframe_error, _ = compute_kps_error(cur_joints, gt_joints, kf_frames, traj_only=False)
        skate_ratio, _ = M.calculate_skating_ratio(cur_joints)
        return GeneratedBatch(
            motions_rel=np.asarray(abs3d_to_rel(sample, abs_stats, rel_stats)),
            lengths=np.asarray(batch["lengths"]),
            captions=batch.get("text", [""] * B),
            tokens=batch.get("tokens", [[] for _ in range(B)]),
            dist_error=dist_error,
            keyframe_error=keyframe_error,
            num_keyframes=num_kf,
            skate_ratio=skate_ratio,
        )

    def generate_fn(rep):
        np_rng = np.random.default_rng(args.seed + rep)
        return [
            generate_batch(b, jax.random.key(args.seed + rep * 1000 + i), np_rng)
            for i, b in enumerate(gt_batches)
        ]

    out_dir = Path(
        getattr(args, "output_dir", "")
        or (Path(args.model_path).parent if args.model_path else "save/eval_out")
    )
    out_dir.mkdir(parents=True, exist_ok=True)
    log_file = out_dir / f"eval_condition_{args.eval_mode}.json"
    summary = evaluation(evaluator, gt_batches, generate_fn, cfg, vec, str(log_file))
    print_summary(summary)

    write_report_meta(log_file, {
        "protocol": "eval_humanml_condition (GMD two-stage)",
        "synthetic_data": synthetic_data,
        "evaluator": evaluator_source,
        "text_encoder": encoder_name(enc),
        "eval_mode": args.eval_mode,
        "classifier_scale": args.classifier_scale,
        "replications": mode["replication_times"],
        "model_path": args.model_path,
        "traj_model_path": args.traj_model_path,
        "random_init_models": not (args.model_path and args.traj_model_path),
    })
    return summary


if __name__ == "__main__":
    main()
