"""Evaluation CLI (reference `python -m eval.eval_humanml_condmdi`).

Usage:
  python -m condmdi_tpu.evals.run --model_path save/x/ckpt_... \
      --edit_mode benchmark_sparse --transition_length 10 \
      --eval_mode wo_mm|debug|mm_short

eval modes (reference eval_humanml_condmdi.py:490-516):
  debug     5 replications
  wo_mm     20 replications, no multimodality (paper protocol)
  mm_short  5 replications + multimodality (30 repeats, 10 times)
"""

from __future__ import annotations

from pathlib import Path

from condmdi_tpu.evals.common import (
    EVAL_MODES,
    load_eval_datasets,
    load_evaluator,
    load_word_vectorizer,
    print_summary,
    write_report_meta,
)


def main(argv=None):
    import jax

    from condmdi_tpu.diffusion.sampling import SamplerConfig
    from condmdi_tpu.evals.harness import EvalConfig, evaluation, generate_eval_batch
    from condmdi_tpu.models.text import encoder_name, make_text_encoder
    from condmdi_tpu.sampling.pipeline import SamplePipeline
    from condmdi_tpu.sampling.synthesize import load_model_for_sampling
    from condmdi_tpu.utils.config import EvalArgs, parse_args
    from condmdi_tpu.utils.seed import seed_all

    args = parse_args(EvalArgs, argv)
    # reference parity: every eval entry pins the global RNGs (fixseed,
    # eval_humanml_condmdi.py:461) — the data layer's crop/text choice uses
    # the global numpy/python RNGs, so unseeded runs are not reproducible.
    seed_all(args.seed)

    k_float = int(getattr(args, "int8_float_last_k", 0))
    if k_float > 0 and getattr(args, "precision_mode", "float") not in (
        "int8", "int8_static", "int8_static_pc"
    ):
        raise SystemExit(
            "evals.run: --int8_float_last_k requires --precision_mode "
            "int8, int8_static or int8_static_pc (int8_prequant stores "
            "quantized kernels "
            "the float twin cannot apply; float has no int8 leg to mix)."
        )

    args.keyframe_conditioned = True
    mode = EVAL_MODES.get(args.eval_mode, EVAL_MODES["wo_mm"])
    if getattr(args, "max_replications", 0):
        mode = {**mode, "replication_times": min(
            mode["replication_times"], args.max_replications
        )}

    T = args.num_frames
    B = 32  # fixed eval batch (reference :455)

    model, params, sched, dcfg = load_model_for_sampling(args)

    # fingerprint the AS-LOADED weights (before int8 quantization mutates
    # the tree): identifies which checkpoint contents produced this report,
    # so the repro gate can distinguish "harness regressed" from "the
    # out-of-git checkpoint at model_path was retrained/replaced"
    from condmdi_tpu.utils.checkpoint import params_fingerprint

    fingerprint = params_fingerprint(params) if args.model_path else ""

    # Guard (round-3 post-mortem): a model built without keyframe
    # conditioning accepts-and-ignores obs_x0/obs_mask (models/unet.py
    # keyframe_conditioned branch), so the keyframe protocol would silently
    # measure an unconditioned sampler — exactly what invalidated the
    # round-3 quality artifacts (its gate checkpoint was trained with
    # keyframe_conditioned=false). Refuse unless explicitly overridden for
    # an ablation baseline.
    model_kc = bool(getattr(model, "keyframe_conditioned", False))
    if not model_kc and args.edit_mode != "uncond":
        if not getattr(args, "allow_unconditioned", False):
            raise SystemExit(
                "evals.run: --model_path points at a model trained WITHOUT "
                "keyframe conditioning (args.json keyframe_conditioned=false); "
                "it ignores obs_x0/obs_mask, so keyframe-protocol metrics "
                "would be meaningless. Train with --keyframe_conditioned true, "
                "or pass --allow_unconditioned true to record an explicit "
                "unconditioned baseline (meta will mark it)."
            )
        print(
            "WARNING: evaluating an UNCONDITIONED model under the keyframe "
            "protocol (--allow_unconditioned) — keyframe metrics are a "
            "no-conditioning baseline, not model performance."
        )

    enc = make_text_encoder(args)
    ds_rel, ds_abs, gt_batches, synthetic_data = load_eval_datasets(args, T, B, enc)

    # int8 protocol runs (VERDICT r3 #3b: gate int8 promotion on FULL
    # wo_mm metric deltas, not keyframe error alone). 'int8_static' needs
    # calibrated activation scales. Round 4 switched from q_sample probing
    # to TRAJECTORY calibration: at guidance > 1 the CFG extrapolation
    # pushes the reverse-process x_t outside the forward marginals, the
    # q_sample-calibrated ranges clip, and the 1000-step scan diverged to
    # inf (battery leg 4 NaN crash). The calibration now runs one full
    # dynamic-int8 sampling pass at the protocol guidance with the
    # serving-shaped conditioning (abs-space obs, sparse edit-mode mask)
    # and freezes the ranges that trajectory actually visits.
    pmode = getattr(args, "precision_mode", "float")
    if pmode in ("int8_static", "int8_static_pc", "int8_prequant"):
        import jax.numpy as jnp

        from condmdi_tpu.data.convert import rel_to_abs3d
        from condmdi_tpu.ops.quant import (
            calibrate_act_scales_trajectory,
            quantize_params_tree,
        )
        from condmdi_tpu.training.keyframes import get_keyframes_mask

        b0 = gt_batches[0]
        motion_rel = jnp.asarray(b0["motion"])
        motion_abs = rel_to_abs3d(motion_rel, ds_rel.stats, ds_abs.stats)
        cal_mask = get_keyframes_mask(
            jax.random.key(args.seed), jnp.asarray(b0["lengths"]), T,
            edit_mode=args.edit_mode, trans_length=args.transition_length,
            feature_mode=args.editable_features, n_keyframes=args.n_keyframes,
        ) & jnp.asarray(b0["time_mask"])[..., None]
        params = calibrate_act_scales_trajectory(
            model, params, sched, dcfg, motion_rel.shape,
            {"text_embed": jnp.asarray(b0["text_embed"])},
            guidance_param=args.guidance_param,
            obs_x0=motion_abs, obs_mask=cal_mask, seed=args.seed,
        )
        if pmode == "int8_prequant":
            params = {**params, "params": quantize_params_tree(params["params"])}
        print(f"eval sampling: precision_mode={pmode} "
              "(act scales trajectory-calibrated)")

    if k_float > 0:
        # mixed-step serving: the same params tree drives an int8 model and
        # a float twin; lax.cond picks per sampler step (both branches are
        # compiled once, only one executes per step). t here is the MODEL
        # timestep (original 1000-step scale even under respacing), so K
        # always means "the last K of the full reverse process".
        model_float = model.clone(precision_mode="float")

        def apply_fn(x, t, y, **kw):
            return jax.lax.cond(
                t[0] < k_float,
                lambda: model_float.apply(params, x, t, y, **kw),
                lambda: model.apply(params, x, t, y, **kw),
            )
    else:
        def apply_fn(x, t, y, **kw):
            return model.apply(params, x, t, y, **kw)

    pipe = SamplePipeline(
        apply_fn, sched, dcfg,
        SamplerConfig(method="ddim" if args.use_ddim else "ddpm"),
    )

    cfg = EvalConfig(
        edit_mode=args.edit_mode,
        transition_length=args.transition_length,
        editable_features=args.editable_features,
        n_keyframes=args.n_keyframes,
        guidance_param=args.guidance_param,
        drop_observations=getattr(args, "drop_observations", False),
        replication_times=mode["replication_times"],
        run_mm=mode["run_mm"],
        mm_num_times=mode["mm_num_times"],
        max_frames=T,
        batch_size=B,
    )

    vec = load_word_vectorizer()
    evaluator, evaluator_source = load_evaluator()

    # multi-chip: shard the generation batch over all devices (dp mesh,
    # params replicated) — value-identical to single-device on the same keys
    # (parallel/dp_sample.py); single device keeps the plain path
    mesh = None
    ndev = len(jax.devices())
    if ndev > 1 and B % ndev == 0:
        from condmdi_tpu.parallel import make_mesh

        mesh = make_mesh()
        print(f"eval generation: data-parallel over {ndev} devices")

    def generate_fn(rep):
        return [
            generate_eval_batch(
                pipe, b, jax.random.key(args.seed + rep * 1000 + i), cfg,
                ds_abs.stats, ds_rel.stats, mesh=mesh,
            )
            for i, b in enumerate(gt_batches)
        ]

    def generate_mm_fn(rep):
        # mm_num_repeats independent samplings of the first batch subset
        # (reference mm_num_samples=100 ≈ 3 batches; scaled to what we have)
        return [
            [
                generate_eval_batch(
                    pipe, b, jax.random.key(9_000_000 + rep * 10_000 + r * 100 + i),
                    cfg, ds_abs.stats, ds_rel.stats, mesh=mesh,
                )
                for i, b in enumerate(gt_batches[:3])
            ]
            for r in range(mode["mm_num_repeats"])
        ]

    out_dir = Path(
        getattr(args, "output_dir", "")
        or (Path(args.model_path).parent if args.model_path else "save/eval_out")
    )
    out_dir.mkdir(parents=True, exist_ok=True)
    suffix = "" if pmode == "float" else f"_{pmode}"
    if k_float > 0:
        suffix += f"_f{k_float}"
    if getattr(args, "drop_observations", False):
        suffix += "_dropobs"
    log_file = out_dir / f"eval_{args.edit_mode}_{args.eval_mode}{suffix}.json"
    summary = evaluation(
        evaluator, gt_batches, generate_fn, cfg, vec, str(log_file),
        generate_mm_fn=generate_mm_fn if mode["run_mm"] else None,
    )
    print_summary(summary)
    # programmatic callers (scripts/fid_vs_steps.py rows) need the identity
    # of the weights too, not just the report file's meta block. AFTER
    # print_summary: that printer iterates metric dicts (round-5 battery
    # take-3 int8 leg crashed on the string before its meta was written)
    summary["params_fingerprint"] = fingerprint

    write_report_meta(log_file, {
        "protocol": "condmdi",
        "synthetic_data": synthetic_data,
        "evaluator": evaluator_source,
        "text_encoder": encoder_name(enc),
        "eval_mode": args.eval_mode,
        "edit_mode": args.edit_mode,
        "replications": mode["replication_times"],
        "model_path": args.model_path,
        "params_fingerprint": fingerprint,
        "model_keyframe_conditioned": model_kc,
        "drop_observations": getattr(args, "drop_observations", False),
        "precision_mode": pmode,
        "int8_float_last_k": k_float,
        # enough to re-derive any single replication (tests/test_report_repro)
        "guidance_param": args.guidance_param,
        "num_samples": len(gt_batches) * B,
        "seed": args.seed,
        # marks reports generated after seed_all() pinned the data layer's
        # global-RNG draws — only these re-derive bit-close same-platform
        "rng": "global_seeded",
        "use_ema": getattr(args, "use_ema", True),
        "devices": ndev,
        # bit-exact re-derivation is only expected on the same backend; a
        # cross-platform rerun (tpu-committed report re-checked on cpu CI)
        # inherits bf16-vs-f32 drift through the 1000-step scan
        "platform": jax.devices()[0].platform,
    })
    return summary


if __name__ == "__main__":
    main()
