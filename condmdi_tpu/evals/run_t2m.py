"""Legacy text-to-motion evaluation CLI (reference eval/eval_humanml.py).

The MDM-style protocol: sample the model from TEXT ONLY (classifier-free
guidance, no keyframe observation) and score matching / R-precision / FID /
diversity / skating (+ multimodality in mm_short) against the test split
over N replications (reference eval_humanml.py:166-292, mode table :345-372).

Usage:
  python -m condmdi_tpu.evals.run_t2m --model_path save/mdm/ckpt_... \
      --guidance_param 2.5 --eval_mode wo_mm|debug|mm_short
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

    args.keyframe_conditioned = False  # text-only protocol
    mode = EVAL_MODES.get(args.eval_mode, EVAL_MODES["wo_mm"])

    T = args.num_frames
    B = 32

    model, params, sched, dcfg = load_model_for_sampling(args)

    def apply_fn(x, t, y, **kw):
        return model.apply(params, x, t, y, **kw)

    pipe = SamplePipeline(
        apply_fn, sched, dcfg,
        SamplerConfig(method="ddim" if args.use_ddim else "ddpm"),
    )

    enc = make_text_encoder(args)
    ds_rel, ds_abs, gt_batches, synthetic_data = load_eval_datasets(args, T, B, enc)

    cfg = EvalConfig(
        guidance_param=args.guidance_param,
        replication_times=mode["replication_times"],
        run_mm=mode["run_mm"],
        mm_num_times=mode["mm_num_times"],
        max_frames=T,
        batch_size=B,
        keyframe_conditioned=False,
        report_keyframe_metrics=False,
    )

    vec = load_word_vectorizer()
    evaluator, evaluator_source = load_evaluator()

    def generate_fn(rep):
        return [
            generate_eval_batch(
                pipe, b, jax.random.key(args.seed + rep * 1000 + i), cfg,
                ds_abs.stats, ds_rel.stats, model_is_abs=args.abs_3d,
            )
            for i, b in enumerate(gt_batches)
        ]

    def generate_mm_fn(rep):
        return [
            [
                generate_eval_batch(
                    pipe, b, jax.random.key(9_000_000 + rep * 10_000 + r * 100 + i),
                    cfg, ds_abs.stats, ds_rel.stats, model_is_abs=args.abs_3d,
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
    log_file = out_dir / f"eval_humanml_{args.eval_mode}.json"
    summary = evaluation(
        evaluator, gt_batches, generate_fn, cfg, vec, str(log_file),
        generate_mm_fn=generate_mm_fn if mode["run_mm"] else None,
    )
    print_summary(summary)

    write_report_meta(log_file, {
        "protocol": "eval_humanml (legacy t2m)",
        "synthetic_data": synthetic_data,
        "evaluator": evaluator_source,
        "text_encoder": encoder_name(enc),
        "eval_mode": args.eval_mode,
        "guidance_param": args.guidance_param,
        "replications": mode["replication_times"],
        "model_path": args.model_path,
    })
    return summary


if __name__ == "__main__":
    main()
