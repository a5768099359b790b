"""Evaluation CLI (reference `python -m eval.eval_humanml_condmdi`).

Usage:
  python -m condmdi_tpu.evals.run --model_path save/x/ckpt_... \
      --edit_mode benchmark_sparse --transition_length 10 \
      --eval_mode wo_mm|debug

eval modes (reference eval_humanml_condmdi.py:490-516):
  debug     5 replications
  wo_mm     20 replications, no multimodality (paper protocol)
  mm_short  5 replications + multimodality
"""

from __future__ import annotations

from pathlib import Path



def main(argv=None):
    import jax

    from condmdi_tpu.data.dataset import DatasetConfig, SyntheticMotionDataset, collate
    from condmdi_tpu.data.word_vectorizer import HashWordVectorizer, WordVectorizer
    from condmdi_tpu.diffusion.sampling import SamplerConfig
    from condmdi_tpu.evals.evaluator import EvaluatorWrapper
    from condmdi_tpu.evals.harness import EvalConfig, evaluation, generate_eval_batch
    from condmdi_tpu.models.text import encoder_name, make_text_encoder
    from condmdi_tpu.sampling.pipeline import SamplePipeline
    from condmdi_tpu.sampling.synthesize import load_model_for_sampling
    from condmdi_tpu.utils.config import EvalArgs, parse_args

    args = parse_args(EvalArgs, argv)
    args.keyframe_conditioned = True
    reps = {"debug": 5, "wo_mm": 20, "mm_short": 5}.get(args.eval_mode, 20)

    T = args.num_frames
    B = 32  # fixed eval batch (reference :455)

    model, params, sched, dcfg = load_model_for_sampling(args)

    def apply_fn(x, t, y, **kw):
        return model.apply(params, x, t, y, **kw)

    pipe = SamplePipeline(
        apply_fn, sched, dcfg,
        SamplerConfig(method="ddim" if args.use_ddim else "ddpm"),
    )

    enc = make_text_encoder(args)
    synthetic_data = False
    data_cfg_rel = DatasetConfig(max_motion_length=T, abs_3d=False, split="test")
    data_cfg_abs = DatasetConfig(max_motion_length=T, abs_3d=True, split="test")
    try:
        from condmdi_tpu.data.dataset import Text2MotionDataset

        ds_rel = Text2MotionDataset(data_cfg_rel)
        ds_abs = Text2MotionDataset(data_cfg_abs)
    except FileNotFoundError:
        import warnings

        warnings.warn(
            "HumanML3D assets absent — evaluating on SYNTHETIC data. The "
            "report will carry synthetic_data=true; its numbers are NOT "
            "comparable to paper numbers.",
            stacklevel=2,
        )
        synthetic_data = True
        ds_rel = SyntheticMotionDataset(data_cfg_rel, size=B * 2, seed=1)
        ds_abs = SyntheticMotionDataset(data_cfg_abs, size=B * 2, seed=1)

    n_batches = max(1, min(len(ds_rel) // B, max(getattr(args, 'num_samples', 32), B) // B))
    gt_batches = []
    for bi in range(n_batches):
        batch = collate([ds_rel[bi * B + i] for i in range(B)], T, enc)
        if not any(batch["tokens"]):  # synthetic data carries no tokens
            batch["tokens"] = [["a/DET", "person/NOUN", "moves/VERB"]] * B
        gt_batches.append(batch)

    cfg = EvalConfig(
        edit_mode=args.edit_mode,
        transition_length=args.transition_length,
        editable_features=args.editable_features,
        n_keyframes=args.n_keyframes,
        guidance_param=args.guidance_param,
        replication_times=reps,
        max_frames=T,
        batch_size=B,
    )

    try:
        vec = WordVectorizer("glove")
    except Exception:
        vec = HashWordVectorizer()
    eval_ckpt = Path("t2m/text_mot_match/model/finest.tar")
    if eval_ckpt.exists():
        evaluator = EvaluatorWrapper.from_torch_checkpoint(str(eval_ckpt))
        evaluator_source = "checkpoint"
    else:
        import warnings

        warnings.warn(
            "T2M evaluator checkpoint absent — using a RANDOM-INIT evaluator. "
            "FID/R-precision from this run are meaningless as absolute "
            "numbers; the report will carry evaluator=random_init.",
            stacklevel=2,
        )
        evaluator = EvaluatorWrapper.random_init(0)
        evaluator_source = "random_init"


    def generate_fn(rep):
        return [
            generate_eval_batch(
                pipe, b, jax.random.key(args.seed + rep * 1000 + i), cfg,
                ds_abs.stats, ds_rel.stats,
            )
            for i, b in enumerate(gt_batches)
        ]

    out_dir = Path(args.model_path).parent if args.model_path else Path("save/eval_out")
    out_dir.mkdir(parents=True, exist_ok=True)
    log_file = out_dir / f"eval_{args.edit_mode}_{args.eval_mode}.json"
    summary = evaluation(evaluator, gt_batches, generate_fn, cfg, vec, str(log_file))
    for k, v in summary.items():
        print(f"{k}: {v['mean']} ± {v['conf']}")

    # self-describing report: a reader must be able to tell synthetic runs
    # from real ones without knowing how the run was launched
    import json

    meta = {
        "synthetic_data": synthetic_data,
        "evaluator": evaluator_source,
        "text_encoder": encoder_name(enc),
        "eval_mode": args.eval_mode,
        "edit_mode": args.edit_mode,
        "replications": reps,
        "model_path": args.model_path,
    }
    try:
        blob = json.loads(log_file.read_text())
    except Exception:
        blob = {}
    blob["meta"] = meta
    log_file.write_text(json.dumps(blob, indent=1, default=str))
    return summary


if __name__ == "__main__":
    main()
