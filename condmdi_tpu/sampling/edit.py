"""Inference-time editing CLI on the UNCONDITIONED model
(reference sample/edit.py:25).

Conditioning enters ONLY through imputation / reconstruction guidance —
`y['inpainted_motion'/'inpainting_mask']` keys in the reference (:97-118) —
handled inside p_mean_variance; the model itself is not keyframe-conditioned.

Usage:
  python -m condmdi_tpu.sampling.edit --edit_mode benchmark_clip \
      --imputate [--reconstruction_guidance] ...
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from condmdi_tpu.data.dataset import DatasetConfig, SyntheticMotionDataset, collate
    from condmdi_tpu.diffusion.sampling import SamplerConfig
    from condmdi_tpu.models.text import encoder_name, make_text_encoder
    from condmdi_tpu.sampling.pipeline import SamplePipeline, build_inpainting_state
    from condmdi_tpu.sampling.synthesize import load_model_for_sampling
    from condmdi_tpu.training.keyframes import get_keyframes_mask
    from condmdi_tpu.utils.config import CondSyntArgs, parse_args

    args = parse_args(CondSyntArgs, argv)
    from condmdi_tpu.utils.config import EDIT_MODES

    if args.edit_mode not in EDIT_MODES:
        raise SystemExit(
            f"error: --edit_mode must be one of {', '.join(EDIT_MODES)} "
            f"(got {args.edit_mode!r})"
        )
    args.keyframe_conditioned = False  # edit.py drives the UNCOND model
    if not (args.imputate or args.reconstruction_guidance):
        args.imputate = True  # editing without either is a no-op
    n_frames = args.num_frames

    model, params, sched, dcfg = load_model_for_sampling(args)
    F = model.njoints * model.nfeats

    data_cfg = DatasetConfig(max_motion_length=n_frames, abs_3d=args.abs_3d, split="test")
    try:
        from condmdi_tpu.data.dataset import Text2MotionDataset

        ds = Text2MotionDataset(data_cfg)
    except FileNotFoundError:
        ds = SyntheticMotionDataset(data_cfg, size=max(args.num_samples, 4))
    encoder = make_text_encoder(args)
    batch = collate([ds[i] for i in range(args.num_samples)], n_frames, encoder)
    B = batch["motion"].shape[0]

    inpainted_motion = jnp.asarray(batch["motion"])
    inpainting_mask = get_keyframes_mask(
        jax.random.key(args.seed),
        jnp.asarray(batch["lengths"]),
        n_frames,
        edit_mode=args.edit_mode,
        trans_length=args.transition_length,
        feature_mode=args.editable_features,
        n_keyframes=args.n_keyframes,
    )
    inpaint = build_inpainting_state(
        inpainted_motion,
        inpainting_mask,
        time_mask=jnp.asarray(batch["time_mask"]),
        imputate=args.imputate,
        reconstruction_guidance=args.reconstruction_guidance,
        reconstruction_weight=args.reconstruction_weight,
        gradient_schedule=args.gradient_schedule,
        stop_imputation_at=args.stop_imputation_at,
        stop_recguidance_at=args.stop_recguidance_at,
        replacement_distribution=args.replacement_distribution,
        diffusion_steps=args.diffusion_steps,
    )

    y = {"text_embed": jnp.asarray(batch["text_embed"])}
    if args.text_condition == "":
        y["uncond"] = True  # unconditioned editing (edit.py:86-90)

    def apply_fn(x, t, yy, **kw):
        return model.apply(params, x, t, yy, **kw)

    pipe = SamplePipeline(
        apply_fn, sched, dcfg,
        SamplerConfig(method="ddim" if args.use_ddim else "ddpm"),
    )

    all_motions = []
    for rep in range(args.num_repetitions):
        rng = jax.random.key(args.seed + 17 * rep)
        sample = pipe.sample(
            rng, (B, n_frames, F), y,
            guidance_param=args.guidance_param if args.text_condition else 1.0,
            inpaint=inpaint,
        )
        all_motions.append(np.asarray(sample))

    from condmdi_tpu.data.humanml_repr import recover_from_ric

    joints = [
        np.asarray(recover_from_ric(jnp.asarray(ds.denormalize(m)), 22, abs_3d=args.abs_3d))
        for m in all_motions
    ]
    out_dir = Path(args.output_dir or "save/edit_out")
    out_dir.mkdir(parents=True, exist_ok=True)
    np.save(
        out_dir / "results.npy",
        {
            "motion": np.concatenate(all_motions, axis=0),
            "joints": np.concatenate(joints, axis=0),
            "text": batch["text"] * args.num_repetitions,
            "lengths": np.tile(batch["lengths"], args.num_repetitions),
            "inpainted_motion": np.asarray(inpainted_motion),
            "inpainting_mask": np.asarray(inpainting_mask),
            "edit_mode": args.edit_mode,
            "text_encoder": encoder_name(encoder),
        },
    )
    print(f"saved {out_dir/'results.npy'}")
    return out_dir


if __name__ == "__main__":
    main()
