"""Keyframe-conditioned sampling CLI (reference sample/conditional_synthesis.py:55).

Usage:
  python -m condmdi_tpu.sampling.conditional --edit_mode benchmark_sparse \
      --transition_length 10 --num_samples 4 [--imputate] \
      [--reconstruction_guidance] [--guidance_param 2.5]

Builds obs_x0/obs_mask from a test batch via the edit-mode zoo, runs the
keyframe-conditioned model (optionally + imputation / reconstruction
guidance), saves results.npy {motion, text, lengths, observed_motion,
observed_mask} exactly like the reference (:272-275).
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
    args.keyframe_conditioned = True
    if getattr(args, "keyframe_guidance_param", 1.0) != 1.0:
        # same surface/limitation as the reference
        # (conditional_synthesis.py:139-140, eval_humanml_condmdi.py:404-405)
        raise NotImplementedError("keyframe_guidance_param != 1 is not implemented")
    n_frames = args.num_frames

    model, params, sched, dcfg = load_model_for_sampling(args)
    F = model.njoints * model.nfeats

    # data: first test batch (synthetic fallback when assets absent)
    dcfg_data = DatasetConfig(
        max_motion_length=n_frames, abs_3d=args.abs_3d, split="test"
    )
    try:
        from condmdi_tpu.data.dataset import Text2MotionDataset

        ds = Text2MotionDataset(dcfg_data)
    except FileNotFoundError:
        ds = SyntheticMotionDataset(dcfg_data, size=max(args.num_samples, 4))
    if getattr(args, "use_fixed_dataset", False):
        # curated reproducible samples (reference --use_fixed_dataset,
        # conditional_synthesis.py:151 → editing_util.load_fixed_dataset:349)
        from condmdi_tpu.data.fixed_dataset import (
            DEFAULT_PATH,
            load_fixed_dataset,
            make_synthetic_fixture,
        )

        if not DEFAULT_PATH.exists():
            make_synthetic_fixture(DEFAULT_PATH, n=max(args.num_samples, 8), T=n_frames)
        encoder = make_text_encoder(args)
        batch = load_fixed_dataset(args.num_samples, text_encoder=encoder)
    else:
        encoder = make_text_encoder(args)
        batch = collate(
            [ds[i] for i in range(args.num_samples)], n_frames, encoder
        )
    B = batch["motion"].shape[0]

    obs_x0 = jnp.asarray(batch["motion"])
    obs_mask = get_keyframes_mask(
        jax.random.key(args.seed),
        jnp.asarray(batch["lengths"]),
        n_frames,
        edit_mode=args.edit_mode,
        trans_length=args.transition_length,
        feature_mode=args.editable_features,
        n_keyframes=args.n_keyframes,
    )
    obs_mask = obs_mask & jnp.asarray(batch["time_mask"])[..., None]

    y = {"text_embed": jnp.asarray(batch["text_embed"])}
    if args.no_text:
        y = {"text_embed": jnp.zeros_like(jnp.asarray(batch["text_embed"]))}

    inpaint = None
    if args.imputate or args.reconstruction_guidance:
        inpaint = build_inpainting_state(
            obs_x0,
            obs_mask,
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

    def apply_fn(x, t, yy, **kw):
        return model.apply(params, x, t, yy, **kw)

    pipe = SamplePipeline(
        apply_fn, sched, dcfg,
        SamplerConfig(method="ddim" if args.use_ddim else "ddpm"),
    )

    all_motions = []
    for rep in range(args.num_repetitions):
        rng = jax.random.key(args.seed + 100 * rep)
        sample = pipe.sample(
            rng, (B, n_frames, F), y,
            guidance_param=args.guidance_param,
            obs_x0=obs_x0, obs_mask=obs_mask,
            inpaint=inpaint,
        )
        all_motions.append(np.asarray(sample))

    from condmdi_tpu.data.humanml_repr import recover_from_ric

    joints = [
        np.asarray(
            recover_from_ric(jnp.asarray(ds.denormalize(m)), 22, abs_3d=args.abs_3d)
        )
        for m in all_motions
    ]

    out_dir = Path(args.output_dir or "save/conditional_out")
    out_dir.mkdir(parents=True, exist_ok=True)
    np.save(
        out_dir / "results.npy",
        {
            "motion": np.concatenate(all_motions, axis=0),
            "joints": np.concatenate(joints, axis=0),
            "text": batch["text"] * args.num_repetitions,
            "lengths": np.tile(batch["lengths"], args.num_repetitions),
            "observed_motion": np.asarray(obs_x0),
            "observed_mask": np.asarray(obs_mask),
            "edit_mode": args.edit_mode,
            "text_encoder": encoder_name(encoder),
        },
    )
    print(f"saved {out_dir/'results.npy'}")
    return out_dir


if __name__ == "__main__":
    main()
