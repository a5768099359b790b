"""Text-to-motion sampling CLI (reference sample/synthesize.py:39).

Usage:
  python -m condmdi_tpu.sampling.synthesize --model_path save/x/ckpt_000... \
      --text_prompt "a person walks forward" --num_samples 4

Text prompts come from --text_prompt, --input_text (file), or the dataset
test split. Outputs results.npy {motion, text, lengths} (+ stick-figure mp4
when matplotlib/ffmpeg are available) in --output_dir.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def load_model_for_sampling(args):
    """Build model + diffusion; load Orbax ckpt or converted torch .pt.

    When --model_path is set and an args.json sits next to the checkpoint,
    model/data/diffusion options are reloaded from it first, CLI flags
    winning (reference parse_and_load_from_model, parser_util.py:566-603).
    """
    import jax
    import jax.numpy as jnp

    from condmdi_tpu.models.factory import create_model, create_gaussian_diffusion
    from condmdi_tpu.utils import checkpoint as ckpt
    from condmdi_tpu.utils.config import load_args_from_model

    mp0 = getattr(args, "model_path", "")
    if mp0 and (Path(mp0).parent / "args.json").exists():
        args = load_args_from_model(
            args, mp0, cli_overridden=getattr(args, "_cli_overridden", ())
        )

    model = create_model(args)
    sched, dcfg = create_gaussian_diffusion(args)

    B, T, F = 1, args.num_frames, model.njoints * model.nfeats
    x = jnp.zeros((B, T, F))
    t = jnp.zeros((B,), jnp.int32)
    y = {"text_embed": jnp.zeros((B, 512))}
    kw = {}
    if getattr(model, "keyframe_conditioned", False):
        kw = dict(obs_x0=x, obs_mask=jnp.zeros((B, T, F), bool))
    params = model.init(jax.random.key(args.seed), x, t, y, **kw)

    mp = getattr(args, "model_path", "")
    if mp and Path(mp).exists():
        if mp.endswith(".pt"):
            loaded = ckpt.load_torch_checkpoint(
                mp, args.arch,
                **(dict(n_levels=len(args.dim_mults)) if args.arch.startswith("unet")
                   else dict(num_layers=args.layers)),
            )
            params = loaded
        else:
            restored = ckpt.load_checkpoint(mp)
            # EMA-preferred (reference model_util.py load_model: EMA weights
            # are the eval weights); --use_ema false loads the raw params —
            # needed e.g. for short runs whose EMA horizon (1/(1-beta))
            # exceeds the trained steps, where the EMA is still dominated
            # by the random init
            use_ema = getattr(args, "use_ema", True)
            if use_ema and restored.get("ema_params") is not None:
                # EMA-horizon guard (round-2 trap, BENCH_NOTES.md: beta
                # 0.9999 left a 4k-step EMA ~67% random init): warn when
                # the trained steps can't have converged the average
                step = int(np.ravel(np.asarray(restored.get("step", 0)))[0]) if restored.get("step") is not None else 0
                beta = float(getattr(args, "avg_model_beta", 0.9999))
                horizon = 3.0 / max(1.0 - beta, 1e-12)
                if step and step < horizon:
                    print(
                        f"WARNING: EMA-preferred load of a {step}-step checkpoint "
                        f"with avg_model_beta={beta} (convergence horizon ≈ "
                        f"{horizon:.0f} steps) — the EMA is still dominated by "
                        "the random init; pass --use_ema false or retrain with "
                        "beta matched to the budget"
                    )
            params = ckpt.select_eval_params(restored, use_ema)
    return model, params, sched, dcfg


def get_text_prompts(args) -> list[str]:
    if getattr(args, "text_prompt", ""):
        return [args.text_prompt] * args.num_samples
    if getattr(args, "input_text", "") and Path(args.input_text).exists():
        lines = [l.strip() for l in open(args.input_text) if l.strip()]
        return lines[: args.num_samples]
    return ["a person walks forward"] * args.num_samples


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from condmdi_tpu.data.dataset import DatasetConfig, SyntheticMotionDataset
    from condmdi_tpu.diffusion.sampling import SamplerConfig
    from condmdi_tpu.models.text import encoder_name, make_text_encoder
    from condmdi_tpu.sampling.pipeline import SamplePipeline
    from condmdi_tpu.utils.config import GenerateArgs, parse_args

    args = parse_args(GenerateArgs, argv)
    n_frames = min(args.num_frames, int(args.motion_length * 20))
    texts = get_text_prompts(args)
    B = len(texts)

    model, params, sched, dcfg = load_model_for_sampling(args)
    F = model.njoints * model.nfeats

    encoder = make_text_encoder(args)
    text_embed = jnp.asarray(encoder.encode(texts))

    def apply_fn(x, t, y, **kw):
        return model.apply(params, x, t, y, **kw)

    pipe = SamplePipeline(
        apply_fn, sched, dcfg,
        SamplerConfig(method="ddim" if args.use_ddim else "ddpm"),
    )
    y = {"text_embed": text_embed}

    all_motions, all_lengths = [], []
    for rep in range(args.num_repetitions):
        rng = jax.random.key(args.seed + rep)
        sample = pipe.sample(
            rng, (B, n_frames, F), y, guidance_param=args.guidance_param
        )
        all_motions.append(np.asarray(sample))
        all_lengths.append(np.full((B,), n_frames))

    # denormalize + recover joints using dataset stats
    ds = SyntheticMotionDataset(
        DatasetConfig(max_motion_length=n_frames, abs_3d=args.abs_3d), size=4
    )
    from condmdi_tpu.data.humanml_repr import recover_from_ric

    joints = [
        np.asarray(recover_from_ric(jnp.asarray(ds.denormalize(m)), 22, abs_3d=args.abs_3d))
        for m in all_motions
    ]

    out_dir = Path(args.output_dir or "save/synthesize_out")
    out_dir.mkdir(parents=True, exist_ok=True)
    np.save(
        out_dir / "results.npy",
        {
            "motion": np.concatenate(all_motions, axis=0),
            "joints": np.concatenate(joints, axis=0),
            "text": texts * args.num_repetitions,
            "lengths": np.concatenate(all_lengths, axis=0),
            "num_samples": B,
            "num_repetitions": args.num_repetitions,
            "text_encoder": encoder_name(encoder),
        },
    )
    print(f"saved {out_dir/'results.npy'}")
    try:
        from condmdi_tpu.viz.plot import save_stick_figure_video

        save_stick_figure_video(joints[0][0], out_dir / "sample00.mp4", title=texts[0])
    except Exception as e:  # viz is best-effort (ffmpeg may be absent)
        print(f"viz skipped: {e}")
    return out_dir


if __name__ == "__main__":
    main()
