"""Is keyframe copy-through learnable by the CURRENT train step?

Tiny UNet + synthetic clips on CPU, a few hundred steps. If training works,
keyframes_mse should fall far below rot_mse/263 (their masked_l2_weighted
normalizations differ by the feature count) — copy-through at observed
entries is the easiest reduction available to the model. If it stays pinned
at rot_mse/263, the conditioning input is dead inside the train step and a
unit-testable bug exists.

Usage: JAX_PLATFORMS=cpu python scripts/probe_trainability.py
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--latent", type=int, default=32)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--bf16", default="false")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from condmdi_tpu.data.dataset import DatasetConfig, SyntheticMotionDataset, collate
    from condmdi_tpu.diffusion.schedule import (
        DiffusionSchedule, get_named_beta_schedule,
    )
    from condmdi_tpu.diffusion.gaussian import (
        DiffusionConfig, ModelMeanType, ModelVarType, LossType,
    )
    from condmdi_tpu.models.text import HashTextEncoder
    from condmdi_tpu.models.unet import MDM_UNET
    from condmdi_tpu.training.loop import (
        TrainConfig, create_train_state, make_train_step,
    )

    B, T = args.batch, args.frames
    ds = SyntheticMotionDataset(
        DatasetConfig(max_motion_length=T, abs_3d=True, split="train"),
        size=B, seed=3,
    )
    batch = collate([ds[i] for i in range(B)], T, HashTextEncoder())
    batch = {
        k: jnp.asarray(v) for k, v in batch.items()
        if isinstance(v, np.ndarray) or hasattr(v, "shape")
    }

    model = MDM_UNET(
        latent_dim=args.latent, dim_mults=(1, 2), adagn=True, zero=True,
        keyframe_conditioned=True, pad_frames_to=T,
    )
    sched = DiffusionSchedule.create(get_named_beta_schedule("cosine", 1000))
    dcfg = DiffusionConfig(
        model_mean_type=ModelMeanType.START_X,
        model_var_type=ModelVarType.FIXED_SMALL,
        loss_type=LossType.MSE,
    )
    tcfg = TrainConfig(
        lr=args.lr, use_bf16=args.bf16 == "true",
        keyframe_conditioned=True,
        keyframe_selection_scheme="random_frames",
        keyframe_mask_prob=0.1,
        avg_model_beta=0.0,
    )

    x = batch["motion"]
    y = {"text_embed": batch["text_embed"]}
    obs0 = jnp.zeros_like(x)
    params = model.init(
        jax.random.key(0), x, jnp.zeros((B,), jnp.int32), y,
        obs_x0=obs0, obs_mask=jnp.zeros(x.shape, bool),
    )

    def apply_fn(p, xx, tt, yy, **kw):
        return model.apply(p, xx, tt, yy, **kw)

    step = make_train_step(apply_fn, sched, dcfg, tcfg)
    state = create_train_state(params, tcfg, sched)

    for i in range(args.steps):
        state, m = step(state, batch, jax.random.key(i))
        if i % 100 == 0 or i == args.steps - 1:
            rm = float(m["rot_mse"])
            km = float(m["keyframes_mse"])
            print(f"step {i:4d} rot_mse={rm:.4f} keyframes_mse={km:.6f} "
                  f"ratio km*263/rm={km * 263 / max(rm, 1e-9):.3f}")


if __name__ == "__main__":
    main()
