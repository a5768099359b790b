"""Whole-framework learning test: a tiny keyframe-conditioned UNet overfit
on synthetic motions must beat an untrained one at in-betweening."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from condmdi_tpu.data.dataset import DatasetConfig, SyntheticMotionDataset, collate
from condmdi_tpu.diffusion import (
    DiffusionConfig,
    DiffusionSchedule,
    get_named_beta_schedule,
)
from condmdi_tpu.diffusion.sampling import SamplerConfig
from condmdi_tpu.models.text import HashTextEncoder
from condmdi_tpu.models.unet import MDM_UNET
from condmdi_tpu.sampling.pipeline import SamplePipeline
from condmdi_tpu.training import TrainConfig, create_train_state, make_train_step
from condmdi_tpu.training.keyframes import get_keyframes_mask



pytestmark = pytest.mark.slow  # protocol/e2e scale; fast gate skips

class TestLearningEndToEnd:
    def test_training_improves_inbetweening(self):
        B, T, F, STEPS = 8, 32, 263, 32
        ds = SyntheticMotionDataset(
            DatasetConfig(max_motion_length=T, abs_3d=True), size=B, seed=3
        )
        batch = collate([ds[i] for i in range(B)], T, HashTextEncoder())
        batch.pop("text")
        batch = {k: jnp.asarray(v) for k, v in batch.items()}

        model = MDM_UNET(
            njoints=F, latent_dim=32, dim_mults=(1, 2), keyframe_conditioned=True,
            pad_frames_to=T,
        )
        params0 = model.init(
            jax.random.key(0), batch["motion"], jnp.zeros((B,), jnp.int32),
            {"text_embed": batch["text_embed"]},
            obs_x0=batch["motion"], obs_mask=jnp.zeros((B, T, F), bool),
        )
        sched = DiffusionSchedule.create(get_named_beta_schedule("cosine", STEPS))
        dcfg = DiffusionConfig()
        tcfg = TrainConfig(
            lr=2e-3, keyframe_conditioned=True,
            keyframe_selection_scheme="random_frames", keyframe_mask_prob=0.1,
            avg_model_beta=0.0,
        )
        # the train step donates its state; keep an untouched copy of the
        # initial params for the untrained-baseline comparison
        params_init = jax.tree_util.tree_map(jnp.copy, params0)
        state = create_train_state(params0, tcfg, sched)

        def apply_fn(params, x, t, y, train=False, rngs=None, **kw):
            return model.apply(params, x, t, y, train=train, rngs=rngs, **kw)

        step_fn = make_train_step(apply_fn, sched, dcfg, tcfg)
        losses = []
        for i in range(250):
            state, m = step_fn(state, batch, jax.random.key(i))
            losses.append(float(m["loss"]))
        # per-step loss is noisy in t; compare windowed means
        first_loss = float(np.mean(losses[:10]))
        last_loss = float(np.mean(losses[-10:]))
        assert last_loss < first_loss * 0.6, (first_loss, last_loss)

        # sample with sparse keyframes from trained vs untrained params
        obs_mask = get_keyframes_mask(
            jax.random.key(9), batch["lengths"], T, edit_mode="benchmark_sparse",
            trans_length=8,
        )
        obs_mask = obs_mask & batch["time_mask"][..., None]

        def sample_with(params):
            pipe = SamplePipeline(
                lambda x, t, y, **kw: model.apply(params, x, t, y, **kw),
                sched, dcfg, SamplerConfig(),
            )
            return pipe.sample(
                jax.random.key(42), (B, T, F),
                {"text_embed": batch["text_embed"]},
                obs_x0=batch["motion"], obs_mask=obs_mask,
            )

        err_untrained = float(
            jnp.abs(sample_with(params_init) - batch["motion"]).mean()
        )
        err_trained = float(
            jnp.abs(sample_with(state.params) - batch["motion"]).mean()
        )
        # trained model reconstructs the (overfit) motions far better
        assert err_trained < err_untrained * 0.7, (err_trained, err_untrained)
