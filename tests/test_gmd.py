"""GMD guidance tests: gradient guidance pulls the trajectory toward targets;
two-stage traj→motion pipeline runs end-to-end."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from condmdi_tpu.diffusion import (
    DiffusionConfig,
    DiffusionSchedule,
    get_named_beta_schedule,
)
from condmdi_tpu.diffusion.sampling import SamplerConfig, ddpm_sample_loop
from condmdi_tpu.sampling.gmd import (
    CondKeyLocations,
    KFRAME_PATTERNS,
    get_kframes,
    interpolate_kframes_trajectory,
    kframes_to_target,
    two_stage_generate,
)
from condmdi_tpu.utils.assets import NormStats

T, F4 = 48, 4


def identity_stats(dim):
    return NormStats(np.zeros(dim, np.float32), np.ones(dim, np.float32))


class TestTargetBuilders:
    def test_kframes_to_target(self):
        kframes = [(1, (1.0, 2.0)), (10, (3.0, 4.0))]
        target, mask = kframes_to_target(kframes, 2, T)
        assert float(target[0, 1, 0, 0]) == 1.0
        assert float(target[0, 10, 0, 2]) == 4.0
        assert bool(mask[0, 10, 0, 0]) and not bool(mask[0, 10, 0, 1])
        assert int(mask.sum()) == 2 * 2 * 2

    def test_interpolation(self):
        kframes = [(0, (0.0, 0.0)), (10, (10.0, 20.0))]
        traj = interpolate_kframes_trajectory(kframes, 20)
        np.testing.assert_allclose(traj[5], [5.0, 10.0])
        np.testing.assert_allclose(traj[15], [10.0, 20.0])  # clamps after last

    def test_patterns_available(self):
        for name in KFRAME_PATTERNS:
            kf = get_kframes(name)
            assert len(kf) >= 2


class TestGradientGuidance:
    def test_guidance_pulls_trajectory_to_target(self):
        """A 'denoiser' that echoes x as x0-prediction: guidance alone must
        drag the pelvis xz channels (traj_only features) toward targets."""
        sched = DiffusionSchedule.create(get_named_beta_schedule("cosine", 40))
        dcfg = DiffusionConfig()
        B = 2
        kframes = [(5, (2.0, -1.0)), (30, (-1.0, 2.0))]
        target, mask = kframes_to_target(kframes, B, T)
        guide = CondKeyLocations(
            target, mask, identity_stats(F4), traj_only=True,
            motion_length_cut=T / 20.0,
        )

        def denoise(x, t):
            return x * 0.95  # contraction toward 0

        unguided = ddpm_sample_loop(
            denoise, sched, dcfg, (B, T, F4), jax.random.key(0),
            sampler=SamplerConfig(zero_noise=True),
        )
        guided = ddpm_sample_loop(
            denoise, sched, dcfg, (B, T, F4), jax.random.key(0),
            cond_loss_fn=guide.loss_fn, cond_scale=30.0,
            sampler=SamplerConfig(zero_noise=True),
        )
        # error at keyframes must shrink a lot under guidance
        tgt = np.asarray(target[:, :, 0, :][..., (0, 2)])
        msk = np.asarray(mask[:, :, 0, :][..., (0, 2)])
        e_un = np.abs(np.asarray(unguided)[..., 1:3] - tgt)[msk].mean()
        e_gd = np.abs(np.asarray(guided)[..., 1:3] - tgt)[msk].mean()
        assert e_gd < e_un * 0.25, (e_gd, e_un)

    def test_stop_cond_gate(self):
        sched = DiffusionSchedule.create(get_named_beta_schedule("cosine", 10))
        B = 1
        target, mask = kframes_to_target([(5, (2.0, 2.0))], B, T)
        guide = CondKeyLocations(
            target, mask, identity_stats(F4), traj_only=True,
            stop_cond_from=1000,  # never active
            motion_length_cut=T / 20.0,
        )

        def denoise(x, t):
            return x * 0.9

        a = ddpm_sample_loop(
            denoise, sched, DiffusionConfig(), (B, T, F4), jax.random.key(0),
            sampler=SamplerConfig(zero_noise=True),
        )
        b = ddpm_sample_loop(
            denoise, sched, DiffusionConfig(), (B, T, F4), jax.random.key(0),
            cond_loss_fn=guide.loss_fn, cond_scale=100.0,
            sampler=SamplerConfig(zero_noise=True),
        )
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


@pytest.mark.slow
class TestTwoStage:
    def test_two_stage_pipeline_runs(self):
        from condmdi_tpu.diffusion.sampling import SamplerConfig
        from condmdi_tpu.models.unet import MDM_UNET
        from condmdi_tpu.sampling.pipeline import SamplePipeline

        B = 1
        sched = DiffusionSchedule.create(get_named_beta_schedule("cosine", 6))
        dcfg = DiffusionConfig()

        traj_model = MDM_UNET(
            njoints=4, latent_dim=8, dim_mults=(1, 2), xz_only=False,
            keyframe_conditioned=False, pad_frames_to=T, zero=False,
        )
        motion_model = MDM_UNET(
            njoints=263, latent_dim=8, dim_mults=(1, 2),
            keyframe_conditioned=False, pad_frames_to=T, zero=False,
        )
        y = {"text_embed": jnp.zeros((B, 512))}
        tp = traj_model.init(
            jax.random.key(0), jnp.zeros((B, T, 4)), jnp.zeros((B,), jnp.int32), y
        )
        mp = motion_model.init(
            jax.random.key(1), jnp.zeros((B, T, 263)), jnp.zeros((B,), jnp.int32), y
        )

        traj_pipe = SamplePipeline(
            lambda x, t, yy, **kw: traj_model.apply(tp, x, t, yy, **kw),
            sched, dcfg, SamplerConfig(),
        )
        motion_pipe = SamplePipeline(
            lambda x, t, yy, **kw: motion_model.apply(mp, x, t, yy, **kw),
            sched, dcfg, SamplerConfig(),
        )
        traj_out, sample = two_stage_generate(
            traj_pipe, motion_pipe, get_kframes("3dots"), jax.random.key(2),
            B, T, identity_stats(4), identity_stats(263), y, y,
            classifier_scale=10.0,
        )
        assert np.asarray(traj_out).shape == (B, T, 4)
        assert np.asarray(sample).shape == (B, T, 263)
        assert np.isfinite(np.asarray(sample)).all()
