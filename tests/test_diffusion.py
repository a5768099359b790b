"""Golden tests: diffusion core + samplers vs the reference implementation.

A shared differentiable toy denoiser (tanh(x) * (1 + t/1000)) is implemented
in both frameworks so whole-sampler trajectories can be compared bit-for-bit
(deterministic DDIM/PLMS, zero-noise DDPM).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from condmdi_tpu.diffusion import (
    DiffusionConfig,
    DiffusionSchedule,
    LossType,
    ModelMeanType,
    ModelVarType,
    ddim_sample_loop,
    ddpm_sample_loop,
    get_named_beta_schedule,
    plms_sample_loop,
    space_timesteps,
)
from condmdi_tpu.diffusion.gaussian import (
    InpaintingState,
    get_gradient_schedule,
    p_mean_variance,
    q_posterior_mean_variance,
    q_sample,
)
from condmdi_tpu.diffusion.sampling import SamplerConfig

RNG = np.random.default_rng(3)

B, T, F = 2, 16, 8
STEPS = 50


def toy_denoise_jax(x, t):
    """t: [B] original-process timesteps."""
    scale = 1.0 + t.astype(x.dtype) / 1000.0
    return jnp.tanh(x) * scale.reshape((-1,) + (1,) * (x.ndim - 1))


def to_ref_layout(x):  # [B,T,F] -> [B,F,1,T]
    return np.ascontiguousarray(np.moveaxis(x, 1, 2))[:, :, None, :]


def from_ref_layout(x):  # [B,F,1,T] -> [B,T,F]
    return np.moveaxis(x[:, :, 0, :], 1, 2)


@pytest.fixture(scope="module")
def ref_modules(reference_path):
    import torch
    import diffusion.gaussian_diffusion as ref_gd
    from diffusion.respace import SpacedDiffusion, space_timesteps as ref_space

    class ToyModel(torch.nn.Module):
        def __init__(self):
            super().__init__()
            # the reference loop calls next(model.parameters()).device
            self.dummy = torch.nn.Parameter(torch.zeros(1))

        def forward(self, x, t, **kwargs):
            scale = 1.0 + t.float() / 1000.0
            return torch.tanh(x) * scale.view(-1, 1, 1, 1)

    return dict(
        torch=torch, gd=ref_gd, SpacedDiffusion=SpacedDiffusion,
        ref_space=ref_space, ToyModel=ToyModel,
    )


def make_ref_diffusion(ref_modules, steps=STEPS, use_timesteps=None, **conf_kw):
    gd = ref_modules["gd"]
    betas = gd.get_named_beta_schedule("cosine", steps)
    conf = gd.DiffusionConfig(
        betas=betas,
        model_mean_type=gd.ModelMeanType.START_X,
        model_var_type=gd.ModelVarType.FIXED_SMALL,
        loss_type=gd.LossType.MSE,
        **conf_kw,
    )
    if use_timesteps is not None:
        return ref_modules["SpacedDiffusion"](use_timesteps, conf)
    return gd.GaussianDiffusion(conf)


def make_ours(steps=STEPS, use_timesteps=None):
    betas = get_named_beta_schedule("cosine", steps)
    sched = DiffusionSchedule.create(betas, use_timesteps=use_timesteps)
    cfg = DiffusionConfig(
        model_mean_type=ModelMeanType.START_X,
        model_var_type=ModelVarType.FIXED_SMALL,
        loss_type=LossType.MSE,
    )
    return sched, cfg


class TestSchedule:
    def test_named_schedules_match(self, ref_modules):
        gd = ref_modules["gd"]
        for name in ("linear", "cosine"):
            np.testing.assert_allclose(
                get_named_beta_schedule(name, 1000),
                gd.get_named_beta_schedule(name, 1000),
                rtol=1e-12,
            )

    def test_space_timesteps_matches(self, ref_modules):
        for spec in ("ddim25", "10,15,20", "5"):
            assert set(space_timesteps(1000, spec)) == ref_modules["ref_space"](
                1000, spec
            )

    def test_respaced_schedule_matches_spaced_diffusion(self, ref_modules):
        use = space_timesteps(1000, "ddim50")
        betas = get_named_beta_schedule("cosine", 1000)
        sched = DiffusionSchedule.create(betas, use_timesteps=use)
        ref = make_ref_diffusion(ref_modules, steps=1000, use_timesteps=use)
        np.testing.assert_allclose(np.asarray(sched.betas), ref.betas, rtol=1e-6)
        np.testing.assert_array_equal(
            np.asarray(sched.timestep_map), np.array(ref.timestep_map)
        )
        np.testing.assert_allclose(
            np.asarray(sched.posterior_mean_coef1), ref.posterior_mean_coef1, rtol=1e-5
        )


class TestClosedForms:
    def test_q_sample_and_posterior(self, ref_modules):
        torch = ref_modules["torch"]
        ref = make_ref_diffusion(ref_modules)
        sched, _ = make_ours()
        x0 = RNG.normal(size=(B, T, F)).astype(np.float32)
        xt = RNG.normal(size=(B, T, F)).astype(np.float32)
        noise = RNG.normal(size=(B, T, F)).astype(np.float32)
        t = np.array([3, STEPS - 1], dtype=np.int64)

        ours = q_sample(sched, jnp.asarray(x0), jnp.asarray(t), jnp.asarray(noise))
        theirs = ref.q_sample(
            torch.from_numpy(to_ref_layout(x0)),
            torch.from_numpy(t),
            torch.from_numpy(to_ref_layout(noise)),
        )
        np.testing.assert_allclose(
            np.asarray(ours), from_ref_layout(theirs.numpy()), atol=1e-5
        )

        om, ov, olv = q_posterior_mean_variance(
            sched, jnp.asarray(x0), jnp.asarray(xt), jnp.asarray(t)
        )
        tm, tv, tlv = ref.q_posterior_mean_variance(
            torch.from_numpy(to_ref_layout(x0)),
            torch.from_numpy(to_ref_layout(xt)),
            torch.from_numpy(t),
        )
        np.testing.assert_allclose(np.asarray(om), from_ref_layout(tm.numpy()), atol=1e-5)
        np.testing.assert_allclose(
            np.broadcast_to(np.asarray(olv), (B, T, F)),
            from_ref_layout(tlv.numpy()),
            atol=1e-5,
        )


class TestPMeanVariance:
    def _setup(self, ref_modules):
        torch = ref_modules["torch"]
        ref = make_ref_diffusion(ref_modules)
        sched, cfg = make_ours()
        model = ref_modules["ToyModel"]()
        x = RNG.normal(size=(B, T, F)).astype(np.float32)
        t = np.array([5, STEPS - 2], dtype=np.int64)
        return torch, ref, sched, cfg, model, x, t

    def test_plain(self, ref_modules):
        torch, ref, sched, cfg, model, x, t = self._setup(ref_modules)
        ours = p_mean_variance(
            toy_denoise_jax, sched, cfg, jnp.asarray(x), jnp.asarray(t)
        )
        theirs = ref.p_mean_variance(
            model,
            torch.from_numpy(to_ref_layout(x)),
            torch.from_numpy(t),
            model_kwargs={"y": {}},
        )
        for k in ("mean", "log_variance", "pred_xstart"):
            np.testing.assert_allclose(
                np.broadcast_to(np.asarray(ours[k]), (B, T, F)),
                from_ref_layout(theirs[k].detach().numpy()),
                atol=1e-4,
                err_msg=k,
            )

    def _inpaint_kwargs(self, torch, time_mask, obs_mask, obs_motion, **extra):
        y = {
            "mask": torch.from_numpy(to_ref_layout(time_mask[..., None] * np.ones((B, T, F), np.float32))[:, :1, :, :]),
            "inpainting_mask": torch.from_numpy(to_ref_layout(obs_mask.astype(np.float32))).bool(),
            "inpainted_motion": torch.from_numpy(to_ref_layout(obs_motion)),
        }
        y.update(extra)
        return {"y": y}

    def test_conditional_imputation(self, ref_modules):
        torch, ref, sched, cfg, model, x, t = self._setup(ref_modules)
        time_mask = np.ones((B, T), dtype=np.float32)
        time_mask[1, 10:] = 0.0
        obs_mask = (RNG.uniform(size=(B, T, F)) < 0.3).astype(bool)
        obs_motion = RNG.normal(size=(B, T, F)).astype(np.float32)

        kwargs = self._inpaint_kwargs(
            torch, time_mask, obs_mask, obs_motion,
            imputate=True, stop_imputation_at=0,
            replacement_distribution="conditional",
        )
        theirs = ref.p_mean_variance(
            model, torch.from_numpy(to_ref_layout(x)), torch.from_numpy(t),
            model_kwargs=kwargs,
        )

        combined = obs_mask & time_mask[..., None].astype(bool)
        inp = InpaintingState(
            inpainted_motion=jnp.asarray(obs_motion),
            inpainting_mask=jnp.asarray(combined),
            grad_weights=jnp.ones((STEPS,)),
            stop_imputation_at=jnp.int32(0),
            stop_recguidance_at=jnp.int32(0),
            imputate=True,
            reconstruction_guidance=False,
        )
        ours = p_mean_variance(
            toy_denoise_jax, sched, cfg, jnp.asarray(x), jnp.asarray(t), inpaint=inp
        )
        for k in ("mean", "pred_xstart"):
            np.testing.assert_allclose(
                np.asarray(ours[k]),
                from_ref_layout(theirs[k].detach().numpy()),
                atol=1e-4,
                err_msg=k,
            )

    def test_reconstruction_guidance(self, ref_modules):
        torch, ref, sched, cfg, model, x, t = self._setup(ref_modules)
        time_mask = np.ones((B, T), dtype=np.float32)
        obs_mask = (RNG.uniform(size=(B, T, F)) < 0.3).astype(bool)
        obs_motion = RNG.normal(size=(B, T, F)).astype(np.float32)

        kwargs = self._inpaint_kwargs(
            torch, time_mask, obs_mask, obs_motion,
            imputate=True, stop_imputation_at=0,
            replacement_distribution="conditional",
            reconstruction_guidance=True, stop_recguidance_at=0,
            reconstruction_weight=5.0, gradient_schedule=None,
            diffusion_steps=STEPS,
        )
        theirs = ref.p_mean_variance(
            model, torch.from_numpy(to_ref_layout(x)), torch.from_numpy(t),
            model_kwargs=kwargs,
        )

        combined = obs_mask & time_mask[..., None].astype(bool)
        inp = InpaintingState(
            inpainted_motion=jnp.asarray(obs_motion),
            inpainting_mask=jnp.asarray(combined),
            grad_weights=jnp.asarray(
                get_gradient_schedule(None, STEPS) * 5.0, dtype=jnp.float32
            ),
            stop_imputation_at=jnp.int32(0),
            stop_recguidance_at=jnp.int32(0),
            imputate=True,
            reconstruction_guidance=True,
        )
        ours = p_mean_variance(
            toy_denoise_jax, sched, cfg, jnp.asarray(x), jnp.asarray(t), inpaint=inp
        )
        for k in ("mean", "pred_xstart"):
            np.testing.assert_allclose(
                np.asarray(ours[k]),
                from_ref_layout(theirs[k].detach().numpy()),
                atol=1e-4,
                err_msg=k,
            )


class TestSamplerLoops:
    def _run_ref_loop(self, ref_modules, method, x_init, use_timesteps=None, zero_noise=False):
        torch = ref_modules["torch"]
        ref = make_ref_diffusion(ref_modules, steps=STEPS if use_timesteps is None else 1000,
                                 use_timesteps=use_timesteps)
        model = ref_modules["ToyModel"]()
        noise = torch.from_numpy(to_ref_layout(x_init))
        kwargs = {"y": {}}
        if zero_noise:
            orig = torch.randn_like
            torch.randn_like = lambda x: torch.zeros_like(x)
        try:
            if method == "ddpm":
                out = ref.p_sample_loop(
                    model, noise.shape, noise=noise, model_kwargs=kwargs, progress=False
                )
            elif method == "ddim":
                out = ref.ddim_sample_loop(
                    model, noise.shape, noise=noise, model_kwargs=kwargs, eta=0.0
                )
            else:
                out = ref.plms_sample_loop(
                    model, noise.shape, noise=noise, model_kwargs=kwargs, order=2
                )
        finally:
            if zero_noise:
                torch.randn_like = orig
        return from_ref_layout(out.detach().numpy())

    def test_ddim_full_loop_parity(self, ref_modules):
        x_init = RNG.normal(size=(B, T, F)).astype(np.float32)
        theirs = self._run_ref_loop(ref_modules, "ddim", x_init)
        sched, cfg = make_ours()
        ours = ddim_sample_loop(
            toy_denoise_jax, sched, cfg, (B, T, F), jax.random.key(0),
            noise=jnp.asarray(x_init),
            sampler=SamplerConfig(method="ddim", eta=0.0),
        )
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-4)

    def test_ddim_respaced_loop_parity(self, ref_modules):
        use = space_timesteps(1000, "ddim25")
        x_init = RNG.normal(size=(B, T, F)).astype(np.float32)
        theirs = self._run_ref_loop(ref_modules, "ddim", x_init, use_timesteps=use)
        betas = get_named_beta_schedule("cosine", 1000)
        sched = DiffusionSchedule.create(betas, use_timesteps=use)
        _, cfg = make_ours()
        ours = ddim_sample_loop(
            toy_denoise_jax, sched, cfg, (B, T, F), jax.random.key(0),
            noise=jnp.asarray(x_init),
            sampler=SamplerConfig(method="ddim", eta=0.0),
        )
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-4)

    def test_ddpm_zero_noise_parity(self, ref_modules):
        x_init = RNG.normal(size=(B, T, F)).astype(np.float32)
        theirs = self._run_ref_loop(ref_modules, "ddpm", x_init, zero_noise=True)
        sched, cfg = make_ours()
        ours = ddpm_sample_loop(
            toy_denoise_jax, sched, cfg, (B, T, F), jax.random.key(0),
            noise=jnp.asarray(x_init),
            sampler=SamplerConfig(zero_noise=True),
        )
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-4)

    def test_plms_loop_parity(self, ref_modules):
        x_init = RNG.normal(size=(B, T, F)).astype(np.float32)
        theirs = self._run_ref_loop(ref_modules, "plms", x_init)
        sched, cfg = make_ours()
        ours = plms_sample_loop(
            toy_denoise_jax, sched, cfg, (B, T, F), jax.random.key(0),
            noise=jnp.asarray(x_init),
            sampler=SamplerConfig(method="plms", order=2),
        )
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-4)


class TestMaskedLosses:
    def test_masked_l2_matches_reference(self, ref_modules):
        torch = ref_modules["torch"]
        ref = make_ref_diffusion(ref_modules)
        from condmdi_tpu.diffusion.losses import masked_l2, masked_l2_weighted

        a = RNG.normal(size=(B, T, F)).astype(np.float32)
        b = RNG.normal(size=(B, T, F)).astype(np.float32)
        tm = np.ones((B, T), dtype=np.float32)
        tm[0, 12:] = 0

        ours = masked_l2(jnp.asarray(a), jnp.asarray(b), jnp.asarray(tm))
        ref_mask = torch.from_numpy(tm[:, None, None, :])
        theirs = ref.masked_l2(
            torch.from_numpy(to_ref_layout(a)),
            torch.from_numpy(to_ref_layout(b)),
            ref_mask,
        )
        np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-5)

        w = np.ones((B, F, 1, 1), dtype=np.float32)
        w[:, :4] *= 4.0
        tw = np.ones((B, F, 1, T), dtype=np.float32)
        theirs_w = ref.masked_l2_weighted(
            torch.from_numpy(to_ref_layout(a)),
            torch.from_numpy(to_ref_layout(b)),
            ref_mask,
            torch.from_numpy(w),
            torch.from_numpy(tw),
        )
        w_ours = np.ones((B, 1, F), dtype=np.float32)
        w_ours[..., :4] *= 4.0
        ours_w = masked_l2_weighted(
            jnp.asarray(a), jnp.asarray(b), jnp.asarray(tm), jnp.asarray(w_ours)
        )
        np.testing.assert_allclose(np.asarray(ours_w), theirs_w.numpy(), atol=1e-5)
