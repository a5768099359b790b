"""Additional sampler coverage: PLMS orders, marginal replacement, CFG+obs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from condmdi_tpu.diffusion import (
    DiffusionConfig,
    DiffusionSchedule,
    ddpm_sample_loop,
    get_named_beta_schedule,
    plms_sample_loop,
)
from condmdi_tpu.diffusion.gaussian import InpaintingState
from condmdi_tpu.diffusion.sampling import SamplerConfig

B, T, F = 2, 12, 6
STEPS = 20


def toy_denoise(x, t):
    scale = 1.0 + t.astype(x.dtype) / 1000.0
    return jnp.tanh(x) * scale.reshape((-1,) + (1,) * (x.ndim - 1))


class TestPLMSOrders:
    @pytest.mark.parametrize("order", [3, 4])
    @pytest.mark.slow
    def test_plms_order_parity(self, reference_path, order):
        import torch
        import diffusion.gaussian_diffusion as gd

        betas = gd.get_named_beta_schedule("cosine", STEPS)
        ref = gd.GaussianDiffusion(gd.DiffusionConfig(
            betas=betas, model_mean_type=gd.ModelMeanType.START_X,
            model_var_type=gd.ModelVarType.FIXED_SMALL, loss_type=gd.LossType.MSE,
        ))

        class Toy(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.dummy = torch.nn.Parameter(torch.zeros(1))

            def forward(self, x, t, **kw):
                return torch.tanh(x) * (1.0 + t.float() / 1000.0).view(-1, 1, 1, 1)

        rng = np.random.default_rng(order)
        x_init = rng.standard_normal((B, T, F)).astype(np.float32)
        noise_ref = torch.from_numpy(
            np.ascontiguousarray(np.moveaxis(x_init, 1, 2))[:, :, None, :]
        )
        want = ref.plms_sample_loop(
            Toy(), noise_ref.shape, noise=noise_ref, model_kwargs={"y": {}},
            order=order,
        )
        want = np.moveaxis(want.detach().numpy()[:, :, 0, :], 1, 2)

        sched = DiffusionSchedule.create(get_named_beta_schedule("cosine", STEPS))
        got = plms_sample_loop(
            toy_denoise, sched, DiffusionConfig(), (B, T, F), jax.random.key(0),
            noise=jnp.asarray(x_init),
            sampler=SamplerConfig(method="plms", order=order),
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)

    def test_order1_equals_ddim(self):
        """PLMS Adams-Bashforth order 1 is algebraically DDIM η=0 — checked
        directly because the REFERENCE's order=1 path crashes on its first
        step (old_out None subscript, gaussian_diffusion.py:1658), i.e. this
        configuration was never runnable upstream."""
        from condmdi_tpu.diffusion import ddim_sample_loop

        sched = DiffusionSchedule.create(get_named_beta_schedule("cosine", STEPS))
        x_init = jnp.asarray(
            np.random.default_rng(0).standard_normal((B, T, F)).astype(np.float32)
        )
        a = plms_sample_loop(
            toy_denoise, sched, DiffusionConfig(), (B, T, F), jax.random.key(0),
            noise=x_init, sampler=SamplerConfig(method="plms", order=1),
        )
        b = ddim_sample_loop(
            toy_denoise, sched, DiffusionConfig(), (B, T, F), jax.random.key(0),
            noise=x_init, sampler=SamplerConfig(method="ddim", eta=0.0),
        )
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


class TestMarginalReplacement:
    def test_final_sample_carries_observed_values(self):
        sched = DiffusionSchedule.create(get_named_beta_schedule("cosine", STEPS))
        rng = np.random.default_rng(1)
        obs = jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32))
        mask = jnp.zeros((B, T, F), bool).at[:, ::4, :].set(True)
        inpaint = InpaintingState(
            inpainted_motion=obs,
            inpainting_mask=mask,
            grad_weights=jnp.ones((STEPS,)),
            stop_imputation_at=jnp.int32(0),
            stop_recguidance_at=jnp.int32(0),
            imputate=True,
            reconstruction_guidance=False,
            replacement_distribution="marginal",
        )
        out = ddpm_sample_loop(
            toy_denoise, sched, DiffusionConfig(), (B, T, F), jax.random.key(2),
            inpaint=inpaint,
        )
        m = np.asarray(mask)
        np.testing.assert_allclose(
            np.asarray(out)[m], np.asarray(obs)[m], atol=1e-5
        )


@pytest.mark.slow
class TestCFGWithKeyframes:
    def test_cfg_passes_obs_through_both_branches(self):
        from condmdi_tpu.models import MDM_UNET, make_cfg_denoiser

        model = MDM_UNET(
            njoints=F, latent_dim=8, dim_mults=(1, 2), keyframe_conditioned=True,
            pad_frames_to=T, zero=False,
        )
        x = jax.random.normal(jax.random.key(0), (B, T, F))
        t = jnp.full((B,), 3, jnp.int32)
        y = {"text_embed": jax.random.normal(jax.random.key(1), (B, 512))}
        obs = jax.random.normal(jax.random.key(2), (B, T, F))
        mask = jnp.zeros((B, T, F), bool).at[:, ::3, :].set(True)
        params = model.init(jax.random.key(3), x, t, y, obs_x0=obs, obs_mask=mask)

        def apply_fn(xx, tt, yy, **kw):
            return model.apply(params, xx, tt, yy, **kw)

        out_c = apply_fn(x, t, y, obs_x0=obs, obs_mask=mask)
        out_u = apply_fn(x, t, {**y, "uncond": True}, obs_x0=obs, obs_mask=mask)
        want = np.asarray(out_u) + 2.0 * (np.asarray(out_c) - np.asarray(out_u))
        got = make_cfg_denoiser(apply_fn, y, 2.0, obs_x0=obs, obs_mask=mask)(x, t)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)
