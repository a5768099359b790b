"""calc_bpd_loop + fixed-dataset fixture tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from condmdi_tpu.diffusion import DiffusionConfig, DiffusionSchedule, get_named_beta_schedule
from condmdi_tpu.diffusion.gaussian import calc_bpd_loop


class TestBPD:
    def test_bpd_loop_shapes_and_reference_parity(self, reference_path):
        import torch
        import diffusion.gaussian_diffusion as gd

        B, T, F, S = 2, 8, 6, 10
        rng = np.random.default_rng(0)
        x0 = rng.standard_normal((B, T, F)).astype(np.float32) * 0.3

        sched = DiffusionSchedule.create(get_named_beta_schedule("cosine", S))
        cfg = DiffusionConfig()

        def denoise(x, t):
            return jnp.tanh(x)

        out = calc_bpd_loop(denoise, sched, cfg, jnp.asarray(x0), jax.random.key(0))
        assert out["vb"].shape == (B, S)
        assert out["total_bpd"].shape == (B,)
        assert np.isfinite(np.asarray(out["total_bpd"])).all()

        # prior KL matches the reference closed form exactly (noise-free term)
        betas = gd.get_named_beta_schedule("cosine", S)
        ref = gd.GaussianDiffusion(gd.DiffusionConfig(
            betas=betas, model_mean_type=gd.ModelMeanType.START_X,
            model_var_type=gd.ModelVarType.FIXED_SMALL, loss_type=gd.LossType.MSE,
        ))
        x0_ref = torch.from_numpy(np.moveaxis(x0, 1, 2)[:, :, None, :])
        want_prior = ref._prior_bpd(x0_ref).numpy()
        np.testing.assert_allclose(
            np.asarray(out["prior_bpd"]), want_prior, rtol=1e-4
        )


class TestFixedDataset:
    @pytest.mark.slow
    def test_fixture_round_trip(self, tmp_path):
        from condmdi_tpu.data.fixed_dataset import (
            load_fixed_dataset,
            make_synthetic_fixture,
        )

        p = make_synthetic_fixture(tmp_path / "fix.npz", n=4, T=32)
        b1 = load_fixed_dataset(3, p)
        b2 = load_fixed_dataset(3, p)
        np.testing.assert_array_equal(b1["motion"], b2["motion"])
        assert b1["motion"].shape == (3, 32, 263)
        assert len(b1["text"]) == 3
