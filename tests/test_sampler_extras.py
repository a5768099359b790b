"""skip_timesteps / init_image / guided-diffusion timestep embedding."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from condmdi_tpu.diffusion import (
    DiffusionConfig,
    DiffusionSchedule,
    ddpm_sample_loop,
    get_named_beta_schedule,
)
from condmdi_tpu.diffusion.sampling import SamplerConfig


class TestSkipTimesteps:
    def test_partial_denoise_stays_near_init(self):
        """With most steps skipped and zero noise, the result must be far
        closer to init_image than a full-from-noise sample."""
        sched = DiffusionSchedule.create(get_named_beta_schedule("cosine", 50))
        cfg = DiffusionConfig()
        B, T, F = 2, 12, 6
        rng = np.random.default_rng(0)
        init = jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32))

        def denoise(x, t):  # near-identity x0 predictor
            return x * 0.999

        full = ddpm_sample_loop(
            denoise, sched, cfg, (B, T, F), jax.random.key(1),
            sampler=SamplerConfig(zero_noise=True),
        )
        partial = ddpm_sample_loop(
            denoise, sched, cfg, (B, T, F), jax.random.key(1),
            skip_timesteps=45, init_image=init,
            sampler=SamplerConfig(zero_noise=True),
        )
        d_partial = float(jnp.abs(partial - init).mean())
        d_full = float(jnp.abs(full - init).mean())
        assert d_partial < d_full * 0.6

    def test_timestep_embedding_matches_reference(self, reference_path):
        import torch
        from diffusion.nn import timestep_embedding as ref_emb

        from condmdi_tpu.models.embeddings import timestep_embedding

        t = np.array([0, 1, 57, 999])
        ours = np.asarray(timestep_embedding(jnp.asarray(t), 64))
        theirs = ref_emb(torch.from_numpy(t), 64).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-5)
