"""DiT denoiser variants: forward shapes, conditioning, two-head output."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from condmdi_tpu.models.dit import MDM_DiT

B, T, F = 2, 24, 263


def build(arch, **kw):
    model = MDM_DiT(
        njoints=F, latent_dim=32, ff_size=64, num_layers=2, num_heads=4,
        arch=arch, **kw,
    )
    x = jnp.zeros((B, T, F))
    t = jnp.zeros((B,), jnp.int32)
    y = {"text_embed": jnp.zeros((B, 512))}
    params = model.init(jax.random.key(0), x, t, y)
    return model, params, x, t, y


class TestDiTVariants:
    @pytest.mark.parametrize(
        "arch",
        ["dit_prenorm", "dit_postnorm", "dit_concat", "dit_concatv2",
         "dit_concatv3", "dit_concatv2_scale"],
    )
    def test_forward_shape(self, arch):
        model, params, x, t, y = build(arch)
        out = model.apply(params, x, t, y)
        assert out.shape == (B, T, F)

    def test_two_head(self):
        model, params, x, t, y = build("dit_prenorm", two_head=True)
        out1, out2 = model.apply(params, x, t, y)
        assert out1.shape == out2.shape == (B, T, F)

    @pytest.mark.slow
    def test_timestep_conditioning_matters(self):
        model, params, _, _, y = build("dit_prenorm")
        x = jax.random.normal(jax.random.key(1), (B, T, F))
        # adaLN-zero: at init the blocks are identity-gated, so perturb params
        params = jax.tree_util.tree_map(
            lambda p: p + 0.02 * jax.random.normal(jax.random.key(2), p.shape), params
        )
        o1 = model.apply(params, x, jnp.full((B,), 1, jnp.int32), y)
        o2 = model.apply(params, x, jnp.full((B,), 500, jnp.int32), y)
        assert not np.allclose(np.asarray(o1), np.asarray(o2))

    def test_adaln_zero_init_passthrough(self):
        """At init, adaLN-zero gates are 0 ⇒ prenorm blocks are identity and
        the (zero-init) output head emits zeros."""
        model, params, _, t, y = build("dit_prenorm")
        x = jax.random.normal(jax.random.key(1), (B, T, F))
        out = model.apply(params, x, t, y)
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)

    def test_factory_dispatch(self):
        from types import SimpleNamespace

        from condmdi_tpu.models.factory import create_model

        args = SimpleNamespace(
            dataset="humanml", arch="dit_concatv2", latent_dim=32, ff_size=64,
            layers=2, num_heads=4, cond_mask_prob=0.1, traj_only=False,
            unconstrained=False,
        )
        model = create_model(args)
        assert isinstance(model, MDM_DiT)
        assert model.arch == "dit_concatv2"
