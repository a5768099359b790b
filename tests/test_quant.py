"""Int8 quantized conv: numeric closeness + params-tree conversion."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from condmdi_tpu.ops.quant import (
    conv1d_f32,
    int8_conv1d,
    quantize_activation,
    quantize_params_tree,
    quantize_weight_per_channel,
)

RNG = np.random.default_rng(0)


class TestQuantOps:
    def test_weight_quant_round_trip(self):
        w = jnp.asarray(RNG.standard_normal((5, 16, 32)).astype(np.float32) * 0.1)
        wq, s = quantize_weight_per_channel(w)
        assert wq.dtype == jnp.int8
        deq = wq.astype(jnp.float32) * s
        rel = np.abs(np.asarray(deq - w)).max() / np.abs(np.asarray(w)).max()
        assert rel < 0.01

    def test_int8_conv_close_to_f32(self):
        x = jnp.asarray(RNG.standard_normal((2, 24, 16)).astype(np.float32))
        w = jnp.asarray(RNG.standard_normal((5, 16, 32)).astype(np.float32) * 0.05)
        b = jnp.asarray(RNG.standard_normal((32,)).astype(np.float32) * 0.1)
        ref = np.asarray(conv1d_f32(x, w, b, padding=2))
        wq, s = quantize_weight_per_channel(w)
        got = np.asarray(int8_conv1d(x, wq, s, b, padding=2))
        rel = np.abs(got - ref).mean() / np.abs(ref).mean()
        assert rel < 0.02, rel

    def test_activation_quant_saturation(self):
        x = jnp.asarray([[100.0, -100.0, 0.5]])
        xq, s = quantize_activation(x)
        assert int(xq.max()) == 127 and int(xq.min()) == -127

    def test_params_tree_conversion(self):
        tree = {
            "block1": {"conv": {"kernel": jnp.zeros((5, 8, 8)) + 0.1, "bias": jnp.zeros(8)}},
            "time_mlp": {"kernel": jnp.zeros((8, 16)), "bias": jnp.zeros(16)},
        }
        q = quantize_params_tree(tree)
        assert "kernel_q" in q["block1"]["conv"]
        assert q["block1"]["conv"]["kernel_q"].dtype == jnp.int8
        # dense kernel untouched
        assert "kernel" in q["time_mlp"]


@pytest.mark.slow
class TestInt8UNet:
    def test_int8_unet_close_to_float(self):
        """Same checkpoint, precision_mode='int8' vs 'float': outputs close."""
        import jax
        import jax.numpy as jnp

        from condmdi_tpu.models.unet import MDM_UNET

        B, T, F = 2, 28, 263
        kw = dict(njoints=F, latent_dim=32, dim_mults=(1, 2),
                  keyframe_conditioned=True, pad_frames_to=28, zero=False)
        m_f = MDM_UNET(**kw)
        m_q = MDM_UNET(**kw, precision_mode="int8")
        x = jax.random.normal(jax.random.key(0), (B, T, F))
        t = jnp.full((B,), 3, jnp.int32)
        y = {"text_embed": jax.random.normal(jax.random.key(1), (B, 512))}
        obs = jax.random.normal(jax.random.key(2), (B, T, F)) * 0.3
        mask = jnp.zeros((B, T, F), bool).at[:, ::5, :].set(True)
        params = m_f.init(jax.random.key(3), x, t, y, obs_x0=obs, obs_mask=mask)

        out_f = np.asarray(m_f.apply(params, x, t, y, obs_x0=obs, obs_mask=mask))
        out_q = np.asarray(m_q.apply(params, x, t, y, obs_x0=obs, obs_mask=mask))
        rel = np.abs(out_q - out_f).mean() / (np.abs(out_f).mean() + 1e-8)
        assert rel < 0.1, rel
        assert np.isfinite(out_q).all()


@pytest.mark.slow
class TestInt8WholeSampler:
    def test_int8_ddim_trajectory_close_to_float(self):
        """The quality gate the FID check will formalize: identical seed +
        deterministic DDIM, float vs int8 model → whole sampled motions stay
        close through all steps (quantization error must not compound)."""
        import jax
        import jax.numpy as jnp

        from condmdi_tpu.diffusion import (
            DiffusionConfig, DiffusionSchedule, get_named_beta_schedule,
        )
        from condmdi_tpu.diffusion.sampling import SamplerConfig
        from condmdi_tpu.models.unet import MDM_UNET
        from condmdi_tpu.sampling.pipeline import SamplePipeline

        B, T, F = 2, 28, 263
        kw = dict(njoints=F, latent_dim=32, dim_mults=(1, 2),
                  keyframe_conditioned=True, pad_frames_to=28, zero=False)
        m_f = MDM_UNET(**kw)
        m_q = MDM_UNET(**kw, precision_mode="int8")
        obs = jax.random.normal(jax.random.key(1), (B, T, F)) * 0.3
        mask = jnp.zeros((B, T, F), bool).at[:, ::7, :].set(True)
        y = {"text_embed": jax.random.normal(jax.random.key(2), (B, 512))}
        params = m_f.init(
            jax.random.key(0), jnp.zeros((B, T, F)), jnp.zeros((B,), jnp.int32),
            y, obs_x0=obs, obs_mask=mask,
        )
        sched = DiffusionSchedule.create(get_named_beta_schedule("cosine", 20))
        scfg = SamplerConfig(method="ddim", eta=0.0)

        outs = {}
        for name, m in (("float", m_f), ("int8", m_q)):
            pipe = SamplePipeline(
                lambda a, b, c, _m=m, **k: _m.apply(params, a, b, c, **k),
                sched, DiffusionConfig(), scfg,
            )
            outs[name] = np.asarray(pipe.sample(
                jax.random.key(3), (B, T, F), y, obs_x0=obs, obs_mask=mask,
            ))
        rel = np.abs(outs["int8"] - outs["float"]).mean() / (
            np.abs(outs["float"]).mean() + 1e-8
        )
        assert rel < 0.25, rel
        assert np.isfinite(outs["int8"]).all()


@pytest.mark.slow
class TestInt8MDM:
    def test_int8_mdm_close_to_float(self):
        import jax
        import jax.numpy as jnp

        from condmdi_tpu.models.mdm import MDM

        B, T, F = 2, 24, 263
        kw = dict(njoints=F, latent_dim=64, ff_size=128, num_layers=2, num_heads=4)
        m_f = MDM(**kw)
        m_q = MDM(**kw, precision_mode="int8")
        x = jax.random.normal(jax.random.key(0), (B, T, F))
        t = jnp.full((B,), 5, jnp.int32)
        y = {"text_embed": jax.random.normal(jax.random.key(1), (B, 512))}
        params = m_f.init(jax.random.key(2), x, t, y)
        out_f = np.asarray(m_f.apply(params, x, t, y))
        out_q = np.asarray(m_q.apply(params, x, t, y))
        rel = np.abs(out_q - out_f).mean() / (np.abs(out_f).mean() + 1e-8)
        assert rel < 0.1, rel
