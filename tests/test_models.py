"""Shape/semantics tests for the denoiser models (MDM, MDM_UNET, CFG)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from condmdi_tpu.models import MDM, MDM_UNET, make_cfg_denoiser, make_plain_denoiser
from condmdi_tpu.models.text import HashTextEncoder
from condmdi_tpu.ops.attention import _pallas_self_attention, _xla_attention, mha

B, T, F = 2, 196, 263
UT, UF = 28, 35  # small UNet test sizes (compile speed)


class TestMDM:
    def _model_and_params(self, **kw):
        model = MDM(njoints=F, latent_dim=64, ff_size=128, num_layers=2, num_heads=4, **kw)
        x = jnp.zeros((B, T, F))
        t = jnp.zeros((B,), jnp.int32)
        y = {"text_embed": jnp.zeros((B, 512))}
        params = model.init(jax.random.key(0), x, t, y)
        return model, params, x, t, y

    def test_forward_shape(self):
        model, params, x, t, y = self._model_and_params()
        out = model.apply(params, x, t, y)
        assert out.shape == (B, T, F)

    def test_uncond_differs_from_cond(self):
        model, params, x, t, _ = self._model_and_params()
        emb = jnp.asarray(HashTextEncoder().encode(["a person walks"] * B))
        x = jax.random.normal(jax.random.key(1), (B, T, F))
        out_c = model.apply(params, x, t, {"text_embed": emb})
        out_u = model.apply(params, x, t, {"text_embed": emb, "uncond": True})
        assert not np.allclose(np.asarray(out_c), np.asarray(out_u))

    @pytest.mark.slow
    def test_trans_dec_and_gru(self):
        for arch in ("trans_dec", "gru"):
            model, params, x, t, y = self._model_and_params(arch=arch)
            out = model.apply(params, x, t, y)
            assert out.shape == (B, T, F)

    def test_cond_mask_dropout_train(self):
        model, params, x, t, y = self._model_and_params(cond_mask_prob=1.0)
        emb = jnp.ones((B, 512))
        x = jax.random.normal(jax.random.key(1), (B, T, F))
        out_trained = model.apply(
            params, x, t, {"text_embed": emb}, train=True,
            rngs={"cond_mask": jax.random.key(2), "dropout": jax.random.key(3)},
        )
        assert out_trained.shape == (B, T, F)


class TestUNet:
    def _model_and_params(self, keyframe=True, **kw):
        model = MDM_UNET(
            njoints=UF, latent_dim=16, dim_mults=(1, 2), keyframe_conditioned=keyframe,
            pad_frames_to=32, **kw,
        )
        x = jnp.zeros((B, UT, UF))
        t = jnp.zeros((B,), jnp.int32)
        y = {"text_embed": jnp.zeros((B, 512))}
        kw2 = {}
        if keyframe:
            kw2 = dict(obs_x0=jnp.zeros((B, UT, UF)), obs_mask=jnp.zeros((B, UT, UF), bool))
        params = model.init(jax.random.key(0), x, t, y, **kw2)
        return model, params, x, t, y, kw2

    def test_forward_shape_keyframe(self):
        model, params, x, t, y, kw = self._model_and_params(True)
        out = model.apply(params, x, t, y, **kw)
        assert out.shape == (B, UT, UF)

    def test_forward_shape_unconditional(self):
        model, params, x, t, y, kw = self._model_and_params(False)
        out = model.apply(params, x, t, y)
        assert out.shape == (B, UT, UF)

    def test_zero_init_outputs_zero(self):
        # zero-init final conv ⇒ UNet output is exactly 0 at init
        model, params, x, t, y, kw = self._model_and_params(True)
        x = jax.random.normal(jax.random.key(1), (B, UT, UF))
        out = model.apply(params, x, t, y, **kw)
        np.testing.assert_allclose(np.asarray(out), 0.0)

    def test_keyframes_change_output(self):
        # zero-init final conv would make every output 0 at init, so disable
        model, params, _, t, y, _ = self._model_and_params(True, zero=False)
        x = jax.random.normal(jax.random.key(1), (B, UT, UF))
        obs = jax.random.normal(jax.random.key(2), (B, UT, UF))
        mask0 = jnp.zeros((B, UT, UF), bool)
        mask1 = mask0.at[:, ::10, :].set(True)
        out0 = model.apply(params, x, t, y, obs_x0=obs, obs_mask=mask0)
        out1 = model.apply(params, x, t, y, obs_x0=obs, obs_mask=mask1)
        assert not np.allclose(np.asarray(out0), np.asarray(out1))

    def test_xz_only_traj_model(self):
        model = MDM_UNET(
            njoints=4, latent_dim=16, dim_mults=(1, 2), xz_only=True,
            keyframe_conditioned=False, pad_frames_to=32,
        )
        x = jnp.zeros((B, UT, 4))
        t = jnp.zeros((B,), jnp.int32)
        params = model.init(jax.random.key(0), x, t, {})
        out = model.apply(params, x, t, {})
        assert out.shape == (B, UT, 4)
        # first and last channels are zero-filled (reference :828-831)
        assert np.allclose(np.asarray(out[..., 0]), 0)
        assert np.allclose(np.asarray(out[..., 3]), 0)


class TestCFG:
    def test_cfg_reduces_to_plain_at_scale_1(self):
        model, = [MDM(njoints=F, latent_dim=64, ff_size=128, num_layers=2, num_heads=4)]
        x = jax.random.normal(jax.random.key(1), (B, T, F))
        t = jnp.full((B,), 10, jnp.int32)
        emb = jnp.asarray(HashTextEncoder().encode(["hop"] * B))
        y = {"text_embed": emb}
        params = model.init(jax.random.key(0), x, t, y)

        def apply_fn(x, tt, yy, **kw):
            return model.apply(params, x, tt, yy, **kw)

        cfg_fn = make_cfg_denoiser(apply_fn, y, text_scale=1.0)
        plain_fn = make_plain_denoiser(apply_fn, y)
        np.testing.assert_allclose(
            np.asarray(cfg_fn(x, t)), np.asarray(plain_fn(x, t)), atol=1e-5
        )

    def test_cfg_scale_extrapolates(self):
        model = MDM(njoints=F, latent_dim=64, ff_size=128, num_layers=2, num_heads=4)
        x = jax.random.normal(jax.random.key(1), (B, T, F))
        t = jnp.full((B,), 10, jnp.int32)
        emb = jnp.asarray(HashTextEncoder().encode(["spin"] * B))
        y = {"text_embed": emb}
        params = model.init(jax.random.key(0), x, t, y)

        def apply_fn(x, tt, yy, **kw):
            return model.apply(params, x, tt, yy, **kw)

        out_c = apply_fn(x, t, y)
        out_u = apply_fn(x, t, {**y, "uncond": True})
        expected = np.asarray(out_u) + 2.5 * (np.asarray(out_c) - np.asarray(out_u))
        got = make_cfg_denoiser(apply_fn, y, text_scale=2.5)(x, t)
        np.testing.assert_allclose(np.asarray(got), expected, atol=1e-5)


class TestAttention:
    def test_pallas_kernel_matches_xla_interpret(self):
        # run the pallas kernel in interpreter mode on CPU
        from jax.experimental.pallas import tpu as pltpu

        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.standard_normal((2, 197, 64)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((2, 197, 64)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((2, 197, 64)).astype(np.float32))
        ref = _xla_attention(q, k, v, num_heads=4)
        with pltpu.force_tpu_interpret_mode():
            got = _pallas_self_attention(q, k, v, num_heads=4)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    def test_mha_cross_attention(self):
        rng = np.random.default_rng(1)
        q = jnp.asarray(rng.standard_normal((2, 30, 64)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((2, 1, 64)).astype(np.float32))
        out = mha(q, k, k, num_heads=4)
        assert out.shape == (2, 30, 64)


class TestOutputProcessLarge:
    """Parity vs the reference OutputProcessLarge (model/mdm.py:455,
    large_out_type=4) with converted torch weights."""

    F_, D, M, TT, BB = 12, 16, 2, 9, 2  # latent_in = cal_multiple(16,12) = 24

    def test_cal_multiple(self):
        from condmdi_tpu.models.mdm import cal_multiple

        assert cal_multiple(16, 12) == 24
        assert cal_multiple(24, 12) == 24
        assert cal_multiple(1, 12) == 12

    @pytest.mark.slow
    def test_torch_parity(self, reference_path):
        import sys
        import types

        import torch

        # stub clip/smplx so the reference model module imports (the head
        # under test touches neither) — same recipe as test_checkpoint.py
        if "clip" not in sys.modules:
            sys.modules["clip"] = types.SimpleNamespace(
                load=None, tokenize=None,
                model=types.SimpleNamespace(convert_weights=None),
            )
        if "smplx" not in sys.modules:
            smplx_stub = types.ModuleType("smplx")
            smplx_stub.__path__ = []
            smplx_stub.SMPLLayer = object
            smplx_stub.SMPL = object
            lbs = types.ModuleType("smplx.lbs")
            lbs.vertices2joints = lambda *a, **k: None
            body_models = types.ModuleType("smplx.body_models")
            body_models.SMPLOutput = object
            smplx_stub.lbs = lbs
            smplx_stub.body_models = body_models
            sys.modules["smplx"] = smplx_stub
            sys.modules["smplx.lbs"] = lbs
            sys.modules["smplx.body_models"] = body_models

        from model.mdm import OutputProcessLarge as TorchOPL

        from condmdi_tpu.models.mdm import OutputProcessLarge

        torch.manual_seed(0)
        ref = TorchOPL("hml_vec", self.F_, self.D, self.F_, 1, self.M).eval()

        rng = np.random.default_rng(0)
        out_np = rng.standard_normal((self.TT, self.BB, self.D)).astype(np.float32)
        skip_np = rng.standard_normal((self.TT, self.BB, self.F_)).astype(np.float32)
        with torch.no_grad():
            want = ref(torch.from_numpy(out_np), torch.from_numpy(skip_np))
        want = want.numpy()[:, :, 0, :].transpose(0, 2, 1)  # [B, T, F]

        def conv(prefix):
            sd = ref.state_dict()
            return {
                "kernel": jnp.asarray(sd[f"{prefix}.weight"].numpy().transpose(2, 1, 0)),
                "bias": jnp.asarray(sd[f"{prefix}.bias"].numpy()),
            }

        params = {"params": {
            "skip_conv": conv("skip_conv.1"),
            "latent_proj": conv("latent_conv.1"),
            "latent_conv": conv("latent_conv.2"),
            "final_conv1": conv("final_conv.0"),
            "final_conv2": conv("final_conv.2"),
        }}
        mod = OutputProcessLarge(self.F_, self.D, self.M)
        got = np.asarray(mod.apply(
            params,
            jnp.asarray(out_np.transpose(1, 0, 2)),   # [B, T, D]
            jnp.asarray(skip_np.transpose(1, 0, 2)),  # [B, T, F]
        ))
        np.testing.assert_allclose(got, want, atol=2e-5)

    @pytest.mark.slow  # large-variant forward (~20 s); plain archs stay fast
    def test_mdm_large_arch(self):
        model = MDM(njoints=F, latent_dim=64, ff_size=128, num_layers=2,
                    num_heads=4, arch="trans_enc_large", out_mult=2)
        x = jnp.zeros((B, 24, F))
        t = jnp.zeros((B,), jnp.int32)
        y = {"text_embed": jnp.zeros((B, 512))}
        params = model.init(jax.random.key(0), x, t, y)
        assert "output_process_large" in params["params"]
        out = model.apply(params, x, t, y)
        assert out.shape == (B, 24, F)
