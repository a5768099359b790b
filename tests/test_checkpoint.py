"""Checkpoint conversion parity: converted torch weights must reproduce the
reference modules' outputs through our Flax models.

The reference model files import `clip` (unavailable); a stub module is
injected so the UNet classes import cleanly — CLIP is never instantiated
with cond_mode='no_cond'.
"""

import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from condmdi_tpu.utils.checkpoint import (
    convert_mdm_state_dict,
    convert_unet_state_dict,
    latest_checkpoint,
    load_checkpoint,
    parse_step_from_checkpoint,
    save_checkpoint,
)


@pytest.fixture(scope="module")
def torch_mod():
    import torch

    return torch


class TestTransformerLayerParity:
    def test_torch_encoder_layer_matches(self, torch_mod):
        """torch.nn.TransformerEncoderLayer (the exact module the reference
        stacks, mdm.py:108) vs our TransformerEncoderLayer via converter."""
        torch = torch_mod
        D, H, FF, T, B = 32, 4, 64, 12, 3
        torch.manual_seed(0)
        layer = torch.nn.TransformerEncoderLayer(
            d_model=D, nhead=H, dim_feedforward=FF, dropout=0.0, activation="gelu"
        ).eval()

        sd = {f"seqTransEncoder.layers.0.{k}": v for k, v in layer.state_dict().items()}
        # converter also needs input/output/timestep params; fake minimal ones
        sd["input_process.poseEmbedding.weight"] = torch.eye(D)
        sd["input_process.poseEmbedding.bias"] = torch.zeros(D)
        sd["output_process.poseFinal.weight"] = torch.eye(D)
        sd["output_process.poseFinal.bias"] = torch.zeros(D)
        sd["embed_timestep.time_embed.0.weight"] = torch.zeros(D, D)
        sd["embed_timestep.time_embed.0.bias"] = torch.zeros(D)
        sd["embed_timestep.time_embed.2.weight"] = torch.zeros(D, D)
        sd["embed_timestep.time_embed.2.bias"] = torch.zeros(D)
        params = convert_mdm_state_dict(sd, num_layers=1)

        from condmdi_tpu.models.mdm import TransformerEncoderLayer

        ours = TransformerEncoderLayer(D, H, FF, dropout=0.0, activation="gelu")
        x = np.random.default_rng(0).standard_normal((B, T, D)).astype(np.float32)
        got = ours.apply({"params": params["params"]["layer0"]}, jnp.asarray(x))
        # torch layer is seq-first
        want = layer(torch.from_numpy(x).transpose(0, 1)).transpose(0, 1)
        np.testing.assert_allclose(
            np.asarray(got), want.detach().numpy(), atol=2e-5
        )


@pytest.mark.slow
class TestUNetParity:
    @pytest.fixture(scope="class")
    def ref_unet(self, reference_path, torch_mod):
        # stub clip/smplx so reference model modules import (neither is
        # instantiated: cond_mode='no_cond' and TemporalUnet has no SMPL)
        if "clip" not in sys.modules:
            sys.modules["clip"] = types.SimpleNamespace(
                load=None, tokenize=None, model=types.SimpleNamespace(convert_weights=None)
            )
        if "smplx" not in sys.modules:
            smplx_stub = types.ModuleType("smplx")
            smplx_stub.__path__ = []  # mark as package
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
        from model.mdm_unet import TemporalUnet as RefTemporalUnet

        return RefTemporalUnet

    def test_temporal_unet_forward_parity(self, ref_unet, torch_mod):
        torch = torch_mod
        torch.manual_seed(0)
        input_dim, cond_dim, dim = 14, 16, 16
        mults = (1, 2)
        ref = ref_unet(
            input_dim=input_dim, cond_dim=cond_dim, dim=dim, dim_mults=mults,
            attention=False, adagn=True, zero=True, added_input_channels=0,
        ).eval()

        sd = {f"unet.{k}": v for k, v in ref.state_dict().items()}
        sd["embed_timestep.time_embed.0.weight"] = torch.zeros(1, 1)
        sd["embed_timestep.time_embed.0.bias"] = torch.zeros(1)
        sd["embed_timestep.time_embed.2.weight"] = torch.zeros(1, 1)
        sd["embed_timestep.time_embed.2.bias"] = torch.zeros(1)
        params = convert_unet_state_dict(sd, n_levels=len(mults), adagn=True)

        from condmdi_tpu.models.unet import TemporalUnet

        ours = TemporalUnet(
            input_dim=input_dim, cond_dim=cond_dim, dim=dim, dim_mults=mults,
            attention=False, adagn=True, zero=True,
        )
        rng = np.random.default_rng(1)
        T, B = 16, 2
        x = rng.standard_normal((B, T, input_dim)).astype(np.float32)
        cond = rng.standard_normal((B, cond_dim)).astype(np.float32)

        got = ours.apply({"params": params["params"]["unet"]}, jnp.asarray(x), jnp.asarray(cond))
        # reference layout: [seq, bs, dim]
        want = ref(
            torch.from_numpy(np.moveaxis(x, 0, 1)).contiguous(),
            cond=torch.from_numpy(cond),
        )
        want = np.moveaxis(want.detach().numpy(), 0, 1)
        np.testing.assert_allclose(np.asarray(got), want, atol=3e-5)

    def test_temporal_unet_nonzero_weights_parity(self, ref_unet, torch_mod):
        """Randomize all weights (zero-init off) for a stronger check."""
        torch = torch_mod
        torch.manual_seed(3)
        input_dim, cond_dim, dim = 6, 8, 8
        mults = (1, 2)
        ref = ref_unet(
            input_dim=input_dim, cond_dim=cond_dim, dim=dim, dim_mults=mults,
            attention=False, adagn=True, zero=False, added_input_channels=0,
        ).eval()
        with torch.no_grad():
            for p in ref.parameters():
                p.add_(torch.randn_like(p) * 0.05)

        sd = {f"unet.{k}": v for k, v in ref.state_dict().items()}
        params = convert_unet_state_dict(
            {**sd,
             "embed_timestep.time_embed.0.weight": torch.zeros(1, 1),
             "embed_timestep.time_embed.0.bias": torch.zeros(1),
             "embed_timestep.time_embed.2.weight": torch.zeros(1, 1),
             "embed_timestep.time_embed.2.bias": torch.zeros(1)},
            n_levels=len(mults), adagn=True,
        )

        from condmdi_tpu.models.unet import TemporalUnet

        ours = TemporalUnet(
            input_dim=input_dim, cond_dim=cond_dim, dim=dim, dim_mults=mults,
            attention=False, adagn=True, zero=False,
        )
        rng = np.random.default_rng(4)
        T, B = 16, 2
        x = rng.standard_normal((B, T, input_dim)).astype(np.float32)
        cond = rng.standard_normal((B, cond_dim)).astype(np.float32)
        got = ours.apply({"params": params["params"]["unet"]}, jnp.asarray(x), jnp.asarray(cond))
        want = ref(
            torch.from_numpy(np.moveaxis(x, 0, 1)).contiguous(),
            cond=torch.from_numpy(cond),
        )
        want = np.moveaxis(want.detach().numpy(), 0, 1)
        np.testing.assert_allclose(np.asarray(got), want, atol=5e-5)


class TestTimestepEmbedderParity:
    def test_matches_torch_replica(self, torch_mod):
        torch = torch_mod
        D = 16
        torch.manual_seed(0)
        lin1 = torch.nn.Linear(D, D)
        lin2 = torch.nn.Linear(D, D)

        from condmdi_tpu.models.embeddings import TimestepEmbedder, sinusoidal_table

        sd = {
            "embed_timestep.time_embed.0.weight": lin1.weight,
            "embed_timestep.time_embed.0.bias": lin1.bias,
            "embed_timestep.time_embed.2.weight": lin2.weight,
            "embed_timestep.time_embed.2.bias": lin2.bias,
            "input_process.poseEmbedding.weight": torch.eye(D),
            "input_process.poseEmbedding.bias": torch.zeros(D),
            "output_process.poseFinal.weight": torch.eye(D),
            "output_process.poseFinal.bias": torch.zeros(D),
        }
        from condmdi_tpu.utils.checkpoint import convert_mdm_state_dict

        params = convert_mdm_state_dict(sd, num_layers=0)
        t = np.array([0, 5, 99])
        got = TimestepEmbedder(D).apply(
            {"params": params["params"]["embed_timestep"]}, jnp.asarray(t)
        )
        pe = torch.from_numpy(sinusoidal_table(5000, D))
        want = lin2(torch.nn.functional.silu(lin1(pe[torch.from_numpy(t)])))
        np.testing.assert_allclose(np.asarray(got), want.detach().numpy(), atol=1e-5)


@pytest.mark.slow
class TestOrbaxRoundTrip:
    def test_save_load(self, tmp_path):
        tree = {
            "params": {"w": jnp.arange(6.0).reshape(2, 3)},
            "step": jnp.int32(7),
        }
        p = save_checkpoint(tmp_path, 7, tree)
        assert parse_step_from_checkpoint(p) == 7
        assert latest_checkpoint(tmp_path) == p
        back = load_checkpoint(p)
        np.testing.assert_allclose(np.asarray(back["params"]["w"]), np.arange(6.0).reshape(2, 3))
