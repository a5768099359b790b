"""CLIP text tower: forward shape, EOT pooling, converter vs torch replica."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from condmdi_tpu.models.clip import (
    ClipResidualBlock,
    ClipTextModel,
    convert_clip_text_state_dict,
)


class TestClipTextModel:
    @pytest.mark.slow
    def test_forward_shape_and_eot_pooling(self):
        model = ClipTextModel(vocab_size=100, context_length=16, width=32,
                              layers=2, heads=4, embed_dim=24)
        ids = np.zeros((2, 16), np.int32)
        ids[0, :4] = [90, 5, 6, 99]  # EOT=99 at position 3
        ids[1, :3] = [90, 7, 99]
        params = model.init(jax.random.key(0), jnp.asarray(ids))
        out = model.apply(params, jnp.asarray(ids))
        assert out.shape == (2, 24)
        # changing tokens AFTER the EOT must not change the output (causal
        # mask + EOT pooling)
        ids2 = ids.copy()
        ids2[0, 10] = 55
        out2 = model.apply(params, jnp.asarray(ids2))
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out2[0]), atol=1e-6)

    @pytest.mark.slow
    def test_block_matches_torch_multihead(self):
        """One CLIP residual block vs torch MultiheadAttention + LN + MLP."""
        import torch

        W, H, T, B = 32, 4, 10, 2
        torch.manual_seed(0)
        mha = torch.nn.MultiheadAttention(W, H, batch_first=False)
        ln1, ln2 = torch.nn.LayerNorm(W), torch.nn.LayerNorm(W)
        fc = torch.nn.Linear(W, 4 * W)
        proj = torch.nn.Linear(4 * W, W)

        sd = {
            "transformer.resblocks.0.ln_1.weight": ln1.weight,
            "transformer.resblocks.0.ln_1.bias": ln1.bias,
            "transformer.resblocks.0.ln_2.weight": ln2.weight,
            "transformer.resblocks.0.ln_2.bias": ln2.bias,
            "transformer.resblocks.0.attn.in_proj_weight": mha.in_proj_weight,
            "transformer.resblocks.0.attn.in_proj_bias": mha.in_proj_bias,
            "transformer.resblocks.0.attn.out_proj.weight": mha.out_proj.weight,
            "transformer.resblocks.0.attn.out_proj.bias": mha.out_proj.bias,
            "transformer.resblocks.0.mlp.c_fc.weight": fc.weight,
            "transformer.resblocks.0.mlp.c_fc.bias": fc.bias,
            "transformer.resblocks.0.mlp.c_proj.weight": proj.weight,
            "transformer.resblocks.0.mlp.c_proj.bias": proj.bias,
            "token_embedding.weight": torch.zeros(10, W),
            "positional_embedding": torch.zeros(16, W),
            "text_projection": torch.zeros(W, W),
            "ln_final.weight": torch.ones(W),
            "ln_final.bias": torch.zeros(W),
        }
        params = convert_clip_text_state_dict(sd)["params"]["block0"]

        x = np.random.default_rng(0).standard_normal((B, T, W)).astype(np.float32)

        # torch forward (seq-first) with causal mask + QuickGELU
        xt = torch.from_numpy(np.moveaxis(x, 0, 1))
        causal = torch.full((T, T), float("-inf")).triu(1)
        h = ln1(xt)
        a, _ = mha(h, h, h, attn_mask=causal, need_weights=False)
        xt = xt + a
        h = ln2(xt)
        h = fc(h)
        h = h * torch.sigmoid(1.702 * h)
        want = (xt + proj(h)).detach().numpy()
        want = np.moveaxis(want, 0, 1)

        block = ClipResidualBlock(W, H)
        got = np.asarray(block.apply({"params": params}, jnp.asarray(x)))
        np.testing.assert_allclose(got, want, atol=2e-5)
