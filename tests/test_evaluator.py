"""Evaluator net parity vs raw torch modules (GRU packed-seq semantics)."""

import numpy as np
import pytest

import jax.numpy as jnp

from condmdi_tpu.evals.evaluator import (
    EvaluatorWrapper,
    gru_scan,
    movement_encode,
)


@pytest.fixture(scope="module")
def torch_mod():
    import torch

    return torch


class TestGRUParity:
    def test_masked_bigru_matches_torch_packed(self, torch_mod):
        torch = torch_mod
        B, T, D, H = 4, 10, 6, 8
        torch.manual_seed(0)
        gru = torch.nn.GRU(D, H, batch_first=True, bidirectional=True)
        x = np.random.default_rng(0).standard_normal((B, T, D)).astype(np.float32)
        lengths = np.array([10, 7, 5, 3])
        h0 = np.random.default_rng(1).standard_normal((2, 1, H)).astype(np.float32)

        from torch.nn.utils.rnn import pack_padded_sequence

        packed = pack_padded_sequence(
            torch.from_numpy(x), lengths.tolist(), batch_first=True
        )
        _, h_last = gru(packed, torch.from_numpy(h0).repeat(1, B, 1))
        want = torch.cat([h_last[0], h_last[1]], dim=-1).detach().numpy()

        sd = gru.state_dict()

        def dirparams(sfx=""):
            return {
                "wi": sd[f"weight_ih_l0{sfx}"].numpy(),
                "wh": sd[f"weight_hh_l0{sfx}"].numpy(),
                "bi": sd[f"bias_ih_l0{sfx}"].numpy(),
                "bh": sd[f"bias_hh_l0{sfx}"].numpy(),
            }

        h0f = jnp.broadcast_to(jnp.asarray(h0[0, 0]), (B, H))
        h0b = jnp.broadcast_to(jnp.asarray(h0[1, 0]), (B, H))
        hf = gru_scan(jnp.asarray(x), jnp.asarray(lengths), dirparams(), h0f)
        hb = gru_scan(
            jnp.asarray(x), jnp.asarray(lengths), dirparams("_reverse"), h0b,
            reverse=True,
        )
        got = np.concatenate([np.asarray(hf), np.asarray(hb)], axis=-1)
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestMovementEncoderParity:
    def test_conv_stack_matches_torch(self, torch_mod):
        torch = torch_mod
        torch.manual_seed(1)
        conv1 = torch.nn.Conv1d(12, 16, 4, 2, 1)
        conv2 = torch.nn.Conv1d(16, 16, 4, 2, 1)
        out = torch.nn.Linear(16, 16)
        x = np.random.default_rng(2).standard_normal((2, 32, 12)).astype(np.float32)

        with torch.no_grad():
            h = torch.from_numpy(np.moveaxis(x, 1, 2))
            h = torch.nn.functional.leaky_relu(conv1(h), 0.2)
            h = torch.nn.functional.leaky_relu(conv2(h), 0.2)
            want = out(h.transpose(1, 2)).numpy()

        params = {
            "conv1": {
                "kernel": np.transpose(conv1.weight.detach().numpy(), (2, 1, 0)),
                "bias": conv1.bias.detach().numpy(),
            },
            "conv2": {
                "kernel": np.transpose(conv2.weight.detach().numpy(), (2, 1, 0)),
                "bias": conv2.bias.detach().numpy(),
            },
            "out": {"kernel": out.weight.detach().numpy().T, "bias": out.bias.detach().numpy()},
        }
        got = np.asarray(movement_encode(params, jnp.asarray(x)))
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestWrapper:
    @pytest.mark.slow  # full-length GRU co-embedding forward (~45 s)
    def test_embedding_shapes_and_determinism(self):
        w = EvaluatorWrapper.random_init(0)
        rng = np.random.default_rng(3)
        motions = rng.standard_normal((6, 196, 263)).astype(np.float32)
        m_lens = np.array([196, 100, 64, 48, 196, 32])
        emb = w.get_motion_embeddings(motions, m_lens)
        assert emb.shape == (6, 512)
        emb2 = w.get_motion_embeddings(motions, m_lens)
        np.testing.assert_allclose(emb, emb2)

        word = rng.standard_normal((6, 22, 300)).astype(np.float32)
        pos = rng.standard_normal((6, 22, 15)).astype(np.float32)
        cap_lens = np.array([22, 20, 15, 10, 8, 5])
        t_emb, mo_emb = w.get_co_embeddings(word, pos, cap_lens, motions, m_lens)
        assert t_emb.shape == (6, 512) and mo_emb.shape == (6, 512)
