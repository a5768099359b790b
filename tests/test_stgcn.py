"""ST-GCN: graph parity + full-forward parity vs the reference module."""

import numpy as np
import pytest

import jax.numpy as jnp

from condmdi_tpu.evals.stgcn import (
    build_graph,
    convert_stgcn_state_dict,
    stgcn_forward,
)


class TestGraph:
    @pytest.mark.parametrize("strategy", ["uniform", "distance", "spatial"])
    def test_openpose_graph_matches_reference(self, reference_path, strategy):
        from eval.a2m.recognition.models.stgcnutils.graph import Graph

        ref = Graph(layout="openpose", strategy=strategy)
        ours = build_graph("openpose", strategy)
        np.testing.assert_allclose(ours, ref.A, atol=1e-8)

    def test_smpl_layouts_build(self):
        assert build_graph("smpl", "spatial").shape[1:] == (24, 24)
        assert build_graph("smpl_noglobal", "spatial").shape[1:] == (23, 23)


class TestForwardParity:
    @pytest.mark.slow
    def test_full_network_matches_reference(self, reference_path):
        import torch
        from eval.a2m.recognition.models.stgcn import STGCN as RefSTGCN

        torch.manual_seed(0)
        ref = RefSTGCN(
            in_channels=4, num_class=5,
            graph_args={"layout": "openpose", "strategy": "spatial"},
            edge_importance_weighting=True, device="cpu",
        ).eval()
        with torch.no_grad():
            for p in ref.parameters():
                p.add_(torch.randn_like(p) * 0.02)

        params = convert_stgcn_state_dict(ref.state_dict())
        A = build_graph("openpose", "spatial")

        rng = np.random.default_rng(0)
        N, C, T, V = 2, 4, 32, 18
        x = rng.standard_normal((N, C, T, V)).astype(np.float32)

        logits, feat = stgcn_forward(params, jnp.asarray(x), jnp.asarray(A))

        # reference forward expects batch["output"] [N, V, C, T]
        batch = {"output": torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))}
        with torch.no_grad():
            out = ref(batch)
        np.testing.assert_allclose(
            np.asarray(feat), batch["features"].numpy(), atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(logits), batch["yhat"].numpy(), atol=2e-4
        )
