"""Action-to-motion evaluation (reference eval/eval_humanact12_uestc.py:18,
eval/a2m/gru_eval.py + action2motion GRU classifier).

Metrics: recognition accuracy, FID over classifier features, diversity,
multimodality — computed from a GRU action-recognition model (the reference
downloads `humanact12_gru.tar`; `A2MClassifier.from_torch_checkpoint`
converts it, `random_init` keeps the pipeline runnable without assets).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from condmdi_tpu.evals import metrics as M
from condmdi_tpu.evals.evaluator import gru_scan

Array = jax.Array


class A2MClassifier:
    """GRU recognition model: motion [B,T,F] → (logits, features)."""

    def __init__(self, params: dict):
        self.params = params
        self._fwd = jax.jit(self._forward)

    def _forward(self, motion: Array, lengths: Array):
        p = self.params
        h = motion @ p["input_emb"]["kernel"] + p["input_emb"]["bias"]
        B, H = h.shape[0], p["h0"].shape[-1]
        h0 = jnp.broadcast_to(p["h0"][0], (B, H))
        feat = gru_scan(h, lengths, p["gru"], h0)
        logits = feat @ p["out"]["kernel"] + p["out"]["bias"]
        return logits, feat

    def __call__(self, motion, lengths):
        logits, feat = self._fwd(jnp.asarray(motion), jnp.asarray(lengths))
        return np.asarray(logits), np.asarray(feat)

    @classmethod
    def random_init(cls, input_dim: int = 150, hidden: int = 128,
                    num_actions: int = 12, seed: int = 0) -> "A2MClassifier":
        rng = np.random.default_rng(seed)

        def dense(i, o):
            return {"kernel": rng.normal(0, 0.05, (i, o)).astype(np.float32),
                    "bias": np.zeros(o, np.float32)}

        params = {
            "input_emb": dense(input_dim, hidden),
            "gru": {
                "wi": rng.normal(0, 0.05, (3 * hidden, hidden)).astype(np.float32),
                "wh": rng.normal(0, 0.05, (3 * hidden, hidden)).astype(np.float32),
                "bi": np.zeros(3 * hidden, np.float32),
                "bh": np.zeros(3 * hidden, np.float32),
            },
            "h0": rng.normal(0, 1, (1, hidden)).astype(np.float32),
            "out": dense(hidden, num_actions),
        }
        return cls(params)

    @classmethod
    def from_torch_checkpoint(cls, path: str) -> "A2MClassifier":
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(sd, dict) and "model" in sd:
            sd = sd["model"]
        npy = lambda t: t.detach().cpu().numpy()
        params = {
            "input_emb": {"kernel": npy(sd["embedding.weight"]).T,
                          "bias": npy(sd["embedding.bias"])},
            "gru": {
                "wi": npy(sd["gru.weight_ih_l0"]),
                "wh": npy(sd["gru.weight_hh_l0"]),
                "bi": npy(sd["gru.bias_ih_l0"]),
                "bh": npy(sd["gru.bias_hh_l0"]),
            },
            "h0": np.zeros((1, sd["gru.weight_hh_l0"].shape[1]), np.float32),
            "out": {"kernel": npy(sd["out.weight"]).T, "bias": npy(sd["out.bias"])},
        }
        return cls(params)


class STGCNClassifier:
    """ST-GCN recognition wrapper (UESTC path; reference stgcn_eval.py).

    motion arrives as [B, T, 25, 6] rot6d a2m features; the network consumes
    quaternion/rot6d joints [B, C, T, V] per its checkpoint's in_channels.
    """

    def __init__(self, params: dict, layout: str = "smpl_noglobal",
                 strategy: str = "spatial"):
        from condmdi_tpu.evals.stgcn import build_graph, stgcn_forward

        self.params = params
        self.A = jnp.asarray(build_graph(layout, strategy))
        self._fwd = jax.jit(lambda x: stgcn_forward(self.params, x, self.A))

    def __call__(self, motion, lengths=None):
        """motion [B, T, V, C] → (logits, features) numpy."""
        x = jnp.transpose(jnp.asarray(motion), (0, 3, 1, 2))  # [B, C, T, V]
        logits, feat = self._fwd(x)
        return np.asarray(logits), np.asarray(feat)

    @classmethod
    def from_torch_checkpoint(cls, path: str, **kw) -> "STGCNClassifier":
        import torch

        from condmdi_tpu.evals.stgcn import convert_stgcn_state_dict

        sd = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(sd, dict) and "model" in sd:
            sd = sd["model"]
        return cls(convert_stgcn_state_dict(sd), **kw)

    @classmethod
    def random_init(cls, in_channels: int = 6, num_class: int = 12,
                    layout: str = "smpl", strategy: str = "spatial",
                    seed: int = 0) -> "STGCNClassifier":
        """Asset-free fallback (relative comparisons only)."""
        from condmdi_tpu.evals.stgcn import build_graph, random_params

        A = build_graph(layout, strategy)
        return cls(
            random_params(in_channels, num_class, A.shape[-1], A.shape[0], seed),
            layout=layout, strategy=strategy,
        )


def evaluate_a2m(
    classifier: A2MClassifier,
    gt_motions: np.ndarray,
    gt_lengths: np.ndarray,
    gt_actions: np.ndarray,
    gen_motions: np.ndarray,
    gen_lengths: np.ndarray,
    gen_actions: np.ndarray,
    diversity_times: int = 20,
    rng=None,
) -> dict:
    """Accuracy / FID / diversity (reference gru_eval.py protocol)."""
    rng = rng or np.random.default_rng(0)
    logits_gen, feat_gen = classifier(gen_motions, gen_lengths)
    _, feat_gt = classifier(gt_motions, gt_lengths)

    accuracy = float((logits_gen.argmax(axis=1) == gen_actions).mean())
    mu_gt, cov_gt = M.calculate_activation_statistics(feat_gt)
    mu_gen, cov_gen = M.calculate_activation_statistics(feat_gen)
    fid = M.calculate_frechet_distance(mu_gt, cov_gt, mu_gen, cov_gen)
    dt = min(diversity_times, len(feat_gen) - 1)
    diversity = M.calculate_diversity(feat_gen, dt, rng=rng)
    return dict(accuracy=accuracy, fid=fid, diversity=float(diversity))
