"""T2M co-embedding evaluator networks, JAX port with torch-exact math.

Parity targets: reference data_loaders/humanml/networks/modules.py —
MovementConvEncoder:79 (2× strided conv k4s2p1 + LeakyReLU(0.2) + Linear),
TextEncoderBiGRUCo:311 / MotionEncoderBiGRUCo:353 (bi-GRU with learnable
initial hidden, packed-sequence semantics = last VALID step per direction,
output MLP with LayerNorm), and evaluator_wrapper.py:121
(EvaluatorMDMWrapper.get_co_embeddings — including the sort-by-length-desc
quirk, :160-171).

Implemented as pure functions over a parameter pytree (not flax modules) so
the released `text_mot_match/model/finest.tar` torch weights convert 1:1 —
the GRU gate math replicates torch exactly:
  r = σ(W_ir x + b_ir + W_hr h + b_hr)
  z = σ(W_iz x + b_iz + W_hz h + b_hz)
  n = tanh(W_in x + b_in + r (W_hn h + b_hn))
  h' = (1 - z) n + z h
Packed sequences are replaced by masked carries inside a lax.scan — batch
stays un-sorted internally; the wrapper re-applies the reference's
permutation so outputs are bit-comparable.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

UNIT_LENGTH = 4


def leaky_relu(x, slope=0.2):
    return jnp.where(x >= 0, x, slope * x)


# --------------------------------------------------------------------------- #
# GRU (torch-exact), masked for variable lengths
# --------------------------------------------------------------------------- #
def gru_scan(x: Array, lengths: Array, p: dict, h0: Array, reverse: bool = False) -> Array:
    """x [B,T,D], lengths [B], params {wi [3H,D], wh [3H,H], bi [3H], bh [3H]},
    h0 [B,H] → final hidden at the last valid step [B,H]."""
    B, T, D = x.shape
    H = h0.shape[-1]
    wi, wh, bi, bh = p["wi"], p["wh"], p["bi"], p["bh"]

    if reverse:
        # per-sample reversal of the valid prefix: index len-1-t
        tidx = jnp.arange(T)[None, :]
        ridx = jnp.clip(lengths[:, None] - 1 - tidx, 0, T - 1)
        x = jnp.take_along_axis(x, ridx[..., None], axis=1)

    def step(h, inp):
        xt, t = inp
        gi = xt @ wi.T + bi  # [B, 3H]
        gh = h @ wh.T + bh
        i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        h_new = (1 - z) * n + z * h
        valid = (t < lengths)[:, None]
        return jnp.where(valid, h_new, h), None

    ts = jnp.arange(T)
    h_final, _ = jax.lax.scan(step, h0, (jnp.moveaxis(x, 0, 1), ts))
    return h_final


# --------------------------------------------------------------------------- #
# Network applications
# --------------------------------------------------------------------------- #
def movement_encode(params: dict, motion: Array) -> Array:
    """[B, T, 259] (features minus 4 contacts) → [B, T//4, 512]."""

    def conv(x, w, b):  # w [k, in, out] flax layout; stride 2, pad 1
        return (
            jax.lax.conv_general_dilated(
                x, w, window_strides=(2,), padding=[(1, 1)],
                dimension_numbers=("NWC", "WIO", "NWC"),
            )
            + b
        )

    h = conv(motion, params["conv1"]["kernel"], params["conv1"]["bias"])
    h = leaky_relu(h)
    h = conv(h, params["conv2"]["kernel"], params["conv2"]["bias"])
    h = leaky_relu(h)
    return h @ params["out"]["kernel"] + params["out"]["bias"]


def _bigru_co(params: dict, inputs: Array, lengths: Array) -> Array:
    B = inputs.shape[0]
    emb = inputs @ params["input_emb"]["kernel"] + params["input_emb"]["bias"]
    h0f = jnp.broadcast_to(params["h0"][0], (B, params["h0"].shape[-1]))
    h0b = jnp.broadcast_to(params["h0"][1], (B, params["h0"].shape[-1]))
    hf = gru_scan(emb, lengths, params["gru_f"], h0f, reverse=False)
    hb = gru_scan(emb, lengths, params["gru_b"], h0b, reverse=True)
    h = jnp.concatenate([hf, hb], axis=-1)
    h = h @ params["out1"]["kernel"] + params["out1"]["bias"]
    mean = h.mean(axis=-1, keepdims=True)
    var = jnp.var(h, axis=-1, keepdims=True)
    h = (h - mean) / jnp.sqrt(var + 1e-5)
    h = h * params["ln"]["scale"] + params["ln"]["bias"]
    h = leaky_relu(h)
    return h @ params["out2"]["kernel"] + params["out2"]["bias"]


def motion_encode(params: dict, movements: Array, m_lens: Array) -> Array:
    return _bigru_co(params, movements, m_lens)


def text_encode(params: dict, word_embs: Array, pos_onehot: Array, cap_lens: Array) -> Array:
    pos = pos_onehot @ params["pos_emb"]["kernel"] + params["pos_emb"]["bias"]
    return _bigru_co(params, word_embs + pos, cap_lens)


# --------------------------------------------------------------------------- #
# Wrapper (reference EvaluatorMDMWrapper:121)
# --------------------------------------------------------------------------- #
class EvaluatorWrapper:
    """Holds converted (or random) evaluator params; numpy in, numpy out."""

    def __init__(self, params: dict):
        self.params = params
        self._co = jax.jit(self._co_embeddings_impl)
        self._mo = jax.jit(self._motion_embeddings_impl)

    # -- impls ----------------------------------------------------------- #
    def _motion_embeddings_impl(self, motions, m_lens):
        movements = movement_encode(self.params["movement"], motions[..., :-4])
        return motion_encode(self.params["motion"], movements, m_lens // UNIT_LENGTH)

    def _co_embeddings_impl(self, word_embs, pos_ohot, cap_lens, motions, m_lens):
        motion_emb = self._motion_embeddings_impl(motions, m_lens)
        text_emb = text_encode(self.params["text"], word_embs, pos_ohot, cap_lens)
        return text_emb, motion_emb

    # -- public API (sort-by-length quirk preserved) ---------------------- #
    def get_co_embeddings(self, word_embs, pos_ohot, cap_lens, motions, m_lens):
        align_idx = np.argsort(np.asarray(m_lens))[::-1].copy()
        motions = jnp.asarray(np.asarray(motions)[align_idx])
        m_lens_s = jnp.asarray(np.asarray(m_lens)[align_idx])
        text_emb, motion_emb = self._co(
            jnp.asarray(word_embs), jnp.asarray(pos_ohot), jnp.asarray(cap_lens),
            motions, m_lens_s,
        )
        return np.asarray(text_emb)[align_idx], np.asarray(motion_emb)

    def get_motion_embeddings(self, motions, m_lens):
        align_idx = np.argsort(np.asarray(m_lens))[::-1].copy()
        motions = jnp.asarray(np.asarray(motions)[align_idx])
        m_lens_s = jnp.asarray(np.asarray(m_lens)[align_idx])
        return np.asarray(self._mo(motions, m_lens_s))

    # -- constructors ------------------------------------------------------ #
    @classmethod
    def random_init(cls, seed: int = 0, dim_pose: int = 263) -> "EvaluatorWrapper":
        """Random weights (pipeline tests / relative comparisons only)."""
        rng = np.random.default_rng(seed)
        H, E, W, P = 1024, 512, 300, 15

        def dense(i, o):
            return {
                "kernel": rng.normal(0, 0.02, (i, o)).astype(np.float32),
                "bias": np.zeros(o, np.float32),
            }

        def gru(i, h):
            return {
                "wi": rng.normal(0, 0.02, (3 * h, i)).astype(np.float32),
                "wh": rng.normal(0, 0.02, (3 * h, h)).astype(np.float32),
                "bi": np.zeros(3 * h, np.float32),
                "bh": np.zeros(3 * h, np.float32),
            }

        params = {
            "movement": {
                "conv1": {
                    "kernel": rng.normal(0, 0.02, (4, dim_pose - 4, E)).astype(np.float32),
                    "bias": np.zeros(E, np.float32),
                },
                "conv2": {
                    "kernel": rng.normal(0, 0.02, (4, E, E)).astype(np.float32),
                    "bias": np.zeros(E, np.float32),
                },
                "out": dense(E, E),
            },
            "motion": {
                "input_emb": dense(E, H),
                "gru_f": gru(H, H),
                "gru_b": gru(H, H),
                "h0": rng.normal(0, 1, (2, H)).astype(np.float32),
                "out1": dense(2 * H, H),
                "ln": {"scale": np.ones(H, np.float32), "bias": np.zeros(H, np.float32)},
                "out2": dense(H, E),
            },
            "text": {
                "pos_emb": dense(P, W),
                "input_emb": dense(W, E),
                "gru_f": gru(E, E),
                "gru_b": gru(E, E),
                "h0": rng.normal(0, 1, (2, E)).astype(np.float32),
                "out1": dense(2 * E, E),
                "ln": {"scale": np.ones(E, np.float32), "bias": np.zeros(E, np.float32)},
                "out2": dense(E, E),
            },
        }
        return cls(params)

    @classmethod
    def from_torch_checkpoint(cls, path: str) -> "EvaluatorWrapper":
        """Convert the reference `text_mot_match/model/finest.tar`."""
        import torch

        blob = torch.load(path, map_location="cpu", weights_only=False)

        def npy(t):
            return t.detach().cpu().numpy()

        def dense(sd, pre):
            return {"kernel": npy(sd[f"{pre}.weight"]).T, "bias": npy(sd[f"{pre}.bias"])}

        def gru_dir(sd, pre, suffix=""):
            return {
                "wi": npy(sd[f"{pre}.weight_ih_l0{suffix}"]),
                "wh": npy(sd[f"{pre}.weight_hh_l0{suffix}"]),
                "bi": npy(sd[f"{pre}.bias_ih_l0{suffix}"]),
                "bh": npy(sd[f"{pre}.bias_hh_l0{suffix}"]),
            }

        mov = blob["movement_encoder"]
        mot = blob["motion_encoder"]
        txt = blob["text_encoder"]
        params = {
            "movement": {
                "conv1": {
                    "kernel": np.transpose(npy(mov["main.0.weight"]), (2, 1, 0)),
                    "bias": npy(mov["main.0.bias"]),
                },
                "conv2": {
                    "kernel": np.transpose(npy(mov["main.3.weight"]), (2, 1, 0)),
                    "bias": npy(mov["main.3.bias"]),
                },
                "out": {"kernel": npy(mov["out_net.weight"]).T, "bias": npy(mov["out_net.bias"])},
            },
            "motion": {
                "input_emb": dense(mot, "input_emb"),
                "gru_f": gru_dir(mot, "gru"),
                "gru_b": gru_dir(mot, "gru", "_reverse"),
                "h0": npy(mot["hidden"])[:, 0, :],
                "out1": dense(mot, "output_net.0"),
                "ln": {"scale": npy(mot["output_net.1.weight"]), "bias": npy(mot["output_net.1.bias"])},
                "out2": dense(mot, "output_net.3"),
            },
            "text": {
                "pos_emb": dense(txt, "pos_emb"),
                "input_emb": dense(txt, "input_emb"),
                "gru_f": gru_dir(txt, "gru"),
                "gru_b": gru_dir(txt, "gru", "_reverse"),
                "h0": npy(txt["hidden"])[:, 0, :],
                "out1": dense(txt, "output_net.0"),
                "ln": {"scale": npy(txt["output_net.1.weight"]), "bias": npy(txt["output_net.1.bias"])},
                "out2": dense(txt, "output_net.3"),
            },
        }
        return cls(params)
