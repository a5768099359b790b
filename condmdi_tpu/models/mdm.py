"""MDM transformer denoiser in Flax (features-last, batch-first).

Architecture parity with reference model/mdm.py:10 (MDM):
  * InputProcess: Dense F→D                       (mdm.py:356)
  * prepend conditioning token = timestep-emb + text/action emb  (:239-264)
  * sinusoidal positional encoding over [cond, frames]           (:275)
  * N post-LN transformer encoder layers (torch TransformerEncoderLayer
    semantics: x = LN(x + Attn(x)); x = LN(x + FFN(x)), gelu)    (:108-117)
  * OutputProcess: Dense D→F                      (mdm.py:397)

Differences by design (TPU-first):
  * layout [B, T, F] (batch leading; lane dim = features) instead of
    [T, B, F] seq-first torch convention;
  * text conditioning consumes a precomputed CLIP embedding [B, 512]
    (`y['text_embed']`) — CLIP weights are frozen and stripped from
    reference checkpoints anyway (training_loop.py:404-410); a JAX text
    encoder lives in models/text.py;
  * classifier-free cond dropout uses an explicit rng collection;
  * attention runs through ops/attention.py (Pallas kernel on TPU, XLA
    fallback elsewhere).

arch variants: trans_enc (default), trans_dec (cross-attends to the cond
token), gru (LSTM-free scan GRU).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from condmdi_tpu.models.embeddings import (
    EmbedAction,
    PositionalEncoding,
    TimestepEmbedder,
)
from condmdi_tpu.ops.attention import mha, multihead_attention

Array = jax.Array


class QDense(nn.Module):
    """Dense with a precision switch; param layout identical to nn.Dense
    so checkpoints serve both modes (cf. QConv in models/unet.py)."""

    features: int
    precision_mode: str = "float"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (x.shape[-1], self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if self.precision_mode == "int8":
            from condmdi_tpu.ops.quant import int8_matmul

            return int8_matmul(x, kernel, bias).astype(x.dtype)
        return x @ kernel.astype(x.dtype) + bias.astype(x.dtype)


class TransformerEncoderLayer(nn.Module):
    """Post-LN encoder layer matching torch.nn.TransformerEncoderLayer."""

    d_model: int
    num_heads: int
    ff_size: int
    dropout: float = 0.1
    activation: str = "gelu"
    precision_mode: str = "float"

    @nn.compact
    def __call__(self, x: Array, *, deterministic: bool = True) -> Array:
        # self-attention block
        attn_out = multihead_attention(
            QDense(3 * self.d_model, self.precision_mode, name="qkv")(x),
            num_heads=self.num_heads,
        )
        attn_out = QDense(self.d_model, self.precision_mode, name="attn_out")(attn_out)
        attn_out = nn.Dropout(self.dropout)(attn_out, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x + attn_out)
        # feed-forward block
        h = QDense(self.ff_size, self.precision_mode, name="ff1")(x)
        h = nn.gelu(h, approximate=False) if self.activation == "gelu" else nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = QDense(self.d_model, self.precision_mode, name="ff2")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(x + h)


class TransformerDecoderLayer(nn.Module):
    """Post-LN decoder layer (self-attn + cross-attn to memory)."""

    d_model: int
    num_heads: int
    ff_size: int
    dropout: float = 0.1
    activation: str = "gelu"

    @nn.compact
    def __call__(self, x: Array, memory: Array, *, deterministic: bool = True) -> Array:
        sa = multihead_attention(
            nn.Dense(3 * self.d_model, name="qkv")(x), num_heads=self.num_heads
        )
        sa = nn.Dense(self.d_model, name="attn_out")(sa)
        sa = nn.Dropout(self.dropout)(sa, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x + sa)

        q = nn.Dense(self.d_model, name="q_proj")(x)
        kv = nn.Dense(2 * self.d_model, name="kv_proj")(memory)
        k, v = jnp.split(kv, 2, axis=-1)
        ca = mha(q, k, v, num_heads=self.num_heads)
        ca = nn.Dense(self.d_model, name="cross_out")(ca)
        ca = nn.Dropout(self.dropout)(ca, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, name="norm2")(x + ca)

        h = nn.Dense(self.ff_size, name="ff1")(x)
        h = nn.gelu(h, approximate=False) if self.activation == "gelu" else nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.d_model, name="ff2")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, name="norm3")(x + h)


def cal_multiple(n: int, multiple: int) -> int:
    """Round n up to the next multiple (reference model/mdm.py:426)."""
    return n if n % multiple == 0 else (n // multiple + 1) * multiple


def _interleave_channels(a: Array, b: Array, groups: int) -> Array:
    """Per-group channel-block interleave (reference model/mdm.py:436,
    `interleave`): group g of the result is [a's block g, b's block g].
    Channels-last equivalent of the torch reshape→concat→reshape trick."""
    B, T, Ca = a.shape
    Cb = b.shape[-1]
    a = a.reshape(B, T, groups, Ca // groups)
    b = b.reshape(B, T, groups, Cb // groups)
    return jnp.concatenate([a, b], axis=-1).reshape(B, T, Ca + Cb)


class OutputProcessLarge(nn.Module):
    """Grouped-conv output head (reference model/mdm.py:455, the hard-coded
    large_out_type=4 branch), selected by arch='*_large' (reference :151-158).

    Combines the transformer latent with a skip connection from the raw
    input features through per-feature grouped convs: both paths are
    widened ×out_mult with feature_group_count=input_feats, interleaved
    per feature group, then reduced back to input_feats. Dead experimental
    variant upstream; kept for arch/checkpoint compatibility.
    """

    input_feats: int
    latent_dim: int
    out_mult: int = 1

    @nn.compact
    def __call__(self, out: Array, skip: Array) -> Array:
        from condmdi_tpu.models.unet import mish

        F_, D, m = self.input_feats, self.latent_dim, self.out_mult
        skip = nn.Conv(
            m * F_, (5,), padding=2, feature_group_count=F_, name="skip_conv"
        )(skip)
        latent_in = cal_multiple(D, F_)
        h = out
        if D != latent_in:
            h = nn.Conv(latent_in, (1,), name="latent_proj")(h)
        h = nn.Conv(
            m * latent_in, (5,), padding=2, feature_group_count=F_,
            name="latent_conv",
        )(h)
        c = _interleave_channels(h, skip, F_)
        c = nn.Conv(
            m * F_, (5,), padding=2, feature_group_count=F_, name="final_conv1"
        )(c)
        c = mish(c)
        return nn.Conv(F_, (1,), feature_group_count=F_, name="final_conv2")(c)


class MDM(nn.Module):
    """Motion Diffusion Model transformer denoiser."""

    njoints: int = 263
    nfeats: int = 1
    latent_dim: int = 512
    ff_size: int = 1024
    num_layers: int = 8
    num_heads: int = 4
    dropout: float = 0.1
    activation: str = "gelu"
    data_rep: str = "hml_vec"
    clip_dim: int = 512
    arch: str = "trans_enc"
    emb_trans_dec: bool = False
    cond_mode: str = "text"  # 'text' | 'action' | 'no_cond'
    cond_mask_prob: float = 0.1
    num_actions: int = 1
    precision_mode: str = "float"  # 'float' | 'int8' serving path
    out_mult: int = 1  # OutputProcessLarge width multiplier (arch='*_large')

    @property
    def input_feats(self) -> int:
        return self.njoints * self.nfeats

    def mask_cond(self, cond: Array, force_mask, train: bool) -> Array:
        """Classifier-free guidance dropout (reference mask_cond:188).

        force_mask: python bool or [B] bool array — zeroes the condition.
        """
        if isinstance(force_mask, bool):
            if force_mask:
                return jnp.zeros_like(cond)
        else:
            cond = jnp.where(force_mask[:, None], 0.0, cond)
        if train and self.cond_mask_prob > 0.0:
            rng = self.make_rng("cond_mask")
            keep = jax.random.bernoulli(
                rng, 1.0 - self.cond_mask_prob, (cond.shape[0], 1)
            )
            cond = cond * keep.astype(cond.dtype)
        return cond

    @nn.compact
    def __call__(
        self,
        x: Array,  # [B, T, F]
        timesteps: Array,  # [B] int
        y: Optional[dict[str, Any]] = None,
        train: bool = False,
    ) -> Array:
        y = y or {}
        B, T, F = x.shape
        emb = TimestepEmbedder(self.latent_dim, name="embed_timestep")(timesteps)

        force_mask = y.get("uncond", False)
        if "text" in self.cond_mode and "text_embed" in y:
            enc_text = y["text_embed"].astype(x.dtype)
            emb = emb + nn.Dense(self.latent_dim, name="embed_text")(
                self.mask_cond(enc_text, force_mask, train)
            )
        if "action" in self.cond_mode and "action" in y:
            act = EmbedAction(self.num_actions, self.latent_dim, name="embed_action")(
                y["action"]
            )
            emb = emb + self.mask_cond(act, force_mask, train)

        h = nn.Dense(self.latent_dim, name="input_process")(x)  # [B, T, D]

        if self.arch.startswith("trans_enc"):
            xseq = jnp.concatenate([emb[:, None, :], h], axis=1)  # [B, T+1, D]
            xseq = PositionalEncoding(
                self.latent_dim, self.dropout, name="pos_enc"
            )(xseq, deterministic=not train)
            for i in range(self.num_layers):
                xseq = TransformerEncoderLayer(
                    self.latent_dim,
                    self.num_heads,
                    self.ff_size,
                    self.dropout,
                    self.activation,
                    precision_mode=self.precision_mode,
                    name=f"layer{i}",
                )(xseq, deterministic=not train)
            out = xseq[:, 1:, :]
        elif self.arch.startswith("trans_dec"):
            memory = emb[:, None, :]
            if self.emb_trans_dec:
                xseq = jnp.concatenate([memory, h], axis=1)
            else:
                xseq = h
            xseq = PositionalEncoding(
                self.latent_dim, self.dropout, name="pos_enc"
            )(xseq, deterministic=not train)
            for i in range(self.num_layers):
                xseq = TransformerDecoderLayer(
                    self.latent_dim,
                    self.num_heads,
                    self.ff_size,
                    self.dropout,
                    self.activation,
                    name=f"layer{i}",
                )(xseq, memory, deterministic=not train)
            out = xseq[:, 1:, :] if self.emb_trans_dec else xseq
        elif self.arch.startswith("gru"):
            xseq = PositionalEncoding(
                self.latent_dim, self.dropout, name="pos_enc"
            )(h, deterministic=not train)
            x_rnn = xseq
            for i in range(self.num_layers):
                cell = nn.GRUCell(features=self.latent_dim)
                x_rnn = nn.RNN(cell, name=f"gru{i}")(x_rnn)
            out = x_rnn
        else:
            raise ValueError(f"unknown arch {self.arch}")

        if self.arch.endswith("_large"):  # reference mdm.py:151-158
            return OutputProcessLarge(
                self.input_feats, self.latent_dim, self.out_mult,
                name="output_process_large",
            )(out, x)
        return nn.Dense(self.input_feats, name="output_process")(out)  # [B, T, F]
