"""DiT-style denoisers with adaLN(-Zero) conditioning, in Flax.

Parity target: reference model/mdm_dit.py:339 (MDM_DiT) and its block zoo —
DiTBlockPreNorm / DiTBlockPostNorm (:480) / DiTBlockConcat (:17) /
DiTBlockConcatV2 (:85, also the v3 wiring and the `scale`-only option) —
plus the optional two-head (eps + x0) output (:560-577).

Structure per variant (arch dispatch mirrors :416-470):
  dit_prenorm    adaLN-Zero pre-norm blocks, final norm before prediction
  dit_postnorm   post-norm blocks (torch TransformerEncoderLayer style)
  dit_concat     skip-concat input modulation blocks + final norm + skip out
  dit_concatv2   skip concat inside the MLP, no final norm, skip out
  dit_concatv3   v2 blocks without output-module skip
  *_scale        scale-only modulation (no shifts)
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from condmdi_tpu.models.embeddings import (
    EmbedAction,
    PositionalEncoding,
    TimestepEmbedder,
)
from condmdi_tpu.ops.attention import mha

Array = jax.Array


def modulate(x: Array, shift: Optional[Array], scale: Array) -> Array:
    out = x * (1 + scale)
    return out + shift if shift is not None else out


class AdaLN(nn.Module):
    """SiLU → zero-init Dense producing n_chunks modulation tensors."""

    d_model: int
    n_chunks: int

    @nn.compact
    def __call__(self, c: Array) -> tuple[Array, ...]:
        h = nn.silu(c)
        h = nn.Dense(
            self.n_chunks * self.d_model,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="mod",
        )(h)
        return tuple(jnp.split(h[:, None, :], self.n_chunks, axis=-1))


class _Attn(nn.Module):
    d_model: int
    num_heads: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        qkv = nn.Dense(3 * self.d_model, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        out = mha(q, k, v, num_heads=self.num_heads)
        return nn.Dense(self.d_model, name="out")(out)


class _MLP(nn.Module):
    d_model: int
    ff_size: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        h = nn.Dense(self.ff_size, name="fc1")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.Dense(self.d_model, name="fc2")(h)


class DiTBlockPreNorm(nn.Module):
    d_model: int
    num_heads: int
    ff_size: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, c, skip=None, *, deterministic=True):
        sh_a, sc_a, g_a, sh_m, sc_m, g_m = AdaLN(self.d_model, 6, name="adaln")(c)
        h = modulate(nn.LayerNorm(epsilon=1e-5, use_bias=False, use_scale=False, name="norm1")(x), sh_a, sc_a)
        x = x + g_a * _Attn(self.d_model, self.num_heads, name="attn")(h)
        h = modulate(nn.LayerNorm(epsilon=1e-5, use_bias=False, use_scale=False, name="norm2")(x), sh_m, sc_m)
        x = x + g_m * _MLP(self.d_model, self.ff_size, self.dropout, name="mlp")(h, deterministic)
        return x


class DiTBlockPostNorm(nn.Module):
    d_model: int
    num_heads: int
    ff_size: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, c, skip=None, *, deterministic=True):
        sh_a, sc_a, g_a, sh_m, sc_m, g_m = AdaLN(self.d_model, 6, name="adaln")(c)
        x = x + g_a * _Attn(self.d_model, self.num_heads, name="attn")(x)
        x = modulate(nn.LayerNorm(epsilon=1e-5, name="norm1")(x), sh_a, sc_a)
        x = x + g_m * _MLP(self.d_model, self.ff_size, self.dropout, name="mlp")(x, deterministic)
        x = modulate(nn.LayerNorm(epsilon=1e-5, name="norm2")(x), sh_m, sc_m)
        return x


class DiTBlockConcat(nn.Module):
    """Skip-concat input modulation (reference DiTBlockConcat:17)."""

    d_model: int
    num_heads: int
    ff_size: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, c, skip, *, deterministic=True):
        sc0, sc1, sh_a, sc_a, g_a, g_m = AdaLN(self.d_model, 6, name="adaln")(c)
        h = jnp.concatenate([x, skip], axis=-1)
        h = modulate(
            nn.LayerNorm(epsilon=1e-5, name="norm0")(h), None, jnp.concatenate([sc0, sc1], axis=-1)
        )
        h = nn.Dense(self.d_model, name="linear0")(h)
        h = h + g_a * _Attn(self.d_model, self.num_heads, name="attn")(h)
        h = modulate(nn.LayerNorm(epsilon=1e-5, name="norm1")(h), sh_a, sc_a)
        h = h + g_m * _MLP(self.d_model, self.ff_size, self.dropout, name="mlp")(h, deterministic)
        return h


class DiTBlockConcatV2(nn.Module):
    """Skip concat inside the MLP (reference DiTBlockConcatV2:85)."""

    d_model: int
    num_heads: int
    ff_size: int
    dropout: float = 0.1
    scale_only: bool = False

    @nn.compact
    def __call__(self, x, c, skip, *, deterministic=True):
        if self.scale_only:
            sc_a, g_a, sc_m, g_m = AdaLN(self.d_model, 4, name="adaln")(c)
            sh_a = sh_m = None
        else:
            sh_a, sc_a, g_a, sh_m, sc_m, g_m = AdaLN(self.d_model, 6, name="adaln")(c)
        x = x + g_a * _Attn(self.d_model, self.num_heads, name="attn")(x)
        x = modulate(nn.LayerNorm(epsilon=1e-5, name="norm1")(x), sh_a, sc_a)
        h = jnp.concatenate([x, skip], axis=-1)
        h = nn.Dense(self.ff_size, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.d_model, name="fc2")(h)
        x = x + g_m * h
        x = modulate(nn.LayerNorm(epsilon=1e-5, name="norm2")(x), sh_m, sc_m)
        return x


class DiTOutput(nn.Module):
    """Final prediction head with optional norm / adaLN / skip concat."""

    out_feats: int
    d_model: int
    norm: bool = False
    skip: bool = False
    scale_only: bool = False

    @nn.compact
    def __call__(self, x, c, skip=None):
        if self.skip and skip is not None:
            x = jnp.concatenate([x, skip], axis=-1)
        if self.norm:
            if self.scale_only:
                (scale,) = AdaLN(x.shape[-1], 1, name="adaln")(c)
                shift = None
            else:
                shift, scale = AdaLN(x.shape[-1], 2, name="adaln")(c)
            x = modulate(
                nn.LayerNorm(epsilon=1e-5, use_bias=False, use_scale=False, name="norm")(x),
                shift, scale,
            )
        return nn.Dense(
            self.out_feats,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="proj",
        )(x)


_BLOCKS = {
    "dit_prenorm": (DiTBlockPreNorm, dict(final_norm=True, use_skip=False)),
    "dit_postnorm": (DiTBlockPostNorm, dict(final_norm=False, use_skip=False)),
    "dit_concatv2": (DiTBlockConcatV2, dict(final_norm=False, use_skip=True)),
    "dit_concatv3": (DiTBlockConcatV2, dict(final_norm=False, use_skip=False)),
    "dit_concat": (DiTBlockConcat, dict(final_norm=True, use_skip=True)),
}


def _dispatch(arch: str):
    # longest-prefix match; 'dit' alone → prenorm (canonical DiT)
    for key in ("dit_concatv2", "dit_concatv3", "dit_concat", "dit_prenorm", "dit_postnorm"):
        if arch.startswith(key):
            return key, *_BLOCKS[key]
    return "dit_prenorm", *_BLOCKS["dit_prenorm"]


class MDM_DiT(nn.Module):
    njoints: int = 263
    nfeats: int = 1
    latent_dim: int = 512
    ff_size: int = 1024
    num_layers: int = 8
    num_heads: int = 4
    dropout: float = 0.1
    clip_dim: int = 512
    arch: str = "dit_prenorm"
    cond_mode: str = "text"
    cond_mask_prob: float = 0.1
    num_actions: int = 1
    two_head: bool = False

    @property
    def input_feats(self):
        return self.njoints * self.nfeats

    def mask_cond(self, cond, force_mask, train: bool):
        if isinstance(force_mask, bool):
            if force_mask:
                return jnp.zeros_like(cond)
        else:
            cond = jnp.where(force_mask[:, None], 0.0, cond)
        if train and self.cond_mask_prob > 0.0:
            rng = self.make_rng("cond_mask")
            keep = jax.random.bernoulli(rng, 1.0 - self.cond_mask_prob, (cond.shape[0], 1))
            cond = cond * keep.astype(cond.dtype)
        return cond

    @nn.compact
    def __call__(self, x, timesteps, y=None, train: bool = False):
        y = y or {}
        key, block_cls, wiring = _dispatch(self.arch)
        scale_only = "scale" in self.arch

        emb = TimestepEmbedder(self.latent_dim, name="embed_timestep")(timesteps)
        force_mask = y.get("uncond", False)
        if "text" in self.cond_mode and "text_embed" in y:
            emb = emb + nn.Dense(self.latent_dim, name="embed_text")(
                self.mask_cond(y["text_embed"].astype(x.dtype), force_mask, train)
            )
        if "action" in self.cond_mode and "action" in y:
            emb = emb + self.mask_cond(
                EmbedAction(self.num_actions, self.latent_dim, name="embed_action")(y["action"]),
                force_mask, train,
            )

        h = nn.Dense(self.latent_dim, name="input_process")(x)
        h = PositionalEncoding(self.latent_dim, self.dropout, name="pos_enc")(
            h, deterministic=not train
        )
        skip = h
        for i in range(self.num_layers):
            kwargs = dict(deterministic=not train)
            if block_cls is DiTBlockConcatV2:
                blk = block_cls(
                    self.latent_dim, self.num_heads, self.ff_size, self.dropout,
                    scale_only=scale_only, name=f"block{i}",
                )
            else:
                blk = block_cls(
                    self.latent_dim, self.num_heads, self.ff_size, self.dropout,
                    name=f"block{i}",
                )
            h = blk(h, emb, skip, **kwargs)

        out = DiTOutput(
            self.input_feats, self.latent_dim,
            norm=wiring["final_norm"], skip=wiring["use_skip"],
            scale_only=scale_only, name="output_process",
        )(h, emb, skip)
        if self.two_head:
            out2 = DiTOutput(
                self.input_feats, self.latent_dim,
                norm=wiring["final_norm"], skip=wiring["use_skip"],
                scale_only=scale_only, name="output_process2",
            )(h, emb, skip)
            return out, out2
        return out
