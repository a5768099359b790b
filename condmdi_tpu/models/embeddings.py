"""Shared embedding components (sinusoidal tables, timestep MLP).

Parity: reference model/mdm.py PositionalEncoding:317 (sin/cos table, the
same table doubles as the timestep-embedding input) and TimestepEmbedder:338
(pe[t] → Linear→SiLU→Linear).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def sinusoidal_table(max_len: int, d_model: int, dtype=np.float32) -> np.ndarray:
    """Classic transformer sin/cos table, shape (max_len, d_model)."""
    pe = np.zeros((max_len, d_model), dtype=np.float64)
    position = np.arange(0, max_len, dtype=np.float64)[:, None]
    div_term = np.exp(np.arange(0, d_model, 2, dtype=np.float64) * (-np.log(10000.0) / d_model))
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe.astype(dtype)


def timestep_embedding(timesteps: Array, dim: int, max_period: int = 10000) -> Array:
    """Guided-diffusion style sinusoidal timestep embedding
    (reference diffusion/nn.py:110): [cos|sin] halves over log-spaced
    frequencies. Distinct from the transformer PE table used by MDM's
    TimestepEmbedder — both exist in the reference; both are provided."""
    half = dim // 2
    freqs = jnp.exp(
        -np.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class PositionalEncoding(nn.Module):
    """Adds the sinusoidal table over the time axis of [B, T, D] input."""

    d_model: int
    dropout: float = 0.1
    max_len: int = 5000

    @nn.compact
    def __call__(self, x: Array, *, deterministic: bool = True) -> Array:
        pe = jnp.asarray(sinusoidal_table(self.max_len, self.d_model), x.dtype)
        x = x + pe[None, : x.shape[1], :]
        if self.dropout > 0.0:
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class TimestepEmbedder(nn.Module):
    """t -> MLP(pe[t]): Linear(D,D) → SiLU → Linear(D,D). Output [B, D]."""

    latent_dim: int
    max_len: int = 5000

    @nn.compact
    def __call__(self, timesteps: Array) -> Array:
        pe = jnp.asarray(sinusoidal_table(self.max_len, self.latent_dim))
        h = pe[timesteps]
        h = nn.Dense(self.latent_dim, name="fc1")(h)
        h = nn.silu(h)
        h = nn.Dense(self.latent_dim, name="fc2")(h)
        return h


class EmbedAction(nn.Module):
    """Action-id → learned embedding row (reference mdm.py:594)."""

    num_actions: int
    latent_dim: int

    @nn.compact
    def __call__(self, action_ids: Array) -> Array:
        table = self.param(
            "action_embedding",
            nn.initializers.normal(stddev=1.0),
            (self.num_actions, self.latent_dim),
        )
        return table[action_ids.reshape(-1).astype(jnp.int32)]
