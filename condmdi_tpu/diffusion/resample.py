"""Timestep schedule samplers (uniform + loss-second-moment importance).

Parity: reference diffusion/resample.py — UniformSampler:61,
LossSecondMomentResampler:124 (history of 10 per-timestep losses; weights
∝ sqrt(E[loss²]) mixed with uniform_prob=0.001; uniform until warmed up).

The reference's dead `dist.all_gather` path (resample.py:87-99, never
reachable — process groups are never initialized) is replaced by nothing:
under SPMD the per-device batch losses are already globally visible after
the psum in the train step, so the history update is a plain in-graph
scatter carried in TrainState.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp

Array = jax.Array


def uniform_sample_t(key: Array, batch: int, num_timesteps: int):
    """UniformSampler.sample: (t [B], weights [B]=1)."""
    t = jax.random.randint(key, (batch,), 0, num_timesteps)
    return t, jnp.ones((batch,), jnp.float32)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class LossAwareState:
    """Rolling per-timestep loss history for importance sampling."""

    history: Array  # [T, K] float32
    counts: Array  # [T] int32
    history_per_term: int = field(metadata=dict(static=True), default=10)
    uniform_prob: float = field(metadata=dict(static=True), default=0.001)

    @classmethod
    def create(cls, num_timesteps: int, history_per_term: int = 10, uniform_prob: float = 0.001):
        return cls(
            history=jnp.zeros((num_timesteps, history_per_term), jnp.float32),
            counts=jnp.zeros((num_timesteps,), jnp.int32),
            history_per_term=history_per_term,
            uniform_prob=uniform_prob,
        )

    def weights(self) -> Array:
        """Per-timestep sampling weights (reference :141-149)."""
        warmed = jnp.all(self.counts == self.history_per_term)
        w = jnp.sqrt(jnp.mean(self.history**2, axis=-1))
        w = w / jnp.maximum(jnp.sum(w), 1e-12)
        w = w * (1 - self.uniform_prob) + self.uniform_prob / self.history.shape[0]
        uniform = jnp.full((self.history.shape[0],), 1.0 / self.history.shape[0])
        return jnp.where(warmed, w, uniform)

    def sample(self, key: Array, batch: int):
        w = self.weights()
        t = jax.random.choice(key, w.shape[0], (batch,), p=w)
        weights = 1.0 / (w.shape[0] * w[t])
        return t, weights.astype(jnp.float32)

    def update(self, ts: Array, losses: Array) -> "LossAwareState":
        """Record per-sample losses at their timesteps (FIFO per term).

        Matches reference update_with_all_losses:152: when a term's history
        is full, shift-left and append; else append at the open slot.
        """
        K = self.history_per_term

        def one(carry, tl):
            hist, cnt = carry
            t, loss = tl
            full = cnt[t] == K
            row = hist[t]
            shifted = jnp.concatenate([row[1:], jnp.asarray([loss])])
            appended = row.at[jnp.minimum(cnt[t], K - 1)].set(loss)
            new_row = jnp.where(full, shifted, appended)
            hist = hist.at[t].set(new_row)
            cnt = cnt.at[t].set(jnp.minimum(cnt[t] + 1, K))
            return (hist, cnt), None

        (hist, cnt), _ = jax.lax.scan(
            one, (self.history, self.counts), (ts, losses)
        )
        return LossAwareState(hist, cnt, self.history_per_term, self.uniform_prob)


def create_named_schedule_sampler(name: str, num_timesteps: int):
    """'uniform' → None (use uniform_sample_t); 'loss-second-moment' → state."""
    if name == "uniform":
        return None
    if name == "loss-second-moment":
        return LossAwareState.create(num_timesteps)
    raise NotImplementedError(f"unknown schedule sampler: {name}")
