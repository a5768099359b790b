"""Multi-head attention: fused Pallas TPU kernel + XLA fallback.

The MDM encoder attends over ≤225 tokens (196/224 frames + 1 cond token,
reference mdm.py:273-284) with head_dim 128 (latent 512 / 4 heads). At this
size the whole (padded) sequence fits comfortably in VMEM, so the kernel is
a single-block fused softmax(QK^T)V per (batch × head) grid cell — no
flash-attention tiling needed; scores never round-trip to HBM. Padding
lanes are masked with -inf before the softmax.

`multihead_attention(qkv, num_heads)` consumes the fused QKV projection
[B, T, 3D] (packed q|k|v) and returns [B, T, D].
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# --------------------------------------------------------------------------- #
# Pallas kernel
# --------------------------------------------------------------------------- #
def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, true_len: int, scale: float):
    """One (batch, head) cell: q,k,v [Tp, Dp] f32 in VMEM → o [Tp, Dp]."""
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    scores = jax.lax.dot_general(
        q * scale,
        k,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [Tp, Tp]
    Tp = scores.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, dimension=1)
    scores = jnp.where(col < true_len, scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)
    o_ref[0, 0] = jnp.dot(probs, v, preferred_element_type=jnp.float32).astype(
        o_ref.dtype
    )


def _pallas_self_attention(q: Array, k: Array, v: Array, num_heads: int) -> Array:
    """q,k,v: [B, T, D] (self-attention, same length). Returns [B, T, D].

    Grid is 2-D (batch, head) — a flat 1-D grid of B·H cells faulted in the
    Mosaic runtime at 1024 cells on v5e; the 2-D layout is also friendlier
    to the pipeline's block prefetcher.
    """
    B, T, D = q.shape
    hd = D // num_heads
    Tp = _round_up(T, 128)
    hdp = _round_up(hd, 128)

    def split_heads(x):
        x = x.reshape(B, T, num_heads, hd).transpose(0, 2, 1, 3)
        return jnp.pad(x, ((0, 0), (0, 0), (0, Tp - T), (0, hdp - hd)))

    qh, kh, vh = split_heads(q), split_heads(k), split_heads(v)  # [B,H,Tp,hdp]

    grid = (B, num_heads)
    spec = pl.BlockSpec(
        (1, 1, Tp, hdp), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        partial(_attn_kernel, true_len=T, scale=1.0 / np.sqrt(hd)),
        out_shape=jax.ShapeDtypeStruct((B, num_heads, Tp, hdp), q.dtype),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
    )(qh, kh, vh)

    out = out[:, :, :T, :hd].transpose(0, 2, 1, 3)
    return out.reshape(B, T, D)


# --------------------------------------------------------------------------- #
# XLA fallback (CPU tests, odd shapes)
# --------------------------------------------------------------------------- #
def _xla_attention(
    q: Array, k: Array, v: Array, num_heads: int, causal: bool = False
) -> Array:
    B, Tq, D = q.shape
    Tk = k.shape[1]
    hd = D // num_heads
    qh = q.reshape(B, Tq, num_heads, hd).transpose(0, 2, 1, 3)
    kh = k.reshape(B, Tk, num_heads, hd).transpose(0, 2, 1, 3)
    vh = v.reshape(B, Tk, num_heads, hd).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / np.sqrt(hd)
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (Tq, Tk), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (Tq, Tk), 1)
        scores = jnp.where(col <= row, scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, vh)
    return out.transpose(0, 2, 1, 3).reshape(B, Tq, D)


def _on_tpu() -> bool:
    import os

    if os.environ.get("CONDMDI_DISABLE_PALLAS"):
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


# --------------------------------------------------------------------------- #
# Differentiable fused attention: Pallas forward + XLA backward (recompute).
# pallas_call has no reverse-mode rule, and at these sizes recomputing the
# [T,T] score matrix for the backward is cheaper than storing it.
# --------------------------------------------------------------------------- #
from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_self_attention(q: Array, k: Array, v: Array, num_heads: int) -> Array:
    return _pallas_self_attention(q, k, v, num_heads)


def _fused_fwd(q, k, v, num_heads):
    return _pallas_self_attention(q, k, v, num_heads), (q, k, v)


def _fused_bwd(num_heads, res, g):
    q, k, v = res
    B, T, D = q.shape
    hd = D // num_heads

    def split(x):
        return x.reshape(B, T, num_heads, hd).transpose(0, 2, 1, 3)

    qh, kh, vh, gh = split(q), split(k), split(v), split(g)
    scale = 1.0 / np.sqrt(hd)
    s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) * scale
    p = jax.nn.softmax(s, axis=-1)
    dv = jnp.einsum("bhqk,bhqd->bhkd", p, gh)
    dp = jnp.einsum("bhqd,bhkd->bhqk", gh, vh)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, kh) * scale
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, qh) * scale

    def merge(x):
        return x.transpose(0, 2, 1, 3).reshape(B, T, D)

    return merge(dq), merge(dk), merge(dv)


fused_self_attention.defvjp(_fused_fwd, _fused_bwd)


# With the 2-D (batch, head) grid, B·H = 1024 validated clean on v5e (the
# FLAT 1-D grid of the same size faulted). Generous ceiling as a guard.
_MAX_PALLAS_GRID = 4096


def mha(
    q: Array, k: Array, v: Array, num_heads: int, use_pallas: bool | None = None
) -> Array:
    """General multi-head attention. q [B,Tq,D]; k,v [B,Tk,D] → [B,Tq,D]."""
    self_attn = q.shape[1] == k.shape[1]
    if use_pallas is None:
        use_pallas = (
            _on_tpu() and self_attn and q.shape[0] * num_heads <= _MAX_PALLAS_GRID
        )
    if use_pallas and self_attn:
        return fused_self_attention(q, k, v, num_heads)
    return _xla_attention(q, k, v, num_heads)


def multihead_attention(
    qkv: Array, num_heads: int, use_pallas: bool | None = None
) -> Array:
    """Self-attention from a fused QKV projection [B, T, 3D] → [B, T, D]."""
    q, k, v = jnp.split(qkv, 3, axis=-1)
    return mha(q, k, v, num_heads, use_pallas=use_pallas)
