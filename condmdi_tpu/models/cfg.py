"""Classifier-free guidance as a batch-doubled denoiser wrapper.

Parity target: reference model/cfg_sampler.py:5 (ClassifierFreeSampleModel):
  out = out_uncond + text_scale * (out_cond − out_uncond)
with obs_x0/obs_mask passed through both branches. The reference runs two
sequential forwards; here the cond and uncond branches are CONCATENATED into
one batch-doubled forward so the MXU sees a single 2B matmul stream (free
throughput on TPU, identical math).

The keyframe CFG knob (`keyframe_scale`) is plumbed but NotImplemented in
the reference (conditional_synthesis.py:139-140); we keep the same surface.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def make_cfg_denoiser(
    apply_fn: Callable[..., Array],
    y: dict[str, Any],
    text_scale: Array | float,
    obs_x0: Optional[Array] = None,
    obs_mask: Optional[Array] = None,
) -> Callable[[Array, Array], Array]:
    """Build denoise_fn(x, t) applying CFG via one batch-doubled forward.

    `apply_fn(x, t, y, obs_x0, obs_mask)` is the bare model forward (params
    already bound). `y` must contain the conditional inputs; the uncond
    branch gets `uncond=True`.
    """

    def denoise(x: Array, t: Array) -> Array:
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.concatenate([t, t], axis=0)
        B = x.shape[0]
        force = jnp.concatenate(
            [jnp.zeros((B,), bool), jnp.ones((B,), bool)], axis=0
        )
        y2 = dict(y)
        # duplicate per-sample conditioning rows
        for k, v in y.items():
            if isinstance(v, jax.Array) and v.ndim >= 1 and v.shape[0] == B:
                y2[k] = jnp.concatenate([v, v], axis=0)
        y2["uncond"] = force
        kw = {}
        if obs_x0 is not None:
            kw["obs_x0"] = jnp.concatenate([obs_x0, obs_x0], axis=0)
            kw["obs_mask"] = jnp.concatenate([obs_mask, obs_mask], axis=0)
        out = apply_fn(x2, t2, y2, **kw)
        out_cond, out_uncond = out[:B], out[B:]
        return out_uncond + text_scale * (out_cond - out_uncond)

    return denoise


def make_plain_denoiser(
    apply_fn: Callable[..., Array],
    y: dict[str, Any],
    obs_x0: Optional[Array] = None,
    obs_mask: Optional[Array] = None,
) -> Callable[[Array, Array], Array]:
    """Bare denoiser closure without CFG (guidance_param == 1)."""

    def denoise(x: Array, t: Array) -> Array:
        kw = {}
        if obs_x0 is not None:
            kw["obs_x0"] = obs_x0
            kw["obs_mask"] = obs_mask
        return apply_fn(x, t, y, **kw)

    return denoise
