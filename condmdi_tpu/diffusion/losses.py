"""Distribution losses + masked MSE losses in the [B, T, F] layout.

Parity targets: reference diffusion/losses.py:12 (normal_kl), :50
(discretized_gaussian_log_likelihood); diffusion/gaussian_diffusion.py:243
(masked_l2), :259 (masked_l2_weighted); diffusion/nn.py mean_flat/sum_flat.

Layout note: the reference carries motion as [bs, F, 1, T] with a time mask
[bs, 1, 1, T]. Here motion is [bs, T, F] and the time mask is [bs, T]
(features last = TPU lane dimension). The masked-loss *normalization*
semantics are preserved exactly:
  masked_l2          : sum(err^2 * mask) / (sum(mask) * F)
  masked_l2_weighted : sum(err^2 * w_norm * tw * mask) / sum(mask)
    where w_norm = weights / weights.sum(features)  per sample.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def sum_flat(x: Array) -> Array:
    """Sum over all non-batch dimensions."""
    return jnp.sum(x, axis=tuple(range(1, x.ndim)))


def mean_flat(x: Array) -> Array:
    return jnp.mean(x, axis=tuple(range(1, x.ndim)))


def normal_kl(mean1, logvar1, mean2, logvar2) -> Array:
    """KL between two diagonal Gaussians (any broadcastable shapes)."""
    return 0.5 * (
        -1.0
        + logvar2
        - logvar1
        + jnp.exp(logvar1 - logvar2)
        + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2)
    )


def approx_standard_normal_cdf(x: Array) -> Array:
    return 0.5 * (
        1.0 + jnp.tanh(np.sqrt(2.0 / np.pi) * (x + 0.044715 * x**3))
    )


def discretized_gaussian_log_likelihood(x, *, means, log_scales) -> Array:
    """Log-likelihood of a Gaussian discretized to 1/255 bins ([-1,1] data)."""
    centered_x = x - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered_x + 1.0 / 255.0)
    cdf_plus = approx_standard_normal_cdf(plus_in)
    min_in = inv_stdv * (centered_x - 1.0 / 255.0)
    cdf_min = approx_standard_normal_cdf(min_in)
    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, a_min=1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, a_min=1e-12))
    cdf_delta = cdf_plus - cdf_min
    return jnp.where(
        x < -0.999,
        log_cdf_plus,
        jnp.where(
            x > 0.999,
            log_one_minus_cdf_min,
            jnp.log(jnp.clip(cdf_delta, a_min=1e-12)),
        ),
    )


def masked_l2(a: Array, b: Array, time_mask: Array) -> Array:
    """MSE over valid frames. a,b: [B,T,F]; time_mask: [B,T] (bool/float).

    Returns per-sample loss [B]: sum over (t,f) of masked sq-err divided by
    (#valid frames × F) — matching reference masked_l2 normalization.
    """
    m = time_mask.astype(a.dtype)[..., None]
    loss = sum_flat((a - b) ** 2 * m)
    n = sum_flat(m) * a.shape[-1]  # valid frames × feature count
    return loss / jnp.maximum(n, 1.0)


def masked_l2_weighted(
    a: Array,
    b: Array,
    mask: Array,
    weights: Array,
    time_weights: Array | None = None,
    over_keyframes: bool = False,
) -> Array:
    """Feature-weighted masked MSE, per-sample [B].

    a, b:        [B, T, F]
    mask:        [B, T] time mask, or [B, T, F] full mask when over_keyframes
    weights:     [B, 1, F] per-feature weights (normalized to sum 1 over F)
    time_weights:[B, T, F] or None (ones)
    """
    loss = (a - b) ** 2
    w = weights / jnp.sum(weights, axis=(1, 2), keepdims=True)
    loss = loss * w
    if time_weights is not None:
        loss = loss * time_weights
    if over_keyframes:
        m = mask.astype(a.dtype)
    else:
        m = mask.astype(a.dtype)[..., None]
    loss = sum_flat(loss * m)
    if over_keyframes:
        # reference divides by sum over the FULL (b, f, t) mask
        n = sum_flat(m)
    else:
        n = jnp.sum(mask.astype(a.dtype), axis=1)
    return loss / jnp.maximum(n, 1e-8)
