"""Denoising samplers as single fused `lax.scan` loops (DDPM / DDIM / PLMS).

Replaces the reference's 1000-iteration Python loops
(gaussian_diffusion.py:1149 p_sample_loop, :1454 ddim_sample_loop, :1690
plms_sample_loop) with compiled scans: one XLA program per sampling run, no
host↔device round trips between steps. Classifier-free guidance is folded
into `denoise_fn` (batch-doubled forward — models/cfg.py); imputation and
reconstruction guidance happen in-graph (diffusion/gaussian.py).

`cond_fn` hooks (GMD-style gradient guidance toward trajectory targets) are
supported as in-graph callables: cond_fn(pred_xstart, t_model) -> new
pred_xstart (Song-style score conditioning, reference condition_score:605).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from condmdi_tpu.diffusion.gaussian import (
    DiffusionConfig,
    InpaintingState,
    p_mean_variance,
    predict_eps_from_xstart,
    predict_xstart_from_eps,
    q_posterior_mean_variance,
    q_sample,
)
from condmdi_tpu.diffusion.schedule import DiffusionSchedule

Array = jax.Array
DenoiseFn = Callable[[Array, Array], Array]
CondFn = Callable[[Array, Array], Array]


@dataclass(frozen=True)
class GuidanceParams:
    """Static switches for sampler-level guidance plumbing."""

    use_cond_fn: bool = False


@dataclass(frozen=True)
class SamplerConfig:
    method: str = "ddpm"  # ddpm | ddim | plms
    eta: float = 0.0  # ddim stochasticity
    order: int = 2  # plms Adams-Bashforth order (1-4)
    const_noise: bool = False
    return_trajectory: bool = False  # also return all pred_xstart frames
    zero_noise: bool = False  # deterministic updates (testing/debugging)


def _nonzero_mask(t: Array, ndim: int) -> Array:
    return (t != 0).astype(jnp.float32).reshape((t.shape[0],) + (1,) * (ndim - 1))


def _marginal_impute(sched, inpaint, x, t_prev, rng):
    """'marginal' replacement: observed entries re-noised from q(x_{t-1}|x_0).

    Reference handles this inside the GMD p_sample_with_grad imputation block
    (gaussian_diffusion.py:800-1107). At t_prev < 0 (final step) the clean
    motion is imputed directly.
    """
    imask = inpaint.inpainting_mask.astype(x.dtype)
    tp = jnp.maximum(t_prev, 0)
    noise = jax.random.normal(rng, x.shape, x.dtype)
    noised = q_sample(sched, inpaint.inpainted_motion, tp, noise)
    noised = jnp.where(
        (t_prev >= 0).reshape((-1,) + (1,) * (x.ndim - 1)),
        noised,
        inpaint.inpainted_motion,
    )
    gate = (t_prev >= inpaint.stop_imputation_at - 1).astype(x.dtype)
    gate = gate.reshape((-1,) + (1,) * (x.ndim - 1))
    return x * (1 - imask * gate) + noised * imask * gate


# --------------------------------------------------------------------------- #
# DDPM
# --------------------------------------------------------------------------- #
def ddpm_sample_loop(
    denoise_fn: DenoiseFn,
    sched: DiffusionSchedule,
    cfg: DiffusionConfig,
    shape: tuple[int, ...],
    rng: Array,
    noise: Optional[Array] = None,
    inpaint: Optional[InpaintingState] = None,
    cond_fn: Optional[CondFn] = None,
    cond_loss_fn: Optional[Callable[[Array, Array], Array]] = None,
    cond_scale: float = 1.0,
    skip_timesteps: int = 0,
    init_image: Optional[Array] = None,
    sampler: SamplerConfig = SamplerConfig(),
) -> Array:
    """Ancestral DDPM sampling — the reference p_sample_loop as one scan.

    cond_fn: Song-style score conditioning — replaces pred_xstart.
    cond_loss_fn(pred_xstart, t): GMD-style mean-shift guidance — the
    gradient of -loss w.r.t. x_t flows THROUGH the denoiser (reference
    p_sample_with_grad + condition_mean_with_grad, gaussian_diffusion.py:715,
    :580); the posterior mean is shifted by variance × grad × cond_scale.
    skip_timesteps / init_image: partial denoising from a noised init image
    (reference p_sample_loop_progressive:1251-1260) — the scan starts at
    t = S-1-skip_timesteps with x = q_sample(init_image, t_start, noise).
    """
    B = shape[0]
    rng, init_rng = jax.random.split(rng)
    x = noise if noise is not None else jax.random.normal(init_rng, shape)
    if skip_timesteps:
        t_start = sched.num_timesteps - 1 - skip_timesteps
        init = init_image if init_image is not None else jnp.zeros(shape, x.dtype)
        x = q_sample(sched, init, jnp.full((B,), t_start, jnp.int32), x)

    marginal = (
        inpaint is not None
        and inpaint.imputate
        and inpaint.replacement_distribution == "marginal"
    )
    # conditional-replacement inpainting runs inside p_mean_variance
    pm_inpaint = None if marginal else inpaint

    def step(carry, i):
        x, rng = carry
        rng, noise_rng, imp_rng = jax.random.split(rng, 3)
        t = jnp.full((B,), i, dtype=jnp.int32)
        if cond_loss_fn is not None:
            def neg_loss(z):
                out = p_mean_variance(denoise_fn, sched, cfg, z, t, inpaint=pm_inpaint)
                return -cond_loss_fn(out["pred_xstart"], sched.model_t(t)), out

            grad, out = jax.grad(neg_loss, has_aux=True)(x)
            out = {**out, "mean": out["mean"] + out["variance"] * grad * cond_scale}
        else:
            out = p_mean_variance(denoise_fn, sched, cfg, x, t, inpaint=pm_inpaint)
        if cond_fn is not None:
            new_xstart = cond_fn(out["pred_xstart"], sched.model_t(t))
            mean, _, _ = q_posterior_mean_variance(sched, new_xstart, x, t)
            out = {**out, "mean": mean, "pred_xstart": new_xstart}
        z = (
            jnp.zeros_like(x)
            if sampler.zero_noise
            else jax.random.normal(noise_rng, x.shape, x.dtype)
        )
        sample = out["mean"] + _nonzero_mask(t, x.ndim) * jnp.exp(
            0.5 * out["log_variance"]
        ) * z
        if marginal:
            sample = _marginal_impute(sched, inpaint, sample, t - 1, imp_rng)
        return (sample, rng), (out["pred_xstart"] if sampler.return_trajectory else None)

    ts = jnp.arange(sched.num_timesteps - 1 - skip_timesteps, -1, -1)
    (x, _), traj = jax.lax.scan(step, (x, rng), ts)
    if sampler.return_trajectory:
        return x, traj
    return x


# --------------------------------------------------------------------------- #
# DDIM
# --------------------------------------------------------------------------- #
def ddim_sample_loop(
    denoise_fn: DenoiseFn,
    sched: DiffusionSchedule,
    cfg: DiffusionConfig,
    shape: tuple[int, ...],
    rng: Array,
    noise: Optional[Array] = None,
    inpaint: Optional[InpaintingState] = None,
    cond_fn: Optional[CondFn] = None,
    sampler: SamplerConfig = SamplerConfig(method="ddim"),
) -> Array:
    """DDIM (eta-parameterized) sampling loop as one scan (reference :1300)."""
    B = shape[0]
    eta = sampler.eta
    rng, init_rng = jax.random.split(rng)
    x = noise if noise is not None else jax.random.normal(init_rng, shape)

    marginal = (
        inpaint is not None
        and inpaint.imputate
        and inpaint.replacement_distribution == "marginal"
    )
    pm_inpaint = None if marginal else inpaint

    def step(carry, i):
        x, rng = carry
        rng, noise_rng, imp_rng = jax.random.split(rng, 3)
        t = jnp.full((B,), i, dtype=jnp.int32)
        out = p_mean_variance(denoise_fn, sched, cfg, x, t, inpaint=pm_inpaint)
        if cond_fn is not None:
            new_xstart = cond_fn(out["pred_xstart"], sched.model_t(t))
            out = {**out, "pred_xstart": new_xstart}

        eps = predict_eps_from_xstart(sched, x, t, out["pred_xstart"])
        alpha_bar = sched.extract(sched.alphas_cumprod, t, x.ndim)
        alpha_bar_prev = sched.extract(sched.alphas_cumprod_prev, t, x.ndim)
        sigma = (
            eta
            * jnp.sqrt((1 - alpha_bar_prev) / (1 - alpha_bar))
            * jnp.sqrt(1 - alpha_bar / alpha_bar_prev)
        )
        z = (
            jnp.zeros_like(x)
            if sampler.zero_noise
            else jax.random.normal(noise_rng, x.shape, x.dtype)
        )
        mean_pred = out["pred_xstart"] * jnp.sqrt(alpha_bar_prev) + jnp.sqrt(
            jnp.maximum(1 - alpha_bar_prev - sigma**2, 0.0)
        ) * eps
        sample = mean_pred + _nonzero_mask(t, x.ndim) * sigma * z
        if marginal:
            sample = _marginal_impute(sched, inpaint, sample, t - 1, imp_rng)
        return (sample, rng), (out["pred_xstart"] if sampler.return_trajectory else None)

    ts = jnp.arange(sched.num_timesteps - 1, -1, -1)
    (x, _), traj = jax.lax.scan(step, (x, rng), ts)
    if sampler.return_trajectory:
        return x, traj
    return x


def ddim_reverse_sample_loop(
    denoise_fn: DenoiseFn,
    sched: DiffusionSchedule,
    cfg: DiffusionConfig,
    x0: Array,
) -> Array:
    """Deterministic DDIM reverse ODE x_0 → x_T (reference :1418)."""
    B = x0.shape[0]

    def step(x, i):
        t = jnp.full((B,), i, dtype=jnp.int32)
        out = p_mean_variance(denoise_fn, sched, cfg, x, t)
        eps = (
            sched.extract(sched.sqrt_recip_alphas_cumprod, t, x.ndim) * x
            - out["pred_xstart"]
        ) / sched.extract(sched.sqrt_recipm1_alphas_cumprod, t, x.ndim)
        alpha_bar_next = sched.extract(sched.alphas_cumprod_next, t, x.ndim)
        mean_pred = out["pred_xstart"] * jnp.sqrt(alpha_bar_next) + jnp.sqrt(
            1 - alpha_bar_next
        ) * eps
        return mean_pred, None

    x, _ = jax.lax.scan(step, x0, jnp.arange(sched.num_timesteps))
    return x


# --------------------------------------------------------------------------- #
# PLMS (pseudo linear multistep, Adams-Bashforth order 1-4)
# --------------------------------------------------------------------------- #
_AB_COEFS = (
    # padded to 4 taps; index k uses coefs[k][: k+1] over [e_t, e_{t-1}, ...]
    (1.0, 0.0, 0.0, 0.0),
    (3.0 / 2.0, -1.0 / 2.0, 0.0, 0.0),
    (23.0 / 12.0, -16.0 / 12.0, 5.0 / 12.0, 0.0),
    (55.0 / 24.0, -59.0 / 24.0, 37.0 / 24.0, -9.0 / 24.0),
)


def plms_sample_loop(
    denoise_fn: DenoiseFn,
    sched: DiffusionSchedule,
    cfg: DiffusionConfig,
    shape: tuple[int, ...],
    rng: Array,
    noise: Optional[Array] = None,
    inpaint: Optional[InpaintingState] = None,
    sampler: SamplerConfig = SamplerConfig(method="plms", order=2),
) -> Array:
    """PLMS loop (reference plms_sample:1589) as an unrolled first (Heun)
    step + one scan for the multistep body. The rolling eps history lives in
    the scan carry as a fixed (order, ...) buffer."""
    order = int(sampler.order)
    assert 1 <= order <= 4
    B = shape[0]
    rng, init_rng = jax.random.split(rng)
    x = noise if noise is not None else jax.random.normal(init_rng, shape)

    def model_eps(x, t):
        out = p_mean_variance(denoise_fn, sched, cfg, x, t, inpaint=inpaint)
        eps = predict_eps_from_xstart(sched, x, t, out["pred_xstart"])
        return eps, out

    S = sched.num_timesteps
    nd = x.ndim

    # ---- first step: Pseudo Improved Euler (Heun) when order > 1 ----------
    t0 = jnp.full((B,), S - 1, dtype=jnp.int32)
    eps0, out0 = model_eps(x, t0)
    alpha_bar_prev0 = sched.extract(sched.alphas_cumprod_prev, t0, nd)
    if order > 1:
        mean_pred = out0["pred_xstart"] * jnp.sqrt(alpha_bar_prev0) + jnp.sqrt(
            1 - alpha_bar_prev0
        ) * eps0
        eps2, _ = model_eps(mean_pred, jnp.maximum(t0 - 1, 0))
        eps_prime = (eps0 + eps2) / 2
    else:
        eps_prime = eps0
    pred_prime = predict_xstart_from_eps(sched, x, t0, eps_prime)
    x = pred_prime * jnp.sqrt(alpha_bar_prev0) + jnp.sqrt(1 - alpha_bar_prev0) * eps_prime

    # eps history buffer, newest first
    eps_buf = jnp.zeros((order,) + shape, x.dtype)
    eps_buf = eps_buf.at[0].set(eps0)

    def step(carry, i):
        x, eps_buf, count = carry
        t = jnp.full((B,), i, dtype=jnp.int32)
        eps, out = model_eps(x, t)
        # shift history: newest first
        new_buf = jnp.concatenate([eps[None], eps_buf[:-1]], axis=0)
        cur_order = jnp.minimum(count + 1, order)  # taps available
        coefs = jnp.asarray(_AB_COEFS, x.dtype)[cur_order - 1]  # (4,)
        taps = jnp.concatenate([eps[None], eps_buf], axis=0)[:4]
        pad = jnp.zeros((4 - taps.shape[0],) + shape, x.dtype)
        taps4 = jnp.concatenate([taps, pad], axis=0)
        eps_prime = jnp.tensordot(coefs, taps4, axes=1)
        pred_prime = predict_xstart_from_eps(sched, x, t, eps_prime)
        alpha_bar_prev = sched.extract(sched.alphas_cumprod_prev, t, nd)
        mean_pred = pred_prime * jnp.sqrt(alpha_bar_prev) + jnp.sqrt(
            1 - alpha_bar_prev
        ) * eps_prime
        nz = _nonzero_mask(t, nd)
        sample = mean_pred * nz + out["pred_xstart"] * (1 - nz)
        return (sample, new_buf, count + 1), None

    ts = jnp.arange(S - 2, -1, -1)
    (x, _, _), _ = jax.lax.scan(step, (x, eps_buf, jnp.int32(1)), ts)
    return x
