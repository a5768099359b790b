"""Gaussian diffusion core: q/posterior math, p_mean_variance, training losses.

Behavior-parity targets: reference diffusion/gaussian_diffusion.py —
q_sample:311, q_posterior_mean_variance:330, p_mean_variance:352 (recon
guidance :405-425, conditional replacement :427-442), _predict_* :536-556,
condition_mean:562 / condition_score:605, training_losses:1843,
_vb_terms_bpd:1805.

Architecture notes (TPU-first, NOT a translation):
  * Everything is a pure function of (schedule, params, arrays, rng). The
    denoiser enters as `denoise_fn(x, t_model) -> x0/eps prediction`, already
    closed over params/conditioning, so this module is model-agnostic.
  * The reference's Python-side branching on `t` (requires_imputation /
    requires_reconstruction_guidance gates) becomes branchless `jnp.where`
    with traced step gates — the whole sampler body stays inside one
    `lax.scan` (see sampling.py).
  * Reconstruction guidance replaces `torch.enable_grad` surgery with a
    single `jax.grad(..., has_aux=True)` through the denoiser.
  * Tensor layout is [B, T, F]; time mask [B, T]; observation masks [B, T, F].
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from condmdi_tpu.diffusion.losses import (
    discretized_gaussian_log_likelihood,
    masked_l2,
    masked_l2_weighted,
    mean_flat,
    normal_kl,
)
from condmdi_tpu.diffusion.schedule import DiffusionSchedule

Array = jax.Array
DenoiseFn = Callable[[Array, Array], Array]  # (x_t [B,T,F], t_model [B]) -> out


class ModelMeanType(enum.Enum):
    PREVIOUS_X = "prev_x"
    START_X = "start_x"
    EPSILON = "eps"


class ModelVarType(enum.Enum):
    LEARNED = "learned"
    FIXED_SMALL = "fixed_small"
    FIXED_LARGE = "fixed_large"
    LEARNED_RANGE = "learned_range"


class LossType(enum.Enum):
    MSE = "mse"
    RESCALED_MSE = "rescaled_mse"
    KL = "kl"
    RESCALED_KL = "rescaled_kl"

    def is_vb(self):
        return self in (LossType.KL, LossType.RESCALED_KL)


@dataclass(frozen=True)
class DiffusionConfig:
    """Static configuration (hashable; safe as a jit static arg).

    Mirrors reference DiffusionConfig (gaussian_diffusion.py:110-137) minus
    torch-specific knobs (fp16 loss-scaling is obsolete on TPU: train in
    bf16/f32 natively).
    """

    model_mean_type: ModelMeanType = ModelMeanType.START_X
    model_var_type: ModelVarType = ModelVarType.FIXED_SMALL
    loss_type: LossType = LossType.MSE
    lambda_rcxyz: float = 0.0
    lambda_vel: float = 0.0
    lambda_root_vel: float = 0.0
    lambda_vel_rcxyz: float = 0.0
    lambda_fc: float = 0.0
    data_rep: str = "hml_vec"
    clip_range: Optional[float] = None
    abs_3d: bool = True
    traj_only: bool = False
    apply_zero_mask: bool = False
    traj_extra_weight: float = 1.0
    time_weighted_loss: bool = False
    train_x0_as_eps: bool = False


# --------------------------------------------------------------------------- #
# Closed-form q distributions
# --------------------------------------------------------------------------- #
def q_mean_variance(sched: DiffusionSchedule, x_start: Array, t: Array):
    nd = x_start.ndim
    mean = sched.extract(sched.sqrt_alphas_cumprod, t, nd) * x_start
    variance = sched.extract(1.0 - sched.alphas_cumprod, t, nd)
    log_variance = sched.extract(sched.log_one_minus_alphas_cumprod, t, nd)
    return mean, variance, log_variance


def q_sample(sched: DiffusionSchedule, x_start: Array, t: Array, noise: Array) -> Array:
    nd = x_start.ndim
    return (
        sched.extract(sched.sqrt_alphas_cumprod, t, nd) * x_start
        + sched.extract(sched.sqrt_one_minus_alphas_cumprod, t, nd) * noise
    )


def q_posterior_mean_variance(
    sched: DiffusionSchedule, x_start: Array, x_t: Array, t: Array
):
    nd = x_t.ndim
    posterior_mean = (
        sched.extract(sched.posterior_mean_coef1, t, nd) * x_start
        + sched.extract(sched.posterior_mean_coef2, t, nd) * x_t
    )
    posterior_variance = sched.extract(sched.posterior_variance, t, nd)
    posterior_log_variance = sched.extract(sched.posterior_log_variance_clipped, t, nd)
    return posterior_mean, posterior_variance, posterior_log_variance


def predict_xstart_from_eps(sched, x_t, t, eps):
    nd = x_t.ndim
    return (
        sched.extract(sched.sqrt_recip_alphas_cumprod, t, nd) * x_t
        - sched.extract(sched.sqrt_recipm1_alphas_cumprod, t, nd) * eps
    )


def predict_xstart_from_xprev(sched, x_t, t, xprev):
    nd = x_t.ndim
    return (
        sched.extract(1.0 / sched.posterior_mean_coef1, t, nd) * xprev
        - sched.extract(sched.posterior_mean_coef2 / sched.posterior_mean_coef1, t, nd)
        * x_t
    )


def predict_eps_from_xstart(sched, x_t, t, pred_xstart):
    nd = x_t.ndim
    return (
        sched.extract(sched.sqrt_recip_alphas_cumprod, t, nd) * x_t - pred_xstart
    ) / sched.extract(sched.sqrt_recipm1_alphas_cumprod, t, nd)


# --------------------------------------------------------------------------- #
# Inpainting / guidance state threaded through the sampler (traced pytree)
# --------------------------------------------------------------------------- #
@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class InpaintingState:
    """Traced inpainting tensors + step gates.

    `inpainting_mask` is a full [B, T, F] float/bool mask (already combined
    with the validity mask); `inpainted_motion` [B, T, F]; gates are scalar
    int32 step thresholds compared against the traced t inside the scan.
    """

    inpainted_motion: Array
    inpainting_mask: Array  # bool [B, T, F]
    grad_weights: Array  # [num_timesteps] gradient schedule × recon weight
    stop_imputation_at: Array  # int32 scalar
    stop_recguidance_at: Array  # int32 scalar
    imputate: bool = field(metadata=dict(static=True), default=False)
    reconstruction_guidance: bool = field(metadata=dict(static=True), default=False)
    replacement_distribution: str = field(
        metadata=dict(static=True), default="conditional"
    )


def get_gradient_schedule(
    schedule_name: Optional[str], num_diffusion_steps: int, scale: float = 0.05
) -> np.ndarray:
    """Reconstruction-guidance weight per timestep (editing_util.py:299)."""
    if schedule_name is None or schedule_name == "none":
        return np.ones(num_diffusion_steps)
    if schedule_name == "first-half":
        half = num_diffusion_steps // 2
        return np.concatenate(
            (np.ones(half), np.zeros(num_diffusion_steps - half))
        )
    if schedule_name == "last-half":
        half = num_diffusion_steps // 2
        return np.concatenate((np.zeros(half), np.ones(num_diffusion_steps - half)))
    if schedule_name == "exponential":
        ts = np.arange(num_diffusion_steps)[::-1]
        return np.exp(-scale * ts)
    if schedule_name == "sigmoid":
        ts = np.arange(num_diffusion_steps)
        s = scale / 5
        return 1 / (1 + np.exp(s * (-ts + num_diffusion_steps / 2)))
    if schedule_name == "half-sigmoid":
        ts = np.arange(num_diffusion_steps)
        s = scale / 5
        return 1 / (1 + np.exp(s * (-ts)))
    raise NotImplementedError(f"unknown gradient schedule: {schedule_name}")


# --------------------------------------------------------------------------- #
# p_mean_variance
# --------------------------------------------------------------------------- #
def p_mean_variance(
    denoise_fn: DenoiseFn,
    sched: DiffusionSchedule,
    cfg: DiffusionConfig,
    x: Array,
    t: Array,
    inpaint: Optional[InpaintingState] = None,
    time_mask: Optional[Array] = None,
) -> dict[str, Array]:
    """Compute p(x_{t-1} | x_t) mean/variance and the x0 prediction.

    Branchless port of the reference's three-way branch (recon-guidance /
    conditional imputation / plain): when the static flags are off the extra
    code simply does not exist in the graph; the per-step `t >= stop_*` gates
    are traced jnp.where selects.
    """
    t_model = sched.model_t(t)
    B = x.shape[0]

    use_recg = inpaint is not None and inpaint.reconstruction_guidance
    use_imp = (
        inpaint is not None
        and inpaint.imputate
        and inpaint.replacement_distribution == "conditional"
    )

    if use_recg:
        imask = inpaint.inpainting_mask.astype(x.dtype)

        def guidance_loss(z):
            hat = denoise_fn(z, t_model)
            loss = jnp.sum((inpaint.inpainted_motion - hat) ** 2 * imask)
            return loss, hat

        cond_grad, hat_x = jax.grad(guidance_loss, has_aux=True)(x)
        cond_grad = cond_grad * (1.0 - imask)

        recg_on = (t >= inpaint.stop_recguidance_at).astype(x.dtype)
        w_r = (
            sched.extract(inpaint.grad_weights, t, x.ndim)
            * recg_on.reshape((B,) + (1,) * (x.ndim - 1))
        )
        sqrt_ab = sched.extract(sched.sqrt_alphas_cumprod, t, x.ndim)
        tilde_x = hat_x - (w_r * sqrt_ab / 2.0) * cond_grad

        imp_gate = (
            (t >= inpaint.stop_imputation_at).astype(x.dtype)
            if inpaint.imputate
            else jnp.zeros((B,), x.dtype)
        )
        imp_gate = imp_gate.reshape((B,) + (1,) * (x.ndim - 1))
        keyframe_val = imp_gate * inpaint.inpainted_motion + (1 - imp_gate) * hat_x
        blended = tilde_x * (1.0 - imask) + keyframe_val * imask
        # when recon gate is off AND imputation gate off, fall back to hat_x
        any_on = jnp.maximum(
            recg_on.reshape(imp_gate.shape), imp_gate
        )
        model_output = any_on * blended + (1 - any_on) * hat_x
    elif use_imp:
        hat_x = denoise_fn(x, t_model)
        imask = inpaint.inpainting_mask.astype(x.dtype)
        imp_gate = (t >= inpaint.stop_imputation_at).astype(x.dtype)
        imp_gate = imp_gate.reshape((B,) + (1,) * (x.ndim - 1))
        replaced = hat_x * (1.0 - imask) + inpaint.inpainted_motion * imask
        model_output = imp_gate * replaced + (1 - imp_gate) * hat_x
    else:
        model_output = denoise_fn(x, t_model)

    model_var_values = None
    if cfg.model_var_type in (ModelVarType.LEARNED, ModelVarType.LEARNED_RANGE):
        C = x.shape[-1]
        model_output, model_var_values = jnp.split(model_output, [C], axis=-1)
        if cfg.model_var_type == ModelVarType.LEARNED:
            model_log_variance = model_var_values
            model_variance = jnp.exp(model_log_variance)
        else:
            min_log = sched.extract(sched.posterior_log_variance_clipped, t, x.ndim)
            max_log = sched.extract(sched.log_betas, t, x.ndim)
            frac = (model_var_values + 1) / 2
            model_log_variance = frac * max_log + (1 - frac) * min_log
            model_variance = jnp.exp(model_log_variance)
    elif cfg.model_var_type == ModelVarType.FIXED_LARGE:
        model_variance = sched.extract(sched.fixed_large_variance, t, x.ndim)
        model_log_variance = sched.extract(sched.fixed_large_log_variance, t, x.ndim)
    else:  # FIXED_SMALL
        model_variance = sched.extract(sched.posterior_variance, t, x.ndim)
        model_log_variance = sched.extract(sched.posterior_log_variance_clipped, t, x.ndim)

    def process_xstart(xs):
        if cfg.model_mean_type != ModelMeanType.START_X and cfg.clip_range is not None:
            return jnp.clip(xs, -cfg.clip_range, cfg.clip_range)
        return xs

    if cfg.model_mean_type == ModelMeanType.PREVIOUS_X:
        pred_xstart = process_xstart(
            predict_xstart_from_xprev(sched, x, t, model_output)
        )
        model_mean = model_output
    elif cfg.model_mean_type == ModelMeanType.START_X:
        pred_xstart = process_xstart(model_output)
        model_mean, _, _ = q_posterior_mean_variance(sched, pred_xstart, x, t)
    else:  # EPSILON
        pred_xstart = process_xstart(predict_xstart_from_eps(sched, x, t, model_output))
        model_mean, _, _ = q_posterior_mean_variance(sched, pred_xstart, x, t)

    return {
        "mean": model_mean,
        "variance": model_variance,
        "log_variance": model_log_variance,
        "pred_xstart": pred_xstart,
        "model_output": model_output,
        "model_var_values": model_var_values,
    }


# --------------------------------------------------------------------------- #
# VLB terms
# --------------------------------------------------------------------------- #
def vb_terms_bpd(
    denoise_fn, sched, cfg, x_start, x_t, t, inpaint=None
) -> dict[str, Array]:
    true_mean, _, true_log_var = q_posterior_mean_variance(sched, x_start, x_t, t)
    out = p_mean_variance(denoise_fn, sched, cfg, x_t, t, inpaint=inpaint)
    kl = normal_kl(true_mean, true_log_var, out["mean"], out["log_variance"])
    kl = mean_flat(kl) / np.log(2.0)
    decoder_nll = -discretized_gaussian_log_likelihood(
        x_start, means=out["mean"], log_scales=0.5 * out["log_variance"]
    )
    decoder_nll = mean_flat(decoder_nll) / np.log(2.0)
    output = jnp.where(t == 0, decoder_nll, kl)
    return {"output": output, "pred_xstart": out["pred_xstart"]}


# --------------------------------------------------------------------------- #
# Training losses
# --------------------------------------------------------------------------- #
def training_losses(
    denoise_fn: DenoiseFn,
    sched: DiffusionSchedule,
    cfg: DiffusionConfig,
    x_start: Array,
    t: Array,
    noise: Array,
    time_mask: Array,
    obs_mask: Optional[Array] = None,
    zero_keyframe_loss: bool = False,
    keyframe_conditioned: bool = False,
    get_xyz: Optional[Callable[[Array], Array]] = None,
) -> dict[str, Array]:
    """MSE-family training loss (per-sample [B] terms).

    Mirrors reference training_losses:1843 for the MSE/RESCALED_MSE path with
    trajectory over-weighting, keyframe-loss zeroing, keyframe-MSE logging,
    velocity loss, and time-weighted / x0-as-eps reweighting. Geometric SMPL
    losses (rcxyz/fc) are integrated via the models' FK hooks when their
    lambdas are nonzero (HumanML3D shipping config keeps them at 0 —
    parser_util.py:72-77).
    """
    x_t = q_sample(sched, x_start, t, noise)
    if cfg.apply_zero_mask:
        x_t = x_t * time_mask[..., None].astype(x_t.dtype)

    terms: dict[str, Array] = {}

    if cfg.loss_type in (LossType.KL, LossType.RESCALED_KL):
        terms["loss"] = vb_terms_bpd(denoise_fn, sched, cfg, x_start, x_t, t)["output"]
        if cfg.loss_type == LossType.RESCALED_KL:
            terms["loss"] = terms["loss"] * sched.num_timesteps
        return terms

    model_output = denoise_fn(x_t, sched.model_t(t))

    if cfg.model_var_type in (ModelVarType.LEARNED, ModelVarType.LEARNED_RANGE):
        C = x_t.shape[-1]
        model_output, model_var_values = jnp.split(model_output, [C], axis=-1)
        frozen = jnp.concatenate(
            [jax.lax.stop_gradient(model_output), model_var_values], axis=-1
        )
        terms["vb"] = vb_terms_bpd(
            lambda *_args: frozen, sched, cfg, x_start, x_t, t
        )["output"]
        if cfg.loss_type == LossType.RESCALED_MSE:
            terms["vb"] = terms["vb"] * (sched.num_timesteps / 1000.0)

    if cfg.model_mean_type == ModelMeanType.PREVIOUS_X:
        target = q_posterior_mean_variance(sched, x_start, x_t, t)[0]
    elif cfg.model_mean_type == ModelMeanType.START_X:
        target = x_start
    else:
        target = noise

    B, T, F = target.shape
    weights = jnp.ones((B, 1, F), dtype=target.dtype)
    if cfg.traj_extra_weight != 1.0:
        # squared: applied outside the squared loss in the reference (:1968)
        weights = weights.at[..., :4].multiply(cfg.traj_extra_weight**2)

    loss_mask = time_mask
    if zero_keyframe_loss:
        assert obs_mask is not None
        # zero the loss over observed (keyframe) entries: mask goes full-rank
        full = time_mask[..., None] & (~obs_mask.astype(bool))
        terms["rot_mse"] = masked_l2_weighted(
            target, model_output, full, weights, over_keyframes=True
        )
    else:
        terms["rot_mse"] = masked_l2_weighted(
            target, model_output, loss_mask, weights
        )

    if keyframe_conditioned and obs_mask is not None:
        kf_mask = time_mask[..., None] & obs_mask.astype(bool)
        terms["keyframes_mse"] = masked_l2_weighted(
            target, model_output, kf_mask, weights, over_keyframes=True
        )

    # geometric SMPL losses (reference :2001 rcxyz, :2030 fc) — active for
    # rot6d action datasets; get_xyz = Rotation2xyz closure (models/smpl.py)
    target_xyz = output_xyz = None
    if cfg.lambda_rcxyz > 0.0 and get_xyz is not None:
        target_xyz = get_xyz(target)
        output_xyz = get_xyz(model_output)
        tx = target_xyz.reshape(B, T, -1)
        ox = output_xyz.reshape(B, T, -1)
        terms["rcxyz_mse"] = masked_l2(tx, ox, time_mask)

    if cfg.lambda_fc > 0.0 and get_xyz is not None:
        if target_xyz is None:
            target_xyz = get_xyz(target)
            output_xyz = get_xyz(model_output)
        # feet: L_Ankle 7, R_Ankle 8, L_Foot 10, R_Foot 11 (reference :2043)
        feet = (7, 10, 8, 11)
        gt_feet = target_xyz[:, :, feet, :]  # [B, T, 4, 3]
        gt_vel = jnp.linalg.norm(gt_feet[:, 1:] - gt_feet[:, :-1], axis=-1)
        fc_mask = (gt_vel <= 0.01)[..., None]  # [B, T-1, 4, 1]
        pred_feet = output_xyz[:, :, feet, :]
        pred_vel = (pred_feet[:, 1:] - pred_feet[:, :-1]) * fc_mask
        terms["fc"] = masked_l2(
            pred_vel.reshape(B, T - 1, -1),
            jnp.zeros_like(pred_vel).reshape(B, T - 1, -1),
            time_mask[:, 1:],
        )

    if cfg.lambda_vel > 0.0:
        target_vel = target[:, 1:] - target[:, :-1]
        out_vel = model_output[:, 1:] - model_output[:, :-1]
        # reference drops the last feature row ("root location") — with
        # features-last layout that is the last channel
        terms["vel_mse"] = masked_l2(
            target_vel[..., :-1], out_vel[..., :-1], time_mask[:, 1:]
        )

    terms["loss"] = (
        terms["rot_mse"]
        + terms.get("vb", 0.0)
        + cfg.lambda_vel * terms.get("vel_mse", 0.0)
        + cfg.lambda_rcxyz * terms.get("rcxyz_mse", 0.0)
        + cfg.lambda_fc * terms.get("fc", 0.0)
    )

    if cfg.time_weighted_loss:
        tw = sched.ratio_eps[t]
        tw = tw / jnp.mean(tw)
        terms["loss"] = terms["loss"] * tw
    if cfg.train_x0_as_eps:
        tw = sched.snr_weight[t]
        tw = tw / jnp.mean(tw)
        terms["loss"] = terms["loss"] * tw

    return terms


def calc_bpd_loop(
    denoise_fn: DenoiseFn,
    sched: DiffusionSchedule,
    cfg: DiffusionConfig,
    x_start: Array,
    rng: Array,
) -> dict[str, Array]:
    """Full variational-bound evaluation (reference calc_bpd_loop:2152):
    per-timestep VLB terms + x0 MSE, prior KL, total bpd — as one scan
    instead of the reference's T-iteration Python loop."""
    B = x_start.shape[0]
    S = sched.num_timesteps

    def step(rng, ti):
        rng, k = jax.random.split(rng)
        t = jnp.full((B,), ti, jnp.int32)
        noise = jax.random.normal(k, x_start.shape, x_start.dtype)
        x_t = q_sample(sched, x_start, t, noise)
        out = vb_terms_bpd(denoise_fn, sched, cfg, x_start, x_t, t)
        xstart_mse = mean_flat((out["pred_xstart"] - x_start) ** 2)
        eps = predict_eps_from_xstart(sched, x_t, t, out["pred_xstart"])
        mse = mean_flat((eps - noise) ** 2)
        return rng, (out["output"], xstart_mse, mse)

    rng, (vb, xstart_mse, mse) = jax.lax.scan(
        step, rng, jnp.arange(S - 1, -1, -1)
    )
    vb = vb.T  # [B, S] (t descending)
    # prior KL: KL(q(x_T | x_0) || N(0, I))
    qt_mean, _, qt_log_var = q_mean_variance(
        sched, x_start, jnp.full((B,), S - 1, jnp.int32)
    )
    prior_kl = mean_flat(
        normal_kl(qt_mean, qt_log_var, 0.0, 0.0)
    ) / np.log(2.0)
    total_bpd = vb.sum(axis=1) + prior_kl
    return {
        "total_bpd": total_bpd,
        "prior_bpd": prior_kl,
        "vb": vb,
        "xstart_mse": xstart_mse.T,
        "mse": mse.T,
    }


class GaussianDiffusion:
    """Thin OO veneer bundling (schedule, config) for API familiarity.

    All heavy lifting is in the module-level pure functions; this class keeps
    an interface recognizable to users of the reference GaussianDiffusion.
    """

    def __init__(self, sched: DiffusionSchedule, cfg: DiffusionConfig):
        self.sched = sched
        self.cfg = cfg

    @property
    def num_timesteps(self) -> int:
        return self.sched.num_timesteps

    def q_sample(self, x_start, t, noise):
        return q_sample(self.sched, x_start, t, noise)

    def q_posterior_mean_variance(self, x_start, x_t, t):
        return q_posterior_mean_variance(self.sched, x_start, x_t, t)

    def p_mean_variance(self, denoise_fn, x, t, inpaint=None):
        return p_mean_variance(denoise_fn, self.sched, self.cfg, x, t, inpaint=inpaint)

    def training_losses(self, denoise_fn, x_start, t, noise, time_mask, **kw):
        return training_losses(
            denoise_fn, self.sched, self.cfg, x_start, t, noise, time_mask, **kw
        )
