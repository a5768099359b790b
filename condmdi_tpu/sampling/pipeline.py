"""End-to-end sampling pipeline: model + schedule + guidance → motions.

This is the compiled core behind the synthesize / conditional_synthesis /
edit entry points (reference sample/*.py): one jitted function per
(config, shapes) containing the FULL denoising scan — CFG, keyframe
conditioning, imputation, reconstruction guidance — plus the feature→joint
recovery (`recover_from_ric`) so a single device round-trip yields joints.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from condmdi_tpu.data.humanml_repr import recover_from_ric
from condmdi_tpu.diffusion.gaussian import (
    DiffusionConfig,
    InpaintingState,
    get_gradient_schedule,
)
from condmdi_tpu.diffusion.sampling import (
    SamplerConfig,
    ddim_sample_loop,
    ddpm_sample_loop,
    plms_sample_loop,
)
from condmdi_tpu.diffusion.schedule import DiffusionSchedule
from condmdi_tpu.models.cfg import make_cfg_denoiser, make_plain_denoiser

Array = jax.Array


def build_inpainting_state(
    inpainted_motion: Array,
    inpainting_mask: Array,
    time_mask: Optional[Array] = None,
    imputate: bool = False,
    reconstruction_guidance: bool = False,
    reconstruction_weight: float = 5.0,
    gradient_schedule: Optional[str] = None,
    stop_imputation_at: int = 0,
    stop_recguidance_at: int = 0,
    replacement_distribution: str = "conditional",
    diffusion_steps: int = 1000,
) -> InpaintingState:
    """Assemble the traced inpainting pytree from CondSynt-style options.

    Mirrors the y-dict keys set up in sample/conditional_synthesis.py:171-195
    and sample/edit.py:97-118. The gradient schedule is indexed by the
    RESPACED step exactly like the reference (`_extract_into_tensor(grad_ws,
    t, ...)` with grad_ws of length diffusion_steps — a quirk preserved).
    """
    if time_mask is not None:
        inpainting_mask = inpainting_mask & time_mask[..., None].astype(bool)
    grad_ws = get_gradient_schedule(gradient_schedule, diffusion_steps)
    return InpaintingState(
        inpainted_motion=jnp.asarray(inpainted_motion),
        inpainting_mask=jnp.asarray(inpainting_mask),
        grad_weights=jnp.asarray(grad_ws * reconstruction_weight, jnp.float32),
        stop_imputation_at=jnp.int32(stop_imputation_at),
        stop_recguidance_at=jnp.int32(stop_recguidance_at),
        imputate=imputate,
        reconstruction_guidance=reconstruction_guidance,
        replacement_distribution=replacement_distribution,
    )


@dataclass
class SamplePipeline:
    """Callable sampler bound to a model apply_fn + diffusion setup."""

    apply_fn: Callable[..., Array]  # (x, t, y, **obs) -> model out, params bound
    sched: DiffusionSchedule
    dcfg: DiffusionConfig
    sampler: SamplerConfig = SamplerConfig()

    def denoiser(
        self,
        y: dict[str, Any],
        guidance_param: float = 1.0,
        obs_x0: Optional[Array] = None,
        obs_mask: Optional[Array] = None,
    ):
        if guidance_param != 1.0:
            return make_cfg_denoiser(
                self.apply_fn, y, guidance_param, obs_x0=obs_x0, obs_mask=obs_mask
            )
        return make_plain_denoiser(self.apply_fn, y, obs_x0=obs_x0, obs_mask=obs_mask)

    def sample(
        self,
        rng: Array,
        shape: tuple[int, ...],
        y: dict[str, Any],
        guidance_param: float = 1.0,
        obs_x0: Optional[Array] = None,
        obs_mask: Optional[Array] = None,
        inpaint: Optional[InpaintingState] = None,
        noise: Optional[Array] = None,
        cond_loss_fn: Optional[Callable[[Array, Array], Array]] = None,
        cond_scale: float = 1.0,
    ) -> Array:
        denoise = self.denoiser(y, guidance_param, obs_x0, obs_mask)
        method = self.sampler.method
        if method == "ddpm":
            loop = ddpm_sample_loop
        elif method == "ddim":
            loop = ddim_sample_loop
        elif method == "plms":
            loop = plms_sample_loop
        else:
            raise ValueError(method)
        extra = {}
        if cond_loss_fn is not None:
            if method != "ddpm":
                # gradient guidance rides the DDPM posterior mean only
                # (reference condition_mean, gaussian_diffusion.py:1149)
                raise ValueError("cond_loss_fn guidance requires the ddpm sampler")
            extra = dict(cond_loss_fn=cond_loss_fn, cond_scale=cond_scale)
        return loop(
            denoise, self.sched, self.dcfg, shape, rng,
            noise=noise, inpaint=inpaint, sampler=self.sampler, **extra,
        )

    def sample_to_joints(
        self, features: Array, denormalize: Callable[[Array], Array], abs_3d: bool
    ) -> Array:
        """Denormalized features → [B, T, 22, 3] joints (recover_from_ric)."""
        feats = denormalize(features)
        return recover_from_ric(feats, 22, abs_3d=abs_3d)
