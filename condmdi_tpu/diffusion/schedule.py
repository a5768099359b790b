"""Beta schedules, timestep respacing, and the precomputed schedule pytree.

Behavior parity: reference diffusion/gaussian_diffusion.py:24-71
(get_named_beta_schedule, betas_for_alpha_bar), diffusion/respace.py:9-133
(space_timesteps, SpacedDiffusion's beta re-derivation and timestep_map).

TPU-first: instead of the reference's SpacedDiffusion subclass +
_WrappedModel timestep remapping at call time, respacing is folded into ONE
immutable `DiffusionSchedule` pytree at construction: the respaced betas are
derived exactly like SpacedDiffusion does, and `timestep_map` is a static
int32 array gathered inside jit (`sched.model_t(t)`). All coefficient arrays
are precomputed in float64 then stored as float32, matching the reference's
float64 setup precision.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def get_named_beta_schedule(
    schedule_name: str, num_diffusion_timesteps: int, scale_betas: float = 1.0
) -> np.ndarray:
    """'linear' (Ho et al., rescaled for any step count) or 'cosine'."""
    if schedule_name == "linear":
        scale = scale_betas * 1000 / num_diffusion_timesteps
        return np.linspace(
            scale * 0.0001, scale * 0.02, num_diffusion_timesteps, dtype=np.float64
        )
    if schedule_name == "cosine":
        return betas_for_alpha_bar(
            num_diffusion_timesteps,
            lambda t: math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2,
        )
    raise NotImplementedError(f"unknown beta schedule: {schedule_name}")


def betas_for_alpha_bar(num_diffusion_timesteps, alpha_bar, max_beta=0.999) -> np.ndarray:
    betas = []
    for i in range(num_diffusion_timesteps):
        t1 = i / num_diffusion_timesteps
        t2 = (i + 1) / num_diffusion_timesteps
        betas.append(min(1 - alpha_bar(t2) / alpha_bar(t1), max_beta))
    return np.array(betas)


def space_timesteps(num_timesteps: int, section_counts) -> list[int]:
    """Pick the retained subset of timesteps ('ddimN' or per-section counts).

    Returns a SORTED list (the reference returns a set; order is made explicit
    here because timestep_map must be deterministic).
    """
    if isinstance(section_counts, str):
        if section_counts.startswith("ddim"):
            desired_count = int(section_counts[len("ddim"):])
            for i in range(1, num_timesteps):
                if len(range(0, num_timesteps, i)) == desired_count:
                    return sorted(range(0, num_timesteps, i))
            raise ValueError(
                f"cannot create exactly {desired_count} steps with an integer stride"
            )
        section_counts = [int(x) for x in section_counts.split(",")]
    size_per = num_timesteps // len(section_counts)
    extra = num_timesteps % len(section_counts)
    start_idx = 0
    all_steps: list[int] = []
    for i, section_count in enumerate(section_counts):
        size = size_per + (1 if i < extra else 0)
        if size < section_count:
            raise ValueError(f"cannot divide section of {size} steps into {section_count}")
        frac_stride = 1 if section_count <= 1 else (size - 1) / (section_count - 1)
        cur_idx = 0.0
        taken = []
        for _ in range(section_count):
            taken.append(start_idx + round(cur_idx))
            cur_idx += frac_stride
        all_steps += taken
        start_idx += size
    return sorted(all_steps)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class DiffusionSchedule:
    """All precomputed diffusion coefficients, indexed by (respaced) step.

    A frozen pytree: array leaves are traced under jit, `num_timesteps` /
    `original_num_steps` / `rescale_timesteps` are static metadata.
    """

    betas: Array
    alphas_cumprod: Array
    alphas_cumprod_prev: Array
    alphas_cumprod_next: Array
    sqrt_alphas_cumprod: Array
    sqrt_one_minus_alphas_cumprod: Array
    log_one_minus_alphas_cumprod: Array
    sqrt_recip_alphas_cumprod: Array
    sqrt_recipm1_alphas_cumprod: Array
    posterior_variance: Array
    posterior_log_variance_clipped: Array
    posterior_mean_coef1: Array
    posterior_mean_coef2: Array
    # FIXED_LARGE variance pair (posterior_variance[1], betas[1:])
    fixed_large_variance: Array
    fixed_large_log_variance: Array
    log_betas: Array
    # time-weighted-loss helpers (reference gaussian_diffusion.py:222-237)
    ratio_eps: Array
    snr_weight: Array  # sqrt_alphas_cumprod / sqrt_one_minus_alphas_cumprod
    # respacing: retained original-step index per respaced step
    timestep_map: Array
    num_timesteps: int = field(metadata=dict(static=True))
    original_num_steps: int = field(metadata=dict(static=True))
    rescale_timesteps: bool = field(metadata=dict(static=True))

    # ------------------------------------------------------------------ #
    @classmethod
    def create(
        cls,
        betas: np.ndarray,
        use_timesteps=None,
        rescale_timesteps: bool = False,
        dtype=jnp.float32,
    ) -> "DiffusionSchedule":
        betas = np.asarray(betas, dtype=np.float64)
        assert betas.ndim == 1 and (betas > 0).all() and (betas <= 1).all()
        original_num_steps = len(betas)

        if use_timesteps is not None:
            use = set(int(u) for u in use_timesteps)
            base_alphas_cumprod = np.cumprod(1.0 - betas)
            last = 1.0
            new_betas, tmap = [], []
            for i, ac in enumerate(base_alphas_cumprod):
                if i in use:
                    new_betas.append(1 - ac / last)
                    last = ac
                    tmap.append(i)
            betas = np.array(new_betas, dtype=np.float64)
            timestep_map = np.array(tmap, dtype=np.int32)
        else:
            timestep_map = np.arange(original_num_steps, dtype=np.int32)

        alphas = 1.0 - betas
        alphas_cumprod = np.cumprod(alphas, axis=0)
        alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])
        alphas_cumprod_next = np.append(alphas_cumprod[1:], 0.0)

        posterior_variance = (
            betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
        )
        posterior_log_variance_clipped = np.log(
            np.append(posterior_variance[1], posterior_variance[1:])
        )

        c = np.zeros_like(betas)
        c[1:] = (1 - alphas_cumprod[:-1]) / (1 - alphas_cumprod[1:]) * np.sqrt(alphas[1:])
        d = np.zeros_like(betas)
        d[1:] = np.sqrt(alphas_cumprod[:-1]) / (1 - alphas_cumprod[1:]) * betas[1:]
        e = c + d
        f = d * np.sqrt(1.0 - alphas_cumprod) / np.sqrt(alphas_cumprod)
        ratio_eps = f / (e + f + 1e-8)

        fixed_large_var = np.append(posterior_variance[1], betas[1:])

        as_dtype = lambda a: jnp.asarray(a, dtype=dtype)
        return cls(
            betas=as_dtype(betas),
            alphas_cumprod=as_dtype(alphas_cumprod),
            alphas_cumprod_prev=as_dtype(alphas_cumprod_prev),
            alphas_cumprod_next=as_dtype(alphas_cumprod_next),
            sqrt_alphas_cumprod=as_dtype(np.sqrt(alphas_cumprod)),
            sqrt_one_minus_alphas_cumprod=as_dtype(np.sqrt(1.0 - alphas_cumprod)),
            log_one_minus_alphas_cumprod=as_dtype(np.log(1.0 - alphas_cumprod)),
            sqrt_recip_alphas_cumprod=as_dtype(np.sqrt(1.0 / alphas_cumprod)),
            sqrt_recipm1_alphas_cumprod=as_dtype(np.sqrt(1.0 / alphas_cumprod - 1)),
            posterior_variance=as_dtype(posterior_variance),
            posterior_log_variance_clipped=as_dtype(posterior_log_variance_clipped),
            posterior_mean_coef1=as_dtype(
                betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
            ),
            posterior_mean_coef2=as_dtype(
                (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
            ),
            fixed_large_variance=as_dtype(fixed_large_var),
            fixed_large_log_variance=as_dtype(np.log(fixed_large_var)),
            log_betas=as_dtype(np.log(betas)),
            ratio_eps=as_dtype(ratio_eps),
            snr_weight=as_dtype(np.sqrt(alphas_cumprod) / np.sqrt(1.0 - alphas_cumprod)),
            timestep_map=jnp.asarray(timestep_map),
            num_timesteps=int(len(betas)),
            original_num_steps=int(original_num_steps),
            rescale_timesteps=bool(rescale_timesteps),
        )

    # ------------------------------------------------------------------ #
    def extract(self, arr: Array, t: Array, broadcast_ndim: int) -> Array:
        """arr[t] reshaped to broadcast over a rank-`broadcast_ndim` batch."""
        out = arr[t]
        return out.reshape(out.shape + (1,) * (broadcast_ndim - out.ndim))

    def model_t(self, t: Array) -> Array:
        """Respaced step index → original-process timestep fed to the model
        (reference respace.py:121 _WrappedModel)."""
        new_t = self.timestep_map[t]
        if self.rescale_timesteps:
            return new_t.astype(jnp.float32) * (1000.0 / self.original_num_steps)
        return new_t
