from condmdi_tpu.diffusion.schedule import (
    DiffusionSchedule,
    get_named_beta_schedule,
    betas_for_alpha_bar,
    space_timesteps,
)
from condmdi_tpu.diffusion.gaussian import (
    GaussianDiffusion,
    DiffusionConfig,
    ModelMeanType,
    ModelVarType,
    LossType,
)
from condmdi_tpu.diffusion.sampling import (
    SamplerConfig,
    GuidanceParams,
    ddpm_sample_loop,
    ddim_sample_loop,
    plms_sample_loop,
)
