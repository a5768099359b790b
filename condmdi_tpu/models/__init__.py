from condmdi_tpu.models.mdm import MDM
from condmdi_tpu.models.unet import MDM_UNET, TemporalUnet
from condmdi_tpu.models.dit import MDM_DiT
from condmdi_tpu.models.cfg import make_cfg_denoiser, make_plain_denoiser
from condmdi_tpu.models.text import HashTextEncoder, CachedTextEncoder
from condmdi_tpu.models.factory import (
    create_model,
    create_gaussian_diffusion,
    create_model_and_diffusion,
    get_model_dims,
)
