from condmdi_tpu.models.mdm import MDM
from condmdi_tpu.models.unet import MDM_UNET, TemporalUnet
from condmdi_tpu.models.cfg import make_cfg_denoiser, make_plain_denoiser
from condmdi_tpu.models.text import HashTextEncoder, CachedTextEncoder
