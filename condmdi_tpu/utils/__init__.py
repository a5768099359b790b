from condmdi_tpu.utils.layout import to_reference_layout, from_reference_layout
from condmdi_tpu.utils.assets import find_assets_dir, load_norm_stats, NormStats
from condmdi_tpu.utils import checkpoint, config, logger
