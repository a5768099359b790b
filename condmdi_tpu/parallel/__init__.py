from condmdi_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    shard_params_fsdp,
    data_parallel_spec,
    initialize_distributed,
)
from condmdi_tpu.parallel.dp_sample import dp_sample, shard_sample_inputs
from condmdi_tpu.parallel.tp import (
    TP_AXIS,
    MDM_TP_RULES,
    UNET_TP_RULES,
    make_mesh_2d,
    shard_params_tp,
    tp_spec_for_path,
)
