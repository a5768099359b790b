from condmdi_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    shard_params_fsdp,
    data_parallel_spec,
    initialize_distributed,
)
