from condmdi_tpu.sampling.pipeline import (
    SamplePipeline,
    build_inpainting_state,
)
