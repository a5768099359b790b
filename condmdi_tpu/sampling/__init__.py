from condmdi_tpu.sampling.pipeline import (
    SamplePipeline,
    build_inpainting_state,
)
from condmdi_tpu.sampling.gmd import (
    CondKeyLocations,
    CondKeyLocationsWithSdf,
    get_kframes,
    kframes_to_target,
    two_stage_generate,
)
