from condmdi_tpu.training.keyframes import get_keyframes_mask, joint_to_full_mask
from condmdi_tpu.training.loop import (
    TrainConfig,
    TrainState,
    create_train_state,
    make_optimizer,
    make_train_step,
)
