from serenade_tpu.trainers.train_step import (  # noqa: F401
    TrainState,
    build_optimizer,
    build_train_step,
    create_train_state,
)
from serenade_tpu.trainers.ssc import SSCTrainer, SSCTrainerNew  # noqa: F401
from serenade_tpu.trainers.distill import (  # noqa: F401
    build_distill_step,
    distill_trainable_mask,
)
