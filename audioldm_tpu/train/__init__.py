from audioldm_tpu.train.distill import (
    DistillState,
    distill_loss_fn,
    init_distill_state,
    make_distill_step,
)
from audioldm_tpu.train.trainer import (
    TrainState,
    Trainer,
    lora_loss_fn,
    make_optimizer,
    make_train_step,
)

__all__ = [
    "DistillState",
    "TrainState",
    "Trainer",
    "distill_loss_fn",
    "init_distill_state",
    "lora_loss_fn",
    "make_distill_step",
    "make_optimizer",
    "make_train_step",
]
