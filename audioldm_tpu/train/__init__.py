from audioldm_tpu.train.trainer import (
    TrainState,
    Trainer,
    lora_loss_fn,
    make_optimizer,
    make_train_step,
)

__all__ = ["TrainState", "Trainer", "lora_loss_fn", "make_optimizer", "make_train_step"]
