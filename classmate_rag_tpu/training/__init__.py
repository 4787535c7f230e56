from classmate_rag_tpu.training.contrastive import (
    TrainState,
    encoder_param_specs,
    make_eval_step,
    make_train_step,
)

__all__ = [
    "TrainState", "encoder_param_specs", "make_eval_step", "make_train_step",
]
