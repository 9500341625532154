from graphvqa_tpu.train.losses import (
    cross_entropy, masked_token_cross_entropy, bitmap_bce, total_loss)
from graphvqa_tpu.train.metrics import (
    topk_accuracy, string_exact_match_acc, program_string_exact_match_acc)
from graphvqa_tpu.train.train_state import TrainState, create_train_state, step_lr

__all__ = [
    "cross_entropy", "masked_token_cross_entropy", "bitmap_bce", "total_loss",
    "topk_accuracy", "string_exact_match_acc", "program_string_exact_match_acc",
    "TrainState", "create_train_state", "step_lr",
]
