"""Training plane: loss, metrics, steps, loop."""

from .loss import continuous_interval_loss, masked_cross_entropy
from .metrics import BinaryStats, binary_stats_arrays, stats_from_array
from .step import TrainState, init_train_state, make_eval_step, make_optimizer, make_train_step

__all__ = [
    "BinaryStats",
    "TrainState",
    "binary_stats_arrays",
    "continuous_interval_loss",
    "init_train_state",
    "make_eval_step",
    "make_optimizer",
    "make_train_step",
    "masked_cross_entropy",
    "stats_from_array",
]
