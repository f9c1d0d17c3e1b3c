"""Training plane: loss, metrics, steps, config, trainer loop."""

from .loss import continuous_interval_loss, masked_cross_entropy
from .metrics import BinaryStats, binary_stats_arrays, stats_from_array
from .step import TrainState, init_train_state, make_eval_step, make_optimizer, make_train_step

__all__ = [
    "BinaryStats",
    "TrainConfig",
    "TrainState",
    "Trainer",
    "binary_stats_arrays",
    "continuous_interval_loss",
    "evaluate",
    "init_train_state",
    "load_config",
    "make_eval_step",
    "make_optimizer",
    "make_train_step",
    "masked_cross_entropy",
    "stats_from_array",
    "train",
]


def __getattr__(name):  # lazy: loop pulls in data/parquet deps
    if name in ("Trainer", "train", "evaluate"):
        from . import loop

        return getattr(loop, name)
    if name in ("TrainConfig", "load_config"):
        from . import config

        return getattr(config, name)
    raise AttributeError(name)
