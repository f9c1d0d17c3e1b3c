"""Binary classification metrics with ignore-index masking.

Equivalent of the torchmetrics F1/Precision/Recall stack
(reference: deepchopper/models/basic_module.py:66-88). Stats are additive
int64 counts, so multi-device reduction is a plain psum / host sum — the
TPU-native version of `sync_dist=True`.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from .. import default


@dataclasses.dataclass
class BinaryStats:
    tp: int = 0
    fp: int = 0
    fn: int = 0
    tn: int = 0

    def __add__(self, other: "BinaryStats") -> "BinaryStats":
        return BinaryStats(
            self.tp + other.tp, self.fp + other.fp, self.fn + other.fn, self.tn + other.tn
        )

    @property
    def precision(self) -> float:
        d = self.tp + self.fp
        return self.tp / d if d else 0.0

    @property
    def recall(self) -> float:
        d = self.tp + self.fn
        return self.tp / d if d else 0.0

    @property
    def f1(self) -> float:
        p, r = self.precision, self.recall
        return 2 * p * r / (p + r) if (p + r) else 0.0

    @property
    def accuracy(self) -> float:
        total = self.tp + self.fp + self.fn + self.tn
        return (self.tp + self.tn) / total if total else 0.0


def binary_stats_arrays(
    preds: jnp.ndarray,
    labels: jnp.ndarray,
    ignore_index: int = default.IGNORE_LABEL,
) -> jnp.ndarray:
    """(tp, fp, fn, tn) as a length-4 int32 vector — jit/psum friendly."""
    mask = labels != ignore_index
    pred_pos = (preds == 1) & mask
    lab_pos = (labels == 1) & mask
    tp = jnp.sum(pred_pos & lab_pos)
    fp = jnp.sum(pred_pos & ~lab_pos)
    fn = jnp.sum(~pred_pos & lab_pos & mask)
    tn = jnp.sum(~pred_pos & ~lab_pos & mask)
    return jnp.stack([tp, fp, fn, tn]).astype(jnp.int32)


def stats_from_array(arr) -> BinaryStats:
    tp, fp, fn, tn = (int(x) for x in arr)
    return BinaryStats(tp, fp, fn, tn)
