"""Loss: masked cross-entropy + continuity penalty.

Equivalent of `ContinuousIntervalLoss`
(reference: deepchopper/models/basic_module.py:11-31): CE ignoring -100 labels
plus lambda * mean(adjacent prediction/target disagreement). The reference
flattens the batch before the adjacency comparison (so adjacency crosses read
boundaries); here adjacency is computed within each read under the valid mask
— a deliberate fix that is identical for lambda=0 (the shipped default).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import default


def masked_cross_entropy(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    ignore_index: int = default.IGNORE_LABEL,
) -> jnp.ndarray:
    """Mean CE over positions whose label != ignore_index.

    logits: (..., C) float; labels: (...) int.
    """
    mask = labels != ignore_index
    safe_labels = jnp.where(mask, labels, 0).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    total = jnp.sum(jnp.where(mask, nll, 0.0))
    count = jnp.maximum(jnp.sum(mask), 1)
    return total / count


def continuous_interval_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    lambda_penalty: float = 0.0,
    ignore_index: int = default.IGNORE_LABEL,
) -> jnp.ndarray:
    loss = masked_cross_entropy(logits, labels, ignore_index)
    if lambda_penalty == 0.0:
        return loss
    mask = labels != ignore_index
    preds = jnp.argmax(logits, axis=-1)
    pair_mask = mask[..., 1:] & mask[..., :-1]
    disagree = (preds[..., 1:] != labels[..., :-1]) & pair_mask
    penalty = jnp.sum(disagree) / jnp.maximum(jnp.sum(pair_mask), 1)
    return loss + lambda_penalty * penalty
