"""Jittable train/eval steps, mesh-sharded data-parallel.

TPU-native replacement for the Lightning module's step methods
(reference: deepchopper/models/basic_module.py:110-207). The step is a pure
function over (params, opt_state, batch); under jit with a sharded batch and
replicated params, XLA inserts the gradient all-reduce over the mesh — the
DDP equivalent with zero custom communication code.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from .loss import continuous_interval_loss
from .metrics import binary_stats_arrays


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(
    learning_rate: float | Callable = 2e-4, weight_decay: float = 0.0
) -> optax.GradientTransformation:
    """Adam(2e-4) per the reference recipe (reference: dc_hg.py:155-158)."""
    if weight_decay:
        return optax.adamw(learning_rate, weight_decay=weight_decay)
    return optax.adam(learning_rate)


def init_train_state(params: Any, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))


def make_train_step(
    apply_fn: Callable,
    tx: optax.GradientTransformation,
    lambda_penalty: float = 0.0,
):
    """Returns a jittable step: (state, batch) -> (state, aux dict)."""

    def step(state: TrainState, batch: dict[str, jnp.ndarray]):
        def loss_fn(params):
            logits = apply_fn({"params": params}, batch["input_ids"], batch["input_quals"])
            loss = continuous_interval_loss(logits, batch["labels"], lambda_penalty)
            return loss, logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        preds = jnp.argmax(logits, axis=-1)
        stats = binary_stats_arrays(preds, batch["labels"])
        new_state = TrainState(params=params, opt_state=opt_state, step=state.step + 1)
        return new_state, {"loss": loss, "stats": stats}

    return step


def make_eval_step(apply_fn: Callable, lambda_penalty: float = 0.0):
    def step(params: Any, batch: dict[str, jnp.ndarray]):
        logits = apply_fn({"params": params}, batch["input_ids"], batch["input_quals"])
        loss = continuous_interval_loss(logits, batch["labels"], lambda_penalty)
        preds = jnp.argmax(logits, axis=-1)
        return {"loss": loss, "stats": binary_stats_arrays(preds, batch["labels"]), "logits": logits}

    return step
