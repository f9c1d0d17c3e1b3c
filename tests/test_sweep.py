"""Hyperparameter sweep harness (reference: configs/hparams_search/hyena_optuna.yaml)."""

from __future__ import annotations

import json

import numpy as np

from deepchopper_tpu.train.config import TrainConfig
from deepchopper_tpu.train.sweep import SearchSpace, run_sweep


def test_search_space_sampling():
    space = SearchSpace(
        {
            "optimizer.lr": "interval(0.0001, 0.1)",
            "callbacks.early_stop_patience": "choice(10, 20, 40)",
            "model.name": "cnn",
        }
    )
    rng = np.random.default_rng(0)
    samples = [space.sample(rng) for _ in range(50)]
    lrs = [s["optimizer.lr"] for s in samples]
    assert all(1e-4 <= lr <= 0.1 for lr in lrs)
    # log-uniform: plenty of mass below the arithmetic midpoint
    assert sum(lr < 0.005 for lr in lrs) > 10
    assert {s["callbacks.early_stop_patience"] for s in samples} <= {"10", "20", "40"}
    assert all(s["model.name"] == "cnn" for s in samples)


def test_run_sweep_with_fake_trainer(tmp_path):
    calls = []

    def fake_train(cfg):
        calls.append(cfg)
        # best metric at high lr for determinism of ordering
        return {"best_val_f1": cfg.optimizer.lr}

    trials = run_sweep(
        TrainConfig(),
        {"optimizer.lr": "interval(0.001, 0.01)"},
        n_trials=5,
        output_dir=tmp_path,
        train_fn=fake_train,
    )
    assert len(trials) == 5 and len(calls) == 5
    metrics = [t.metric for t in trials]
    assert metrics == sorted(metrics, reverse=True)  # best-first, maximize
    results = json.loads((tmp_path / "results.json").read_text())
    assert len(results) == 5
    # each trial trained into its own output dir
    assert {c.output_dir for c in calls} == {str(tmp_path / f"trial_{i}") for i in range(5)}


def test_run_sweep_survives_failing_trial(tmp_path):
    def flaky_train(cfg):
        if cfg.optimizer.lr > 0.005:
            raise RuntimeError("diverged")
        return {"best_val_f1": 1.0 - cfg.optimizer.lr}

    trials = run_sweep(
        TrainConfig(),
        {"optimizer.lr": "interval(0.001, 0.01)"},
        n_trials=6,
        output_dir=tmp_path,
        train_fn=flaky_train,
        seed=7,
    )
    assert len(trials) == 6
    finite = [t for t in trials if np.isfinite(t.metric)]
    assert finite, "at least one trial should succeed"
    # NaN (failed) trials sort last
    assert np.isfinite(trials[0].metric)
