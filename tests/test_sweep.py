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


def test_tpe_concentrates_samples_near_optimum():
    """TPE must beat the startup-phase random samples: after observing a
    clear optimum region, suggestions concentrate there
    (reference sampler: optuna.samplers.TPESampler, hyena_optuna.yaml:40-44)."""
    from deepchopper_tpu.train.sweep import TPESampler

    space = SearchSpace({"optimizer.lr": "interval(0.0001, 0.1)"})
    tpe = TPESampler(space, seed=0, n_startup_trials=5)
    history: list[tuple[dict, float]] = []
    # objective: minimize |log(lr) - log(0.003)| (signed values: lower=better)
    import math

    target = math.log(0.003)
    for _ in range(40):
        s = tpe.suggest(history)
        history.append((s, abs(math.log(s["optimizer.lr"]) - target)))
    late = [math.exp(abs(math.log(o["optimizer.lr"]) - target) * 0 + math.log(o["optimizer.lr"]))
            for o, _ in history[-15:]]
    # most late suggestions within ~10x of the optimum
    near = sum(1 for lr in late if 0.0003 <= lr <= 0.03)
    assert near >= 10, late


def test_tpe_categorical_prefers_good_choice():
    from deepchopper_tpu.train.sweep import TPESampler

    space = SearchSpace({"model.lin1_size": "choice(128, 256, 1024)"})
    tpe = TPESampler(space, seed=1, n_startup_trials=4)
    history = []
    for _ in range(40):
        s = tpe.suggest(history)
        history.append((s, 0.0 if s["model.lin1_size"] == "256" else 1.0))
    late = [o["model.lin1_size"] for o, _ in history[-15:]]
    assert late.count("256") >= 8, late


def test_successive_halving_pruner_prunes_laggards():
    from deepchopper_tpu.train.sweep import SuccessiveHalvingPruner

    p = SuccessiveHalvingPruner(min_resource=1, reduction_factor=2, direction="maximize")
    # rungs at epochs 1, 2, 4, ... (report epoch index 0-based)
    assert p.report(0, 0.9) is False  # first at rung 1: no comparison yet
    assert p.report(0, 0.95) is False  # top half
    assert p.report(0, 0.1) is True  # clearly below the top-1/2 cutoff
    assert p.report(1, 0.9) is False  # different rung, fresh
    assert p.report(2, 0.5) is False  # epoch 3 is not a rung (1,2,4)


def test_run_sweep_prunes_via_epoch_callback(tmp_path):
    """End-to-end: run_sweep passes an epoch callback; a trial whose val/f1
    lags at a rung is pruned (fit returns early, metrics flag pruned)."""
    from deepchopper_tpu.train.loop import TrialPruned

    quality = {}

    def fake_train(cfg, epoch_callback=None):
        # per-config quality driven by lr; report 4 epochs
        q = cfg.optimizer.lr
        best = 0.0
        for epoch in range(4):
            f1 = q * (epoch + 1) / 4
            best = max(best, f1)
            if epoch_callback is not None:
                try:
                    epoch_callback({"epoch": epoch, "val/f1": f1})
                except TrialPruned:
                    return {"best_val_f1": best, "pruned": 1.0}
        return {"best_val_f1": best}

    trials = run_sweep(
        TrainConfig(),
        {"optimizer.lr": "interval(0.001, 0.01)"},
        n_trials=10,
        output_dir=tmp_path,
        train_fn=fake_train,
        seed=3,
        min_resource=1,
        reduction_factor=2,
    )
    assert len(trials) == 10
    assert any(t.pruned for t in trials), "some lagging trial should be pruned"
    assert not trials[0].pruned  # the best trial ran to completion
    # pruned trials still carry their partial metric
    assert all(np.isfinite(t.metric) for t in trials)


def test_trainer_epoch_callback_prunes(tmp_path, monkeypatch):
    """The real Trainer honors TrialPruned from its epoch callback."""
    import sys

    sys.path.insert(0, "tests")
    from test_train_harness import synth_parquet, tiny_cfg

    from deepchopper_tpu.train.loop import Trainer, TrialPruned

    ds = synth_parquet(tmp_path / "t.parquet", n=20, seed=0)
    cfg = tiny_cfg(ds, tmp_path / "out", **{"trainer.max_epochs": 5})

    def cb(row):
        if row["epoch"] >= 1:
            raise TrialPruned

    tr = Trainer(cfg, epoch_callback=cb)
    tr.fit()
    assert tr.pruned and len(tr.history) == 2


def test_minimize_sweep_prunes_high_loss_not_low(tmp_path):
    """A minimize sweep on val/loss must prune HIGH-loss trials: the pruner's
    orientation follows the monitored metric, not f1's default."""
    from deepchopper_tpu.train.loop import TrialPruned

    def fake_train(cfg, epoch_callback=None):
        loss = cfg.optimizer.lr * 100  # low lr => low loss => better
        for epoch in range(4):
            if epoch_callback is not None:
                try:
                    epoch_callback({"epoch": epoch, "val/loss": loss})
                except TrialPruned:
                    return {"best_val_loss": loss, "pruned": 1.0}
        return {"best_val_loss": loss}

    trials = run_sweep(
        TrainConfig(),
        {"optimizer.lr": "interval(0.001, 0.01)"},
        n_trials=10,
        optimized_metric="best_val_loss",
        direction="minimize",
        monitor="val/loss",
        output_dir=tmp_path,
        train_fn=fake_train,
        seed=5,
        min_resource=1,
        reduction_factor=2,
    )
    assert not trials[0].pruned  # the lowest-loss trial survived
    pruned = [t for t in trials if t.pruned]
    kept = [t for t in trials if not t.pruned]
    assert pruned, "some high-loss trial should be pruned"
    assert min(t.metric for t in pruned) >= min(t.metric for t in kept)


def test_custom_train_fn_without_callback_runs_once(tmp_path):
    """A train_fn without epoch_callback support runs exactly once per trial
    (no except-TypeError double-run that would also swallow real TypeErrors)."""
    calls = []

    def plain_train(cfg):
        calls.append(cfg.optimizer.lr)
        return {"best_val_f1": 0.5}

    trials = run_sweep(
        TrainConfig(),
        {"optimizer.lr": "interval(0.001, 0.01)"},
        n_trials=3,
        output_dir=tmp_path,
        train_fn=plain_train,
        seed=2,
    )
    assert len(calls) == 3
    assert all(np.isfinite(t.metric) for t in trials)


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
