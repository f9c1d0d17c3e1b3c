"""Training/eval orchestration: the reference's Lightning harness, TPU-native.

Replaces `train(cfg)` / `evaluate(cfg)` (reference: deepchopper/train.py:29-109,
deepchopper/eval.py:23-87) plus the callback stack
(reference: configs/callbacks/default.yaml — ModelCheckpoint top-1 on val/f1
max + save_last, EarlyStopping patience 40) and the ReduceLROnPlateau
scheduler (reference: configs/model/hyena.yaml scheduler block — mode min on
val/loss, factor 0.1, patience 10).

Design: one jitted train step over a 1-axis data-parallel mesh. Params and
optimizer state are replicated; the batch axis is sharded, so XLA lowers the
gradient all-reduce onto ICI — the DDP equivalent. The learning rate lives
inside the optimizer state via `optax.inject_hyperparams`, so the plateau
scheduler just rewrites one scalar leaf between epochs with zero recompiles.
"""

from __future__ import annotations

import csv
import dataclasses
import json
import logging
import time
from pathlib import Path
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..data.parquet_module import DataModule
from ..models.registry import DeepChopper, ModelBundle, save_checkpoint
from ..parallel.mesh import batch_sharding, make_mesh, replicate, replicated_sharding
from .config import TrainConfig
from .metrics import BinaryStats, stats_from_array
from .step import TrainState, init_train_state, make_eval_step, make_train_step

log = logging.getLogger(__name__)


def make_plateau_optimizer(lr: float, weight_decay: float = 0.0) -> optax.GradientTransformation:
    """Adam with the learning rate exposed as an opt-state leaf."""
    if weight_decay:
        return optax.inject_hyperparams(optax.adamw)(learning_rate=lr, weight_decay=weight_decay)
    return optax.inject_hyperparams(optax.adam)(learning_rate=lr)


def _find_inject_index(opt_state: Any) -> int | None:
    """Locate the InjectHyperparamsState inside a possibly-chained opt state."""
    if hasattr(opt_state, "hyperparams"):
        return -1  # opt_state itself
    if isinstance(opt_state, tuple):
        for i, s in enumerate(opt_state):
            if hasattr(s, "hyperparams"):
                return i
    return None


def _get_lr(state: TrainState) -> float:
    idx = _find_inject_index(state.opt_state)
    inner = state.opt_state if idx == -1 else state.opt_state[idx]
    return float(inner.hyperparams["learning_rate"])


def _set_lr(state: TrainState, lr: float) -> TrainState:
    idx = _find_inject_index(state.opt_state)
    inner = state.opt_state if idx == -1 else state.opt_state[idx]
    hp = dict(inner.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
    new_inner = inner._replace(hyperparams=hp)
    if idx == -1:
        return state._replace(opt_state=new_inner)
    outer = tuple(new_inner if i == idx else s for i, s in enumerate(state.opt_state))
    return state._replace(opt_state=outer)


@dataclasses.dataclass
class PlateauScheduler:
    """ReduceLROnPlateau (reference: torch.optim.lr_scheduler.ReduceLROnPlateau
    wired at configs/model/hyena.yaml — mode=min, factor=0.1, patience=10)."""

    factor: float = 0.1
    patience: int = 10
    min_lr: float = 0.0
    best: float = float("inf")
    bad_epochs: int = 0

    def step(self, metric: float, lr: float) -> float:
        if metric < self.best:
            self.best = metric
            self.bad_epochs = 0
            return lr
        self.bad_epochs += 1
        if self.bad_epochs > self.patience:
            self.bad_epochs = 0
            return max(lr * self.factor, self.min_lr)
        return lr


@dataclasses.dataclass
class EarlyStopping:
    """Reference: configs/callbacks/default.yaml early_stopping block."""

    patience: int = 40
    mode: str = "max"
    min_delta: float = 0.0
    best: float | None = None
    bad_epochs: int = 0

    def improved(self, value: float) -> bool:
        if self.best is None:
            return True
        if self.mode == "max":
            return value > self.best + self.min_delta
        return value < self.best - self.min_delta

    def step(self, value: float) -> bool:
        """Record a metric; returns True when training should stop."""
        if self.improved(value):
            self.best = value
            self.bad_epochs = 0
            return False
        self.bad_epochs += 1
        return self.bad_epochs >= self.patience


class CsvLogger:
    """Per-epoch metrics CSV (reference capability: configs/logger/csv.yaml)."""

    def __init__(self, path: Path):
        self.path = path
        self._fields: list[str] | None = None

    def log(self, row: dict[str, Any]) -> None:
        row = {k: (f"{v:.6g}" if isinstance(v, float) else v) for k, v in row.items()}
        new = self._fields is None
        if new:
            self._fields = list(row)
            self.path.parent.mkdir(parents=True, exist_ok=True)
        with open(self.path, "a", newline="") as fh:
            w = csv.DictWriter(fh, fieldnames=self._fields, extrasaction="ignore")
            if new:
                w.writeheader()
            w.writerow(row)


class JsonlLogger:
    """Per-epoch metrics as JSON lines — the machine-readable run log
    (reference capability: the experiment-tracker backends of
    configs/logger/*.yaml, reduced to their offline/file mode)."""

    def __init__(self, path: Path):
        self.path = path

    def log(self, row: dict[str, Any]) -> None:
        self.path.parent.mkdir(parents=True, exist_ok=True)
        with open(self.path, "a") as fh:
            fh.write(json.dumps({k: _jsonable(v) for k, v in row.items()}) + "\n")


def _jsonable(v: Any) -> Any:
    if isinstance(v, (np.floating, np.integer)):
        return v.item()
    return v


class WandbOfflineLogger:
    """File-based wandb-offline run directory (reference default logger:
    configs/logger/wandb.yaml). The network client isn't in this environment,
    so the backend writes the offline run-dir contract directly:
    `wandb/offline-run-<stamp>/files/` with `wandb-metadata.json` (run config),
    an appended `wandb-history.jsonl` (one row per epoch, `_step` keyed), and
    `wandb-summary.json` rewritten to the latest row — the same files a
    `wandb sync`-able offline run exposes to readers."""

    def __init__(self, out_dir: Path, run_config: dict[str, Any] | None = None):
        stamp = time.strftime("%Y%m%d_%H%M%S")
        self.run_dir = out_dir / "wandb" / f"offline-run-{stamp}"
        self.files_dir = self.run_dir / "files"
        self._step = 0
        self._started = False
        self._run_config = run_config or {}

    def _start(self) -> None:
        import platform

        self.files_dir.mkdir(parents=True, exist_ok=True)
        meta = {
            "mode": "offline",
            "startedAt": time.strftime("%Y-%m-%dT%H:%M:%S"),
            "host": platform.node(),
            "python": platform.python_version(),
            "config": self._run_config,
        }
        (self.files_dir / "wandb-metadata.json").write_text(json.dumps(meta, indent=1) + "\n")
        self._started = True

    def log(self, row: dict[str, Any]) -> None:
        if not self._started:
            self._start()
        rec = {"_step": self._step, "_timestamp": time.time()}
        rec.update({k: _jsonable(v) for k, v in row.items()})
        with open(self.files_dir / "wandb-history.jsonl", "a") as fh:
            fh.write(json.dumps(rec) + "\n")
        (self.files_dir / "wandb-summary.json").write_text(json.dumps(rec) + "\n")
        self._step += 1


class MlflowFileLogger:
    """mlflow local file-store run directory (reference:
    configs/logger/mlflow.yaml). mlflow's default tracking backend is just a
    `./mlruns` directory tree — no client or network needed to WRITE it, and
    a stock `mlflow ui` pointed at the directory reads it:

        mlruns/0/meta.yaml                  experiment metadata
        mlruns/0/<run_id>/meta.yaml         run metadata
        mlruns/0/<run_id>/metrics/<key>     lines of "<ts_ms> <value> <step>"
        mlruns/0/<run_id>/params/<key>      one value per file
        mlruns/0/<run_id>/tags/mlflow.runName

    (neptune/comet/aim — the reference's remaining logger backends — are
    network-client-bound and intentionally absent; see docs/logging.md.)"""

    EXPERIMENT_ID = "0"

    def __init__(self, out_dir: Path, run_config: dict[str, Any] | None = None):
        import uuid

        self.root = out_dir / "mlruns"
        self.run_id = uuid.uuid4().hex
        self.exp_dir = self.root / self.EXPERIMENT_ID
        self.run_dir = self.exp_dir / self.run_id
        self._run_config = run_config or {}
        self._started = False
        self._start_ms = 0
        self._step = 0

    def _start(self) -> None:
        now_ms = int(time.time() * 1000)
        self._start_ms = now_ms
        (self.run_dir / "metrics").mkdir(parents=True, exist_ok=True)
        (self.run_dir / "params").mkdir(exist_ok=True)
        (self.run_dir / "tags").mkdir(exist_ok=True)
        (self.run_dir / "artifacts").mkdir(exist_ok=True)
        exp_meta = self.exp_dir / "meta.yaml"
        if not exp_meta.exists():
            exp_meta.write_text(
                f"artifact_location: {self.exp_dir.resolve().as_uri()}\n"
                f"creation_time: {now_ms}\n"
                f"experiment_id: '{self.EXPERIMENT_ID}'\n"
                f"last_update_time: {now_ms}\n"
                "lifecycle_stage: active\n"
                "name: deepchopper\n"
            )
        (self.run_dir / "meta.yaml").write_text(
            f"artifact_uri: {(self.run_dir / 'artifacts').resolve().as_uri()}\n"
            "end_time: null\n"
            "entry_point_name: ''\n"
            f"experiment_id: '{self.EXPERIMENT_ID}'\n"
            "lifecycle_stage: active\n"
            f"run_id: {self.run_id}\n"
            f"run_name: run-{self.run_id[:8]}\n"
            f"run_uuid: {self.run_id}\n"
            "source_name: ''\n"
            "source_type: 4\n"
            "source_version: ''\n"
            f"start_time: {now_ms}\n"
            "status: 1\n"
            "user_id: deepchopper\n"
        )
        (self.run_dir / "tags" / "mlflow.runName").write_text(f"run-{self.run_id[:8]}")
        for key, val in self._run_config.items():
            safe = str(key).replace("/", "_")
            (self.run_dir / "params" / safe).write_text(str(val))
        self._started = True

    def log(self, row: dict[str, Any]) -> None:
        if not self._started:
            self._start()
        ts = int(time.time() * 1000)
        step = int(row.get("epoch", self._step))
        for key, val in row.items():
            if not isinstance(val, (int, float, np.floating, np.integer)):
                continue
            path = self.run_dir / "metrics" / str(key)
            path.parent.mkdir(parents=True, exist_ok=True)  # keys may contain '/'
            with open(path, "a") as fh:
                fh.write(f"{ts} {_jsonable(val)} {step}\n")
        self._step += 1


class MultiLogger:
    """Fan a metrics row out to several backends
    (csv, tensorboard, jsonl, wandb-offline, mlflow file store)."""

    def __init__(self, out_dir: Path, names: str, run_config: dict[str, Any] | None = None):
        self.backends: list[Any] = []
        for name in (n.strip() for n in names.split(",") if n.strip()):
            if name == "csv":
                self.backends.append(CsvLogger(out_dir / "metrics.csv"))
            elif name == "tensorboard":
                from .tb_logger import TensorBoardLogger

                self.backends.append(TensorBoardLogger(out_dir / "tb"))
            elif name == "jsonl":
                self.backends.append(JsonlLogger(out_dir / "metrics.jsonl"))
            elif name in ("wandb", "wandb_offline"):
                self.backends.append(WandbOfflineLogger(out_dir, run_config))
            elif name == "mlflow":
                self.backends.append(MlflowFileLogger(out_dir, run_config))
            else:
                log.warning(
                    "unknown logger backend %r "
                    "(csv, tensorboard, jsonl, wandb_offline, mlflow)",
                    name,
                )

    def log(self, row: dict[str, Any]) -> None:
        for b in self.backends:
            b.log(dict(row))


def param_count(params: Any) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))


class TrialPruned(Exception):
    """Raised by an epoch callback to stop an unpromising sweep trial early
    (capability of the reference's Optuna pruning hooks,
    configs/hparams_search/hyena_optuna.yaml)."""


class Trainer:
    """Epoch loop + callbacks over the jitted data-parallel step."""

    def __init__(self, cfg: TrainConfig, epoch_callback=None):
        """`epoch_callback(row)` is invoked after every epoch with the metrics
        row; raising `TrialPruned` from it ends fit() early (sweep pruning)."""
        self.cfg = cfg
        self.out_dir = Path(cfg.output_dir) / cfg.task_name
        self.ckpt_dir = self.out_dir / "checkpoints"
        self.logger = MultiLogger(self.out_dir, cfg.trainer.loggers, dataclasses.asdict(cfg))
        self.mesh = make_mesh(cfg.trainer.n_devices)
        self.history: list[dict[str, float]] = []
        self.best_ckpt_path: Path | None = None
        self.epoch_callback = epoch_callback
        self.pruned = False

    # -- setup -------------------------------------------------------------

    def _build(self) -> tuple[ModelBundle, TrainState, Any, Any]:
        cfg = self.cfg
        head_overrides = {
            k: v
            for k, v in (
                ("lin1_size", cfg.model.lin1_size),
                ("use_identity_layer_for_qual", cfg.model.use_identity_layer_for_qual),
            )
            if v is not None
        }
        if cfg.model.checkpoint:
            # head_overrides must flow here too: the test-on-best/eval path
            # rebuilds from the trial's checkpoint, whose head shapes match
            # the overridden config, not the registry default.
            bundle = DeepChopper.from_checkpoint(
                cfg.model.checkpoint, cfg.model.name, head_overrides=head_overrides or None
            )
        elif cfg.model.torch_checkpoint:
            bundle = DeepChopper.from_pretrained(
                cfg.model.name, torch_checkpoint=cfg.model.torch_checkpoint
            )
        else:
            bundle = DeepChopper.new(
                cfg.model.name, seed=cfg.seed or 0, head_overrides=head_overrides or None
            )

        tx = make_plateau_optimizer(cfg.optimizer.lr, cfg.optimizer.weight_decay)
        if cfg.trainer.gradient_clip:
            tx = optax.chain(optax.clip_by_global_norm(cfg.trainer.gradient_clip), tx)
        state = init_train_state(bundle.params, tx)
        state = replicate(state, self.mesh)

        step = make_train_step(bundle.module.apply, tx, cfg.model.lambda_penalty)
        jit_train = jax.jit(
            step,
            in_shardings=(replicated_sharding(self.mesh), batch_sharding(self.mesh)),
            out_shardings=(replicated_sharding(self.mesh), replicated_sharding(self.mesh)),
        )
        ev = make_eval_step(bundle.module.apply, cfg.model.lambda_penalty)

        def eval_metrics_only(params, batch):
            out = ev(params, batch)
            return {"loss": out["loss"], "stats": out["stats"]}

        jit_eval = jax.jit(
            eval_metrics_only,
            in_shardings=(replicated_sharding(self.mesh), batch_sharding(self.mesh)),
            out_shardings=replicated_sharding(self.mesh),
        )
        return bundle, state, jit_train, jit_eval

    def _device_batch(self, batch) -> dict[str, jnp.ndarray]:
        n = self.mesh.devices.size
        b = batch.input_ids.shape[0]
        # Round the batch axis up to a multiple of max(mesh, 8): tail batches
        # otherwise produce a fresh shape (= fresh XLA compile) every epoch.
        step_mult = max(n, 8)
        pad = (-b) % step_mult
        ids, quals, labels = batch.input_ids, batch.quals, batch.labels
        if pad:
            from .. import default

            ids = np.concatenate([ids, np.full((pad, ids.shape[1]), default.TOKEN_PAD, ids.dtype)])
            quals = np.concatenate([quals, np.zeros((pad, quals.shape[1]), quals.dtype)])
            labels = np.concatenate(
                [labels, np.full((pad, labels.shape[1]), default.IGNORE_LABEL, labels.dtype)]
            )
        sharding = batch_sharding(self.mesh)
        return {
            "input_ids": jax.device_put(ids, sharding),
            "input_quals": jax.device_put(quals, sharding),
            "labels": jax.device_put(labels, sharding),
        }

    # -- loops -------------------------------------------------------------

    def _run_eval(self, jit_eval, params, batches, limit: int | None) -> dict[str, float]:
        total = BinaryStats()
        losses: list[float] = []
        for i, batch in enumerate(batches):
            if limit is not None and i >= limit:
                break
            out = jit_eval(params, self._device_batch(batch))
            losses.append(float(out["loss"]))
            total = total + stats_from_array(np.asarray(out["stats"]))
        return {
            "loss": float(np.mean(losses)) if losses else float("nan"),
            "f1": total.f1,
            "precision": total.precision,
            "recall": total.recall,
            "acc": total.accuracy,
        }

    def fit(self, datamodule: DataModule | None = None) -> dict[str, float]:
        cfg = self.cfg
        dm = datamodule or DataModule(**dataclasses.asdict(cfg.data))
        save_ckpts = True
        if cfg.trainer.fast_dev_run:
            # One batch, one epoch, no checkpoints — smoke the full loop
            # (reference: configs/debug/fdr.yaml).
            cfg = dataclasses.replace(
                cfg,
                trainer=dataclasses.replace(
                    cfg.trainer, max_epochs=1, limit_train_batches=1, limit_val_batches=1
                ),
            )
            save_ckpts = False
            log.info("fast_dev_run: 1 batch / 1 epoch / no checkpoints")
        overfit_cache: list | None = None
        if cfg.trainer.overfit_batches:
            # Train AND validate on the same cached batches
            # (reference: configs/debug/overfit.yaml).
            import itertools

            overfit_cache = list(
                itertools.islice(dm.train_batches(0), cfg.trainer.overfit_batches)
            )
            log.info("overfit mode: %d cached batches", len(overfit_cache))
        bundle, state, jit_train, jit_eval = self._build()
        log.info("model %s: %d params", cfg.model.name, param_count(bundle.params))
        self.out_dir.mkdir(parents=True, exist_ok=True)

        from .config import save_config

        save_config(cfg, self.out_dir / "config.yaml")
        from .config import format_config_tree

        log.info("run config:\n%s", format_config_tree(cfg))

        plateau = PlateauScheduler(
            cfg.optimizer.plateau_factor, cfg.optimizer.plateau_patience, cfg.optimizer.min_lr
        )
        stopper = EarlyStopping(
            cfg.callbacks.early_stop_patience, cfg.callbacks.monitor_mode, cfg.callbacks.min_delta
        )
        best_metric: float | None = None
        mode_max = cfg.callbacks.monitor_mode == "max"

        start_epoch = 0
        if cfg.ckpt_path:
            state, start_epoch, best_metric = self._restore(cfg.ckpt_path, state)
            log.info("resumed from %s at epoch %d", cfg.ckpt_path, start_epoch)
            if best_metric is not None:
                stopper.best = best_metric

        for epoch in range(start_epoch, cfg.trainer.max_epochs):
            t0 = time.monotonic()
            train_stats = BinaryStats()
            train_losses: list[float] = []
            train_src = overfit_cache if overfit_cache is not None else dm.train_batches(epoch)
            for i, batch in enumerate(train_src):
                if (
                    cfg.trainer.limit_train_batches is not None
                    and i >= cfg.trainer.limit_train_batches
                ):
                    break
                state, aux = jit_train(state, self._device_batch(batch))
                train_losses.append(float(aux["loss"]))
                train_stats = train_stats + stats_from_array(np.asarray(aux["stats"]))
                if i % cfg.trainer.log_every_n_steps == 0:
                    log.info("epoch %d step %d loss=%.4f", epoch, i, train_losses[-1])

            val = self._run_eval(
                jit_eval,
                state.params,
                iter(overfit_cache) if overfit_cache is not None else dm.val_batches(),
                cfg.trainer.limit_val_batches,
            )
            lr = _get_lr(state)
            new_lr = plateau.step(val["loss"], lr)
            if new_lr != lr:
                log.info("plateau: lr %.2e -> %.2e", lr, new_lr)
                state = _set_lr(state, new_lr)

            row = {
                "epoch": epoch,
                "train/loss": float(np.mean(train_losses)) if train_losses else float("nan"),
                "train/f1": train_stats.f1,
                "val/loss": val["loss"],
                "val/f1": val["f1"],
                "val/precision": val["precision"],
                "val/recall": val["recall"],
                "lr": new_lr,
                "time_s": time.monotonic() - t0,
            }
            self.history.append(row)
            self.logger.log(row)
            log.info(
                "epoch %d: train/loss=%.4f val/loss=%.4f val/f1=%.4f (%.1fs)",
                epoch,
                row["train/loss"],
                val["loss"],
                val["f1"],
                row["time_s"],
            )

            monitored = val[cfg.callbacks.monitor.split("/")[-1]]
            improved = best_metric is None or (
                monitored > best_metric if mode_max else monitored < best_metric
            )
            if improved:
                best_metric = monitored
                if save_ckpts:
                    self.best_ckpt_path = self.ckpt_dir / f"epoch_{epoch:03d}_f1_{val['f1']:.4f}.ckpt"
                    self._save(self.best_ckpt_path, state, epoch, best_metric)
                    log.info("new best %s=%.4f -> %s", cfg.callbacks.monitor, monitored, self.best_ckpt_path)
            if cfg.callbacks.save_last and save_ckpts:
                self._save(self.ckpt_dir / "last.ckpt", state, epoch, best_metric)

            if self.epoch_callback is not None:
                try:
                    self.epoch_callback(row)
                except TrialPruned:
                    self.pruned = True
                    log.info("trial pruned at epoch %d", epoch)
                    break

            if stopper.step(monitored):
                log.info("early stopping at epoch %d (patience %d)", epoch, stopper.patience)
                break

        result = {
            "best_"
            + cfg.callbacks.monitor.replace("/", "_"): (
                best_metric if best_metric is not None else float("nan")
            )
        }
        (self.out_dir / "result.json").write_text(json.dumps(result))
        return result

    def test(self, datamodule: DataModule | None = None, ckpt_path: str | Path | None = None) -> dict[str, float]:
        """Test on the best checkpoint (reference: train.py:77-84 test-on-best)."""
        cfg = self.cfg
        dm = datamodule or DataModule(**dataclasses.asdict(cfg.data))
        ckpt = ckpt_path or self.best_ckpt_path
        if ckpt is not None:
            cfg = dataclasses.replace(cfg, model=dataclasses.replace(cfg.model, checkpoint=str(ckpt)))
            self.cfg = cfg
        bundle, state, _jit_train, jit_eval = self._build()
        metrics = self._run_eval(jit_eval, state.params, dm.test_batches(), None)
        row = {"epoch": -1, **{f"test/{k}": v for k, v in metrics.items()}}
        (self.out_dir / "test_metrics.json").write_text(json.dumps(row))
        log.info("test: %s", row)
        return metrics

    # -- checkpoint io -----------------------------------------------------

    def _save(self, path: Path, state: TrainState, epoch: int, best: float | None) -> None:
        from flax import serialization

        save_checkpoint(
            path,
            jax.device_get(state.params),
            {
                "epoch": epoch,
                "step": int(state.step),
                "best_metric": best,
                "model": self.cfg.model.name,
                "lr": _get_lr(state),
                # Full optimizer state rides along so resume keeps Adam moments.
                "opt_state_msgpack": serialization.to_bytes(jax.device_get(state.opt_state)),
            },
        )

    def _restore(self, path: str | Path, state: TrainState) -> tuple[TrainState, int, float | None]:
        from flax import serialization

        from ..models.registry import load_checkpoint

        params, meta = load_checkpoint(path, jax.device_get(state.params))
        state = state._replace(params=replicate(params, self.mesh))
        if meta.get("opt_state_msgpack"):
            opt_state = serialization.from_bytes(
                jax.device_get(state.opt_state), meta["opt_state_msgpack"]
            )
            state = state._replace(opt_state=replicate(opt_state, self.mesh))
        elif meta.get("lr") is not None:
            state = _set_lr(state, float(meta["lr"]))
        return state, int(meta.get("epoch", -1)) + 1, meta.get("best_metric")


# ---------------------------------------------------------------------------
# Task entry points (reference: deepchopper/train.py:94-109, eval.py:76-87)
# ---------------------------------------------------------------------------


def train(cfg: TrainConfig, epoch_callback=None) -> dict[str, float]:
    """Train, then test on the best checkpoint when cfg.test is set."""
    if cfg.seed is not None:
        np.random.seed(cfg.seed)
    trainer = Trainer(cfg, epoch_callback=epoch_callback)
    metrics: dict[str, float] = {}
    if cfg.train:
        metrics.update(trainer.fit())
        if trainer.pruned:
            metrics["pruned"] = 1.0
    if cfg.test and not trainer.pruned:
        metrics.update({f"test/{k}": v for k, v in trainer.test().items()})
    return metrics


def evaluate(cfg: TrainConfig) -> dict[str, float]:
    """Evaluate a checkpoint on the test split, or predict when
    predict_data_path is set (reference: deepchopper/eval.py:23-73)."""
    trainer = Trainer(cfg)
    if cfg.data.predict_data_path:
        from ..infer import PredictEngine

        bundle = (
            DeepChopper.from_checkpoint(cfg.model.checkpoint, cfg.model.name)
            if cfg.model.checkpoint
            else DeepChopper.new(cfg.model.name)
        )
        engine = PredictEngine(
            bundle,
            max_length=cfg.data.max_length,
            tokens_per_batch=cfg.data.tokens_per_batch,
        )
        stats = engine.predict_file(cfg.data.predict_data_path, trainer.out_dir / "predictions")
        return {"predict/reads": float(stats.reads)}
    return {f"test/{k}": v for k, v in trainer.test(ckpt_path=cfg.model.checkpoint).items()}
