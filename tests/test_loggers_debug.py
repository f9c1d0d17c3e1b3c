"""TensorBoard event logger, MultiLogger, debug-run shortcuts, RankedLogger."""

from __future__ import annotations

import struct
from pathlib import Path

import numpy as np

from deepchopper_tpu.train.tb_logger import TensorBoardLogger, _crc32c, _masked_crc


def test_crc32c_vectors():
    # RFC 3720 test vectors
    assert _crc32c(b"") == 0x0
    assert _crc32c(b"123456789") == 0xE3069283
    assert _crc32c(bytes(32)) == 0x8A9136AA


def _read_records(path: Path):
    data = path.read_bytes()
    pos = 0
    out = []
    while pos < len(data):
        (length,) = struct.unpack_from("<Q", data, pos)
        (hcrc,) = struct.unpack_from("<I", data, pos + 8)
        assert hcrc == _masked_crc(data[pos : pos + 8])
        rec = data[pos + 12 : pos + 12 + length]
        (rcrc,) = struct.unpack_from("<I", data, pos + 12 + length)
        assert rcrc == _masked_crc(rec)
        out.append(rec)
        pos += 12 + length + 4
    return out


def test_tb_events_file_wellformed(tmp_path):
    tb = TensorBoardLogger(tmp_path)
    tb.log({"epoch": 0, "train/loss": 1.5, "val/f1": 0.25, "name": "skip-me"})
    tb.log_scalars(3, {"lr": 2e-4})
    tb.close()
    recs = _read_records(tb.path)
    assert len(recs) == 3  # file_version + 2 scalar events
    assert b"brain.Event:2" in recs[0]
    assert b"train/loss" in recs[1] and b"val/f1" in recs[1]
    # float 0.25 little-endian appears after the simple_value tag
    assert struct.pack("<f", 0.25) in recs[1]
    assert b"lr" in recs[2]


def _tiny_cfg(tmp_path, fq, **trainer_kw):
    from deepchopper_tpu.train.config import TrainConfig, load_config

    cfg = load_config(
        None,
        [
            f"data.train_data_path={fq}",
            "data.max_length=128",
            "data.tokens_per_batch=2048",
            "data.shuffle_buffer=1",
            "model.name=hyenadna-tiny-1k-seqlen",
            "trainer.n_devices=1",
            f"output_dir={tmp_path}/out",
            "test=false",
        ]
        + [f"trainer.{k}={v}" for k, v in trainer_kw.items()],
    )
    return cfg


def _make_fq(tmp_path, n=24):
    rng = np.random.default_rng(0)
    fq = tmp_path / "t.fq"
    with open(fq, "wb") as fh:
        for i in range(n):
            ln = int(rng.integers(60, 120))
            seq = "".join(rng.choice(list("ACGT"), ln))
            fh.write(b"@t%d|10:30\n%s\n+\n%s\n" % (i, seq.encode(), b"I" * ln))
    return fq


def test_fast_dev_run(tmp_path):
    from deepchopper_tpu.train.loop import Trainer

    fq = _make_fq(tmp_path)
    cfg = _tiny_cfg(tmp_path, fq, fast_dev_run=True, loggers="csv,tensorboard")
    tr = Trainer(cfg)
    tr.fit()
    assert len(tr.history) == 1
    # no checkpoints in fast_dev_run
    assert not list((tr.out_dir / "checkpoints").glob("*.ckpt"))
    # both logger backends wrote
    assert (tr.out_dir / "metrics.csv").exists()
    assert list((tr.out_dir / "tb").glob("events.out.tfevents.*"))


def test_overfit_batches(tmp_path):
    from deepchopper_tpu.train.loop import Trainer

    fq = _make_fq(tmp_path)
    cfg = _tiny_cfg(tmp_path, fq, overfit_batches=1, max_epochs=2, loggers="csv")
    tr = Trainer(cfg)

    # Validation must consume the cached overfit batches, not the val split.
    import deepchopper_tpu.data.parquet_module as pm

    def boom(self):
        raise AssertionError("val_batches must not be used in overfit mode")

    orig = pm.DataModule.val_batches
    pm.DataModule.val_batches = boom
    try:
        tr.fit()
    finally:
        pm.DataModule.val_batches = orig
    assert len(tr.history) == 2
    assert np.isfinite(tr.history[-1]["val/loss"])


def test_jsonl_and_wandb_offline_backends(tmp_path):
    """Offline experiment-tracker backends (reference default logger:
    configs/logger/wandb.yaml; csv/tensorboard covered above)."""
    import json

    from deepchopper_tpu.train.loop import MultiLogger

    ml = MultiLogger(tmp_path, "jsonl,wandb_offline", run_config={"model": {"name": "cnn"}})
    ml.log({"epoch": 0, "train/loss": 1.5, "val/f1": np.float32(0.25)})
    ml.log({"epoch": 1, "train/loss": 0.9, "val/f1": 0.5})

    rows = [json.loads(ln) for ln in (tmp_path / "metrics.jsonl").read_text().splitlines()]
    assert [r["epoch"] for r in rows] == [0, 1]
    assert rows[0]["val/f1"] == 0.25  # numpy scalars serialized as plain JSON

    run_dirs = list((tmp_path / "wandb").glob("offline-run-*"))
    assert len(run_dirs) == 1
    files = run_dirs[0] / "files"
    meta = json.loads((files / "wandb-metadata.json").read_text())
    assert meta["mode"] == "offline" and meta["config"]["model"]["name"] == "cnn"
    hist = [json.loads(ln) for ln in (files / "wandb-history.jsonl").read_text().splitlines()]
    assert [h["_step"] for h in hist] == [0, 1]
    summary = json.loads((files / "wandb-summary.json").read_text())
    assert summary["epoch"] == 1 and summary["val/f1"] == 0.5


def test_mlflow_file_store_backend(tmp_path):
    """mlflow's local file store is directories + text files — writable with
    no client and readable by a stock `mlflow ui` (reference:
    configs/logger/mlflow.yaml)."""
    from deepchopper_tpu.train.loop import MultiLogger

    ml = MultiLogger(tmp_path, "mlflow", run_config={"model.name": "hyena", "lr": 2e-4})
    ml.log({"epoch": 0, "train/loss": 1.5, "val/f1": np.float32(0.25), "note": "skipme"})
    ml.log({"epoch": 1, "train/loss": 0.9, "val/f1": 0.5})

    exp_dir = tmp_path / "mlruns" / "0"
    assert "name: deepchopper" in (exp_dir / "meta.yaml").read_text()
    run_dirs = [d for d in exp_dir.iterdir() if d.is_dir()]
    assert len(run_dirs) == 1
    run = run_dirs[0]
    meta = (run / "meta.yaml").read_text()
    assert f"run_id: {run.name}" in meta and "lifecycle_stage: active" in meta
    # params written once from run_config
    assert (run / "params" / "lr").read_text() == "0.0002"
    # metric files: "<ts_ms> <value> <step>" per line, slash keys nest
    lines = (run / "metrics" / "val" / "f1").read_text().splitlines()
    assert len(lines) == 2
    ts, val, step = lines[0].split()
    assert float(val) == 0.25 and step == "0"
    assert (run / "metrics" / "train" / "loss").exists()
    # non-numeric values are skipped, not written as metrics
    assert not (run / "metrics" / "note").exists()
    assert (run / "tags" / "mlflow.runName").read_text().startswith("run-")


def test_unknown_logger_backend_warns(caplog):
    import logging

    from deepchopper_tpu.train.loop import MultiLogger

    with caplog.at_level(logging.WARNING):
        ml = MultiLogger(Path("/tmp/unused"), "csv,bogus")
    assert len(ml.backends) == 1
    assert any("bogus" in m for m in caplog.messages)


def test_ranked_logger_and_suppress(caplog):
    import logging

    from deepchopper_tpu.utils.pylogger import RankedLogger, suppress_warnings

    lg = RankedLogger("test.ranked")
    with caplog.at_level(logging.INFO, logger="test.ranked"):
        lg.info("hello")
    assert any("[rank 0] hello" in m for m in caplog.messages)
    suppress_warnings()  # must not raise
    suppress_warnings(verbose=True)
