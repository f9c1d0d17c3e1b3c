"""Training harness: config tree, data module splits, trainer loop, callbacks.

Covers the capabilities of the reference's Hydra+Lightning harness
(reference: deepchopper/train.py:29-109, configs/callbacks/default.yaml,
configs/model/hyena.yaml scheduler block) on a tiny model + synthetic data.
"""

from __future__ import annotations

import numpy as np
import pytest

from deepchopper_tpu.train.config import TrainConfig, apply_override, load_config, save_config
from deepchopper_tpu.train.loop import EarlyStopping, PlateauScheduler, Trainer, train


def synth_parquet(path, n=60, seed=0, with_adapter=True):
    """Labeled dataset: reads with an embedded all-A adapter marked as target."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        L = int(rng.integers(80, 180))
        seq = "".join(rng.choice(list("ACGT"), L))
        s = int(rng.integers(10, L - 30))
        e = s + 20
        if with_adapter:
            seq = seq[:s] + "A" * 20 + seq[e:]
        rows.append(
            {
                "id": f"read{i}|{s}:{e}",
                "seq": seq,
                "qual": rng.integers(5, 40, L).astype(np.int32).tolist(),
                "target": [s, e],
            }
        )
    schema = pa.schema(
        [
            pa.field("id", pa.string()),
            pa.field("seq", pa.string()),
            pa.field("qual", pa.list_(pa.int32())),
            pa.field("target", pa.list_(pa.int32())),
        ]
    )
    pq.write_table(pa.Table.from_pylist(rows, schema=schema), path)
    return path


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    return synth_parquet(tmp_path_factory.mktemp("data") / "train.parquet")


def synth_separable_parquet(path, n=160, seed=0):
    """A cleanly-learnable dataset: fixed-length reads with a 60-base all-A
    adapter whose flanking bases are guaranteed non-A, so the label boundary
    is exactly the maximal A-run and boundary tokens are unambiguous.

    Fixed length => every read buckets to one (rows, width) shape, so the
    whole fit pays exactly one train-step and one eval-step compile.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    rows = []
    L, A = 180, 60
    for i in range(n):
        seq = list("".join(rng.choice(list("ACGT"), L)))
        s = int(rng.integers(10, L - A - 20))
        e = s + A
        seq[s:e] = "A" * A
        seq[s - 1] = rng.choice(list("CGT"))
        seq[e] = rng.choice(list("CGT"))
        rows.append(
            {
                "id": f"read{i}|{s}:{e}",
                "seq": "".join(seq),
                "qual": rng.integers(5, 40, L).astype(np.int32).tolist(),
                "target": [s, e],
            }
        )
    schema = pa.schema(
        [
            pa.field("id", pa.string()),
            pa.field("seq", pa.string()),
            pa.field("qual", pa.list_(pa.int32())),
            pa.field("target", pa.list_(pa.int32())),
        ]
    )
    pq.write_table(pa.Table.from_pylist(rows, schema=schema), path)
    return path


@pytest.fixture(scope="module")
def sep_dataset(tmp_path_factory):
    return synth_separable_parquet(tmp_path_factory.mktemp("sepdata") / "train.parquet")


def tiny_cfg(dataset, out_dir, **over) -> TrainConfig:
    cfg = load_config(
        None,
        [
            f"data.train_data_path={dataset}",
            "data.max_length=256",
            "data.tokens_per_batch=4096",
            "data.shuffle_buffer=16",
            "model.name=hyenadna-tiny-1k-seqlen",
            "trainer.max_epochs=2",
            "optimizer.lr=0.001",
            f"output_dir={out_dir}",
            "test=false",
        ]
        + [f"{k}={v}" for k, v in over.items()],
    )
    return cfg


# -- config system ----------------------------------------------------------


def test_config_yaml_roundtrip(tmp_path):
    cfg = TrainConfig()
    cfg.model.name = "cnn"
    cfg.optimizer.lr = 3e-4
    save_config(cfg, tmp_path / "c.yaml")
    loaded = load_config(tmp_path / "c.yaml")
    assert loaded.model.name == "cnn"
    assert loaded.optimizer.lr == 3e-4
    assert loaded.callbacks.early_stop_patience == 40


def test_config_overrides():
    cfg = load_config(None, ["trainer.max_epochs=7", "model.lambda_penalty=0.5", "seed=3", "train=false"])
    assert cfg.trainer.max_epochs == 7
    assert cfg.model.lambda_penalty == 0.5
    assert cfg.seed == 3
    assert cfg.train is False


def test_config_unknown_key_raises():
    cfg = TrainConfig()
    with pytest.raises(KeyError):
        apply_override(cfg, "model.nonexistent", "1")


# -- callbacks --------------------------------------------------------------


def test_plateau_scheduler_reduces_after_patience():
    s = PlateauScheduler(factor=0.1, patience=2)
    lr = 1.0
    lr = s.step(1.0, lr)  # best
    for _ in range(2):
        lr = s.step(1.5, lr)
    assert lr == 1.0  # within patience
    lr = s.step(1.5, lr)  # patience exceeded
    assert lr == pytest.approx(0.1)


def test_early_stopping_max_mode():
    es = EarlyStopping(patience=2, mode="max")
    assert not es.step(0.5)
    assert not es.step(0.4)
    assert es.step(0.4)  # second bad epoch hits patience
    assert es.best == 0.5


# -- data module ------------------------------------------------------------


def test_datamodule_ratio_split_partitions(dataset):
    from deepchopper_tpu.data.parquet_module import DataModule

    dm = DataModule(train_data_path=str(dataset), max_length=256, tokens_per_batch=4096)
    n_train = sum(b.input_ids.shape[0] for b in dm.train_batches())
    n_val = sum(b.input_ids.shape[0] for b in dm.val_batches())
    n_test = sum(b.input_ids.shape[0] for b in dm.test_batches())
    assert n_train + n_val + n_test == 60
    assert n_train == 48 and n_val == 6  # 80/10/10 (reference: hg_data.py:7-39)


def test_datamodule_shuffle_is_epoch_seeded(dataset):
    from deepchopper_tpu.data.parquet_module import DataModule

    dm = DataModule(
        train_data_path=str(dataset), max_length=256, tokens_per_batch=4096, shuffle_buffer=16
    )
    ids0 = [rid for b in dm.train_batches(0) for rid in b.read_ids]
    ids0_again = [rid for b in dm.train_batches(0) for rid in b.read_ids]
    ids1 = [rid for b in dm.train_batches(1) for rid in b.read_ids]
    assert ids0 == ids0_again  # deterministic per epoch
    assert ids0 != ids1  # reshuffled across epochs
    assert sorted(ids0) == sorted(ids1)


def test_datamodule_explicit_files(dataset, tmp_path):
    from deepchopper_tpu.data.parquet_module import DataModule

    val = synth_parquet(tmp_path / "val.parquet", n=10, seed=1)
    dm = DataModule(
        train_data_path=str(dataset),
        val_data_path=str(val),
        test_data_path=str(val),
        max_length=256,
        tokens_per_batch=4096,
    )
    assert sum(b.input_ids.shape[0] for b in dm.train_batches()) == 60
    assert sum(b.input_ids.shape[0] for b in dm.val_batches()) == 10


# -- trainer ----------------------------------------------------------------


@pytest.fixture(scope="module")
def fit_run(sep_dataset, tmp_path_factory):
    out = tmp_path_factory.mktemp("out")
    cfg = tiny_cfg(sep_dataset, out, **{"trainer.max_epochs": 12})
    trainer = Trainer(cfg)
    metrics = trainer.fit()
    return cfg, trainer, metrics, out


def test_fit_learns_and_logs(fit_run):
    """The loop must actually TRAIN: on the separable planted-adapter set the
    tiny model has to reach high val/f1 (the reference's whole value is
    F1≈0.99 on real data, scripts/predict.sh:5 + deepchopper/train.py:29-91) —
    a broken optimizer/loss/metric wiring cannot pass this."""
    cfg, trainer, metrics, out = fit_run
    assert len(trainer.history) == 12
    assert trainer.history[-1]["train/loss"] < trainer.history[0]["train/loss"] * 0.5
    assert metrics["best_val_f1"] >= 0.95
    # CSV log written with one row per epoch
    lines = (out / "train" / "metrics.csv").read_text().strip().splitlines()
    assert len(lines) == 13
    assert lines[0].startswith("epoch,")
    assert (out / "train" / "config.yaml").exists()


def test_fit_checkpoints(fit_run):
    cfg, trainer, _metrics, out = fit_run
    assert trainer.best_ckpt_path is not None and trainer.best_ckpt_path.exists()
    assert (out / "train" / "checkpoints" / "last.ckpt").exists()


def test_test_on_best_checkpoint(fit_run, dataset):
    _cfg, trainer, _metrics, _out = fit_run
    res = trainer.test()
    assert set(res) >= {"loss", "f1", "precision", "recall"}
    assert np.isfinite(res["loss"])


def test_resume_from_checkpoint(dataset, tmp_path):
    cfg = tiny_cfg(dataset, tmp_path, **{"trainer.max_epochs": 1})
    t1 = Trainer(cfg)
    t1.fit()
    last = tmp_path / "train" / "checkpoints" / "last.ckpt"
    assert last.exists()

    cfg2 = tiny_cfg(dataset, tmp_path / "resumed", **{"trainer.max_epochs": 2})
    cfg2.ckpt_path = str(last)
    t2 = Trainer(cfg2)
    t2.fit()
    # Resumed at epoch 1, so only one extra epoch ran.
    assert len(t2.history) == 1
    assert t2.history[0]["epoch"] == 1


def test_train_entrypoint_with_test(dataset, tmp_path):
    cfg = tiny_cfg(dataset, tmp_path, **{"test": "true", "trainer.max_epochs": 1})
    metrics = train(cfg)
    assert "test/f1" in metrics
    assert (tmp_path / "train" / "test_metrics.json").exists()


class TestSplitMaterialization:
    """Per-split parquet cache: O(n) once, O(split) per epoch, same content."""

    def test_materialized_equals_filtered(self, tmp_path):
        import numpy as np

        from deepchopper_tpu.data.parquet_module import DataModule

        rng = np.random.default_rng(0)
        fq = tmp_path / "d.fq"
        with open(fq, "wb") as fh:
            for i in range(60):
                n = int(rng.integers(60, 200))
                seq = "".join(rng.choice(list("ACGT"), n))
                qual = "".join(chr(c) for c in rng.integers(38, 70, n))
                fh.write(b"@sm_%d|%d:%d\n%s\n+\n%s\n" % (i, 5, 25, seq.encode(), qual.encode()))

        dm = DataModule(train_data_path=str(fq), max_length=256, seed=3, shuffle_buffer=1)
        cached = {w: [] for w in ("train", "val", "test")}
        for w in cached:
            for r in dm._split_iter(w):
                cached[w].append(r)
        # cache files exist and cover all rows exactly once
        paths = dm._split_cache_paths()
        assert all(p.exists() for p in paths.values())
        total = sum(len(v) for v in cached.values())
        assert total == 60

        # equality vs the fallback index-filter path
        split = dm._get_split()
        for w in cached:
            want = list(dm._iter_encoded(str(fq), getattr(split, w)))
            got = cached[w]
            assert [r.id for r in got] == [r.id for r in want]
            for a, b in zip(got, want):
                np.testing.assert_array_equal(a.input_ids, b.input_ids)
                np.testing.assert_array_equal(a.labels, b.labels)

    def test_second_epoch_uses_cache(self, tmp_path, monkeypatch):
        import numpy as np

        import deepchopper_tpu.data.parquet_module as pm

        rng = np.random.default_rng(1)
        fq = tmp_path / "e.fq"
        with open(fq, "wb") as fh:
            for i in range(20):
                n = int(rng.integers(60, 120))
                seq = "".join(rng.choice(list("ACGT"), n))
                qual = "I" * n
                fh.write(b"@ep_%d\n%s\n+\n%s\n" % (i, seq.encode(), qual.encode()))
        dm = pm.DataModule(train_data_path=str(fq), max_length=256, shuffle_buffer=1)
        n1 = sum(1 for _ in dm._split_iter("train"))
        # Once materialized, the raw source must not be re-read.
        def boom(*a, **k):
            raise AssertionError("source re-scanned after materialization")

        monkeypatch.setattr(dm, "_iter_source_rows", boom)
        n2 = sum(1 for _ in dm._split_iter("train"))
        assert n1 == n2 == 16

    def test_cache_invalidated_when_source_regenerated(self, tmp_path):
        """Regenerating train_data_path in place must not silently reuse the
        stale per-split cache (advisor finding, round 2): the cache tag
        includes the source size+mtime."""
        import os

        import deepchopper_tpu.data.parquet_module as pm

        fq = tmp_path / "f.fq"

        def write(n):
            with open(fq, "wb") as fh:
                for i in range(n):
                    fh.write(b"@rg_%d\n%s\n+\n%s\n" % (i, b"ACGT" * 20, b"I" * 80))

        write(20)
        dm1 = pm.DataModule(train_data_path=str(fq), max_length=256, shuffle_buffer=1)
        n1 = sum(1 for _ in dm1._split_iter("train"))
        old_dir = dm1._split_cache_paths()["train"].parent
        assert old_dir.is_dir() and n1 == 16

        write(30)  # regenerate in place with different content
        os.utime(fq, ns=(os.stat(fq).st_mtime_ns + 2_000_000_000,) * 2)
        dm2 = pm.DataModule(train_data_path=str(fq), max_length=256, shuffle_buffer=1)
        assert dm2._split_cache_paths()["train"].parent != old_dir
        n2 = sum(1 for _ in dm2._split_iter("train"))
        assert n2 == 24  # 0.8 * 30 — fresh split of the regenerated source
