"""End-to-end validation that the bf16-precision pallas FFT conv preserves
chop outputs on a TRAINED model (where logit margins are realistic).

LIMITATION: the trained model here is hyenadna-tiny on a PLANTED 60-base
homopolymer adapter — a deliberately separable task with large logit
margins. Real nanopore chimera margins may be narrower, so "labels
unchanged" on this harness does NOT establish equivalence for production
checkpoints; rerun the predict/compare phases against a converted real
checkpoint and representative reads before trusting bf16 output as
byte-equivalent there. The bf16 default remains justified by the error
analysis (conv rel err ~5e-3, same order as the bf16 activation stream)
plus majority-vote smoothing, not by this harness alone.

Phases (each in a subprocess — the kernel reads DEEPCHOPPER_FFT_PRECISION
once at import, so precisions must not share a process/jit cache):
  1. train   (CPU): fit hyenadna-tiny on a separable planted-adapter set to
              val/f1 >= 0.95, save a native checkpoint.
  2. predict (TPU, x2): load the checkpoint, predict per-base labels and run
              the fused chop on a fresh synthetic FASTQ, once per precision.
  3. compare: per-base label agreement, F1 vs planted truth for both, and
              byte equality of the decompressed chopped FASTQs.

Usage: python scripts/validate_fft_precision.py [--workdir DIR]
"""

from __future__ import annotations

import argparse
import gzip
import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

L_MIN, L_MAX, ADAPTER = 160, 230, 60


def synth_separable_parquet(path: Path, n: int = 160, seed: int = 0) -> Path:
    """Planted-adapter training set (same recipe as tests/test_train_harness)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        length = 180
        seq = list("".join(rng.choice(list("ACGT"), length)))
        s = int(rng.integers(10, length - ADAPTER - 20))
        e = s + ADAPTER
        seq[s:e] = "A" * ADAPTER
        seq[s - 1] = rng.choice(list("CGT"))
        seq[e] = rng.choice(list("CGT"))
        rows.append(
            {
                "id": f"read{i}|{s}:{e}",
                "seq": "".join(seq),
                "qual": rng.integers(5, 40, length).astype(np.int32).tolist(),
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


def synth_fastq(path: Path, n: int = 400, seed: int = 7) -> dict[str, tuple[int, int]]:
    """Fresh eval reads, same planted-adapter distribution; returns truth."""
    rng = np.random.default_rng(seed)
    truth = {}
    with open(path, "wb") as fh:
        for i in range(n):
            length = int(rng.integers(L_MIN, L_MAX))
            seq = list("".join(rng.choice(list("ACGT"), length)))
            s = int(rng.integers(10, length - ADAPTER - 20))
            e = s + ADAPTER
            seq[s:e] = "A" * ADAPTER
            seq[s - 1] = rng.choice(list("CGT"))
            seq[e] = rng.choice(list("CGT"))
            rid = f"val{i}"
            truth[rid] = (s, e)
            qual = (rng.integers(38, 73, length).astype(np.uint8)).tobytes()
            fh.write(b"@%s\n%s\n+\n%s\n" % (rid.encode(), "".join(seq).encode(), qual))
    return truth


_TRAIN_CODE = r"""
import sys
sys.path.insert(0, sys.argv[3])
from deepchopper_tpu.train.config import load_config
from deepchopper_tpu.train.loop import Trainer

cfg = load_config(None, [
    f"data.train_data_path={sys.argv[1]}",
    "data.max_length=256",
    "data.tokens_per_batch=4096",
    "data.shuffle_buffer=16",
    "model.name=hyenadna-tiny-1k-seqlen",
    "trainer.max_epochs=12",
    "optimizer.lr=0.001",
    f"output_dir={sys.argv[2]}",
    "test=false",
])
t = Trainer(cfg)
metrics = t.fit()
print(f"TRAIN_RESULT {metrics['best_val_f1']:.4f} {t.best_ckpt_path}")
"""

_PREDICT_CODE = r"""
import json
import sys

import numpy as np

sys.path.insert(0, sys.argv[5])
from deepchopper_tpu.chop import ChopOptions
from deepchopper_tpu.infer import PredictEngine
from deepchopper_tpu.infer.fused import fused_predict_chop
from deepchopper_tpu.models.registry import DeepChopper

ckpt, fq, out_prefix, labels_npz = sys.argv[1:5]
bundle = DeepChopper.from_checkpoint(ckpt, name="hyenadna-tiny-1k-seqlen")
engine = PredictEngine(bundle, max_length=1024, tokens_per_batch=1 << 14, return_labels=True)
predicts = engine.predict_to_predicts(fq)
np.savez(labels_npz, **{rid: p.prediction for rid, p in predicts.items()})

engine2 = PredictEngine(bundle, max_length=1024, tokens_per_batch=1 << 14, return_labels=True)
stats = fused_predict_chop(engine2, fq, ChopOptions(output_prefix=out_prefix))
print(f"PREDICT_RESULT {json.dumps({'output': stats.output_file, 'records': stats.total_output_count})}")
"""


def run_sub(code: str, args: list[str], env_extra: dict[str, str]) -> str:
    env = dict(os.environ, **env_extra)
    p = subprocess.run(
        [sys.executable, "-c", code, *args], env=env, capture_output=True, text=True
    )
    if p.returncode != 0:
        sys.stderr.write(p.stderr)
        raise SystemExit(f"subprocess failed (rc={p.returncode})")
    return p.stdout


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/fft_precision_val")
    args = ap.parse_args()
    wd = Path(args.workdir)
    wd.mkdir(parents=True, exist_ok=True)

    train_pq = synth_separable_parquet(wd / "train.parquet")
    truth = synth_fastq(wd / "eval.fq")

    ckpt_marker = wd / "ckpt_path.txt"
    if not ckpt_marker.exists():
        out = run_sub(
            _TRAIN_CODE,
            [str(train_pq), str(wd / "train_out"), str(REPO)],
            {"JAX_PLATFORMS": "cpu"},
        )
        line = [l for l in out.splitlines() if l.startswith("TRAIN_RESULT")][0]
        _, f1, ckpt = line.split(maxsplit=2)
        print(f"trained: val/f1={f1}, ckpt={ckpt}")
        assert float(f1) >= 0.95, f"training failed to converge: f1={f1}"
        ckpt_marker.write_text(ckpt)
    ckpt = ckpt_marker.read_text().strip()

    results = {}
    for prec in ("float32", "bfloat16"):
        out_prefix = wd / f"chop_{prec}"
        labels_npz = wd / f"labels_{prec}.npz"
        out = run_sub(
            _PREDICT_CODE,
            [ckpt, str(wd / "eval.fq"), str(out_prefix), str(labels_npz), str(REPO)],
            {"DEEPCHOPPER_FFT_PRECISION": prec},
        )
        line = [l for l in out.splitlines() if l.startswith("PREDICT_RESULT")][0]
        results[prec] = json.loads(line.split(maxsplit=1)[1])
        results[prec]["labels"] = dict(np.load(labels_npz))

    # Per-base agreement between precisions + F1 vs planted truth.
    la, lb = results["float32"]["labels"], results["bfloat16"]["labels"]
    total = agree = 0
    stats = {p: [0, 0, 0] for p in results}  # tp, fp, fn
    for rid, (s, e) in truth.items():
        pa_, pb = la[rid], lb[rid]
        total += pa_.size
        agree += int((pa_ == pb).sum())
        for prec, pred in (("float32", pa_), ("bfloat16", pb)):
            t = np.zeros(pred.size, np.int8)
            t[s:e] = 1
            stats[prec][0] += int(((pred == 1) & (t == 1)).sum())
            stats[prec][1] += int(((pred == 1) & (t == 0)).sum())
            stats[prec][2] += int(((pred == 0) & (t == 1)).sum())
    print(f"per-base agreement bf16 vs f32: {agree}/{total} = {agree/total:.6f}")
    for prec, (tp, fp, fn) in stats.items():
        p = tp / max(tp + fp, 1)
        r = tp / max(tp + fn, 1)
        f1 = 2 * p * r / max(p + r, 1e-9)
        print(f"  {prec}: F1 vs planted truth = {f1:.4f} (P={p:.4f} R={r:.4f})")

    ba = gzip.open(results["float32"]["output"], "rb").read()
    bb = gzip.open(results["bfloat16"]["output"], "rb").read()
    print(f"chopped FASTQ byte-identical: {ba == bb} "
          f"({results['float32']['records']} vs {results['bfloat16']['records']} records)")
    return 0 if ba == bb else 1


if __name__ == "__main__":
    raise SystemExit(main())
