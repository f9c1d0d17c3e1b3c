"""End-to-end validation that the bf16-precision pallas FFT conv preserves
chop outputs on a TRAINED model (where logit margins are realistic).

Two regimes:

* default: separable 60-base homopolymer adapter, trained to F1 >= 0.95 —
  large margins; establishes byte-equality in the confident regime.
* --narrow: the round-4 LIMITATION closed. The adapter is a NOISY
  homopolymer (65% A) and training stops early, so per-base logit margins
  near adapter boundaries sit close to zero — the regime real chimera
  boundaries live in. The compare phase reports the bf16-vs-f32 flip rate
  OVERALL and restricted to the ±5-base boundary windows, the logit-margin
  distribution at flipped positions, and chopped-output byte agreement.
  Decision rule (VERDICT r4 item 5): flip the conv default to f32 if the
  boundary-window flip rate exceeds ~1e-4 AND flips move chop output.

Phases (each in a subprocess — the kernel reads DEEPCHOPPER_FFT_PRECISION
once at import, so precisions must not share a process/jit cache):
  1. train   (CPU): fit hyenadna-tiny on the planted-adapter set,
              save a native checkpoint.
  2. predict (TPU, x2): load the checkpoint, predict per-base labels (+
              logit margins in --narrow) and run the fused chop on a fresh
              synthetic FASTQ, once per precision.
  3. compare: per-base label agreement, F1 vs planted truth for both, and
              byte equality of the decompressed chopped FASTQs.

Usage: python scripts/validate_fft_precision.py [--workdir DIR] [--narrow]
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


def _plant_adapter(rng, seq: list, s: int, e: int, noisy: bool) -> None:
    """Overwrite seq[s:e] with the planted adapter. `noisy`: 65% A / 35%
    random — boundary bases become statistically ambiguous, so a trained
    model's logit margins near s and e sit close to zero."""
    if noisy:
        for j in range(s, e):
            seq[j] = "A" if rng.random() < 0.65 else rng.choice(list("CGT"))
    else:
        seq[s:e] = "A" * (e - s)
    seq[s - 1] = rng.choice(list("CGT"))
    seq[e] = rng.choice(list("CGT"))


def synth_separable_parquet(path: Path, n: int = 160, seed: int = 0, noisy: bool = False) -> Path:
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
        _plant_adapter(rng, seq, s, e, noisy)
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


def synth_fastq(path: Path, n: int = 400, seed: int = 7, noisy: bool = False) -> dict[str, tuple[int, int]]:
    """Fresh eval reads, same planted-adapter distribution; returns truth."""
    rng = np.random.default_rng(seed)
    truth = {}
    with open(path, "wb") as fh:
        for i in range(n):
            length = int(rng.integers(L_MIN, L_MAX))
            seq = list("".join(rng.choice(list("ACGT"), length)))
            s = int(rng.integers(10, length - ADAPTER - 20))
            e = s + ADAPTER
            _plant_adapter(rng, seq, s, e, noisy)
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
    f"trainer.max_epochs={sys.argv[4]}",
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
from deepchopper_tpu.data.fastq_module import iter_batches
from deepchopper_tpu.infer import PredictEngine
from deepchopper_tpu.infer.fused import fused_predict_chop
from deepchopper_tpu.models.registry import DeepChopper

ckpt, fq, out_prefix, labels_npz = sys.argv[1:5]
save_margins = len(sys.argv) > 6 and sys.argv[6] == "margins"
bundle = DeepChopper.from_checkpoint(ckpt, name="hyenadna-tiny-1k-seqlen")
engine = PredictEngine(bundle, max_length=1024, tokens_per_batch=1 << 14, return_labels=True)
predicts = engine.predict_to_predicts(fq)
np.savez(labels_npz, **{rid: p.prediction for rid, p in predicts.items()})

if save_margins:
    # logit margins per base: |logit_adapter - logit_not| — near-zero margins
    # are where bf16-vs-f32 rounding can flip the argmax
    eng_l = PredictEngine(bundle, max_length=1024, tokens_per_batch=1 << 14)
    margins = {}
    batches = iter_batches(fq, max_length=1024, tokens_per_batch=1 << 14,
                           buckets=eng_l.buckets, max_batch=eng_l.max_batch)
    for batch, logits in eng_l.predict_batches(batches):
        for i, rid in enumerate(batch.read_ids):
            n = int(batch.lengths[i]) - 1
            margins[rid] = (logits[i, :n, 1] - logits[i, :n, 0]).astype(np.float32)
    np.savez(labels_npz.replace(".npz", "_margins.npz"), **margins)

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
    ap.add_argument(
        "--narrow",
        action="store_true",
        help="narrow-margin regime: noisy adapter + early-stopped training; "
        "reports boundary-window flip rates and margin stats",
    )
    args = ap.parse_args()
    wd = Path(args.workdir)
    wd.mkdir(parents=True, exist_ok=True)

    train_pq = synth_separable_parquet(wd / "train.parquet", noisy=args.narrow)
    truth = synth_fastq(wd / "eval.fq", noisy=args.narrow)

    ckpt_marker = wd / "ckpt_path.txt"
    if not ckpt_marker.exists():
        epochs = "3" if args.narrow else "12"
        out = run_sub(
            _TRAIN_CODE,
            [str(train_pq), str(wd / "train_out"), str(REPO), epochs],
            # axon's site dir force-registers the TPU backend regardless of
            # JAX_PLATFORMS — strip it so training really runs on CPU.
            {"JAX_PLATFORMS": "cpu", "PYTHONPATH": str(REPO)},
        )
        line = [l for l in out.splitlines() if l.startswith("TRAIN_RESULT")][0]
        _, f1, ckpt = line.split(maxsplit=2)
        print(f"trained: val/f1={f1}, ckpt={ckpt}")
        if not args.narrow:
            assert float(f1) >= 0.95, f"training failed to converge: f1={f1}"
        ckpt_marker.write_text(ckpt)
    ckpt = ckpt_marker.read_text().strip()

    results = {}
    for prec in ("float32", "bfloat16"):
        out_prefix = wd / f"chop_{prec}"
        labels_npz = wd / f"labels_{prec}.npz"
        extra = ["margins"] if args.narrow else []
        out = run_sub(
            _PREDICT_CODE,
            [ckpt, str(wd / "eval.fq"), str(out_prefix), str(labels_npz), str(REPO), *extra],
            {"DEEPCHOPPER_FFT_PRECISION": prec},
        )
        line = [l for l in out.splitlines() if l.startswith("PREDICT_RESULT")][0]
        results[prec] = json.loads(line.split(maxsplit=1)[1])
        results[prec]["labels"] = dict(np.load(labels_npz))
        if args.narrow:
            results[prec]["margins"] = dict(np.load(str(labels_npz).replace(".npz", "_margins.npz")))

    # Per-base agreement between precisions + F1 vs planted truth.
    la, lb = results["float32"]["labels"], results["bfloat16"]["labels"]
    total = agree = 0
    window = 5
    btotal = bagree = 0  # ±window around planted boundaries
    flip_margins = []
    stats = {p: [0, 0, 0] for p in results}  # tp, fp, fn
    for rid, (s, e) in truth.items():
        pa_, pb = la[rid], lb[rid]
        total += pa_.size
        agree += int((pa_ == pb).sum())
        bmask = np.zeros(pa_.size, bool)
        bmask[max(s - window, 0) : s + window] = True
        bmask[max(e - window, 0) : e + window] = True
        btotal += int(bmask.sum())
        bagree += int((pa_ == pb)[bmask].sum())
        if args.narrow:
            flips = pa_ != pb
            if flips.any():
                flip_margins.append(np.abs(results["float32"]["margins"][rid][flips]))
        for prec, pred in (("float32", pa_), ("bfloat16", pb)):
            t = np.zeros(pred.size, np.int8)
            t[s:e] = 1
            stats[prec][0] += int(((pred == 1) & (t == 1)).sum())
            stats[prec][1] += int(((pred == 1) & (t == 0)).sum())
            stats[prec][2] += int(((pred == 0) & (t == 1)).sum())
    print(f"per-base agreement bf16 vs f32: {agree}/{total} = {agree/total:.6f} "
          f"(flip rate {1 - agree/total:.2e})")
    print(f"boundary-window (±{window}) agreement: {bagree}/{btotal} = {bagree/max(btotal,1):.6f} "
          f"(flip rate {1 - bagree/max(btotal,1):.2e})")
    if args.narrow and flip_margins:
        fm = np.concatenate(flip_margins)
        print(f"  f32 |margin| at flipped bases: n={fm.size}, median={np.median(fm):.4f}, "
              f"p90={np.percentile(fm, 90):.4f}, max={fm.max():.4f}")
    elif args.narrow:
        print("  no flips anywhere")
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
