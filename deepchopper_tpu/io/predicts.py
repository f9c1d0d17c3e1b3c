"""Prediction shards: the predict -> chop file contract.

The reference writes per-batch torch-pickle `.pt` files with keys
{prediction (B,L,2 logits), target (B,L), seq (B,L input_ids), qual (B,L),
id (B,256 packed ascii)} (reference: deepchopper/models/callbacks.py:12-25) and
reads them back in the chop binary (reference: src/smooth/predict.rs:263-317).

This module keeps that contract bidirectionally:

* native shards are `.npz` (same keys, numpy dtypes) — no torch needed;
* reference `.pt` shards load via torch (CPU build is baked in), so chop can
  consume reference predictions for cross-validation.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path

import numpy as np

from .. import default
from ..ops.labels import get_label_region, majority_voting
from ..ops.sequence import ascii_list2str, detokenize_bases


@dataclass
class Predict:
    """One read's per-base predictions (reference: src/smooth/predict.rs:33-210)."""

    prediction: np.ndarray  # int8 per-base labels (ignore positions removed)
    seq: str
    id: str
    is_truncated: bool
    qual: str | None = field(default=None)

    def seq_len(self) -> int:
        return len(self.seq)

    def qual_array(self) -> np.ndarray:
        if self.qual is None:
            return np.zeros(0, dtype=np.uint8)
        return np.frombuffer(self.qual.encode("ascii"), dtype=np.uint8) - default.QUAL_OFFSET

    def prediction_region(self) -> list[tuple[int, int]]:
        return get_label_region(self.prediction)

    def smooth_label(self, window_size: int) -> np.ndarray:
        return majority_voting(self.prediction, window_size)

    def smooth_prediction(self, window_size: int) -> list[tuple[int, int]]:
        return get_label_region(self.smooth_label(window_size))

    def smooth_and_select_intervals(
        self,
        smooth_window_size: int,
        min_interval_size: int,
        approved_interval_number: int,
    ) -> list[tuple[int, int]]:
        """Smooth -> region-extract -> min-size filter -> count gate
        (reference: src/smooth/predict.rs:186-209)."""
        intervals = [
            (s, e)
            for (s, e) in self.smooth_prediction(smooth_window_size)
            if e - s >= min_interval_size
        ]
        if len(intervals) > approved_interval_number:
            return []
        return intervals


# ---------------------------------------------------------------------------
# Shard decoding (shared between .pt and .npz)
# ---------------------------------------------------------------------------


def decode_shard_arrays(
    prediction: np.ndarray,
    target: np.ndarray,
    seq: np.ndarray,
    ids: np.ndarray,
    ignore_label: int = default.IGNORE_LABEL,
    smoothed: bool = False,
) -> dict[str, Predict]:
    """Decode batch arrays into per-read `Predict`s.

    `prediction` is (B, L, 2) logits (argmaxed here) or (B, L) labels when the
    on-device fused path already argmaxed/smoothed. Positions whose target is
    `ignore_label` are dropped (reference: src/smooth/predict.rs:287-316).
    """
    prediction = np.asarray(prediction)
    if prediction.ndim == 3:
        labels = np.argmax(prediction, axis=2).astype(np.int8)
    else:
        labels = prediction.astype(np.int8)
    target = np.asarray(target)
    seq = np.asarray(seq)
    ids = np.asarray(ids)

    out: dict[str, Predict] = {}
    keep = target != ignore_label
    for i in range(labels.shape[0]):
        row_keep = keep[i]
        id_len = int(ids[i, 0])
        id_str = ascii_list2str(ids[i, 2 : id_len + 2])
        is_truncated = bool(ids[i, 1])
        out[id_str] = Predict(
            prediction=labels[i][row_keep],
            seq=detokenize_bases(seq[i][row_keep]),
            id=id_str,
            is_truncated=is_truncated,
            qual=None,
        )
    return out


# ---------------------------------------------------------------------------
# Loaders
# ---------------------------------------------------------------------------


def load_predicts_from_batch_pt(
    pt_path: str | Path, ignore_label: int = default.IGNORE_LABEL
) -> dict[str, Predict]:
    """Load one reference-format torch `.pt` shard
    (reference: src/smooth/predict.rs:263-317)."""
    import torch

    tensors = torch.load(pt_path, map_location="cpu", weights_only=False)
    return decode_shard_arrays(
        tensors["prediction"].numpy(),
        tensors["target"].numpy(),
        tensors["seq"].numpy(),
        tensors["id"].numpy(),
        ignore_label,
    )


def load_predicts_from_batch_npz(
    npz_path: str | Path, ignore_label: int = default.IGNORE_LABEL
) -> dict[str, Predict]:
    """Load one native `.npz` shard (same keys as the `.pt` contract)."""
    with np.load(npz_path) as data:
        return decode_shard_arrays(
            data["prediction"], data["target"], data["seq"], data["id"], ignore_label
        )


def load_predicts_from_batch_pts(
    path: str | Path,
    ignore_label: int = default.IGNORE_LABEL,
    max_predicts: int | None = None,
    pattern: str = "*",
) -> dict[str, Predict]:
    """Walk a directory and load every `.pt`/`.npz` shard found
    (reference: src/smooth/predict.rs:212-261). Failed shards are skipped with
    a warning, matching the reference's filter_map behavior. `pattern`
    restricts the walk (e.g. `"3_*"` loads only rank 3's shards — the
    shard-parallel multi-host chop path).
    """
    import logging

    path = Path(path)
    if path.is_file():
        files = [path]
    else:
        files = sorted(p for p in path.rglob(pattern) if p.suffix in (".pt", ".npz"))
    if max_predicts is not None and len(files) > max_predicts:
        files = files[:max_predicts]
    out: dict[str, Predict] = {}
    for f in files:
        try:
            loader = load_predicts_from_batch_pt if f.suffix == ".pt" else load_predicts_from_batch_npz
            out.update(loader(f, ignore_label))
        except Exception as exc:  # noqa: BLE001 - mirror reference resilience
            logging.getLogger(__name__).warning("load shard %s failed: %s", f, exc)
    return out


# ---------------------------------------------------------------------------
# Writer (native contract)
# ---------------------------------------------------------------------------


def pack_read_ids(ids: list[str], truncated: list[bool], max_id_length: int = default.MAX_ID_LENGTH) -> np.ndarray:
    """Pack read ids as [len, truncated, ord(c)...] rows padded to fixed width
    (reference: deepchopper/models/llm/tokenizer.py:169-176)."""
    out = np.zeros((len(ids), max_id_length), dtype=np.int32)
    for i, (rid, trunc) in enumerate(zip(ids, truncated)):
        encoded = rid.encode("ascii", errors="replace")[: max_id_length - 2]
        out[i, 0] = len(rid)
        out[i, 1] = int(trunc)
        out[i, 2 : 2 + len(encoded)] = np.frombuffer(encoded, dtype=np.uint8)
    return out


def write_prediction_shard(
    path: str | Path,
    prediction: np.ndarray,
    target: np.ndarray,
    seq: np.ndarray,
    qual: np.ndarray,
    ids: np.ndarray,
) -> None:
    """Write one native `.npz` shard with the predict->chop contract keys."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_name(path.name + ".tmp.npz")
    np.savez(
        tmp,
        prediction=np.asarray(prediction),
        target=np.asarray(target),
        seq=np.asarray(seq),
        qual=np.asarray(qual),
        id=np.asarray(ids),
    )
    tmp.replace(path)


def write_prediction_shard_pt(
    path: str | Path,
    prediction: np.ndarray,
    target: np.ndarray,
    seq: np.ndarray,
    qual: np.ndarray,
    ids: np.ndarray,
) -> None:
    """Write one reference-format torch `.pt` shard.

    Emits the exact tensor dict the reference's predict callback saves
    (reference: deepchopper/models/callbacks.py:12-25) so the reference's
    `deepchopper-chop` binary (reference: src/smooth/predict.rs:263-317) can
    consume this framework's predictions — the reverse direction of
    `load_predicts_from_batch_pt`. Dtypes follow the reference run:
    float logits, long target/seq/id (Lightning collates int64), qual float.
    """
    import torch

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_name(path.name + ".tmp.pt")
    torch.save(
        {
            "prediction": torch.from_numpy(np.ascontiguousarray(prediction, dtype=np.float32)),
            "target": torch.from_numpy(np.ascontiguousarray(target, dtype=np.int64)),
            "seq": torch.from_numpy(np.ascontiguousarray(seq, dtype=np.int64)),
            "qual": torch.from_numpy(np.ascontiguousarray(qual, dtype=np.float32)),
            "id": torch.from_numpy(np.ascontiguousarray(ids, dtype=np.int64)),
        },
        tmp,
    )
    tmp.replace(path)
