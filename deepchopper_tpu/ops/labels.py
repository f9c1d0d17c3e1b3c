"""Label ops: target parsing/vectorization, region extraction, smoothing.

These are the semantic heart of the chop pipeline. Several reference behaviors
are quirky but load-bearing for output parity and are reproduced deliberately:

* `get_label_region` uses `start == 0` as its "no open region" sentinel, so a
  1-run touching index 0 only opens at the first index >= 1
  (reference: src/utils.rs:671-695).
* `majority_voting` forces the window odd, shifts the window left at the tail
  so it stays full-size, and keeps the original label on a two-way count tie
  (reference: src/smooth/utils.rs:48-97).
* `parse_target_from_id` degrades to [(0, 0)] on malformed ids instead of
  raising (reference: src/fq_encode/triat.rs:14-48).
"""

from __future__ import annotations

import re

import numpy as np

from .. import default
from ..errors import TargetRegionInvalid

# ---------------------------------------------------------------------------
# Target parsing / vectorization
# ---------------------------------------------------------------------------

_TARGET_PART = re.compile(rb"^(\d+):(\d+)$")


def parse_target_from_id(src: str | bytes) -> list[tuple[int, int]]:
    """Parse `...|start:end-start2:end2` adapter annotations from a read id.

    Semantics (reference: src/fq_encode/triat.rs:14-48):
    * empty input -> []
    * no '|' in the id -> [(0, 0)]
    * otherwise the last '|'-separated field is split on '-' into
      `start:end` pairs; ANY parse failure degrades to [(0, 0)].
    """
    if isinstance(src, str):
        src = src.encode("ascii", errors="replace")
    if not src:
        return []
    if b"|" not in src:
        return [(0, 0)]
    number_part = src.rsplit(b"|", 1)[-1]
    result: list[tuple[int, int]] = []
    for part in number_part.split(b"-"):
        m = _TARGET_PART.match(part)
        if m is None:
            return [(0, 0)]
        result.append((int(m.group(1)), int(m.group(2))))
    return result


def vectorize_target(start: int, end: int, length: int) -> np.ndarray:
    """[start, end) -> binary label vector (reference: src/kmer.rs:33-46)."""
    if start > end or end > length:
        raise TargetRegionInvalid(f"invalid target region {start}:{end} for length {length}")
    out = np.zeros(length, dtype=np.int64)
    out[start:end] = 1
    return out


def vectorize_targets(targets, length: int) -> np.ndarray:
    """Flat [s1, e1, s2, e2, ...] or [(s,e), ...] -> binary label vector.

    (reference: src/kmer.rs:48-70)
    """
    flat = np.asarray(targets, dtype=np.int64).reshape(-1)
    if flat.size == 0:
        return np.zeros(length, dtype=np.int64)
    if flat.size % 2 != 0:
        raise TargetRegionInvalid("targets must contain an even number of values")
    out = np.zeros(length, dtype=np.int64)
    for start, end in flat.reshape(-1, 2):
        if start > end or end > length:
            raise TargetRegionInvalid(f"invalid target region {start}:{end} for length {length}")
        out[start:end] = 1
    return out


# ---------------------------------------------------------------------------
# Region extraction
# ---------------------------------------------------------------------------


def get_label_region(labels) -> list[tuple[int, int]]:
    """1-runs -> [start, end) ranges, with the reference's index-0 sentinel.

    A run that starts at index 0 is only opened once the scan reaches index 1
    (so `[1, 0, ...]` yields no region and `[1, 1, 0]` yields (1, 2)) —
    reference: src/utils.rs:671-695. This quirk must be preserved for chop
    output parity.
    """
    labels = np.asarray(labels)
    n = labels.shape[0]
    if n == 0:
        return []
    ones = labels == 1
    if not ones.any():
        return []
    # Vectorized scan replicating the sentinel semantics:
    # run starts = positions i where ones[i] and (i==0 or not ones[i-1]);
    # a run starting at 0 has its recorded start bumped to min(1, run_end).
    diff = np.diff(ones.astype(np.int8))
    starts = list((np.nonzero(diff == 1)[0] + 1))
    ends_excl = list(np.nonzero(diff == -1)[0] + 1)
    if ones[0]:
        starts.insert(0, 0)
    if ones[-1]:
        ends_excl.append(n)
    regions: list[tuple[int, int]] = []
    for s, e in zip(starts, ends_excl):
        if s == 0:
            # Sentinel quirk: `start` keeps being reassigned while it equals 0,
            # so the recorded start is index 1 of the run; a run of length 1 at
            # index 0 (or exactly [0..1)) never opens.
            if e <= 1:
                continue
            s = 1
        regions.append((s, e))
    return regions


# ---------------------------------------------------------------------------
# Majority-vote smoothing
# ---------------------------------------------------------------------------


def majority_voting(labels, window_size: int) -> np.ndarray:
    """Sliding-window majority vote over binary labels (vectorized).

    Exact semantics (reference: src/smooth/utils.rs:48-97):
    * even `window_size` is bumped to the next odd value;
    * window for position i is [i-half, i+half+1) clipped to the array,
      except at the tail where it is shifted left to stay full-size;
    * a 0/1 count tie keeps the original label (possible only in the
      partial windows near the head).
    """
    labels = np.asarray(labels)
    n = labels.shape[0]
    if n == 0:
        return labels.copy()
    w = int(window_size)
    if w % 2 == 0:
        w += 1
    half = w // 2

    idx = np.arange(n, dtype=np.int64)
    start = np.maximum(idx - half, 0)
    end = np.minimum(idx + half + 1, n)
    # Tail shift: keep the window full-size once it hits the right edge.
    shift = (end == n) & ((end - start) < w)
    start = np.where(shift, np.maximum(end - w, 0), start)

    is_one = (labels == 1).astype(np.int64)
    csum = np.concatenate(([0], np.cumsum(is_one)))
    ones = csum[end] - csum[start]
    size = end - start
    twice = 2 * ones
    out = np.where(twice > size, 1, np.where(twice < size, 0, labels))
    return out.astype(labels.dtype, copy=False)


def majority_voting_batch(labels: np.ndarray, lengths: np.ndarray, window_size: int) -> np.ndarray:
    """Batched majority vote over a padded (B, L) label matrix.

    Each row i is smoothed over its own `lengths[i]` prefix; padding positions
    are passed through untouched. Dispatches to the C++ host library when
    available (deepchopper_tpu/native/host_ops.cpp `majority_vote_batch`);
    otherwise fully vectorized NumPy (one cumsum over the batch).
    """
    labels = np.asarray(labels)
    from .. import native

    if native.available() and labels.dtype == np.int8:
        return native.majority_vote_batch(labels, lengths, window_size)
    b, maxlen = labels.shape
    lengths = np.asarray(lengths, dtype=np.int64).reshape(b, 1)
    w = int(window_size)
    if w % 2 == 0:
        w += 1
    half = w // 2

    idx = np.arange(maxlen, dtype=np.int64)[None, :]
    start = np.maximum(idx - half, 0)
    end = np.minimum(idx + half + 1, lengths)
    shift = (end == lengths) & ((end - start) < w)
    start = np.where(shift, np.maximum(end - w, 0), start)

    is_one = (labels == 1).astype(np.int64)
    csum = np.concatenate([np.zeros((b, 1), dtype=np.int64), np.cumsum(is_one, axis=1)], axis=1)
    ones = np.take_along_axis(csum, end, axis=1) - np.take_along_axis(csum, start, axis=1)
    size = end - start
    twice = 2 * ones
    out = np.where(twice > size, 1, np.where(twice < size, 0, labels))
    return np.where(idx < lengths, out, labels).astype(labels.dtype, copy=False)


# ---------------------------------------------------------------------------
# Smooth + select
# ---------------------------------------------------------------------------


def smooth_label_region(
    labels,
    smooth_window_size: int = default.SMOOTH_WINDOW_SIZE,
    min_interval_size: int = default.MIN_INTERVAL_SIZE,
    approved_interval_number: int = default.APPROVED_INTERVAL_NUMBER,
) -> list[tuple[int, int]]:
    """majority_voting -> get_label_region -> min-size filter -> count gate.

    Returns [] when more than `approved_interval_number` intervals survive
    (reference: src/utils.rs:699-736, src/smooth/predict.rs:186-209).
    """
    regions = get_label_region(majority_voting(labels, smooth_window_size))
    results = [(s, e) for (s, e) in regions if e - s >= min_interval_size]
    if len(results) > approved_interval_number:
        return []
    return results


# ---------------------------------------------------------------------------
# Ignore-label filtering
# ---------------------------------------------------------------------------


def summary_predict(
    predictions,
    labels,
    ignore_label: int = default.IGNORE_LABEL,
) -> tuple[list[np.ndarray], list[np.ndarray]]:
    """Drop positions whose label equals `ignore_label`, per row.

    (reference: src/utils.rs:9-55)
    """
    preds_out: list[np.ndarray] = []
    labels_out: list[np.ndarray] = []
    for pred, lab in zip(predictions, labels):
        pred = np.asarray(pred)
        lab = np.asarray(lab)
        keep = lab != ignore_label
        preds_out.append(pred[keep])
        labels_out.append(lab[keep])
    return preds_out, labels_out
