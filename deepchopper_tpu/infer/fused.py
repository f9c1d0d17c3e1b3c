"""Streamed fused predict+chop: FASTQ -> chopped BGZF in one pass.

The round-1 fused path materialized a dict of per-read Predict objects and
then re-streamed the FASTQ (engine.predict_to_predicts +
chop.stream_chop_with_predicts). This runner removes both costs:

* reads are encoded chunk-at-a-time by the native host plane
  (data.span_batches) — no per-read Python objects;
* smoothing + interval extraction run per BATCH right as device labels land
  (threaded C++ majority vote over the already-padded matrix);
* each chunk is chopped and written the moment all of its reads have
  predictions, in file order, straight from the chunk's byte buffer.

Chop semantics are identical to chop.pipeline.process_chunk
(reference guard-rail ordering: src/bin/predict.rs:130-192); the in-memory
all-at-once capability mirrors the reference's `predict_cli`
(src/cli.rs:57-165).
"""

from __future__ import annotations

import dataclasses
import logging
import os
import resource
import time
from collections import deque
from pathlib import Path

import numpy as np

from .. import native
from ..chop.pipeline import ChopOptions, ChopStats
from ..data.span_batches import FastqChunk, SpanBatchSource
from ..io.bgzf import open_bgzf_writer
from ..io.chop import ChopType, split_records_by_intervals, split_records_by_remove_intervals
from ..ops.labels import get_label_region, majority_voting_batch
from ..ops.sequence import normalize_seq_bytes

log = logging.getLogger(__name__)


@dataclasses.dataclass
class FusedStats(ChopStats):
    """ChopStats plus a host/device stage breakdown (wall seconds)."""

    encode_s: float = 0.0  # residual: wall minus feed result-wait (feed-side work)
    device_s: float = 0.0  # feed thread blocked on device results (D2H fetch)
    smooth_s: float = 0.0  # worker: majority vote + region extraction (overlaps device)
    chop_write_s: float = 0.0  # worker: record split + BGZF write (overlaps device)
    first_write_s: float = 0.0  # wall from run start to the first chopped chunk written


_CHOP_TYPE_CODE = {ChopType.ALL: 0, ChopType.TERMINAL: 1, ChopType.INTERNAL: 2}


def _chop_chunk(chunk: FastqChunk, opts: ChopOptions, writer, stats: FusedStats) -> None:
    """Chop one completed chunk in record order, writing to `writer`.

    Per-read guard rails (reference: src/bin/predict.rs:141-164): short read,
    no/too-many intervals, or truncated prediction -> passthrough unchanged.
    Dispatches to the C++ chop kernel (native.chop_records — GIL-free, so it
    overlaps the feed thread) with the Python loop as fallback/oracle.
    """
    if native.available():
        pairs: list[int] = []
        offs = np.empty(chunk.n_records, np.int64)
        cnts = np.empty(chunk.n_records, np.int64)
        trunc = np.empty(chunk.n_records, np.uint8)
        for row in range(chunk.n_records):
            is_trunc, kept = chunk.intervals[row]
            offs[row] = len(pairs) // 2
            cnts[row] = len(kept)
            trunc[row] = int(is_trunc)
            for s, e in kept:
                pairs.append(s)
                pairs.append(e)
        result = native.chop_records(
            chunk.buf,
            chunk.spans,
            np.asarray(pairs, np.int64),
            offs,
            cnts,
            trunc,
            opts.min_read_len,
            opts.max_process_intervals,
            opts.min_read_length_after_chop,
            opts.output_chopped_seqs,
            _CHOP_TYPE_CODE[opts.chop_type],
            opts.id_annotation,
        )
        if result is not None:
            data, n_out = result
            writer.write(data)
            stats.total_fq_count += chunk.n_records
            stats.total_output_count += n_out
            chunk.buf = None
            chunk.spans = None
            return
    buf = chunk.buf
    mv = memoryview(buf)  # zero-copy byte slicing
    for row in range(chunk.n_records):
        sp = chunk.spans[row]
        id_off, name_len, s_off, s_len, q_off, q_len, d_off, d_len = (int(v) for v in sp)
        header_end = d_off + d_len if d_off >= 0 else id_off + name_len
        intervals = chunk.intervals[row]
        stats.total_fq_count += 1
        truncated = intervals is None or intervals[0]
        kept = None if intervals is None else intervals[1]
        # Passthrough conditions, in reference order.
        if (
            s_len < opts.min_read_len
            or kept is None
            or not kept
            or len(kept) > opts.max_process_intervals
            or truncated
        ):
            writer.write(
                b"@%s\n%s\n+\n%s\n"
                % (
                    mv[id_off:header_end].tobytes(),
                    mv[s_off : s_off + s_len].tobytes(),
                    mv[q_off : q_off + q_len].tobytes(),
                )
            )
            stats.total_output_count += 1
            continue
        name = mv[id_off : id_off + name_len].tobytes().decode("ascii")
        seq = normalize_seq_bytes(buf[s_off : s_off + s_len]).tobytes()
        qual = mv[q_off : q_off + q_len].tobytes()
        if opts.output_chopped_seqs:
            recs = split_records_by_intervals(seq, name, qual, kept)
        else:
            recs = split_records_by_remove_intervals(
                seq,
                name,
                qual,
                kept,
                opts.min_read_length_after_chop,
                opts.id_annotation,
                opts.chop_type,
            )
        for rec in recs:
            writer.write(rec.to_bytes())
        stats.total_output_count += len(recs)
    chunk.buf = None  # release the chunk buffer early
    chunk.spans = None


def fused_predict_chop(
    engine,
    fq_path: str | Path,
    opts: ChopOptions | None = None,
    max_samples: int | None = None,
    chunk_bytes: int = 2 << 20,
) -> FusedStats:
    """Run the full fused pipeline; returns stats with a stage breakdown.

    Small chunks keep several in flight even for modest inputs, so completed
    chunks chop+write on the worker while later ones are still predicting;
    max_lag scales inversely so live chunk memory stays ~32MB regardless.
    """
    if not engine.return_labels:
        raise ValueError("construct PredictEngine(return_labels=True) for the fused path")
    opts = opts or ChopOptions()
    fq_path = Path(fq_path)
    stats = FusedStats()
    start = time.monotonic()

    order: deque[FastqChunk] = deque()
    source = SpanBatchSource(
        fq_path,
        max_length=engine.max_length,
        tokens_per_batch=engine.tokens_per_batch,
        buckets=list(engine.buckets),
        max_batch=engine.max_batch,
        max_samples=max_samples,
        chunk_bytes=chunk_bytes,
        on_chunk=order.append,
        max_lag_chunks=max(2, (32 << 20) // chunk_bytes),
    )

    if opts.output_prefix is not None:
        out_dir = Path(opts.output_prefix).parent or Path(".")
    else:
        out_dir = fq_path.parent
    out_dir.mkdir(parents=True, exist_ok=True)
    temp_output = out_dir / f".deepchopper_temp_{os.getpid()}.fq.gz"

    regions_fn = native.label_regions if native.available() else get_label_region

    def _consume(batch, labels) -> None:
        """Vote + region-extract one batch, then chop any completed chunks.

        Runs on the worker thread: the C++ vote/label-region kernels and the
        BGZF writer release the GIL, so this overlaps the feed thread's
        dispatch+fetch work and the device never starves on chop IO.
        (Fetching on the worker instead was measured slower: it serializes
        result-wait with vote+chop on one thread, making the worker the
        critical path — the feed thread is the right place to block on D2H
        while the worker overlaps host compute.)
        """
        t0 = time.monotonic()
        pred_lens = (batch.lengths.astype(np.int64) - 1).clip(min=0)
        smoothed = majority_voting_batch(labels, pred_lens, opts.smooth_window_size)
        for i, (chunk, row) in enumerate(batch.refs):
            n = int(pred_lens[i])
            regions = regions_fn(smoothed[i, :n])
            kept = [(s, e) for (s, e) in regions if e - s >= opts.min_interval_size]
            if len(kept) > opts.approved_interval_number:
                kept = []
            seq_len = int(chunk.spans[row, 3])
            # prediction shorter than the read => truncated at encode
            chunk.intervals[row] = (n != seq_len, kept)
            chunk.remaining -= 1
            stats.predicts_loaded += 1
        t1 = time.monotonic()
        stats.smooth_s += t1 - t0
        while order and order[0].remaining == 0:
            _chop_chunk(order.popleft(), opts, writer, stats)
            if not stats.first_write_s:
                stats.first_write_s = time.monotonic() - start
        stats.chop_write_s += time.monotonic() - t1

    import queue
    import threading

    work: queue.Queue = queue.Queue(maxsize=8)
    worker_err: list[BaseException] = []

    def _worker() -> None:
        while True:
            item = work.get()
            if item is None:
                return
            try:
                _consume(*item)
            except BaseException as exc:  # noqa: BLE001 - surfaced on join
                worker_err.append(exc)
                return

    try:
        with open_bgzf_writer(
            temp_output, threads=opts.threads, level=opts.compression_level
        ) as writer:
            worker = threading.Thread(target=_worker, name="fused-chop", daemon=True)
            worker.start()
            try:
                t_last = time.monotonic()
                for batch, labels in engine.predict_batches(source.batches()):
                    t0 = time.monotonic()
                    stats.device_s += t0 - t_last  # approx: time blocked in iterator
                    if worker_err:
                        break
                    # Timeout-put: a dead worker leaves the queue full, and a
                    # blocking put would deadlock instead of surfacing its error.
                    while True:
                        try:
                            work.put((batch, labels), timeout=0.5)
                            break
                        except queue.Full:
                            if worker_err:
                                break
                    if worker_err:
                        break
                    t_last = time.monotonic()
            finally:
                # Stop the worker BEFORE the writer closes, even on error.
                # (A dead worker leaves the queue full: never block on put.)
                while worker.is_alive():
                    try:
                        work.put(None, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                worker.join()
            if worker_err:
                raise worker_err[0]
            while order:
                chunk = order.popleft()
                if chunk.remaining:
                    raise RuntimeError(
                        f"chunk {chunk.chunk_id}: {chunk.remaining} reads never predicted"
                    )
                _chop_chunk(chunk, opts, writer, stats)
                if not stats.first_write_s:
                    stats.first_write_s = time.monotonic() - start

        if opts.output_prefix is not None:
            output_file = (
                f"{opts.output_prefix}.{stats.predicts_loaded}pd."
                f"{stats.total_output_count}record.chop.fq.gz"
            )
        else:
            output_file = (
                f"{fq_path.stem}.{stats.predicts_loaded}pd."
                f"{stats.total_output_count}record.chop.fq.gz"
            )
        os.replace(temp_output, output_file)
        stats.output_file = str(output_file)
    except BaseException:
        temp_output.unlink(missing_ok=True)
        raise

    stats.elapsed_s = time.monotonic() - start
    # smooth/chop run on the worker thread and OVERLAP device time, so stage
    # seconds are per-stage busy time, not an additive wall-time partition.
    stats.encode_s = max(stats.elapsed_s - stats.device_s, 0.0)
    stats.peak_rss_bytes = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss * 1024
    log.info(
        "fused: %d reads -> %d records in %.2fs (device-wait %.2fs, smooth %.2fs, "
        "chop+write %.2fs, peak RSS %.1f MB) -> %s",
        stats.total_fq_count,
        stats.total_output_count,
        stats.elapsed_s,
        stats.device_s,
        stats.smooth_s,
        stats.chop_write_s,
        stats.peak_rss_bytes / 1e6,
        stats.output_file,
    )
    return stats
