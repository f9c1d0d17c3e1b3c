"""Streaming chop pipeline — native equivalent of `deepchopper-chop`.

Loads prediction shards (.pt/.npz), streams the FASTQ in chunks, smooths and
splits each read, and writes an incrementally-compressed BGZF output that is
atomically renamed to `<stem>.<N>pd.<M>record.chop.fq.gz`
(reference: src/bin/predict.rs:129-384).

Hot-loop design: per-chunk smoothing is batched — all reads in a chunk are
padded into one (B, L) matrix and smoothed with a single cumsum pass
(ops.labels.majority_voting_batch) instead of the reference's per-read
rayon loop.
"""

from __future__ import annotations

import logging
import os
import resource
import time
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np

from .. import default
from ..io.chop import ChopType, FastqRecord, split_records_by_intervals, split_records_by_remove_intervals
from ..io.fastq import iter_fastq_chunks, open_bgzf_writer
from ..io.predicts import Predict, load_predicts_from_batch_pts
from ..ops.labels import get_label_region

log = logging.getLogger(__name__)


@dataclass
class ChopOptions:
    """Chop-stage knobs with the reference's tuned defaults
    (reference: src/bin/predict.rs:19-78)."""

    smooth_window_size: int = default.SMOOTH_WINDOW_SIZE
    min_interval_size: int = default.MIN_INTERVAL_SIZE
    approved_interval_number: int = default.APPROVED_INTERVAL_NUMBER
    max_process_intervals: int = default.MAX_PROCESS_INTERVALS
    min_read_length_after_chop: int = default.MIN_READ_LENGTH_AFTER_CHOP
    output_chopped_seqs: bool = False
    chop_type: ChopType = ChopType.ALL
    chunk_size: int = default.CHOP_CHUNK_SIZE
    threads: int = 2
    max_batch_size: int | None = None
    output_prefix: str | None = None
    min_read_len: int = default.MIN_READ_LEN
    id_annotation: bool = True
    # BGZF deflate level (6 = the reference writers' default). Output bytes
    # decompress identically at any level; lower is faster on CPU-starved
    # hosts at slightly larger files.
    compression_level: int = 6


@dataclass
class ChopStats:
    total_fq_count: int = 0
    total_output_count: int = 0
    predicts_loaded: int = 0
    elapsed_s: float = 0.0
    peak_rss_bytes: int = 0
    output_file: str = ""
    extras: dict = field(default_factory=dict)


def _select_intervals_batch(
    predicts: list[Predict], opts: ChopOptions
) -> list[list[tuple[int, int]]]:
    """Batched smooth_and_select_intervals over a chunk of reads.

    Semantically identical to Predict.smooth_and_select_intervals per read
    (reference: src/smooth/predict.rs:186-209) but smooths the whole chunk in
    one vectorized pass.
    """
    from .. import native
    from ..ops.labels import majority_voting_batch

    if not predicts:
        return []
    lengths = np.array([len(p.prediction) for p in predicts], dtype=np.int64)
    maxlen = int(lengths.max()) if len(lengths) else 0
    mat = np.zeros((len(predicts), maxlen), dtype=np.int8)
    for i, p in enumerate(predicts):
        mat[i, : lengths[i]] = p.prediction
    smoothed = majority_voting_batch(mat, lengths, opts.smooth_window_size)
    regions_fn = native.label_regions if native.available() else get_label_region
    out: list[list[tuple[int, int]]] = []
    for i in range(len(predicts)):
        regions = regions_fn(smoothed[i, : lengths[i]])
        kept = [(s, e) for (s, e) in regions if e - s >= opts.min_interval_size]
        if len(kept) > opts.approved_interval_number:
            kept = []
        out.append(kept)
    return out


def process_chunk(
    chunk: list[FastqRecord],
    all_predicts: dict[str, Predict],
    opts: ChopOptions,
) -> list[FastqRecord]:
    """Chop one chunk (guard-rail ordering per reference: src/bin/predict.rs:130-192).

    Per read: no prediction -> DROP; short read -> passthrough; zero or too
    many intervals -> passthrough; truncated (pred/qual length mismatch) ->
    passthrough; else chop.
    """
    paired: list[tuple[FastqRecord, Predict]] = []
    for rec in chunk:
        p = all_predicts.get(rec.name)
        if p is not None:
            paired.append((rec, p))

    intervals_per_read = _select_intervals_batch([p for _, p in paired], opts)

    results: list[FastqRecord] = []
    for (rec, p), intervals in zip(paired, intervals_per_read):
        if len(p.seq) < opts.min_read_len:
            results.append(rec)
            continue
        if len(intervals) > opts.max_process_intervals or not intervals:
            results.append(rec)
            continue
        if len(p.seq) != len(rec.qual):
            log.debug("truncated prediction, passthrough: %s", rec.name)
            results.append(rec)
            continue
        if opts.output_chopped_seqs:
            results.extend(split_records_by_intervals(p.seq, rec.name, rec.qual, intervals))
        else:
            results.extend(
                split_records_by_remove_intervals(
                    p.seq,
                    rec.name,
                    rec.qual,
                    intervals,
                    opts.min_read_length_after_chop,
                    opts.id_annotation,
                    opts.chop_type,
                )
            )
    return results


def run_chop(
    predict_paths: list[str | Path],
    fq_path: str | Path,
    opts: ChopOptions | None = None,
) -> ChopStats:
    """Full streaming chop run (reference: src/bin/predict.rs:197-384)."""
    opts = opts or ChopOptions()
    all_predicts: dict[str, Predict] = {}
    for p in predict_paths:
        all_predicts.update(
            load_predicts_from_batch_pts(p, default.IGNORE_LABEL, opts.max_batch_size)
        )
    log.info("collected %d predictions", len(all_predicts))
    return stream_chop_with_predicts(all_predicts, fq_path, opts)


def predict_cli(
    predicts: list[str | Path],
    fq: str | Path,
    threads: int = 2,
    max_batch_size: int | None = None,
    smooth_window_size: int = default.SMOOTH_WINDOW_SIZE,
    min_interval_size: int = default.MIN_INTERVAL_SIZE,
    approved_interval_number: int = default.APPROVED_INTERVAL_NUMBER,
    max_process_intervals: int = default.MAX_PROCESS_INTERVALS,
    min_read_length_after_chop: int = default.MIN_READ_LENGTH_AFTER_CHOP,
    output_chopped_seqs: bool = False,
    chop_type: ChopType = ChopType.ALL,
    output_prefix: str | None = None,
) -> ChopStats:
    """In-memory chop pipeline with the reference `PredictOptions` knobs
    (reference: src/cli.rs:13-165, exported as py_predict_cli at
    src/python.rs:827-876)."""
    opts = ChopOptions(
        smooth_window_size=smooth_window_size,
        min_interval_size=min_interval_size,
        approved_interval_number=approved_interval_number,
        max_process_intervals=max_process_intervals,
        min_read_length_after_chop=min_read_length_after_chop,
        output_chopped_seqs=output_chopped_seqs,
        chop_type=chop_type,
        threads=threads,
        max_batch_size=max_batch_size,
        output_prefix=output_prefix,
    )
    return run_chop(list(predicts), fq, opts)


def _part_paths(out_dir: Path, rank: int) -> tuple[Path, Path]:
    return (
        out_dir / f".dc_chop_part_{rank}.fq.gz",
        out_dir / f".dc_chop_part_{rank}.json",
    )


def multihost_stream_chop(
    all_predicts: dict[str, Predict],
    fq_path: str | Path,
    opts: ChopOptions | None = None,
    rank: int = 0,
    nprocs: int = 1,
    barrier=None,
) -> ChopStats | None:
    """Shard-parallel multi-host chop: every rank chops the reads IT predicted.

    TPU-native improvement over the reference's DDP contract (each rank writes
    prediction shards, then rank 0 re-reads the whole FASTQ and chops
    everything, deepchopper/models/callbacks.py:25 + docs/tutorials): the
    expensive work — smoothing, splitting, BGZF deflate — runs on every host
    concurrently. Each rank streams the FASTQ but `process_chunk` drops reads
    without a prediction, so a read owned by another rank's interleaved slice
    costs only the parse. Rank r writes a raw BGZF part stream (no EOF block)
    plus a counts sidecar; after `barrier()`, rank 0 concatenates the parts in
    rank order, appends the single EOF marker, and atomically renames to the
    reference's output contract name. BGZF blocks are standalone gzip members,
    so the concatenation is a byte-valid bgzip file.

    Ordering contract: records are grouped BY RANK (rank 0's reads
    0, n, 2n, ... then rank 1's 1, n+1, ...), not in FASTQ order — the price
    of stream concatenation without a rank-0 re-chop. The record MULTISET is
    identical to a single-host run (tested); byte-level diffing against a
    single-host output requires the nprocs=1 path.

    Returns the merged ChopStats on rank 0, None on other ranks.
    """
    import json as _json

    opts = opts or ChopOptions()
    fq_path = Path(fq_path)
    start = time.monotonic()

    if opts.output_prefix is not None:
        out_dir = Path(opts.output_prefix).parent or Path(".")
    else:
        out_dir = fq_path.parent
    out_dir.mkdir(parents=True, exist_ok=True)
    part_path, sidecar = _part_paths(out_dir, rank)

    fq_count = 0
    output_count = 0
    try:
        with open_bgzf_writer(
            part_path, threads=opts.threads, level=opts.compression_level, write_eof=False
        ) as writer:
            for chunk in iter_fastq_chunks(fq_path, opts.chunk_size):
                fq_count += len(chunk)
                results = process_chunk(chunk, all_predicts, opts)
                for rec in results:
                    writer.write(rec.to_bytes())
                output_count += len(results)
        sidecar.write_text(
            _json.dumps(
                {
                    "fq_count": fq_count,
                    "output_count": output_count,
                    "predicts_loaded": len(all_predicts),
                }
            )
        )
    except BaseException:
        part_path.unlink(missing_ok=True)
        sidecar.unlink(missing_ok=True)
        raise

    if barrier is not None:
        barrier("deepchopper_chop_parts_done")
    if rank != 0:
        return None

    from ..io.bgzf import BGZF_EOF

    stats = ChopStats(total_fq_count=fq_count)
    temp_output = out_dir / f".deepchopper_temp_{os.getpid()}.fq.gz"
    try:
        # Validate every rank's sidecar INSIDE the cleanup scope: a missing
        # part (a rank died between its write and the barrier) must not leak
        # the other ranks' hidden part files for a retry to merge stale.
        for r in range(nprocs):
            _, sc = _part_paths(out_dir, r)
            if not sc.exists():
                raise FileNotFoundError(f"missing chop part sidecar for rank {r}: {sc}")
            counts = _json.loads(sc.read_text())
            stats.total_output_count += counts["output_count"]
            stats.predicts_loaded += counts["predicts_loaded"]

        with open(temp_output, "wb") as out:
            for r in range(nprocs):
                pp, _ = _part_paths(out_dir, r)
                with open(pp, "rb") as fh:
                    while True:
                        buf = fh.read(4 << 20)
                        if not buf:
                            break
                        out.write(buf)
            out.write(BGZF_EOF)
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
        stats.output_file = output_file
    except BaseException:
        temp_output.unlink(missing_ok=True)
        raise
    finally:
        for r in range(nprocs):
            pp, sc = _part_paths(out_dir, r)
            pp.unlink(missing_ok=True)
            sc.unlink(missing_ok=True)

    stats.elapsed_s = time.monotonic() - start
    stats.peak_rss_bytes = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss * 1024
    return stats


def stream_chop_with_predicts(
    all_predicts: dict[str, Predict],
    fq_path: str | Path,
    opts: ChopOptions | None = None,
) -> ChopStats:
    """Streaming chop with predictions already in memory (fused predict+chop
    path; capability of the reference's `predict_cli`, src/cli.rs:57-165)."""
    opts = opts or ChopOptions()
    fq_path = Path(fq_path)
    start = time.monotonic()
    stats = ChopStats()
    stats.predicts_loaded = len(all_predicts)

    if opts.output_prefix is not None:
        out_dir = Path(opts.output_prefix).parent or Path(".")
    else:
        out_dir = fq_path.parent
    temp_output = out_dir / f".deepchopper_temp_{os.getpid()}.fq.gz"

    try:
        with open_bgzf_writer(
            temp_output, threads=opts.threads, level=opts.compression_level
        ) as writer:
            for chunk in iter_fastq_chunks(fq_path, opts.chunk_size):
                stats.total_fq_count += len(chunk)
                results = process_chunk(chunk, all_predicts, opts)
                for rec in results:
                    writer.write(rec.to_bytes())
                stats.total_output_count += len(results)

        if opts.output_prefix is not None:
            output_file = (
                f"{opts.output_prefix}.{stats.predicts_loaded}pd."
                f"{stats.total_output_count}record.chop.fq.gz"
            )
        else:
            # Rust's file_stem removes only the last extension and the output
            # lands in the current working directory (reference:
            # src/bin/predict.rs:342-353).
            output_file = (
                f"{fq_path.stem}.{stats.predicts_loaded}pd."
                f"{stats.total_output_count}record.chop.fq.gz"
            )
        os.replace(temp_output, output_file)
        stats.output_file = output_file
    except BaseException:
        temp_output.unlink(missing_ok=True)
        raise

    stats.elapsed_s = time.monotonic() - start
    stats.peak_rss_bytes = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss * 1024
    log.info(
        "processed %d reads -> %d records in %.2fs (peak RSS %.1f MB) -> %s",
        stats.total_fq_count,
        stats.total_output_count,
        stats.elapsed_s,
        stats.peak_rss_bytes / 1e6,
        stats.output_file,
    )
    return stats
