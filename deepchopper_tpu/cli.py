"""Command-line interface: predict / chop / web / encode / eval-bam / stat.

Mirrors the reference's typer CLI surface and flags
(reference: deepchopper/cli.py:66-257) using argparse (typer is not available
in this environment). `chop` runs the native pipeline in-process instead of
shelling out to a separate binary.
"""

from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path

from . import __version__


def _add_predict(sub: argparse._SubParsersAction) -> None:
    p = sub.add_parser("predict", help="Predict per-base adapter labels for a FASTQ")
    p.add_argument("data_path", type=Path, help="Path to the FASTQ dataset")
    p.add_argument("--output", "-o", type=Path, default=Path("predictions"), help="Directory for prediction shards")
    p.add_argument("--batch-tokens", type=int, default=1 << 17, help="Tokens per device batch")
    p.add_argument("--batch-size", "-b", type=int, default=None, help="Cap on reads per batch")
    p.add_argument("--model", "-m", default="rna002", help="Model name (rna002, rna004, or registry name)")
    p.add_argument("--checkpoint", type=Path, default=None, help="Native checkpoint path")
    p.add_argument("--torch-checkpoint", type=Path, default=None, help="Reference torch checkpoint to convert")
    p.add_argument(
        "--random-init",
        action="store_true",
        help="Run with UNTRAINED weights (tests/benchmarks only; otherwise missing weights are a hard error)",
    )
    p.add_argument("--max-sample", type=int, default=None, help="Stop after this many reads")
    p.add_argument("--limit-batches", type=int, default=None, help="Stop after this many device batches")
    p.add_argument("--max-length", type=int, default=32768, help="Token window; longer reads are truncated and flagged")
    p.add_argument("--fused-chop", action="store_true", help="Skip shard IO: predict and chop in one pass")
    p.add_argument(
        "--shard-format",
        choices=["npz", "pt"],
        default="npz",
        help="Prediction shard format: npz (native) or pt (reference torch format, readable by deepchopper-chop)",
    )
    p.add_argument(
        "--conv-precision",
        choices=["bfloat16", "float32"],
        default=None,
        help="TPU conv-kernel precision. Default bfloat16: measured flips only "
        "at |logit margin| < 0.03 (model ~51/49 uncertain), F1 unchanged "
        "(docs/performance.md). float32 costs ~12%% throughput; use for "
        "strict run-to-run reproducibility studies.",
    )
    p.add_argument("--fq", type=Path, default=None, help="FASTQ for --fused-chop qualities (defaults to data_path)")
    p.add_argument("--verbose", "-v", action="store_true", help="Restore suppressed third-party warnings and debug logs")


def _add_chop(sub: argparse._SubParsersAction) -> None:
    p = sub.add_parser("chop", help="Chop reads using prediction shards")
    p.add_argument("predicts", type=Path, nargs="+", help="Prediction shard dirs/files (.pt or .npz)")
    p.add_argument("fq", type=Path, help="FASTQ file")
    p.add_argument("--smooth-window", "-s", type=int, default=21, help="Majority-vote smoothing window (odd)")
    p.add_argument("--min-interval-size", "--mis", type=int, default=13, help="Drop predicted adapter intervals shorter than this")
    p.add_argument("--approved-intervals", "-a", type=int, default=20, help="Reject reads with more smoothed intervals than this")
    p.add_argument("--max-process-intervals", "--mpi", type=int, default=4, help="Pass reads through unchanged above this interval count")
    p.add_argument("--min-read-length", "--mcr", type=int, default=20, help="Minimum kept-fragment length after chopping")
    p.add_argument("--output-chopped", "--ocq", action="store_true", help="Emit the removed adapter sequences instead of the kept parts")
    p.add_argument("--chop-type", "--ct", default="all", choices=["terminal", "internal", "all"], help="Restrict chopping to terminal/internal adapter reads")
    p.add_argument("--threads", "-t", type=int, default=2, help="BGZF writer threads")
    p.add_argument("--output", "-o", dest="output_prefix", default=None, help="Output prefix (default: input stem); suffix .<N>pd.<M>record.chop.fq.gz is appended")
    p.add_argument("--max-batch", "-m", type=int, default=None, help="Cap on records processed per smoothing batch")
    p.add_argument("--chunk-size", type=int, default=10000, help="Streaming chunk size in reads (bounds RSS)")
    p.add_argument("--verbose", "-v", action="store_true", help="Restore suppressed third-party warnings and debug logs")


def _add_misc(sub: argparse._SubParsersAction) -> None:
    p = sub.add_parser("web", help="Launch the web UI")
    p.add_argument("--port", type=int, default=7860, help="HTTP port for the web UI")
    p.add_argument("--checkpoint", type=Path, default=None, help="Native checkpoint path")
    p.add_argument("--torch-checkpoint", type=Path, default=None, help="Reference torch checkpoint to convert")
    p.add_argument("--random-init", action="store_true", help="Run with UNTRAINED weights (demo only)")

    p = sub.add_parser("encode", help="Encode FASTQ(s) to parquet datasets")
    p.add_argument("paths", type=Path, nargs="+", help="FASTQ files or folders of FASTQs")
    p.add_argument("--chunk", action="store_true", help="Write chunked parquet")
    p.add_argument("--chunk-size", type=int, default=1_000_000, help="Records per parquet chunk with --chunk")

    p = sub.add_parser("stat", help="Read-length summary for FASTQ/FASTA/BAM")
    p.add_argument("path", type=Path, help="FASTQ/FASTA/BAM file to summarize")

    p = sub.add_parser("eval-bam", help="BAM overlap evaluation of predictions")
    p.add_argument("bam", type=Path, help="Aligned BAM of the ORIGINAL (unchopped) reads")
    p.add_argument("predicts", type=Path, help="Prediction shard dir")
    p.add_argument("--output-dir", type=Path, default=Path("."), help="Where stats_*.json / overlap_results_*.json land")
    p.add_argument("--blat-cli", default=None, help="Path to the blat binary (enables BLAT categories)")
    p.add_argument("--hg38-2bit", default=None, help="Reference genome .2bit for BLAT")
    p.add_argument("--internal-threshold", type=float, default=0.9, help="Fraction of read length above which an interval counts as terminal")
    p.add_argument("--overlap-threshold", type=float, default=0.5, help="Minimum softclip/interval overlap fraction")
    p.add_argument("--min-mapping-quality", type=int, default=0, help="Skip alignments below this MAPQ")

    tools = sub.add_parser("tools", help="Developer utilities (reference dev binaries)")
    tsub = tools.add_subparsers(dest="tool", required=True)

    t = tsub.add_parser("fq2fa", help="FASTQ -> FASTA on stdout")
    t.add_argument("fq", type=Path)

    t = tsub.add_parser("fqsearch", help="Search reads by id substring / length")
    t.add_argument("fq", type=Path)
    t.add_argument("--id", dest="id_substring", default=None)
    t.add_argument("--min-len", type=int, default=None)
    t.add_argument("--max-len", type=int, default=None)

    t = tsub.add_parser("select", help="Select chopped reads by type annotation")
    t.add_argument("fq", type=Path)
    t.add_argument("--type", dest="chop_type", default="internal", choices=["terminal", "internal"])
    t.add_argument("--output", "-o", type=Path, default=None)

    t = tsub.add_parser("diff", help="Compare original vs chopped FASTQ lengths")
    t.add_argument("original", type=Path)
    t.add_argument("chopped", type=Path)

    t = tsub.add_parser("chimericstat", help="Count primary mapped reads with SA tags")
    t.add_argument("bam", type=Path)

    t = tsub.add_parser("sa", help="SA-tag supplementary alignment histogram")
    t.add_argument("bam", type=Path)

    t = tsub.add_parser("scdiff", help="Compare softclips between two BAMs")
    t.add_argument("original", type=Path)
    t.add_argument("chopped", type=Path)

    t = tsub.add_parser("replacefq", help="Replace records by id from another FASTQ")
    t.add_argument("target", type=Path)
    t.add_argument("replacement", type=Path)
    t.add_argument("output", type=Path)

    t = tsub.add_parser("replacebam", help="Swap internal-chopped records between BAMs")
    t.add_argument("--dcbam", type=Path, required=True, help="DeepChopper-processed BAM")
    t.add_argument("--dobam", type=Path, required=True, help="Original BAM")
    t.add_argument("--output", "-o", type=Path, required=True)
    t.add_argument("--threads", "-t", type=int, default=4)

    t = tsub.add_parser("psl-top1", help="Top-1 identity summary of a PSL file")
    t.add_argument("psl", type=Path)

    t = tsub.add_parser("blat-predictions", help="Batch-BLAT predicted adapter seqs")
    t.add_argument("predicts", type=Path, nargs="+", help="Prediction shard dirs/files")
    t.add_argument("--prefix", "-p", default="")
    t.add_argument("--sr", dest="selected_reads", type=Path, default=None)
    t.add_argument("--fq", dest="fastq", type=Path, default=None)
    t.add_argument("--smooth-window", "-s", type=int, default=21)
    t.add_argument("--min-interval-size", "--mis", type=int, default=13)
    t.add_argument("--approved-intervals", "-a", type=int, default=20)
    t.add_argument("--max-process-intervals", "--mpi", type=int, default=4)
    t.add_argument("--blat-cli", default=None)
    t.add_argument("--hg38-2bit", default=None)

    t = tsub.add_parser("encode-smoke", help="Tensor-encode a FASTQ and print shapes")
    t.add_argument("fq", type=Path)
    t.add_argument("--max-reads", type=int, default=100)

    p = sub.add_parser("train", help="Train a model (hydra-style config + overrides)")
    p.add_argument("--config", "-c", type=Path, default=None, help="YAML config file")
    p.add_argument("overrides", nargs="*", help="key.subkey=value overrides")
    p.add_argument(
        "--sweep",
        type=Path,
        default=None,
        help="hparams-search YAML (TPE + pruning; see configs/hparams_search/)",
    )
    p.add_argument("--verbose", "-v", action="store_true")

    p = sub.add_parser("eval", help="Evaluate a checkpoint (test or predict)")
    p.add_argument("--config", "-c", type=Path, default=None, help="YAML config file")
    p.add_argument("overrides", nargs="*", help="key.subkey=value overrides")
    p.add_argument("--verbose", "-v", action="store_true")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="deepchopper-tpu",
        description="DeepChopper-TPU: a genomic language model to identify artificial sequences.",
    )
    parser.add_argument("--version", "-V", action="version", version=f"DeepChopper-TPU {__version__}")
    sub = parser.add_subparsers(dest="command", required=True)
    _add_predict(sub)
    _add_chop(sub)
    _add_misc(sub)
    return parser


def cmd_predict(args: argparse.Namespace) -> int:
    if getattr(args, "conv_precision", None):
        # Must land before the kernels module is first imported: it reads
        # DEEPCHOPPER_FFT_PRECISION once at import (ops/pallas_fft.py).
        import os

        os.environ["DEEPCHOPPER_FFT_PRECISION"] = args.conv_precision

    from .chop import ChopOptions
    from .infer import PredictEngine
    from .models.registry import DeepChopper
    from .parallel.mesh import initialize_distributed

    if not args.data_path.exists():
        print(f"Error: data path '{args.data_path}' does not exist.", file=sys.stderr)
        return 1

    # Multi-host DP: launcher sets DC_COORDINATOR/DC_NUM_PROCESSES/DC_PROCESS_ID
    # (one process per host); each host then predicts its interleaved input
    # shard and writes {rank}_{batch}.npz files merged at chop.
    initialize_distributed()

    try:
        if args.checkpoint is not None:
            bundle = DeepChopper.from_checkpoint(
                args.checkpoint, DeepChopper.PRETRAINED_ALIASES.get(args.model, args.model)
            )
        else:
            bundle = DeepChopper.from_pretrained(
                args.model, torch_checkpoint=args.torch_checkpoint, random_init=args.random_init
            )
    except FileNotFoundError as exc:
        print(f"Error: {exc}", file=sys.stderr)
        return 1

    engine = PredictEngine(
        bundle,
        max_length=args.max_length,
        tokens_per_batch=args.batch_tokens,
        max_batch=args.batch_size or 512,
        return_labels=args.fused_chop,
    )
    if args.fused_chop:
        import jax

        from . import native
        from .infer.fused import fused_predict_chop

        if jax.process_count() > 1:
            # Multi-host: each host predicts its interleaved input shard, then
            # chops the reads IT predicted into a per-rank BGZF part stream;
            # rank 0 concatenates parts + EOF (shard-parallel — the smoothing,
            # splitting, and deflate all run on every host concurrently,
            # unlike the reference's rank-0-rechops-everything contract,
            # deepchopper/models/callbacks.py:25).
            from jax.experimental import multihost_utils

            from .chop.pipeline import multihost_stream_chop
            from .io.predicts import load_predicts_from_batch_pts

            rank, nprocs = jax.process_index(), jax.process_count()
            engine.predict_file(args.data_path, args.output, max_samples=args.max_sample)
            multihost_utils.sync_global_devices("deepchopper_predict_done")
            own = load_predicts_from_batch_pts(Path(args.output) / "0", pattern=f"{rank}_*")
            stats = multihost_stream_chop(
                own,
                args.fq or args.data_path,
                ChopOptions(),
                rank=rank,
                nprocs=nprocs,
                barrier=multihost_utils.sync_global_devices,
            )
            if stats is not None:
                print(
                    f"chopped {stats.total_fq_count} reads -> "
                    f"{stats.total_output_count} records -> {stats.output_file}"
                )
            return 0
        if jax.default_backend() == "tpu":
            # Stream during warmup: background-compile the bucket ladder and
            # start chopping immediately (bit-exact row decomposition onto
            # whichever variants have landed).
            engine.warmup_async()
        if args.fq is not None and args.fq != args.data_path:
            # The streamed runner predicts and chops the same stream; a
            # different qualities file needs the two-phase path.
            predicts = engine.predict_to_predicts(args.data_path, max_samples=args.max_sample)
            from .chop.pipeline import stream_chop_with_predicts

            stats = stream_chop_with_predicts(predicts, args.fq, ChopOptions())
        elif native.available():
            stats = fused_predict_chop(engine, args.data_path, ChopOptions(), max_samples=args.max_sample)
        else:
            predicts = engine.predict_to_predicts(args.data_path, max_samples=args.max_sample)
            from .chop.pipeline import stream_chop_with_predicts

            stats = stream_chop_with_predicts(predicts, args.data_path, ChopOptions())
        print(f"chopped {stats.total_fq_count} reads -> {stats.total_output_count} records -> {stats.output_file}")
    else:
        stats = engine.predict_file(
            args.data_path,
            args.output,
            max_samples=args.max_sample,
            limit_batches=args.limit_batches,
            shard_format=args.shard_format,
        )
        print(
            f"predicted {stats.reads} reads in {stats.elapsed_s:.1f}s "
            f"({stats.reads_per_s:.0f} reads/s excl. compile) -> {args.output}"
        )
    return 0


def cmd_chop(args: argparse.Namespace) -> int:
    from .chop import ChopOptions, run_chop
    from .io.chop import ChopType

    opts = ChopOptions(
        smooth_window_size=args.smooth_window,
        min_interval_size=args.min_interval_size,
        approved_interval_number=args.approved_intervals,
        max_process_intervals=args.max_process_intervals,
        min_read_length_after_chop=args.min_read_length,
        output_chopped_seqs=args.output_chopped,
        chop_type=ChopType.parse(args.chop_type),
        chunk_size=args.chunk_size,
        threads=args.threads,
        max_batch_size=args.max_batch,
        output_prefix=args.output_prefix,
    )
    stats = run_chop(list(args.predicts), args.fq, opts)
    print(
        f"processed {stats.total_fq_count} reads -> {stats.total_output_count} records "
        f"in {stats.elapsed_s:.1f}s -> {stats.output_file}"
    )
    return 0


def cmd_web(args: argparse.Namespace) -> int:
    try:
        from .ui.main import launch
    except ImportError as exc:
        print(f"web UI unavailable: {exc}", file=sys.stderr)
        return 1
    launch(
        port=args.port,
        checkpoint=args.checkpoint,
        torch_checkpoint=args.torch_checkpoint,
        random_init=args.random_init,
    )
    return 0


def cmd_encode(args: argparse.Namespace) -> int:
    from .io.parquet import encode_fq_path_to_parquet, encode_fq_path_to_parquet_chunk

    for path in args.paths:
        if args.chunk:
            out = encode_fq_path_to_parquet_chunk(path, chunk_size=args.chunk_size)
        else:
            out = encode_fq_path_to_parquet(path)
        print(f"encoded {path} -> {out}")
    return 0


def cmd_stat(args: argparse.Namespace) -> int:
    from .utils.stat import summary_record_len

    lens = summary_record_len(args.path)
    import numpy as np

    arr = np.asarray(lens)
    print(
        f"{args.path}: n={arr.size} min={arr.min()} p50={int(np.median(arr))} "
        f"mean={arr.mean():.1f} max={arr.max()}"
    )
    return 0


def cmd_eval_bam(args: argparse.Namespace) -> int:
    from .eval import OverlapOptions, collect_overlap_results_for_predicts

    opts = OverlapOptions(
        internal_threshold=args.internal_threshold,
        overlap_threshold=args.overlap_threshold,
        min_mapping_quality=args.min_mapping_quality,
        blat_cli=args.blat_cli,
        hg38_2bit=args.hg38_2bit,
    )
    results = collect_overlap_results_for_predicts(
        args.bam, args.predicts, opts, output_dir=args.output_dir
    )
    for key in sorted(results):
        print(f"{key}: {len(results[key])}")
    return 0


def cmd_tools(args: argparse.Namespace) -> int:
    from . import tools

    if args.tool == "fq2fa":
        tools.fq2fa(args.fq)
    elif args.tool == "fqsearch":
        for rec in tools.fqsearch(args.fq, args.id_substring, args.min_len, args.max_len):
            sys.stdout.buffer.write(rec.to_bytes())
    elif args.tool == "select":
        hits = tools.select_by_chop_type(args.fq, args.chop_type, args.output)
        print(f"selected {len(hits)} {args.chop_type} records", file=sys.stderr)
        if args.output is None:
            for rec in hits:
                sys.stdout.buffer.write(rec.to_bytes())
    elif args.tool == "diff":
        print(tools.diff_fq(args.original, args.chopped))
    elif args.tool == "chimericstat":
        s = tools.chimericstat(args.bam)
        print(f"total={s.total} primary_mapped={s.primary_mapped} with_sa={s.with_sa} ratio={s.ratio:.4f}")
    elif args.tool == "sa":
        print(tools.sa_summary(args.bam))
    elif args.tool == "scdiff":
        print(tools.scdiff(args.original, args.chopped))
    elif args.tool == "replacefq":
        n = tools.replacefq(args.target, args.replacement, args.output)
        print(f"replaced {n} records -> {args.output}")
    elif args.tool == "replacebam":
        n = tools.replacebam(args.dcbam, args.dobam, args.output, args.threads)
        print(f"replaced {n} internal records -> {args.output}")
    elif args.tool == "psl-top1":
        print(tools.psl_top1_summary(args.psl))
    elif args.tool == "blat-predictions":
        from .eval.blat import blat_predictions

        res = blat_predictions(
            list(args.predicts),
            prefix=args.prefix,
            selected_reads=args.selected_reads,
            fastq=args.fastq,
            smooth_window_size=args.smooth_window,
            min_interval_size=args.min_interval_size,
            approved_interval_number=args.approved_intervals,
            max_process_intervals=args.max_process_intervals,
            blat_cli=args.blat_cli,
            hg38_2bit=args.hg38_2bit,
        )
        print(res)
    elif args.tool == "encode-smoke":
        print(tools.encode_smoke(args.fq, args.max_reads))
    return 0


def cmd_train(args: argparse.Namespace) -> int:
    from .train.config import load_config
    from .train.loop import train

    cfg = load_config(args.config, args.overrides)
    if getattr(args, "sweep", None):
        import yaml

        from .train.sweep import run_sweep

        spec = yaml.safe_load(Path(args.sweep).read_text()) or {}
        trials = run_sweep(
            cfg,
            {k: str(v) for k, v in (spec.get("params") or {}).items()},
            n_trials=int(spec.get("n_trials", 10)),
            optimized_metric=spec.get("optimized_metric", "best_val_f1"),
            direction=spec.get("direction", "maximize"),
            sampler=spec.get("sampler", "tpe"),
            n_startup_trials=int(spec.get("n_startup_trials", 5)),
            pruning=bool(spec.get("pruning", True)),
            monitor=spec.get("monitor"),
            monitor_mode=spec.get("monitor_mode"),
            min_resource=int(spec.get("min_resource", 1)),
            reduction_factor=int(spec.get("reduction_factor", 3)),
            output_dir=Path(cfg.output_dir) / "sweep",
        )
        best = trials[0] if trials else None
        print(f"sweep done: best={best.metric if best else None} {best.overrides if best else {}}")
        return 0
    metrics = train(cfg)
    print(f"train done: {metrics}")
    return 0


def cmd_eval(args: argparse.Namespace) -> int:
    from .train.config import load_config
    from .train.loop import evaluate

    cfg = load_config(args.config, args.overrides)
    metrics = evaluate(cfg)
    print(f"eval done: {metrics}")
    return 0


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    logging.basicConfig(
        level=logging.INFO if getattr(args, "verbose", False) else logging.WARNING,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
    )
    from .utils.pylogger import suppress_warnings

    suppress_warnings(verbose=getattr(args, "verbose", False))
    handlers = {
        "predict": cmd_predict,
        "chop": cmd_chop,
        "web": cmd_web,
        "encode": cmd_encode,
        "stat": cmd_stat,
        "train": cmd_train,
        "eval": cmd_eval,
        "eval-bam": cmd_eval_bam,
        "tools": cmd_tools,
    }
    return handlers[args.command](args)


if __name__ == "__main__":
    raise SystemExit(main())
