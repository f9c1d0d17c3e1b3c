"""TPU inference engine: bucketed, jit-cached, async-pipelined predict.

Replaces the reference's Lightning predict loop
(reference: deepchopper/cli.py:66-152, deepchopper/models/basic_module.py:197-207):

* one XLA compile per bucket shape (batch dims padded up to the bucket target
  so partial batches reuse the same executable);
* device steps dispatch asynchronously ahead of host IO (JAX async dispatch
  gives a natural 2-deep pipeline: while the TPU runs batch i, the host
  encodes/pads batch i+1 and writes shard i-1);
* shards follow the predict->chop contract
  (reference: deepchopper/models/callbacks.py:12-25) as `.npz` under
  `output_dir/<dataloader_idx>/<rank>_<batch>.npz`;
* the fused path skips shard IO entirely: on-device argmax -> host
  majority-vote smoothing -> chop (capability of the reference's in-memory
  `predict_cli`, src/cli.rs:57-165).
"""

from __future__ import annotations

import dataclasses
import logging
import time
from collections.abc import Iterator
from pathlib import Path
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

from .. import default
from ..data.bucketing import Batch, default_buckets
from ..data.fastq_module import iter_batches
from ..models.registry import ModelBundle

log = logging.getLogger(__name__)


@dataclasses.dataclass
class PredictStats:
    reads: int = 0
    batches: int = 0
    tokens: int = 0  # true token count (sum of read lengths)
    padded_tokens: int = 0  # tokens the device actually computed (B*W per step)
    elapsed_s: float = 0.0
    compile_s: float = 0.0
    setup_s: float = 0.0  # one-time Mosaic/runtime setup (first Pallas exec)
    # dispatch count per padded (rows, width) shape — feeds the MFU estimate
    shape_counts: dict = dataclasses.field(default_factory=dict)

    @property
    def reads_per_s(self) -> float:
        run = max(self.elapsed_s - self.compile_s, 1e-9)
        return self.reads / run

    @property
    def tokens_per_s(self) -> float:
        run = max(self.elapsed_s - self.compile_s, 1e-9)
        return self.tokens / run


def _prefetch_iter(it: Iterator, depth: int) -> Iterator:
    """Pull `it` on a daemon thread, `depth` items ahead.

    Exceptions from the producer re-raise at the consumer's next pull; the
    producer blocks when the consumer falls `depth` behind (bounded memory).
    If the consumer abandons the generator early (break / exception /
    GeneratorExit), a stop flag unblocks the producer so it doesn't keep
    pulling the source — for the dispatch stage that would pin in-flight
    device buffers for the life of the process.
    """
    import queue
    import threading

    q: queue.Queue = queue.Queue(maxsize=depth)
    _END = object()
    stop = threading.Event()

    def _put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def _run() -> None:
        try:
            for item in it:
                if not _put(item):
                    return
            _put(_END)
        except BaseException as exc:  # noqa: BLE001 - re-raised at consumer
            _put(exc)
        finally:
            close = getattr(it, "close", None)
            if stop.is_set() and close is not None:
                close()

    threading.Thread(target=_run, name="batch-prefetch", daemon=True).start()
    try:
        while True:
            item = q.get()
            if item is _END:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()


class PredictEngine:
    def __init__(
        self,
        bundle: ModelBundle,
        max_length: int = 32768,
        tokens_per_batch: int = 1 << 17,
        buckets: list[int] | None = None,
        max_batch: int = 512,
        return_labels: bool = False,
        mesh=None,
    ):
        """`mesh`: optional 1-axis `jax.sharding.Mesh` — the batch axis shards
        across it (data-parallel predict over chips; reference capability:
        multi-GPU Lightning predict, deepchopper/cli.py:127-135). Outputs stay
        replicated (labels are tiny); per-host shard naming is handled by
        `predict_file(rank=jax.process_index())`."""
        from ..utils.compile_cache import enable_compilation_cache

        enable_compilation_cache()
        self.bundle = bundle
        self.max_length = max_length
        self.tokens_per_batch = tokens_per_batch
        self.buckets = buckets or default_buckets(max_length)
        self.max_batch = max_batch
        self.return_labels = return_labels
        self.mesh = mesh
        self._compiled: dict[tuple[int, int], object] = {}
        import threading

        self._lock = threading.Lock()
        # In-flight compiles: shape -> Event (set when done); lets the stream
        # thread and the async-warmup pool dedupe work on the same shape.
        self._inflight: dict[tuple[int, int], threading.Event] = {}
        self._inflight_exc: dict[tuple[int, int], BaseException] = {}
        # Streaming warmup: when on, _plan_dispatches only uses ALREADY
        # compiled row variants (bit-exact row decomposition), so the stream
        # never blocks on a compile except the first, smallest variant of a
        # width it needs.
        self._stream_warmup = False
        self.stats = PredictStats()

        module = bundle.module
        # Covers the degenerate case tokens_per_batch < max bucket width:
        # the widest bucket still needs one batch row per mesh device.
        min_rows = mesh.devices.size if mesh is not None else 1
        flat_tokens = max(self.tokens_per_batch, max(self.buckets) * min_rows)
        self._flat_tokens = flat_tokens

        # Both steps return ONE canonical flat shape regardless of the bucket:
        # the runtime pays a large one-time setup cost on the first
        # device-to-host transfer of each distinct (shape, dtype) — returning
        # (B, W)-shaped outputs would pay it once per bucket (~45s each on a
        # tunneled chip). A fixed flat buffer pays it exactly once, absorbed
        # by warmup(); the host slices the valid B*W prefix back out.

        # Inputs arrive compact (int8 tokens + uint8 raw phred — 4x less
        # host-to-device traffic than int32+float32); the per-read L2 qual
        # normalization happens on device. Zero padding contributes nothing to
        # the L2 norm, so this matches the host-side normalize_quals exactly
        # (reference contract: deepchopper/models/llm/tokenizer.py:131).

        def _apply(params, ids_i8, quals_u8):
            ids = ids_i8.astype(jnp.int32)
            q = quals_u8.astype(jnp.float32)
            norm = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True))
            q = q / jnp.maximum(norm, 1e-12)
            return module.apply({"params": params}, ids, q)

        if mesh is None:
            # Single device: one canonical flat output buffer per dtype, so
            # the runtime's per-(shape,dtype) transfer-path setup is paid once.
            def _logits_step(params, ids_i8, quals_u8):
                logits = _apply(params, ids_i8, quals_u8)
                flat = logits.astype(jnp.float32).reshape(-1)
                out = jnp.zeros((flat_tokens * 2,), jnp.float32)
                return jax.lax.dynamic_update_slice(out, flat, (0,))

            def _labels_step(params, ids_i8, quals_u8):
                logits = _apply(params, ids_i8, quals_u8)
                labels = jnp.argmax(logits, axis=-1).astype(jnp.int8)
                out = jnp.zeros((flat_tokens,), jnp.int8)
                return jax.lax.dynamic_update_slice(out, labels.reshape(-1), (0,))

        else:
            # Mesh: keep outputs batch-sharded — a replicated flat buffer
            # would all-gather the full logits to every device each step.
            def _logits_step(params, ids_i8, quals_u8):
                return _apply(params, ids_i8, quals_u8).astype(jnp.float32)

            def _labels_step(params, ids_i8, quals_u8):
                logits = _apply(params, ids_i8, quals_u8)
                return jnp.argmax(logits, axis=-1).astype(jnp.int8)

        self._step_fn = _labels_step if return_labels else _logits_step
        if mesh is not None:
            from ..parallel.mesh import replicated_sharding

            self._params = jax.device_put(bundle.params, replicated_sharding(mesh))
        else:
            self._params = jax.device_put(bundle.params)

    # -- compilation ------------------------------------------------------

    def _get_step(self, shape: tuple[int, int]):
        import threading

        fn = self._compiled.get(shape)
        if fn is not None:
            return fn
        with self._lock:
            fn = self._compiled.get(shape)
            if fn is not None:
                return fn
            ev = self._inflight.get(shape)
            owner = ev is None
            if owner:
                ev = threading.Event()
                self._inflight[shape] = ev
        if not owner:
            # Another thread (stream or warmup pool) is compiling this shape.
            ev.wait()
            exc = self._inflight_exc.get(shape)
            if exc is not None:
                raise exc
            return self._compiled[shape]
        try:
            t0 = time.monotonic()
            if self.mesh is not None:
                from ..parallel.mesh import batch_sharding, replicated_sharding

                fn = jax.jit(
                    self._step_fn,
                    in_shardings=(
                        replicated_sharding(self.mesh),
                        batch_sharding(self.mesh),
                        batch_sharding(self.mesh),
                    ),
                    out_shardings=batch_sharding(self.mesh),
                )
            else:
                fn = jax.jit(self._step_fn)
            # Trigger compile eagerly so compile time is attributable.
            ids = jnp.zeros(shape, jnp.int8)
            quals = jnp.zeros(shape, jnp.uint8)
            fn(self._params, ids, quals)
            dt = time.monotonic() - t0
            with self._lock:
                self.stats.compile_s += dt
                self._compiled[shape] = fn
            log.info("compiled bucket %s in %.1fs", shape, dt)
        except BaseException as exc:
            with self._lock:
                self._inflight_exc[shape] = exc
            raise
        finally:
            with self._lock:
                self._inflight.pop(shape, None)
            ev.set()
        return fn

    def _bucket_batch_size(self, width: int) -> int:
        n = max(1, min(self.max_batch, self.tokens_per_batch // width))
        if self.mesh is not None:
            # The sharded batch axis must divide evenly across the mesh.
            # Round UP, not down: producers (bucketing.iter_batches,
            # span_batches) emit full batches of exactly
            # min(max_batch, tokens_per_batch // width) rows, so the largest
            # compiled variant must be >= that or a full batch falls through
            # the row-variant lookup and dispatches with a batch axis that
            # does not divide the mesh.
            size = self.mesh.devices.size
            n = ((n + size - 1) // size) * size
        return n

    def _row_variants(self, width: int) -> list[int]:
        """Compiled row counts per bucket: target plus /4 and /16 tails.

        Partial batches pad up to the smallest variant that fits instead of
        the full target. Round 3 shipped a denser /2,/4,/8,/16 ladder (waste
        3.9% vs 10.4% of dispatched tokens) but the Mosaic kernel compile at
        first execution is NOT served by the persistent XLA cache, so every
        cold process pays ~15-25s per (rows, width) executable: the two extra
        variants per bucket cost ~10 min of warmup to save ~6% of dispatched
        tokens on the tail batches only. {t, t/4, t/16} keeps the worst-case
        tail row padding under 4x while holding warmup at 3 shapes/bucket
        (`DEEPCHOPPER_ROW_VARIANTS` overrides the divisor list, e.g.
        "2,4,8,16" to restore the dense ladder)."""
        import os

        t = self._bucket_batch_size(width)
        size = self.mesh.devices.size if self.mesh is not None else 1
        divs = tuple(
            int(x) for x in os.environ.get("DEEPCHOPPER_ROW_VARIANTS", "4,16").split(",") if x
        )
        out = {t}
        for div in divs:
            v = max(size, ((t // div) // size) * size, 1)
            out.add(v)
        return sorted(out)

    def runtime_setup(self) -> float:
        """Absorb the one-time Pallas/Mosaic runtime setup cost; returns seconds.

        Measured on the tunneled chip: the FIRST Pallas kernel execution in a
        process pays a large one-time cost (~25-450s depending on service
        load) before the actual kernel compile; every subsequent kernel
        compiles in single-digit seconds. Running a trivial one-tile kernel
        first makes that cost explicit and keeps the per-bucket compile loop
        fast — without it the first model executable absorbs the whole cost
        and warmup appears serial. No-op off TPU and on repeat calls.
        """
        if self.stats.setup_s or jax.default_backend() != "tpu":
            return 0.0
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def _triv(x_ref, o_ref):
            o_ref[:] = x_ref[:] + 1.0

        t0 = time.monotonic()
        out = pl.pallas_call(
            _triv,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(jnp.zeros((8, 128), jnp.float32))
        np.asarray(out)
        self.stats.setup_s = time.monotonic() - t0
        log.info("pallas runtime setup in %.1fs", self.stats.setup_s)
        return self.stats.setup_s

    def warmup(
        self,
        buckets: list[int] | None = None,
        variants: bool = True,
        max_workers: int | None = None,
    ) -> float:
        """Precompile every bucket shape (and tail row variants); returns
        total wall seconds (including the one-time runtime setup).

        `runtime_setup()` runs first so the per-shape loop isn't charged the
        one-time Mosaic cost, then compiles run CONCURRENTLY across a thread
        pool — XLA compilation is C++ and releases the GIL. The realized
        overlap (sum of per-shape compile seconds / wall) is logged so a
        serialized compile service is visible instead of assumed away.
        Partial batches pad up to the nearest compiled row variant, so after
        warmup the whole run executes with zero recompilation; the persistent
        XLA cache makes the XLA share once-per-machine (the Mosaic share is
        per-process — see runtime_setup)."""
        import os
        from concurrent.futures import ThreadPoolExecutor

        shapes: list[tuple[int, int]] = []
        for w in buckets or self.buckets:
            rows = self._row_variants(w) if variants else [self._bucket_batch_size(w)]
            shapes.extend((r, w) for r in rows)
        shapes = [s for s in dict.fromkeys(shapes) if s not in self._compiled]
        t0 = time.monotonic()
        self.runtime_setup()
        t_compile = time.monotonic()
        compile_s_before = self.stats.compile_s
        workers = max_workers or min(16, max(1, len(shapes)), os.cpu_count() or 8)
        if workers > 1 and len(shapes) > 1:
            with ThreadPoolExecutor(workers) as ex:
                list(ex.map(self._get_step, shapes))
        else:
            for s in shapes:
                self._get_step(s)
        wall = time.monotonic() - t_compile
        if shapes and wall > 0:
            compiled_s = self.stats.compile_s - compile_s_before
            log.info(
                "warmup: %d shapes in %.1fs wall (compile-seconds %.1f, overlap %.1fx)",
                len(shapes),
                wall,
                compiled_s,
                compiled_s / wall,
            )
        if shapes:
            shape = shapes[0]
            out = self._get_step(shape)(
                self._params,
                jnp.zeros(shape, jnp.int8),
                jnp.zeros(shape, jnp.uint8),
            )
            np.asarray(out)
        return time.monotonic() - t0

    def warmup_async(
        self,
        buckets: list[int] | None = None,
        variants: bool = True,
        max_workers: int | None = None,
    ):
        """Background warmup: stream DURING compilation instead of after it.

        Compiles the bucket ladder on daemon threads, smallest row variants
        first across all widths, so the stream's first dispatch of a width
        blocks on at most ONE cheap compile; bigger variants hot-swap in as
        they land (`_plan_dispatches` consults the live compiled set, and row
        decomposition is bit-exact, so outputs are identical to a fully
        warmed run). The reference's Rust chop starts streaming immediately
        (src/bin/predict.rs:275) — this is the TPU equivalent.

        Returns a `concurrent.futures.Future` that completes (with total
        compile-wall seconds) when the whole ladder is compiled. All pool
        threads are DAEMONS: pending compiles never block process exit
        (`future.cancel()` also stops workers before their next compile).
        """
        import os
        import queue as queue_mod
        import threading
        from concurrent.futures import Future

        shapes: list[tuple[int, int]] = []
        # Priority: one small variant of EVERY width first (unblocks the
        # stream everywhere), then the mid variants, then the full targets.
        per_width = {
            w: (self._row_variants(w) if variants else [self._bucket_batch_size(w)])
            for w in (buckets or self.buckets)
        }
        max_tiers = max(len(v) for v in per_width.values()) if per_width else 0
        for tier in range(max_tiers):
            for w, rows in per_width.items():
                if tier < len(rows):
                    shapes.append((rows[tier], w))
        shapes = [s for s in dict.fromkeys(shapes) if s not in self._compiled]
        self._stream_warmup = True
        t0 = time.monotonic()
        workers = max_workers or min(16, max(1, len(shapes), 1), os.cpu_count() or 8)
        future: Future = Future()
        work: queue_mod.Queue = queue_mod.Queue()
        for s in shapes:
            work.put(s)
        errors: list[BaseException] = []

        def _worker() -> None:
            while not future.cancelled():
                try:
                    s = work.get_nowait()
                except queue_mod.Empty:
                    return
                try:
                    self._get_step(s)
                except BaseException as exc:  # noqa: BLE001 - surfaced via future
                    errors.append(exc)
                    return

        def _run() -> None:
            try:
                self.runtime_setup()
                threads = [
                    threading.Thread(target=_worker, name=f"warmup_{i}", daemon=True)
                    for i in range(workers)
                ]
                self._warmup_threads = threads
                for t in threads:
                    t.start()
                for t in threads:
                    t.join()
            finally:
                self._stream_warmup = False
            wall = time.monotonic() - t0
            log.info("async warmup: %d shapes done in %.1fs wall", len(shapes), wall)
            if future.cancelled():
                return
            if errors:
                future.set_exception(errors[0])
            else:
                future.set_result(wall)

        coordinator = threading.Thread(target=_run, name="warmup-main", daemon=True)
        self._warmup_future = future
        self._warmup_coordinator = coordinator
        coordinator.start()
        # Daemon threads frozen mid-XLA-compile at interpreter teardown abort
        # the process ("FATAL: exception not rethrown") — drain gracefully.
        import atexit

        atexit.register(self.stop_warmup)
        return future

    def stop_warmup(self) -> None:
        """Cancel pending async-warmup compiles and wait out in-flight ones.

        Bounded by the duration of at most one compile per worker thread;
        safe to call multiple times / without a prior warmup_async."""
        fut = getattr(self, "_warmup_future", None)
        if fut is None:
            return
        fut.cancel()
        coord = getattr(self, "_warmup_coordinator", None)
        if coord is not None and coord.is_alive():
            coord.join()
        self._warmup_future = None

    def _available_rows(self, width: int) -> list[int]:
        with self._lock:
            return sorted(r for (r, w) in self._compiled if w == width)

    def estimated_flops(self) -> float | None:
        """Total device FLOPs dispatched so far, from XLA's own cost analysis.

        Sums per-shape executable FLOPs weighted by dispatch counts. Note
        `fn.lower(...).compile()` is an AOT compile that bypasses the
        in-memory jit cache — each distinct shape costs one (persistent-
        disk-cache-served at best) XLA compile here, which is why this runs
        once post-bench, not per batch. Shapes whose cost analysis reports
        zero FLOPs are skipped (not fatal) so one odd executable doesn't
        void the whole estimate; returns None only when nothing usable was
        reported (e.g. CPU interpret paths)."""
        total = 0.0
        try:
            for shape, count in self.stats.shape_counts.items():
                fn = self._compiled.get(shape)
                if fn is None:
                    continue
                ca = (
                    fn.lower(
                        self._params,
                        jax.ShapeDtypeStruct(shape, jnp.int8),
                        jax.ShapeDtypeStruct(shape, jnp.uint8),
                    )
                    .compile()
                    .cost_analysis()
                )
                if isinstance(ca, (list, tuple)):
                    ca = ca[0] if ca else {}
                flops = float(ca.get("flops", 0.0)) if ca else 0.0
                if flops <= 0.0:
                    continue
                total += flops * count
        except Exception:  # pragma: no cover - runtime-dependent
            return None
        return total or None

    # -- prediction -------------------------------------------------------

    def predict_batches(
        self,
        batches: Iterator[Batch],
        depth: int = 4,
        prefetch: int = 3,
        materialize: bool = True,
    ) -> Iterator[tuple[Batch, Any]]:
        """Yield (batch, outputs) with a `depth`-deep async pipeline.

        Dispatches run ahead of result collection so per-call dispatch/transfer
        latency (large on tunneled chips) overlaps across in-flight batches,
        and the INPUT iterator (host encode — C++, GIL-releasing) is pulled on
        a background thread `prefetch` batches ahead so encode overlaps device
        compute instead of serializing with result waits (measured ~27% of
        fused wall time otherwise). Outputs are (B, W, 2) float32 logits, or
        (B, W) int8 labels when `return_labels`. Partial batches decompose
        into compiled row variants (see _plan_dispatches).

        `materialize=False` yields (batch, parts) with the device results
        still in flight; the consumer calls `unpack(batch, parts)` (from any
        thread) to fetch+assemble. The consumer-side queue must be bounded:
        each un-unpacked batch holds device output buffers.

        Threading: encode runs `prefetch` ahead on one daemon thread; the
        dispatch work (row padding, H2D transfer, step call — each a
        latency-bound tunnel round trip) runs `depth` ahead on a second; the
        caller's thread only collects results. Without the dispatch stage the
        H2D latency serialized with result waits (~15 ms/batch of the fused
        wall).
        """
        if prefetch:
            batches = _prefetch_iter(batches, prefetch)
        t_start = time.monotonic()

        def _dispatched() -> Iterator[tuple[Batch, list]]:
            for batch in batches:
                b, w = batch.input_ids.shape
                ids8 = batch.input_ids.astype(np.int8, copy=False)  # vocab ids < 128
                if batch.quals_raw is None:
                    raise ValueError("engine requires batches with quals_raw (see pad_batch)")
                quals8 = batch.quals_raw
                parts = []  # (row_start, rows_valid, out_dev, padded_shape)
                for start, rows, target_b in self._plan_dispatches(b, w):
                    if rows < target_b:
                        ids_in = np.full((target_b, w), default.TOKEN_PAD, np.int8)
                        ids_in[:rows] = ids8[start : start + rows]
                        quals_in = np.zeros((target_b, w), np.uint8)
                        quals_in[:rows] = quals8[start : start + rows]
                    else:
                        ids_in = ids8[start : start + rows]
                        quals_in = quals8[start : start + rows]
                    step = self._get_step((target_b, w))
                    out_dev = step(self._params, jnp.asarray(ids_in), jnp.asarray(quals_in))
                    try:
                        out_dev.copy_to_host_async()  # overlap D2H with later dispatches
                    except Exception:  # pragma: no cover - runtime-dependent
                        pass
                    parts.append((start, rows, out_dev, (target_b, w)))
                    shape = (target_b, w)
                    self.stats.shape_counts[shape] = self.stats.shape_counts.get(shape, 0) + 1
                    self.stats.padded_tokens += target_b * w
                self.stats.batches += 1
                self.stats.reads += b
                self.stats.tokens += int(batch.lengths.sum())
                yield batch, parts

        dispatched = _prefetch_iter(_dispatched(), depth) if depth else _dispatched()
        for batch, parts in dispatched:
            if materialize:
                yield self._unpack(batch, parts)
            else:
                yield batch, parts
        self.stats.elapsed_s += time.monotonic() - t_start

    def _plan_dispatches(self, b: int, w: int) -> list[tuple[int, int, int]]:
        """Split a b-row batch into dispatches of compiled row variants.

        Returns (row_start, rows_valid, compiled_rows) triples. Full batches
        are one dispatch. Tail batches decompose GREEDILY into the largest
        compiled variants that fit, with only the final remainder padding up
        to the smallest variant — tail row-padding waste drops from
        (variant - b) to at most (smallest_variant - 1) rows at a cost of
        ~1-2 ms dispatch overhead per extra part (measured on the tunneled
        chip; round 2 reverted an earlier version of this when the dispatch
        floor was ~30 ms). Compiles nothing new: only warmup's shapes run.
        """
        variants = self._row_variants(w)
        if self._stream_warmup:
            # Streaming warmup: dispatch only to ALREADY compiled variants
            # (bit-exact row decomposition), blocking at most on the smallest
            # variant of a width seen for the first time. Bigger variants
            # hot-swap in as the background pool lands them.
            avail = self._available_rows(w)
            variants = avail or [variants[0]]
        target_b = next((v for v in variants if v >= b), None)
        if target_b is None and self._stream_warmup and variants[-1] < b:
            # Largest compiled variant is smaller than the batch: decompose
            # fully into compiled variants (no new compiles mid-stream).
            plan: list[tuple[int, int, int]] = []
            start = 0
            rem = b
            for v in sorted(variants, reverse=True):
                while rem >= v:
                    plan.append((start, v, v))
                    start += v
                    rem -= v
            if rem:
                plan.append((start, rem, variants[0]))
            return plan
        if target_b is None:
            # Oversized batch from a foreign producer: pad its own row
            # count up to a mesh multiple (one extra compile, no crash).
            size = self.mesh.devices.size if self.mesh is not None else 1
            return [(0, b, ((b + size - 1) // size) * size)]
        if target_b == b:
            return [(0, b, b)]
        plan: list[tuple[int, int, int]] = []
        start = 0
        rem = b
        for v in sorted(variants, reverse=True):
            while rem >= v:
                plan.append((start, v, v))
                start += v
                rem -= v
        if rem:
            plan.append((start, rem, variants[0]))
        # A decomposition that saves no padded rows (e.g. variants [16,64],
        # b=63 -> 4x16 = 64 rows) only adds per-dispatch overhead; keep the
        # single padded dispatch unless the plan computes strictly fewer rows.
        if sum(p[2] for p in plan) >= target_b:
            return [(0, b, target_b)]
        return plan

    def unpack(self, batch: Batch, parts) -> np.ndarray:
        """Fetch+assemble a lazily-yielded batch's outputs (thread-safe)."""
        return self._unpack(batch, parts)[1]

    def _unpack(self, batch: Batch, parts) -> tuple[Batch, np.ndarray]:
        """Reassemble per-dispatch outputs into this batch's rows."""
        b, w = batch.input_ids.shape
        if self.return_labels:
            out = np.empty((b, w), np.int8)
        else:
            out = np.empty((b, w, 2), np.float32)
        for start, rows, out_dev, (pb_b, _w) in parts:
            if self.mesh is not None:
                out[start : start + rows] = np.asarray(out_dev)[:rows]
                continue
            flat = np.asarray(out_dev)
            if self.return_labels:
                out[start : start + rows] = flat[: pb_b * w].reshape(pb_b, w)[:rows]
            else:
                out[start : start + rows] = flat[: pb_b * w * 2].reshape(pb_b, w, 2)[:rows]
        return batch, out

    def predict_file(
        self,
        fq_path: str | Path,
        output_dir: str | Path,
        rank: int | None = None,
        dataloader_idx: int = 0,
        max_samples: int | None = None,
        limit_batches: int | None = None,
        shard: tuple[int, int] | None = None,
        shard_format: str = "npz",
    ) -> PredictStats:
        """Predict a FASTQ and write prediction shards with the chop contract.

        `shard_format="npz"` (native) or `"pt"` (reference torch format — the
        reference's `deepchopper-chop` binary can consume it directly,
        reference: src/smooth/predict.rs:263-317).

        Multi-host DP: `rank` defaults to `jax.process_index()` and `shard`
        defaults to (process_index, process_count), so each host reads its own
        interleaved slice of the FASTQ and writes `{rank}_{batch}` shards
        that the chop stage merges (reference contract:
        deepchopper/models/callbacks.py:25, cli.py:181).
        """
        from ..io.predicts import write_prediction_shard, write_prediction_shard_pt

        if shard_format not in ("npz", "pt"):
            raise ValueError(f"shard_format must be 'npz' or 'pt', got {shard_format!r}")
        write_shard = write_prediction_shard_pt if shard_format == "pt" else write_prediction_shard

        if rank is None:
            rank = jax.process_index()
        if shard is None and jax.process_count() > 1:
            shard = (jax.process_index(), jax.process_count())
        out = Path(output_dir) / str(dataloader_idx)
        out.mkdir(parents=True, exist_ok=True)
        batches = iter_batches(
            fq_path,
            max_length=self.max_length,
            tokens_per_batch=self.tokens_per_batch,
            buckets=self.buckets,
            max_samples=max_samples,
            max_batch=self.max_batch,
            shard=shard,
        )
        for i, (batch, outputs) in enumerate(self.predict_batches(batches)):
            if limit_batches is not None and i >= limit_batches:
                break
            write_shard(
                out / f"{rank}_{i}.{shard_format}",
                prediction=outputs,
                target=batch.labels,
                seq=batch.input_ids,
                qual=batch.quals,
                ids=batch.ids,
            )
        log.info(
            "predict: %d reads, %d batches, %.0f reads/s (+%.1fs compile)",
            self.stats.reads,
            self.stats.batches,
            self.stats.reads_per_s,
            self.stats.compile_s,
        )
        return self.stats

    # -- fused predict + chop ---------------------------------------------

    def predict_to_predicts(
        self,
        fq_path: str | Path,
        max_samples: int | None = None,
    ) -> dict[str, "object"]:
        """Fused path: FASTQ -> per-read `Predict`s without shard IO.

        Uses on-device argmax (labels-only transfer) and decodes per-read
        label/seq vectors on host.
        """
        from ..io.predicts import Predict
        from ..ops.sequence import detokenize_bases

        if not self.return_labels:
            raise ValueError("construct PredictEngine(return_labels=True) for the fused path")
        out: dict[str, Predict] = {}
        batches = iter_batches(
            fq_path,
            max_length=self.max_length,
            tokens_per_batch=self.tokens_per_batch,
            buckets=self.buckets,
            max_samples=max_samples,
            max_batch=self.max_batch,
        )
        for batch, labels in self.predict_batches(batches):
            seqs = batch.seqs
            for i, rid in enumerate(batch.read_ids):
                n = int(batch.lengths[i]) - 1  # strip SEP
                if seqs is not None and seqs[i] is not None:
                    seq = seqs[i][:n]
                else:
                    seq = detokenize_bases(batch.input_ids[i, :n])
                out[rid] = Predict(
                    prediction=labels[i, :n].astype(np.int8),
                    seq=seq,
                    id=rid,
                    is_truncated=bool(batch.ids[i, 1]),
                    qual=None,
                )
        return out
