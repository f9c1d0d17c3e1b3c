"""Parquet-backed dataset module (the reference's FqDataModule capability).

Reads the encoder's parquet schema {id: utf8, seq: utf8, qual: list<int32>,
target: list<int32>} (reference: src/fq_encode/parquet_encoder.rs:41-56,
deepchopper/data/fq_datamodule.py:22-352) and yields tokenizer-contract
encoded reads into the bucketed batcher. Splits are either explicit files per
split or a ratio split of a single dataset
(reference: deepchopper/data/hg_data.py:7-39 — 80/10/10 seeded shuffle).

FASTQ paths are accepted everywhere parquet is (the reference's
OnlyFqDataModule capability, deepchopper/data/only_fq.py:88-392): the loader
dispatches on suffix.
"""

from __future__ import annotations

import dataclasses
from collections.abc import Iterator
from pathlib import Path

import numpy as np

from .bucketing import Batch, EncodedRead, bucketed_batches, encode_read


def _is_fastq(path: Path) -> bool:
    name = path.name.lower()
    return any(
        name.endswith(s) for s in (".fq", ".fastq", ".fq.gz", ".fastq.gz", ".fq.bgz", ".fastq.bgz")
    )


def _parquet_files(path: Path) -> list[Path]:
    if path.is_dir():
        files = sorted(path.rglob("*.parquet"))
        if not files:
            raise FileNotFoundError(f"no .parquet files under {path}")
        return files
    return [path]


def iter_parquet_rows(path: str | Path, columns: list[str] | None = None) -> Iterator[dict]:
    """Stream rows {id, seq, qual, target} from a parquet file or chunk dir."""
    import pyarrow.parquet as pq

    for f in _parquet_files(Path(path)):
        pf = pq.ParquetFile(f)
        for rb in pf.iter_batches(columns=columns):
            cols = {name: rb.column(i) for i, name in enumerate(rb.schema.names)}
            n = rb.num_rows
            ids = cols["id"].to_pylist()
            seqs = cols["seq"].to_pylist()
            quals = cols["qual"].to_pylist()
            targets = cols["target"].to_pylist() if "target" in cols else [None] * n
            for i in range(n):
                yield {"id": ids[i], "seq": seqs[i], "qual": quals[i], "target": targets[i]}


def _pairs(flat: list[int] | None) -> list[tuple[int, int]]:
    if not flat:
        return [(0, 0)]
    return [(flat[i], flat[i + 1]) for i in range(0, len(flat) - 1, 2)]


def iter_encoded_from_any(
    path: str | Path,
    max_length: int = 32768,
    has_targets: bool = True,
    max_samples: int | None = None,
) -> Iterator[EncodedRead]:
    """Encoded-read stream from a FASTQ or parquet source (suffix dispatch)."""
    p = Path(path)
    if _is_fastq(p):
        from .fastq_module import iter_encoded_reads

        yield from iter_encoded_reads(p, max_length, has_targets, max_samples)
        return
    for i, row in enumerate(iter_parquet_rows(p)):
        if max_samples is not None and i >= max_samples:
            return
        targets = _pairs(row["target"]) if has_targets else None
        yield encode_read(
            row["id"], row["seq"], np.asarray(row["qual"], np.int32), targets, max_length
        )


def count_rows(path: str | Path) -> int:
    import pyarrow.parquet as pq

    p = Path(path)
    if _is_fastq(p):
        from .fastq_module import parse_fastq_file

        return sum(1 for _ in parse_fastq_file(p))
    return sum(pq.ParquetFile(f).metadata.num_rows for f in _parquet_files(p))


@dataclasses.dataclass
class SplitSpec:
    """Row-index split of one dataset (reference: hg_data.py ratio splits)."""

    train: np.ndarray
    val: np.ndarray
    test: np.ndarray


def ratio_split(n: int, train: float = 0.8, val: float = 0.1, seed: int = 0) -> SplitSpec:
    rng = np.random.default_rng(seed)
    order = rng.permutation(n)
    n_train = int(n * train)
    n_val = int(n * val)
    return SplitSpec(
        train=order[:n_train],
        val=order[n_train : n_train + n_val],
        test=order[n_train + n_val :],
    )


class DataModule:
    """Train/val/test/predict encoded-batch provider.

    Mirrors the reference datamodule contract
    (reference: deepchopper/data/fq_datamodule.py:119-352) with bucketed
    fixed-shape batches instead of dynamic padding.
    """

    def __init__(
        self,
        train_data_path: str | None = None,
        val_data_path: str | None = None,
        test_data_path: str | None = None,
        predict_data_path: str | None = None,
        split_train: float = 0.8,
        split_val: float = 0.1,
        max_length: int = 32768,
        tokens_per_batch: int = 1 << 17,
        max_batch: int = 512,
        buckets: list[int] | None = None,
        shuffle_buffer: int = 4096,
        seed: int = 0,
    ):
        self.train_data_path = train_data_path
        self.val_data_path = val_data_path
        self.test_data_path = test_data_path
        self.predict_data_path = predict_data_path
        self.split_train = split_train
        self.split_val = split_val
        self.max_length = max_length
        self.tokens_per_batch = tokens_per_batch
        self.max_batch = max_batch
        self.buckets = buckets
        self.shuffle_buffer = shuffle_buffer
        self.seed = seed
        self._split: SplitSpec | None = None

    # -- split management --------------------------------------------------

    def _needs_ratio_split(self) -> bool:
        return self.train_data_path is not None and self.val_data_path is None

    def _get_split(self) -> SplitSpec:
        if self._split is None:
            n = count_rows(self.train_data_path)
            self._split = ratio_split(n, self.split_train, self.split_val, self.seed)
        return self._split

    def _split_cache_paths(self) -> dict[str, Path]:
        base = Path(self.train_data_path)
        # The tag includes the source file's size+mtime so regenerating the
        # source in place invalidates the cache instead of silently training
        # on stale splits (advisor finding, round 2).
        try:
            st = base.stat()
            src = f"_{st.st_size}_{st.st_mtime_ns // 1_000_000}"
        except OSError:
            src = ""
        tag = f"splits_s{self.seed}_t{self.split_train:g}_v{self.split_val:g}{src}"
        d = base.parent / f".{base.name}.{tag}"
        return {w: d / f"{w}.parquet" for w in ("train", "val", "test")}

    def _materialize_splits(self) -> dict[str, Path] | None:
        """One-time O(n) pass writing per-split parquet files.

        The round-1 implementation re-scanned and re-encoded the WHOLE source
        for every split, every epoch (O(3n) decode per epoch — fine for
        fixtures, pathological at cell-line scale). Epochs now read only their
        own split file. Falls back to in-stream index filtering when the cache
        directory is not writable.
        """
        paths = self._split_cache_paths()
        cache_dir = paths["train"].parent
        if cache_dir.is_dir() and all(p.exists() for p in paths.values()):
            return paths
        import os as _os
        import shutil

        import pyarrow.parquet as pq

        from ..io.parquet import _arrow_schema

        split = self._get_split()
        n = sum(len(getattr(split, w)) for w in ("train", "val", "test"))
        member = np.empty(n, np.int8)
        for si, w in enumerate(("train", "val", "test")):
            member[getattr(split, w)] = si
        # Write into a temp dir and rename it into place: a crash mid-write
        # must never leave a partial cache that later runs would trust.
        tmp_dir = cache_dir.with_name(cache_dir.name + f".tmp{_os.getpid()}")
        try:
            tmp_dir.mkdir(parents=True, exist_ok=True)
            writers = {}
            buffers: dict[str, list[dict]] = {w: [] for w in paths}
            schema = _arrow_schema()

            def flush(w: str) -> None:
                if not buffers[w]:
                    return
                import pyarrow as pa

                if w not in writers:
                    writers[w] = pq.ParquetWriter(tmp_dir / paths[w].name, schema)
                writers[w].write_table(pa.Table.from_pylist(buffers[w], schema=schema))
                buffers[w] = []

            for i, row in enumerate(self._iter_source_rows()):
                w = ("train", "val", "test")[member[i]]
                buffers[w].append(row)
                if len(buffers[w]) >= 10_000:
                    flush(w)
            for w in paths:
                flush(w)
                if w not in writers:  # empty split still needs a valid file
                    writers[w] = pq.ParquetWriter(tmp_dir / paths[w].name, schema)
                writers[w].close()
            if cache_dir.exists():
                shutil.rmtree(cache_dir)
            _os.replace(tmp_dir, cache_dir)
            return paths
        except Exception:  # noqa: BLE001 - fall back to in-stream filtering
            shutil.rmtree(tmp_dir, ignore_errors=True)
            return None

    def _iter_source_rows(self) -> Iterator[dict]:
        """{id, seq, qual, target} rows from the ratio-split source."""
        p = Path(self.train_data_path)
        if _is_fastq(p):
            from .fastq_module import parse_fastq_file

            for rec in parse_fastq_file(p):
                yield {
                    "id": rec["id"],
                    "seq": rec["seq"],
                    "qual": np.asarray(rec["qual"]).tolist(),
                    "target": [v for se in rec["target"] for v in se],
                }
            return
        yield from iter_parquet_rows(p)

    def _iter_encoded(self, path: str, indices: np.ndarray | None) -> Iterator[EncodedRead]:
        if indices is None:
            yield from iter_encoded_from_any(path, self.max_length)
            return
        allowed = set(int(i) for i in indices)
        for i, r in enumerate(iter_encoded_from_any(path, self.max_length)):
            if i in allowed:
                yield r

    def _split_iter(self, which: str) -> Iterator[EncodedRead]:
        if self._needs_ratio_split():
            paths = self._materialize_splits()
            if paths is not None:
                yield from iter_encoded_from_any(paths[which], self.max_length)
                return
            split = self._get_split()
            yield from self._iter_encoded(self.train_data_path, getattr(split, which))
            return
        path = getattr(self, f"{which}_data_path")
        if path is None:
            raise ValueError(f"no {which} data path configured")
        yield from self._iter_encoded(path, None)

    # -- shuffling ---------------------------------------------------------

    def _shuffled(self, reads: Iterator[EncodedRead], epoch: int) -> Iterator[EncodedRead]:
        """Buffered streaming shuffle (epoch-seeded)."""
        if self.shuffle_buffer <= 1:
            yield from reads
            return
        rng = np.random.default_rng((self.seed, epoch))
        buf: list[EncodedRead] = []
        for r in reads:
            buf.append(r)
            if len(buf) >= self.shuffle_buffer:
                idx = rng.integers(len(buf))
                buf[idx], buf[-1] = buf[-1], buf[idx]
                yield buf.pop()
        rng.shuffle(buf)  # type: ignore[arg-type]
        yield from buf

    # -- batch iterators ---------------------------------------------------

    def _batches(self, reads: Iterator[EncodedRead]) -> Iterator[Batch]:
        yield from bucketed_batches(
            reads,
            buckets=self.buckets,
            tokens_per_batch=self.tokens_per_batch,
            max_batch=self.max_batch,
        )

    def train_batches(self, epoch: int = 0) -> Iterator[Batch]:
        yield from self._batches(self._shuffled(self._split_iter("train"), epoch))

    def val_batches(self) -> Iterator[Batch]:
        yield from self._batches(self._split_iter("val"))

    def test_batches(self) -> Iterator[Batch]:
        yield from self._batches(self._split_iter("test"))

    def predict_batches(self) -> Iterator[Batch]:
        if self.predict_data_path is None:
            raise ValueError("no predict data path configured")
        yield from self._batches(
            iter_encoded_from_any(self.predict_data_path, self.max_length, has_targets=False)
        )
