"""Parquet/JSON dataset encoders.

Equivalent of the reference's ParquetEncoder/JsonEncoder
(reference: src/fq_encode/parquet_encoder.rs:41-168, json_encoder.rs:36-144):
one row per read with schema {id: utf8, seq: utf8, qual: list<int32>,
target: list<int32>}, plus chunked parallel writing to `<fq>_chunks/*.parquet`.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from .. import default
from ..ops.labels import parse_target_from_id
from ..ops.qual import encode_qual


def _record_rows(fq_path: str | Path, kmer_size: int = 0):
    from .fastq import StreamingFastqReader

    for rec in StreamingFastqReader(fq_path):
        seq = rec.seq.decode("ascii").upper()
        if kmer_size > 0 and len(seq) < kmer_size:
            continue
        if len(rec.seq) != len(rec.qual):
            continue
        targets = parse_target_from_id(rec.name)
        flat = [int(v) for se in targets for v in se]
        yield {
            "id": rec.name,
            "seq": seq,
            "qual": encode_qual(rec.qual.decode("ascii")).tolist(),
            "target": flat,
        }


def _arrow_schema():
    import pyarrow as pa

    return pa.schema(
        [
            pa.field("id", pa.string()),
            pa.field("seq", pa.string()),
            pa.field("qual", pa.list_(pa.int32())),
            pa.field("target", pa.list_(pa.int32())),
        ]
    )


def encode_fq_path_to_parquet(
    fq_path: str | Path, result_path: str | Path | None = None, kmer_size: int = 0, **_kw
) -> Path:
    """Encode one FASTQ to one parquet file
    (reference: src/python.rs `encode_fq_path_to_parquet`)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    fq_path = Path(fq_path)
    if result_path is None:
        result_path = fq_path.with_suffix(".parquet")
    rows = list(_record_rows(fq_path, kmer_size=kmer_size))
    table = pa.Table.from_pylist(rows, schema=_arrow_schema())
    pq.write_table(table, result_path)
    return Path(result_path)


def encode_fq_paths_to_parquet(fq_paths: list[str | Path], **kw) -> list[Path]:
    return [encode_fq_path_to_parquet(p, **kw) for p in fq_paths]


def encode_fq_path_to_parquet_chunk(
    fq_path: str | Path, chunk_size: int = 1_000_000, parallel: bool = True, **_kw
) -> Path:
    """Chunked encoding to `<stem>_chunks/*.parquet`
    (reference: src/fq_encode/parquet_encoder.rs:115-168)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    fq_path = Path(fq_path)
    out_dir = fq_path.parent / f"{fq_path.stem}_chunks"
    out_dir.mkdir(parents=True, exist_ok=True)
    schema = _arrow_schema()
    chunk: list[dict] = []
    idx = 0
    for row in _record_rows(fq_path):
        chunk.append(row)
        if len(chunk) >= chunk_size:
            pq.write_table(pa.Table.from_pylist(chunk, schema=schema), out_dir / f"{idx}.parquet")
            chunk, idx = [], idx + 1
    if chunk:
        pq.write_table(pa.Table.from_pylist(chunk, schema=schema), out_dir / f"{idx}.parquet")
    return out_dir


def encode_fq_path_to_json(
    fq_path: str | Path, result_path: str | Path | None = None, kmer_size: int = 0, **_kw
) -> Path:
    """Encode one FASTQ to JSON-lines
    (reference: src/fq_encode/json_encoder.rs:36-144)."""
    fq_path = Path(fq_path)
    if result_path is None:
        result_path = fq_path.with_suffix(".json")
    with open(result_path, "w") as fh:
        for row in _record_rows(fq_path, kmer_size=kmer_size):
            fh.write(json.dumps(row) + "\n")
    return Path(result_path)


def write_json(records: list[dict], path: str | Path) -> None:
    """(reference: src/output/json.rs:6-13)"""
    with open(path, "w") as fh:
        for row in records:
            fh.write(json.dumps(row) + "\n")


def write_parquet(records: list[dict], path: str | Path) -> None:
    """(reference: src/output/parquet.rs:11-22)"""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pylist(records, schema=_arrow_schema()), path)


def write_predicts(
    dataset: str | Path,
    output_fq_path: str | Path,
    predicts: list,
    smooth_window_size: int = 1,
    min_interval_size: int = 1,
    approved_interval_number: int = 0,
) -> None:
    """Chop a parquet dataset using externally supplied per-base labels and
    write a bgzf FASTQ (reference: src/python.rs:710-782).

    `predicts[i]` is the per-base 0/1 label vector for row i of the parquet
    dataset ({id, seq, qual} columns); labels are smoothed with
    `smooth_label_region` before splitting. Quals are stored as Phred ints and
    re-offset to ascii (+33) on output.
    """
    import pyarrow.parquet as pq

    from ..ops.labels import smooth_label_region
    from .chop import split_records_by_remove_interval
    from .fastq import write_fq_parallel

    table = pq.read_table(dataset, columns=["id", "seq", "qual"])
    ids = table.column("id").to_pylist()
    seqs = table.column("seq").to_pylist()
    quals = table.column("qual").to_pylist()

    records = []
    for i, (rid, seq, qual) in enumerate(zip(ids, seqs, quals)):
        labels = np.asarray(predicts[i], dtype=np.int8)
        intervals = smooth_label_region(
            labels, smooth_window_size, min_interval_size, approved_interval_number
        )
        qual_bytes = (np.asarray(qual, dtype=np.int64) + default.QUAL_OFFSET).astype(
            np.uint8
        ).tobytes()
        records.extend(
            split_records_by_remove_interval(
                seq, rid, qual_bytes, intervals, default.MIN_CHOPED_SEQ_LEN, id_annotation=False
            )
        )
    write_fq_parallel(records, output_fq_path)


def extract_records_by_ids(fq_path: str | Path, ids: list[str]) -> list:
    """(reference: src/output/extract.rs:9-26)"""
    from .fastq import StreamingFastqReader

    wanted = set(ids)
    return [rec for rec in StreamingFastqReader(fq_path) if rec.name in wanted]


class JsonEncoder:
    """Class-style wrapper (reference: src/fq_encode/json_encoder.rs:36-144)."""

    def __init__(self, option=None):
        self.option = option

    def encode(self, fq_path: str | Path, result_path: str | Path | None = None) -> Path:
        k = getattr(self.option, "kmer_size", 0) if self.option is not None else 0
        return encode_fq_path_to_json(fq_path, result_path, kmer_size=k)


class ParquetEncoder:
    """Class-style wrapper (reference: src/fq_encode/parquet_encoder.rs:41-168)."""

    def __init__(self, option=None):
        self.option = option

    def encode(self, fq_path: str | Path, result_path: str | Path | None = None) -> Path:
        k = getattr(self.option, "kmer_size", 0) if self.option is not None else 0
        return encode_fq_path_to_parquet(fq_path, result_path, kmer_size=k)

    def encode_chunk(self, fq_path: str | Path, chunk_size: int = 1_000_000, parallel: bool = True):
        return encode_fq_path_to_parquet_chunk(fq_path, chunk_size=chunk_size, parallel=parallel)
