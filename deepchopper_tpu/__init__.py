"""deepchopper_tpu — a TPU-native chimera-artifact detection framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
ylab-hi/DeepChopper (reference mounted at /root/reference): FASTQ reads are
tokenized with a vectorized uint8 gather on host, bucketed into fixed shapes,
classified per-base by a JAX genomic LM (HyenaDNA-style long-conv backbone +
qual-fusing MLP head) sharded data-parallel over a TPU mesh, then smoothed and
chopped with byte-compatible interval semantics.

The top-level namespace mirrors the reference's PyO3 bridge surface
(reference: src/python.rs:878-958) so reference users can switch directly.
"""

from __future__ import annotations

from . import default, errors, ops
from .chop.pipeline import predict_cli
from .data.assembly import (
    collect_and_split_dataset,
    collect_and_split_dataset_with_natural_terminal_adapters,
    collect_and_split_dataset_with_natural_terminal_adapters_and_both_adapters,
)
from .data.tensor_encoder import (
    FqEncoderOption,
    RecordData,
    TensorEncoder,
    encode_fq_path_to_tensor,
    encode_fq_paths_to_tensor,
)
from .io.parquet import (
    JsonEncoder,
    ParquetEncoder,
    encode_fq_path_to_json,
    encode_fq_path_to_parquet,
    encode_fq_path_to_parquet_chunk,
    encode_fq_paths_to_parquet,
    extract_records_by_ids,
    write_json,
    write_parquet,
)
from .io.bam import BamRecord, BamWriter, left_right_soft_clip, read_bam_records, read_bam_records_parallel
from .io.chop import (
    ChopType,
    FastqRecord,
    generate_unmaped_intervals,
    remove_intervals_and_keep_left,
    split_records_by_intervals,
    split_records_by_remove_interval,
    split_records_by_remove_intervals,
)
from .io.fastq import convert_multiple_fqs_to_one_fq, write_fq, write_fq_parallel
from .io.parquet import write_predicts
from .io.predicts import (
    Predict,
    load_predicts_from_batch_pt,
    load_predicts_from_batch_pts,
)
from .eval.blat import PslAlignment, blat_predictions, parse_psl_by_qname
from .eval.stat import StatResult, collect_statistics_for_predicts
from .utils.stat import summary_bam_record_len, summary_fx_record_len
from .utils.vis import highlight_targets
from .ops import (
    ascii_list2str,
    encode_qual,
    encode_qual_kmer,
    generate_kmers,
    generate_kmers_table,
    get_label_region,
    id_list2seq,
    kmerids_to_seq,
    kmers_to_seq,
    majority_voting,
    normalize_seq,
    parse_target_from_id,
    reverse_complement,
    seq_to_kmers,
    seq_to_kmers_and_offset,
    smooth_label_region,
    splite_qual_by_offsets,
    summary_predict,
    to_kmer_target_region,
    to_original_target_region,
    to_original_targtet_region,
    vectorize_target,
    vectorize_targets,
)

__version__ = "0.1.0"

__all__ = [
    "BamRecord",
    "BamWriter",
    "blat_predictions",
    "left_right_soft_clip",
    "read_bam_records",
    "read_bam_records_parallel",
    "ChopType",
    "FastqRecord",
    "Predict",
    "PslAlignment",
    "StatResult",
    "collect_and_split_dataset",
    "collect_and_split_dataset_with_natural_terminal_adapters",
    "collect_and_split_dataset_with_natural_terminal_adapters_and_both_adapters",
    "collect_statistics_for_predicts",
    "convert_multiple_fqs_to_one_fq",
    "highlight_targets",
    "load_predicts_from_batch_pt",
    "load_predicts_from_batch_pts",
    "parse_psl_by_qname",
    "predict_cli",
    "split_records_by_remove_interval",
    "summary_bam_record_len",
    "summary_fx_record_len",
    "write_fq",
    "write_fq_parallel",
    "write_predicts",
    "FqEncoderOption",
    "JsonEncoder",
    "ParquetEncoder",
    "RecordData",
    "TensorEncoder",
    "ascii_list2str",
    "default",
    "encode_fq_path_to_json",
    "encode_fq_path_to_parquet",
    "encode_fq_path_to_parquet_chunk",
    "encode_fq_path_to_tensor",
    "encode_fq_paths_to_parquet",
    "encode_fq_paths_to_tensor",
    "extract_records_by_ids",
    "write_json",
    "write_parquet",
    "encode_qual",
    "encode_qual_kmer",
    "errors",
    "generate_kmers",
    "generate_kmers_table",
    "generate_unmaped_intervals",
    "get_label_region",
    "id_list2seq",
    "kmerids_to_seq",
    "kmers_to_seq",
    "majority_voting",
    "normalize_seq",
    "ops",
    "parse_target_from_id",
    "remove_intervals_and_keep_left",
    "reverse_complement",
    "seq_to_kmers",
    "seq_to_kmers_and_offset",
    "smooth_label_region",
    "split_records_by_intervals",
    "split_records_by_remove_intervals",
    "splite_qual_by_offsets",
    "summary_predict",
    "to_kmer_target_region",
    "to_original_target_region",
    "to_original_targtet_region",
    "vectorize_target",
    "vectorize_targets",
]
