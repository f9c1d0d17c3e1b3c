"""Sweep closure for the reference's inline `#[cfg(test)]` vectors.

Every `#[test]` in the reference Rust core either has a named port in this
repo's suite or a one-line N/A reason. The table below is the authoritative
mapping (file:test -> port); the tests in THIS file port the vectors that
had no counterpart before round 4.

src/kmer.rs: test_seq_to_kmers, test_generate_kmers(_table)(_empty_base),
  test_construct_seq_from_kmers, test_seq_to_kmers_and_offset_{overlap,
  non_overlap}, test_update_target_region(_valid/_invalid_*),
  test_to_original_target_region, test_vectorize_target(s)_{valid,invalid}
  -> tests/test_ops_sequence_qual_kmer.py (vectors ported verbatim).
src/fq_encode/triat.rs: test_parse_target_from_id(_failing_case)
  -> tests/test_ops_labels.py.  test_encode_qual -> same file.
src/fq_encode/tensor_encoder.rs: test_encode_fq* family (shape/label
  assertions on the 25-record fixture incl. (25,2,4741))
  -> tests/test_tensor_encoder.py.
src/fq_encode/parquet_encoder.rs + json_encoder.rs: test_encode_fq_for_
  {parquet,json...} -> tests/test_parquet_json.py.
src/smooth/utils.rs: test_majority_voting{,2,_empty_labels,_small_window}
  -> tests/test_ops_labels.py.  test_id2seq / test_id_list2seq_i64 /
  test_id_list2seq(_i64)_with_unknown_tokens -> THIS FILE.
src/smooth/predict.rs: test_load_predict, test_predicts (12-predict .pt
  fixture) -> tests/test_io_fastq_predicts.py (torch-gated).
src/output/split.rs: test_generate_unmaped_intervals,
  test_remove_intervals_and_keep_left -> tests/test_chop_kernel.py.
src/output/writefq.rs: test_write_fq_with_file_path, test_write_fq_parallel,
  test_streaming_fastq_reader -> tests/test_io_fastq_predicts.py.
src/output/bam.rs: test_read_bam(_parallel), test_cigar_soft_clip
  -> tests/test_bam_stream.py.
src/utils.rs: test_get_label_region_{empty,no_label,single_label,
  multiple_labels,label_at_end}, test_summary_predict
  -> tests/test_ops_labels.py.  test_collect_and_split_dataset -> THIS FILE.
src/stat.rs: test_summary_bam_record_len -> THIS FILE.
src/vis.rs: test_highlight -> THIS FILE.
src/tokenizer.rs: test_tokenizer, test_pre — N/A: the module is disabled in
  the reference itself (src/lib.rs:7 commented out); the k-mer capability
  lives in ops/kmer.py.
src/python.rs: test_log — N/A: pyo3-log bridge has no equivalent in a pure
  Python package; rank-aware logging is covered by
  tests/test_loggers_debug.py::test_ranked_logger_and_suppress.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pytest

REF_DATA = Path("/root/reference/tests/data")


def test_id2seq_vectors():
    """reference: src/smooth/utils.rs:140-158 (test_id2seq,
    test_id_list2seq_i64, and the *_with_unknown_tokens pair)."""
    from deepchopper_tpu.ops.sequence import detokenize_bases, id_list2seq

    assert id_list2seq([7, 8, 9, 10, 11]) == "ACGTN"
    assert detokenize_bases(np.asarray([7, 8, 9, 10, 11], np.int64)) == "ACGTN"
    # Special token IDs (0-6) map to 'N' instead of erroring — both the u8
    # and i64 entry points.
    assert id_list2seq([0, 1, 6, 7, 8, 9, 10, 11]) == "NNNACGTN"
    assert (
        detokenize_bases(np.asarray([0, 1, 6, 7, 8, 9, 10, 11], np.uint8)) == "NNNACGTN"
    )


def test_highlight_targets_vector():
    """reference: src/vis.rs test_highlight — same sequence and intervals;
    asserts the highlighted spans land on the right bases (the reference
    test only smoke-prints)."""
    from deepchopper_tpu.utils.vis import highlight_targets

    seq = "ATGCACTGACTGACATGCACTGACTGAC"
    out = highlight_targets(seq, [(0, 3), (10, 13)])
    assert "\x1b[31mATG\x1b[0m" in out
    assert "\x1b[31mTGA\x1b[0m" in out  # seq[10:13]
    # Stripped of ANSI codes the sequence is unchanged.
    assert out.replace("\x1b[31m", "").replace("\x1b[0m", "") == seq
    plain = highlight_targets(seq, [(0, 3), (10, 13)], color=False)
    assert plain == "[ATG]CACTGAC[TGA]CATGCACTGACTGAC"


@pytest.mark.skipif(not (REF_DATA / "reads.bam").exists(), reason="needs reference fixture")
def test_summary_bam_record_len_vector():
    """reference: src/stat.rs test_summary_bam_record_len — same fixture,
    same expected lengths."""
    from deepchopper_tpu.utils.stat import summary_bam_record_len

    result = sorted(summary_bam_record_len(REF_DATA / "reads.bam"))
    assert result == sorted([3863, 4041, 3739, 4041, 3863, 3739])


@pytest.mark.skipif(
    not (REF_DATA / "250_internal.fq").exists(), reason="needs reference fixture"
)
def test_collect_and_split_dataset_vector(tmp_path):
    """reference: src/utils.rs test_collect_and_split_dataset — same fixture
    (one file serving all three pools), same ratios; additionally asserts
    the split sizes the reference only implies (100 reads * 0.8/0.1/0.1
    with positive_ratio 0.9, internal_adapter_ratio 0.5)."""
    from deepchopper_tpu.data.assembly import collect_and_split_dataset

    fq = REF_DATA / "250_internal.fq"
    train, val, test = collect_and_split_dataset(
        fq, fq, fq, 100.0, 0.8, 0.1, 0.1, 0.5, 0.9, output_dir=tmp_path
    )
    for p in (train, val, test):
        assert p.exists()

    def count(p):
        # records, not '@'-prefixed lines: quality strings may start with '@'
        lines = sum(1 for _ in open(p, "rb"))
        assert lines % 4 == 0, p
        return lines // 4

    # The reference test only asserts success; additionally pin the split
    # sizes to the ratio formula within int-truncation slack (each of the
    # three pools truncates independently: up to 3 reads below the ideal).
    for path, ratio in ((train, 0.8), (val, 0.1), (test, 0.1)):
        ideal = 100.0 * ratio  # positive+negative pools sum to the full ratio
        got = count(path)
        assert ideal - 3 <= got <= ideal, (path, got, ideal)
