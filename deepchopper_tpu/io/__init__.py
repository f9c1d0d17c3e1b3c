"""Host IO plane: FASTQ streaming, chop kernel, prediction shards."""

from .chop import (
    ChopType,
    FastqRecord,
    generate_unmaped_intervals,
    remove_intervals_and_keep_left,
    split_records_by_intervals,
    split_records_by_remove_intervals,
)

__all__ = [
    "ChopType",
    "FastqRecord",
    "generate_unmaped_intervals",
    "remove_intervals_and_keep_left",
    "split_records_by_intervals",
    "split_records_by_remove_intervals",
]
