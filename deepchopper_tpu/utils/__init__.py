"""Utilities: stats, visualization, logging helpers."""

from .stat import summary_bam_record_len, summary_fx_record_len, summary_record_len
from .vis import highlight_targets

__all__ = [
    "highlight_targets",
    "summary_bam_record_len",
    "summary_fx_record_len",
    "summary_record_len",
]
