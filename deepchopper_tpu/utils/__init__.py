"""Utilities: stats, visualization, logging helpers."""

from .compile_cache import enable_compilation_cache
from .pylogger import RankedLogger, suppress_warnings
from .stat import summary_bam_record_len, summary_fx_record_len, summary_record_len
from .vis import highlight_targets

__all__ = [
    "RankedLogger",
    "enable_compilation_cache",
    "highlight_targets",
    "summary_bam_record_len",
    "summary_fx_record_len",
    "summary_record_len",
    "suppress_warnings",
]
