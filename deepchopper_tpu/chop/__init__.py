"""Streaming chop stage (native equivalent of the deepchopper-chop binary)."""

from .pipeline import ChopOptions, ChopStats, process_chunk, run_chop

__all__ = ["ChopOptions", "ChopStats", "process_chunk", "run_chop"]
