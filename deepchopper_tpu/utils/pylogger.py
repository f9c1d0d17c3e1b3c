"""Rank-aware logging + curated third-party warning suppression.

Equivalents of the reference's RankedLogger
(reference: deepchopper/utils/pylogger.py:12-57) and the curated
warning filter list (reference: deepchopper/utils/suppress_warnings.py:44-97).
"""

from __future__ import annotations

import logging
import warnings


class RankedLogger(logging.LoggerAdapter):
    """Prefixes messages with the JAX process index; `rank_zero_only=True`
    drops messages on non-zero ranks (multi-host runs log once)."""

    def __init__(self, name: str = __name__, rank_zero_only: bool = False):
        super().__init__(logging.getLogger(name), {})
        self.rank_zero_only = rank_zero_only

    @staticmethod
    def _rank() -> int:
        try:
            import jax

            return jax.process_index()
        except Exception:  # pragma: no cover - pre-init
            return 0

    def log(self, level: int, msg, *args, **kwargs) -> None:
        if not self.isEnabledFor(level):
            return
        rank = self._rank()
        if self.rank_zero_only and rank != 0:
            return
        super().log(level, f"[rank {rank}] {msg}", *args, **kwargs)


_SUPPRESSED: list[tuple[type[Warning], str]] = [
    # Noise sources curated like the reference's list (theirs targets torch/
    # lightning; ours targets the JAX stack).
    (UserWarning, r".*experimental.*"),
    (DeprecationWarning, r".*jax\..*"),
    (FutureWarning, r".*treescope.*"),
    (UserWarning, r".*TPU.*in use.*"),
]


_SAVED_FILTERS: list | None = None
_SAVED_XLA_BRIDGE_LEVEL: int | None = None


def suppress_warnings(verbose: bool = False) -> None:
    """Install the curated warning filters; `verbose=True` removes them again
    (reference contract: deepchopper/cli.py:92-94 --verbose).

    Only OUR filters are added/removed — never `warnings.resetwarnings()`,
    which would wipe the user's -W/PYTHONWARNINGS configuration too. The
    jax xla_bridge logger level is saved and restored the same way so a
    later verbose=True call gets backend messages back in-process.
    """
    global _SAVED_FILTERS, _SAVED_XLA_BRIDGE_LEVEL
    bridge_logger = logging.getLogger("jax._src.xla_bridge")
    if verbose:
        if _SAVED_FILTERS is not None:
            warnings.filters[:] = _SAVED_FILTERS
            _SAVED_FILTERS = None
        if _SAVED_XLA_BRIDGE_LEVEL is not None:
            bridge_logger.setLevel(_SAVED_XLA_BRIDGE_LEVEL)
            _SAVED_XLA_BRIDGE_LEVEL = None
        return
    if _SAVED_FILTERS is None:
        _SAVED_FILTERS = list(warnings.filters)
    if _SAVED_XLA_BRIDGE_LEVEL is None:
        _SAVED_XLA_BRIDGE_LEVEL = bridge_logger.level
    for category, pattern in _SUPPRESSED:
        warnings.filterwarnings("ignore", message=pattern, category=category)
    bridge_logger.setLevel(logging.ERROR)
