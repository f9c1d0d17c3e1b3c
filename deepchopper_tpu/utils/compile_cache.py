"""Persistent XLA compilation cache.

The flagship predict path compiles one executable per bucket shape; on a
tunneled TPU that warmup costs minutes per process. Enabling JAX's persistent
compilation cache makes it a once-per-machine cost: later processes load the
serialized executables from disk instead of recompiling.

(Reference has no equivalent — torch eager pays no compile; this is the
TPU-native answer to keeping cold-start competitive.)
"""

from __future__ import annotations

import logging
import os
from pathlib import Path

log = logging.getLogger(__name__)

_ENABLED = False


def enable_compilation_cache(cache_dir: str | Path | None = None) -> Path | None:
    """Idempotently enable the persistent JAX compilation cache.

    Directory resolution order: explicit arg, `DEEPCHOPPER_COMPILE_CACHE` env,
    `JAX_COMPILATION_CACHE_DIR` env (left to JAX itself), else
    `~/.cache/deepchopper_tpu/xla`. Set `DEEPCHOPPER_COMPILE_CACHE=0` to
    disable. Returns the directory in use, or None when disabled/unavailable.
    """
    global _ENABLED
    env = os.environ.get("DEEPCHOPPER_COMPILE_CACHE")
    if env == "0":
        return None
    if _ENABLED:
        import jax

        return Path(jax.config.jax_compilation_cache_dir)
    if cache_dir is None:
        cache_dir = env or os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if cache_dir is None:
        cache_dir = Path.home() / ".cache" / "deepchopper_tpu" / "xla"
    cache_dir = Path(cache_dir)
    try:
        import jax

        # TPU executables are what cost minutes to build; CPU AOT cache
        # entries are fragile across detected-host-feature drift (XLA warns
        # about possible SIGILL), so only persist for TPU backends.
        if jax.default_backend() not in ("tpu", "axon"):
            return None

        cache_dir.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        # Cache every executable, however quick the compile: the per-bucket
        # predict steps are numerous and the one-time disk cost is tiny.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _ENABLED = True
        log.info("persistent XLA compilation cache at %s", cache_dir)
        return cache_dir
    except Exception as exc:  # pragma: no cover - depends on jax version/fs
        log.warning("could not enable persistent compilation cache: %s", exc)
        return None
