"""Persistent XLA compilation cache.

First-query latency is compile-bound (tens of seconds on a cold TPU
runtime; minutes through a remote-compile tunnel). Enabling JAX's
persistent compilation cache makes every executable survive process
restarts, so serving restarts and repeated CLI runs skip compilation.
Opt-out with YRT_NO_COMPILE_CACHE=1; relocate with YRT_COMPILE_CACHE_DIR."""

from __future__ import annotations

import os

from .log import get_logger

logger = get_logger("utils.jax_cache")

_ENABLED = False


def enable_compile_cache() -> None:
    """Idempotent; call before the first jit compilation."""
    global _ENABLED
    if _ENABLED or os.environ.get("YRT_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        cache_dir = os.environ.get(
            "YRT_COMPILE_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "youtu_rag_tpu", "jax"),
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        _ENABLED = True
        logger.debug("persistent compile cache at %s", cache_dir)
    except Exception:  # noqa: BLE001 - cache is an optimization only
        logger.exception("could not enable persistent compile cache")
