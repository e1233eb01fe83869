"""Device-level profiling helpers (the low-level profiler SURVEY.md §5.1
notes the reference lacks): wraps ``jax.profiler`` traces around retrieval
or build spans so kernel timelines land in TensorBoard-readable dirs."""

from __future__ import annotations

import contextlib
import os
import time
from pathlib import Path

from ..utils.log import get_logger

logger = get_logger("tracing.profiler")


def profile_dir() -> Path:
    d = Path(os.environ.get("YRT_PROFILE_DIR", "/tmp/yrt-profiles"))
    d.mkdir(parents=True, exist_ok=True)
    return d


@contextlib.contextmanager
def device_trace(name: str = "trace", enabled: bool | None = None):
    """Capture a jax.profiler trace for the enclosed block.

        with device_trace("kb-search"):
            store.search_batch(...)

    Enabled when YRT_PROFILE=1 (or enabled=True); otherwise a no-op so the
    hook can stay in hot paths."""
    if enabled is None:
        enabled = bool(os.environ.get("YRT_PROFILE"))
    if not enabled:
        yield None
        return
    import jax

    out = profile_dir() / f"{name}-{int(time.time())}"
    logger.info("capturing device trace -> %s", out)
    with jax.profiler.trace(str(out)):
        yield out


@contextlib.contextmanager
def annotate(label: str):
    """Named sub-span inside a device trace (TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(label):
        yield
