"""Outage-proof JAX backend resolution for benchmark entry points.

The environment imports jax at interpreter startup with the ``axon`` remote
TPU platform. When the axon tunnel is down, the *first* device use raises
``RuntimeError: Unable to initialize backend 'axon': UNAVAILABLE`` — or, worse,
blocks for minutes inside the PJRT C API where Python signal handlers cannot
run. Round 3 lost its whole perf record to exactly that (BENCH_r03 rc=1).

``resolve_backend()`` makes device init safe for scripts that must always
emit a parseable result line:

1. If ``JAX_PLATFORMS`` already pins ``cpu``, return immediately.
2. Probe the default backend in a **subprocess** with a hard timeout —
   a wedged tunnel cannot hang the parent because the probe is killable.
3. On probe success, initialize in-process (fast: the probe warmed the
   server side) and report the real platform.
4. On probe failure/timeout, flip the running process to the CPU backend
   *before* its first device use (``jax.config.update('jax_platforms',
   'cpu')`` — legal while no backend is initialized) and report
   ``"unavailable-fallback-cpu"`` so downstream JSON marks the degradation
   instead of crashing.

Behavior parity note: the reference handles flaky remote dependencies with
HTTP retries (utu/rag/utils/http_retry.py:16-103) and construction-time
health probes (utu/rag/embeddings/service_embedder.py:44-62); this is the
equivalent guard for our remote *accelerator* dependency.
"""

from __future__ import annotations

import os
import subprocess
import sys

FALLBACK_LABEL = "unavailable-fallback-cpu"

_PROBE_SRC = "import jax; print('PLATFORM=' + jax.devices()[0].platform)"


def probe_default_backend(timeout_s: float = 150.0) -> str | None:
    """Probe the default JAX backend in a killable subprocess.

    Returns the platform string (e.g. ``"tpu"``, ``"cpu"``) or ``None`` if
    the backend failed to initialize or the probe timed out.
    """
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # probe whatever the site hook registers
    try:
        r = subprocess.run(
            [sys.executable, "-c", _PROBE_SRC],
            capture_output=True,
            text=True,
            timeout=timeout_s,
            env=env,
        )
    except (subprocess.TimeoutExpired, OSError):
        return None
    if r.returncode != 0:
        return None
    for line in reversed(r.stdout.strip().splitlines()):
        if line.startswith("PLATFORM="):
            return line.split("=", 1)[1].strip() or None
    return None


def resolve_backend(timeout_s: float = 150.0) -> str:
    """Return a platform label, guaranteeing the caller can use jax.devices().

    Either the default backend is healthy (label = its platform name) or the
    process is switched to CPU and the label is ``"unavailable-fallback-cpu"``.
    Call this *before* the first in-process device use.
    """
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        return "cpu"
    platform = probe_default_backend(timeout_s)
    if platform is not None:
        return platform
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:  # noqa: BLE001 — backend already initialized somehow
        pass
    return FALLBACK_LABEL
