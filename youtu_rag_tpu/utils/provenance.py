"""Self-describing benchmark reports.

The reference publishes quality tables without machine-checkable
provenance (``/root/reference/README.md:609-882`` — numbers only); the
repo's README tables are rendered from the committed report JSONs, so
each report must record enough to audit drift between regenerations:
the fixture seed, the git commit the run came from, and the run time.

Every scripts/bench_*.py merges ``run_provenance(seed=...)`` into its
report dict before writing it.
"""

from __future__ import annotations

import subprocess
import time
from typing import Any


def git_head(cwd: str | None = None) -> str | None:
    """Current commit hash (None outside a git checkout / without git)."""
    try:
        out = subprocess.run(
            ["git", "rev-parse", "HEAD"],
            capture_output=True, text=True, timeout=10, cwd=cwd,
        )
    except (OSError, subprocess.TimeoutExpired):
        return None
    h = out.stdout.strip()
    return h if out.returncode == 0 and len(h) == 40 else None


def run_provenance(seed: int | None = None, **extra: Any) -> dict[str, Any]:
    """Provenance block for a benchmark report: seed + git hash + UTC time."""
    prov: dict[str, Any] = {
        "git_hash": git_head(),
        "generated_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    if seed is not None:
        prov["fixture_seed"] = seed
    prov.update(extra)
    return {"provenance": prov}
