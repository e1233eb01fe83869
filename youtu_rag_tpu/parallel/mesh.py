"""Device-mesh helpers.

The reference's only 'distribution' is HTTP fan-out (SURVEY.md §5.8); here
multi-chip scale is a first-class ``jax.sharding.Mesh``. One helper builds
meshes for both the retrieval engine (1-D ``db`` axis: index rows sharded
across chips, queries replicated, per-shard top-k merged over ICI) and
training (``dp`` × ``tp``)."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def local_device_count() -> int:
    return jax.local_device_count()


def get_mesh(axes: dict[str, int] | None = None, devices=None) -> Mesh:
    """Build a mesh from an axis-name → size dict.

    ``None`` → 1-D ``{"db": all local devices}``. One axis may be -1
    (inferred). Axis order follows dict order; the innermost axis maps to
    neighboring devices (ICI-adjacent on real slices)."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if axes is None:
        axes = {"db": n}
    names = list(axes.keys())
    sizes = list(axes.values())
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = n // known
    total = int(np.prod(sizes))
    assert total <= n, f"mesh {axes} needs {total} devices, have {n}"
    arr = np.asarray(devices[:total]).reshape(sizes)
    return Mesh(arr, tuple(names))
