"""Device-mesh helpers: single-host ICI meshes and multi-host DCN×ICI.

The reference's only 'distribution' is HTTP fan-out (SURVEY.md §5.8); here
multi-chip scale is a first-class ``jax.sharding.Mesh``. One helper builds
meshes for both the retrieval engine (1-D ``db`` axis: index rows sharded
across chips, queries replicated, per-shard top-k merged over ICI) and
training (``dp`` × ``tp``); ``get_hybrid_mesh`` adds the multi-slice /
multi-host layer where the outer axes ride DCN and inner axes ride ICI.

Multi-host launch recipe (one process per host/slice):

    # on every host, same program:
    JAX_COORDINATOR_ADDRESS=host0:1234 JAX_NUM_PROCESSES=2 JAX_PROCESS_ID=<i> \
        python train.py
    # in the program:
    from youtu_rag_tpu.parallel.mesh import init_distributed, get_hybrid_mesh
    init_distributed()                       # no-op when single-process
    mesh = get_hybrid_mesh({"ici": -1}, {"dcn": -1})   # dcn = processes

CPU testing: each process sets ``JAX_PLATFORMS=cpu`` +
``XLA_FLAGS=--xla_force_host_platform_device_count=K``; collectives cross
processes over Gloo (tests/parallel/test_multihost.py spawns 2×4)."""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh


def local_device_count() -> int:
    return jax.local_device_count()


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    **kwargs,
) -> bool:
    """Initialize the multi-process JAX runtime (jax.distributed).

    Arguments fall back to ``JAX_COORDINATOR_ADDRESS`` /
    ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID`` env vars (the launch recipe
    above). Returns True when distributed mode is active; a single-process
    configuration is a no-op returning False. Safe to call twice."""
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if process_id is None:
        process_id = int(os.environ.get("JAX_PROCESS_ID", "0"))
    if num_processes <= 1 or not coordinator_address:
        return False
    # already-initialized check must not touch the backend (jax.process_
    # count() would initialize XLA before jax.distributed.initialize)
    from jax._src import distributed as _dist

    if getattr(_dist.global_state, "client", None) is not None:
        return True
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )
    return True


def is_multi_process(devices=None) -> bool:
    devices = devices if devices is not None else jax.devices()
    return len({d.process_index for d in devices}) > 1


def get_hybrid_mesh(
    ici_axes: dict[str, int], dcn_axes: dict[str, int], devices=None
) -> Mesh:
    """DCN×ICI mesh: ``dcn_axes`` (outer, slowest-varying) split across
    processes/slices so their collectives ride the data-center network;
    ``ici_axes`` (inner) split within a process/slice so theirs ride ICI.

    ``-1`` infers: dcn against the process count, ici against the local
    device count. Single-process (tests, the driver dryrun) emulates the
    same topology by reshaping local devices — identical program, the
    collective just has no DCN hop to cross."""
    devices = list(devices) if devices is not None else jax.devices()
    procs = sorted({d.process_index for d in devices})
    per_proc = {p: sorted((d for d in devices if d.process_index == p), key=lambda d: d.id) for p in procs}
    n_proc = len(procs)
    n_local = len(per_proc[procs[0]])

    dcn_names, dcn_sizes = list(dcn_axes.keys()), list(dcn_axes.values())
    ici_names, ici_sizes = list(ici_axes.keys()), list(ici_axes.values())
    if -1 in dcn_sizes:
        known = int(np.prod([s for s in dcn_sizes if s != -1]))
        dcn_sizes[dcn_sizes.index(-1)] = n_proc // known
    if -1 in ici_sizes:
        known = int(np.prod([s for s in ici_sizes if s != -1]))
        ici_sizes[ici_sizes.index(-1)] = (len(devices) // int(np.prod(dcn_sizes))) // known

    n_dcn = int(np.prod(dcn_sizes))
    n_ici = int(np.prod(ici_sizes))
    if n_proc > 1:
        assert n_dcn == n_proc, (
            f"dcn axes {dcn_axes} must span the {n_proc} processes exactly "
            f"(got {n_dcn}) — ICI axes cannot cross a process boundary"
        )
        assert n_ici <= n_local, (ici_axes, n_local)
        ordered = np.concatenate([np.asarray(per_proc[p][:n_ici]) for p in procs])
    else:
        assert n_dcn * n_ici <= len(devices), (dcn_axes, ici_axes, len(devices))
        ordered = np.asarray(devices[: n_dcn * n_ici])
    arr = ordered.reshape(dcn_sizes + ici_sizes)
    return Mesh(arr, tuple(dcn_names + ici_names))


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
