"""Multi-chip sharded vector index.

The design SURVEY.md §5.8 calls for: index rows sharded over a 1-D ``db``
mesh axis (``NamedSharding``), queries replicated, each chip runs the fused
masked top-k on its local shard, then per-shard (score, global-id)
candidates merge via ``all_gather`` over ICI — identical code on 1 chip,
v5e-8, or a pod slice; multi-slice runs the same collective over DCN.

Implementation: ``ShardedVectorIndex`` subclasses ``DeviceVectorIndex`` —
all host bookkeeping, filter compilation, append/tombstone logic is shared;
only array placement (NamedSharding) and the search dispatch (shard_map)
differ. Appends use the same dynamic_update_slice kernel; XLA routes the
update to the owning shard."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

shard_map = jax.shard_map

from ..core.config import IndexConfig
from ..index.device_index import DeviceVectorIndex, _pow2_at_least
from ..ops.topk import (
    pallas_topk,
    pallas_topk_int8,
    xla_topk,
    xla_topk_int8,
)


def make_sharded_topk(mesh: Mesh, axis: str = "db"):
    """Build the jitted sharded search: per-shard top-k + all-gather merge.

    ``scales=None`` → bf16/f32 storage; with scales the per-shard kernel is
    the int8 path (scales shard with the rows)."""

    def _merge(q, s, i, local_rows, k):
        shard = jax.lax.axis_index(axis)
        gi = i + shard * local_rows  # local → global row ids
        # merge candidates over ICI: [S, q, k] each, tiny payload
        s_all = jax.lax.all_gather(s, axis)
        i_all = jax.lax.all_gather(gi, axis)
        n_sh = s_all.shape[0]
        qn = q.shape[0]
        cand_s = jnp.transpose(s_all, (1, 0, 2)).reshape(qn, n_sh * k)
        cand_i = jnp.transpose(i_all, (1, 0, 2)).reshape(qn, n_sh * k)
        ts, pos = jax.lax.top_k(cand_s, k)
        ti = jnp.take_along_axis(cand_i, pos, axis=1)
        return ts, ti

    @functools.partial(jax.jit, static_argnames=("k", "backend", "block_rows"))
    def search(queries, vectors, bias, k: int, backend: str = "xla", block_rows: int = 1024):
        def per_shard(q, x, b):
            # x: [N/S, d] local shard; b: [N/S]
            if backend == "pallas":
                s, i = pallas_topk(q, x, b, k, block_rows=block_rows)
            elif backend == "pallas_interpret":
                s, i = pallas_topk(q, x, b, k, block_rows=block_rows, interpret=True)
            else:
                s, i = xla_topk(q, x, b, k)
            return _merge(q, s, i, x.shape[0], k)

        return shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(P(), P(axis, None), P(axis)),
            out_specs=(P(), P()),
            check_vma=False,  # all_gather makes outputs replicated
        )(queries, vectors, bias)

    @functools.partial(jax.jit, static_argnames=("k", "backend", "block_rows"))
    def search_int8(
        queries, vectors, scales, bias, k: int, backend: str = "xla", block_rows: int = 1024
    ):
        def per_shard(q, x, sc, b):
            if backend == "pallas":
                s, i = pallas_topk_int8(q, x, sc, b, k, block_rows=block_rows)
            elif backend == "pallas_interpret":
                s, i = pallas_topk_int8(q, x, sc, b, k, block_rows=block_rows, interpret=True)
            else:
                s, i = xla_topk_int8(q, x, sc, b, k)
            return _merge(q, s, i, x.shape[0], k)

        return shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(P(), P(axis, None), P(axis), P(axis)),
            out_specs=(P(), P()),
            check_vma=False,
        )(queries, vectors, scales, bias)

    search.int8 = search_int8
    return search


class ShardedVectorIndex(DeviceVectorIndex):
    """DeviceVectorIndex with rows sharded over a mesh ``db`` axis."""

    def __init__(self, dim: int, config: IndexConfig | None = None, mesh: Mesh | None = None, axis: str = "db"):
        from .mesh import get_mesh

        self.mesh = mesh or get_mesh({axis: -1})
        self.axis = axis
        self.n_shards = self.mesh.shape[axis]
        cfg = config or IndexConfig()
        # capacity must split evenly into shards of whole blocks
        cfg = cfg.model_copy(
            update={"min_capacity": _pow2_at_least(cfg.min_capacity, cfg.block_rows * self.n_shards)}
        )
        self._row_sharding = NamedSharding(self.mesh, P(axis, None))
        self._vec_sharding = NamedSharding(self.mesh, P(axis))
        self._sharded_topk = make_sharded_topk(self.mesh, axis)
        super().__init__(dim, cfg, device=None)

    # placement: shard 2-D arrays on rows, 1-D bias on its only axis
    def _put(self, x):
        sh = self._row_sharding if getattr(x, "ndim", 1) >= 2 else self._vec_sharding
        return jax.device_put(x, sh)

    def _backend(self, backend: str) -> str:
        if backend != "auto":
            return backend
        on_tpu = self.mesh.devices.flat[0].platform == "tpu"
        local_rows = self.capacity // self.n_shards
        if on_tpu and local_rows >= 8 * self.config.block_rows:
            return "pallas"
        return "xla"

    def build_ivf(self, n_lists: int | None = None, seed: int = 0) -> None:
        raise NotImplementedError(
            "per-shard IVF over the db mesh axis lands in a later round "
            "(ROADMAP); sharded indexes currently use the brute-force "
            "fused kernel per shard"
        )

    def _run_search(self, queries, vectors, bias, k, backend):
        if self._int8:
            return self._sharded_topk.int8(
                queries, vectors, self._scales, bias, k, backend, self.config.block_rows
            )
        return self._sharded_topk(queries, vectors, bias, k, backend, self.config.block_rows)
