"""IVF state for DeviceVectorIndex: build (cluster-sort) + probe planning.

Flow (all device-side, jit-compiled; see ops/ivf.py for the kernel):
- ``build_ivf``: spherical k-means on (a sample of) the live vectors,
  full assignment, stable argsort → ``index.reorder`` so clusters are
  contiguous; cluster→block ranges recorded; rows appended *after* the
  freeze live in tail blocks that every search probes (classic
  fresh-tail ANN mutation model — deletes are tombstone bias as usual);
- ``probe``: queries × centroids (tiny MXU matmul) → top-``n_probe``
  clusters per query → union block mask → padded block-id list for the
  scalar-prefetch kernel. The block list is a pow2-bucketed static size so
  jit specializations stay bounded."""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.kmeans import kmeans_assign, kmeans_fit
from ..utils.log import get_logger

logger = get_logger("index.ivf")


@dataclass
class IVFState:
    centroids: jax.Array  # [C, d] f32, unit norm
    cluster_block_start: jax.Array  # [C] int32 — first block of cluster
    cluster_block_count: jax.Array  # [C] int32 — blocks spanned
    max_cluster_blocks: int  # static bound on blocks per cluster
    frozen_blocks: int  # blocks covered by the freeze (tail = beyond)
    n_lists: int
    n_probe: int


def fit_sample_indices(n: int, seed: int, cap: int = 131072) -> np.ndarray | None:
    """Row sample for the k-means fit (None → fit on everything).

    Deterministic per seed — multi-process builds rely on every process
    drawing the same sample (SPMD)."""
    if n <= cap:
        return None
    sel = np.random.default_rng(seed).choice(n, cap, replace=False)
    return np.sort(sel).astype(np.int32)


def fit_and_assign(index, n_lists: int, seed: int, fit_sample: int = 131072):
    """k-means fit + full assignment with bounded device memory.

    Dequantization happens CHUNKED — a full f32 view is 4x the int8
    bytes and OOMs one chip past ~4M rows at d=768 — and the assignment
    gathers pad to pow2 buckets so repeated builds keep bounded jit
    specializations. Shared by the single-device and (single-process)
    sharded builders. Returns (centroids [C, d], assign np[int32, size])."""
    n = index.size
    sel = fit_sample_indices(n, seed, fit_sample)
    fit_on = index.dequantize_take(sel if sel is not None else np.arange(n, dtype=np.int32))
    centroids = kmeans_fit(fit_on, n_lists, iters=index.config.kmeans_iters, seed=seed)

    chunk = 1 << 20
    assigns = []
    for i in range(0, n, chunk):
        rows = np.arange(i, min(i + chunk, n), dtype=np.int64)
        part, n_valid = index.dequantize_take_padded(rows)
        assigns.append(np.asarray(kmeans_assign(part, centroids))[:n_valid])
    return centroids, np.concatenate(assigns)


def build_ivf_state(index, n_lists: int | None = None, seed: int = 0, fit_sample: int = 131072) -> IVFState:
    """Cluster, reorder the index in place, and return probe metadata."""
    cfg = index.config
    n_lists = n_lists or min(cfg.n_lists, max(index.size // 64, 1))
    block_rows = cfg.block_rows

    n = index.size
    assert n > 0, "cannot build IVF over an empty index"
    centroids, assign = fit_and_assign(index, n_lists, seed, fit_sample)

    perm = np.argsort(assign, kind="stable")
    index.reorder(perm)

    counts = np.bincount(assign, minlength=n_lists)
    row_start = np.concatenate([[0], np.cumsum(counts)])
    block_start = (row_start[:-1] // block_rows).astype(np.int32)
    block_end = np.ceil(row_start[1:] / block_rows).astype(np.int32)
    block_count = np.maximum(block_end - block_start, 0).astype(np.int32)
    block_count = np.where(counts > 0, block_count, 0).astype(np.int32)
    max_cb = int(block_count.max()) if len(block_count) else 1

    state = IVFState(
        centroids=centroids,
        cluster_block_start=jnp.asarray(block_start),
        cluster_block_count=jnp.asarray(block_count),
        max_cluster_blocks=max(max_cb, 1),
        frozen_blocks=-(-n // block_rows),
        n_lists=n_lists,
        n_probe=min(cfg.n_probe, n_lists),
        )
    logger.info(
        "IVF built: %d lists over %d rows (max %d blocks/cluster)", n_lists, n, max_cb
    )
    return state


def _pow2_at_least(x: int, floor: int = 8) -> int:
    c = floor
    while c < x:
        c *= 2
    return c


def plan_max_blocks(state: IVFState, qn: int, total_blocks: int) -> int:
    """Static bound for the probed-block list (pow2-bucketed)."""
    tail = total_blocks - state.frozen_blocks
    est = qn * state.n_probe * state.max_cluster_blocks + tail + 4
    return min(_pow2_at_least(est), max(total_blocks, 1))


@functools.partial(jax.jit, static_argnames=("n_probe", "max_cluster_blocks", "total_blocks", "max_blocks"))
def probe_blocks(
    queries,
    centroids,
    cluster_block_start,
    cluster_block_count,
    *,
    n_probe: int,
    max_cluster_blocks: int,
    total_blocks: int,
    frozen_blocks,  # traced scalar: per-shard values differ under shard_map
    max_blocks: int,
    adaptive_margin=None,  # traced f32 scalar; None/inf = fixed n_probe
    min_probe=None,  # traced i32 scalar; floor on kept clusters per query
):
    """Union of probed clusters' blocks (+ always the tail) → padded ids.

    Adaptive nprobe: when ``adaptive_margin`` is given, a query keeps only
    the clusters whose centroid score is within the margin of its best
    (never fewer than ``min_probe``). Shapes stay static — dropped
    clusters just contribute zero blocks, shrinking ``n_valid`` and with
    it the DMA kernel's trip count (ops/ivf.py loops n_valid, not
    max_blocks). FAISS/ScaNN expose this as per-query nprobe auto-tuning;
    here it falls out of the mask-and-union plan.

    Returns (block_ids [max_blocks] i32, n_valid [] i32)."""
    sims = queries.astype(jnp.float32) @ centroids.T  # [q, C]
    top_sims, top_c = jax.lax.top_k(sims, n_probe)  # [q, p]
    sel = top_c.reshape(-1)  # [q*p]

    starts = jnp.take(cluster_block_start, sel)  # [qp]
    counts = jnp.take(cluster_block_count, sel)  # [qp]
    if adaptive_margin is not None:
        floor = jnp.int32(1) if min_probe is None else min_probe
        rank = jnp.arange(n_probe)[None, :]  # [1, p] (top_k is sorted)
        keep = (top_sims >= top_sims[:, :1] - adaptive_margin) | (rank < floor)
        counts = jnp.where(keep.reshape(-1), counts, 0)
    offs = jnp.arange(max_cluster_blocks)[None, :]  # [1, mcb]
    blocks = starts[:, None] + offs  # [qp, mcb]
    valid = offs < counts[:, None]
    blocks = jnp.where(valid, blocks, total_blocks)  # out-of-range → dropped

    mask = jnp.zeros(total_blocks + 1, jnp.int32).at[blocks.reshape(-1)].max(1)
    mask = mask[:total_blocks]
    # fresh tail (blocks appended after the freeze) is always probed
    tail = jnp.arange(total_blocks) >= jnp.asarray(frozen_blocks)
    mask = jnp.maximum(mask, tail.astype(jnp.int32))

    # order blocks: selected first (ascending id), rest after
    order_key = jnp.where(mask > 0, jnp.arange(total_blocks), total_blocks + jnp.arange(total_blocks))
    order = jnp.argsort(order_key)
    ids = order[:max_blocks].astype(jnp.int32)
    n_valid = jnp.minimum(jnp.sum(mask), max_blocks).astype(jnp.int32)
    return ids, n_valid
