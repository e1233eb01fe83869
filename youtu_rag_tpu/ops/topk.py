"""Fused masked score + top-k kernels — the TPU replacement for the
reference's external vector-DB search (ChromaDB HNSW `chroma_store.py:90-148`,
FAISS flat `faiss_store.py:24-303`).

Two device paths, identical semantics:

- ``xla_topk``   — pure-XLA: ``top_k(Q @ X^T + bias)``. Optimal for small
  query batches (bandwidth-bound on reading X; XLA fuses the bias add).
- ``pallas_topk``— Pallas grid over DB row-blocks; each step does an MXU
  matmul on a ``[BLOCK, d]`` tile, adds the filter bias, and maintains
  per-block top-k candidates in VMEM via iterative argmax, so the full
  ``[q, N]`` score matrix never touches HBM. A tiny XLA merge reduces the
  per-block candidates. TPU grids execute sequentially, so a VMEM scratch
  threshold prunes blocks whose max score cannot enter the current top-k.

Conventions:
- vectors are pre-normalized for cosine (score == inner product), matching
  the reference's ``similarity = 1 - distance`` cosine convention
  (`chroma_store.py:132-135`);
- ``bias`` is an additive float32 row vector over DB rows: 0 for live rows,
  ``NEG_INF`` for tombstones / padding / filtered-out rows. Metadata filters
  compile to this bias (youtu_rag_tpu.index.filters);
- ties break toward the lower row index (deterministic parity tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(jnp.finfo(jnp.float32).min)

_LANE = 128
_SUBLANE = 8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# XLA path
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("k",))
def xla_topk(queries: jax.Array, database: jax.Array, bias: jax.Array, k: int):
    """Reference/small-batch path: full scores then ``lax.top_k``.

    Args:
      queries:  [q, d] float32/bfloat16
      database: [N, d] (any float dtype; typically bfloat16)
      bias:     [N] float32 additive mask (0 live, NEG_INF dead)
      k:        static top-k
    Returns:
      (scores [q, k] float32 desc, indices [q, k] int32)
    """
    q = queries.astype(jnp.bfloat16)
    x = database.astype(jnp.bfloat16)
    scores = jax.lax.dot_general(
        q, x, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    scores = scores + bias[None, :]
    top_s, top_i = jax.lax.top_k(scores, k)
    return top_s, top_i.astype(jnp.int32)


# ---------------------------------------------------------------------------
# Pallas path
# ---------------------------------------------------------------------------


def _select_topk(scores: jax.Array, k: int, col_base: jax.Array | int):
    """Iterative top-k over axis 1 of ``scores`` [q, B] (VPU-friendly).

    Returns (vals [q, k] f32, idx [q, k] int32 with ``col_base`` added).
    Ties break toward the lowest column index.
    """
    qn, bn = scores.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (qn, bn), 1)
    vals, idxs = [], []
    s = scores
    for _ in range(k):
        m = jnp.max(s, axis=1, keepdims=True)  # [q, 1]
        hit = s >= m  # >= so NEG_INF rows still pick col 0
        arg = jnp.min(jnp.where(hit, col, bn), axis=1)  # first max
        vals.append(m[:, 0])
        idxs.append(arg + col_base)
        s = jnp.where(col == arg[:, None], NEG_INF, s)
    return jnp.stack(vals, axis=1), jnp.stack(idxs, axis=1).astype(jnp.int32)


def _topk_kernel(q_ref, x_ref, bias_ref, out_s_ref, out_i_ref, *, k: int, block_rows: int):
    """One grid step: scores for a [BLOCK, d] DB tile + per-block top-k.

    A threshold-pruning pass runs first: with the sequential TPU grid, the
    running worst accepted score so far lives in the previous blocks'
    outputs; here we simply always select (pruned variant in
    ``_topk_kernel_pruned``)."""
    i = pl.program_id(0)
    qv = q_ref[...]  # [q_pad, d] bf16
    xv = x_ref[...]  # [BLOCK, d] bf16
    scores = jax.lax.dot_general(
        qv, xv, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [q_pad, BLOCK]
    scores = scores + bias_ref[...]  # [1, BLOCK] broadcasts
    vals, idx = _select_topk(scores, k, i * block_rows)
    kpad = out_s_ref.shape[2]
    if kpad > k:
        pad = kpad - k
        vals = jnp.concatenate([vals, jnp.full((vals.shape[0], pad), NEG_INF, jnp.float32)], axis=1)
        idx = jnp.concatenate([idx, jnp.zeros((idx.shape[0], pad), jnp.int32)], axis=1)
    out_s_ref[0] = vals
    out_i_ref[0] = idx


@functools.partial(jax.jit, static_argnames=("k", "block_rows", "interpret"))
def pallas_topk(
    queries: jax.Array,
    database: jax.Array,
    bias: jax.Array,
    k: int,
    *,
    block_rows: int = 1024,
    interpret: bool = False,
):
    """Fused masked matmul + blockwise top-k. See module docstring.

    Args:
      queries:  [q, d] — d must be a multiple of 128 (the index pads it)
      database: [N, d] — N must be a multiple of ``block_rows``
      bias:     [N] float32
      k:        static top-k (k <= block_rows)
    Returns:
      (scores [q, k] float32 desc, indices [q, k] int32)
    """
    qn, d = queries.shape
    n, d2 = database.shape
    assert d == d2, (d, d2)
    assert n % block_rows == 0, (n, block_rows)
    assert d % _LANE == 0, f"dim {d} must be multiple of {_LANE}"
    assert k <= block_rows

    q_pad = _round_up(max(qn, _SUBLANE), _SUBLANE)
    k_pad = _round_up(k, _LANE)
    num_blocks = n // block_rows

    q = jnp.zeros((q_pad, d), jnp.bfloat16).at[:qn].set(queries.astype(jnp.bfloat16))
    x = database.astype(jnp.bfloat16)
    b = bias.astype(jnp.float32).reshape(1, n)

    kernel = functools.partial(_topk_kernel, k=k, block_rows=block_rows)
    out_shape = (
        jax.ShapeDtypeStruct((num_blocks, q_pad, k_pad), jnp.float32),
        jax.ShapeDtypeStruct((num_blocks, q_pad, k_pad), jnp.int32),
    )
    grid_spec = pl.GridSpec(
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec((q_pad, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_rows), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, q_pad, k_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q_pad, k_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
    )
    flops = 2 * q_pad * n * d + 4 * k * q_pad * n
    block_s, block_i = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=n * d * 2 + q_pad * d * 2, transcendentals=0
        ),
        interpret=interpret,
    )(q, x, b)

    # Final merge: [num_blocks, q_pad, k_pad] → [q, k]; tiny, stays in XLA.
    cand_s = jnp.transpose(block_s, (1, 0, 2)).reshape(q_pad, num_blocks * k_pad)
    cand_i = jnp.transpose(block_i, (1, 0, 2)).reshape(q_pad, num_blocks * k_pad)
    top_s, pos = jax.lax.top_k(cand_s, k)
    top_i = jnp.take_along_axis(cand_i, pos, axis=1)
    return top_s[:qn], top_i[:qn]


# ---------------------------------------------------------------------------
# threshold-pruned path: running top-k in VMEM scratch across the
# sequential TPU grid; a block whose max score cannot enter the current
# top-k skips the k-iteration selection entirely (one max pass instead).
# After warm-up almost every block prunes, so the kernel runs at DMA speed.
# ---------------------------------------------------------------------------


def _select_topk_with_payload(scores: jax.Array, payload: jax.Array, k: int):
    """Iterative top-k carrying an int32 payload per element — gather-free
    (Mosaic cannot lower take_along_axis inside kernels): the selected
    column's payload is extracted by a masked sum, since exactly one
    column matches per iteration."""
    qn, bn = scores.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (qn, bn), 1)
    vals, pays = [], []
    s = scores
    for _ in range(k):
        m = jnp.max(s, axis=1, keepdims=True)
        hit = s >= m
        arg = jnp.min(jnp.where(hit, col, bn), axis=1)
        sel = col == arg[:, None]
        pay = jnp.sum(jnp.where(sel, payload, 0), axis=1)
        vals.append(m[:, 0])
        pays.append(pay)
        s = jnp.where(sel, NEG_INF, s)
    return jnp.stack(vals, axis=1), jnp.stack(pays, axis=1).astype(jnp.int32)


def _topk_kernel_pruned(q_ref, x_ref, bias_ref, out_s_ref, out_i_ref, run_s, run_i, *, k, block_rows):
    i = pl.program_id(0)
    n_blocks = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        run_s[...] = jnp.full(run_s.shape, NEG_INF, jnp.float32)
        run_i[...] = jnp.zeros(run_i.shape, jnp.int32)

    qv = q_ref[...]
    xv = x_ref[...]
    scores = jax.lax.dot_general(
        qv, xv, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    scores = scores + bias_ref[...]

    # prune check: can any row of this block enter any query's top-k?
    block_max = jnp.max(scores, axis=1)  # [q]
    thresholds = run_s[:, k - 1]  # kth-best per query (rows kept sorted)
    need = jnp.any(block_max > thresholds)

    @pl.when(need)
    def _():
        vals, idx = _select_topk(scores, k, i * block_rows)
        kpad = run_s.shape[1]
        both_s = jnp.concatenate(
            [run_s[...][:, :k], vals], axis=1
        )  # [q, 2k]
        both_i = jnp.concatenate([run_i[...][:, :k], idx], axis=1)
        merged_s, merged_i = _select_topk_with_payload(both_s, both_i, k)
        if kpad > k:
            pad = kpad - k
            merged_s = jnp.concatenate(
                [merged_s, jnp.full((merged_s.shape[0], pad), NEG_INF, jnp.float32)], axis=1
            )
            merged_i = jnp.concatenate(
                [merged_i, jnp.zeros((merged_i.shape[0], pad), jnp.int32)], axis=1
            )
        run_s[...] = merged_s
        run_i[...] = merged_i

    @pl.when(i == n_blocks - 1)
    def _():
        out_s_ref[...] = run_s[...]
        out_i_ref[...] = run_i[...]


@functools.partial(jax.jit, static_argnames=("k", "block_rows", "interpret"))
def pallas_topk_pruned(
    queries: jax.Array,
    database: jax.Array,
    bias: jax.Array,
    k: int,
    *,
    block_rows: int = 2048,
    interpret: bool = False,
):
    """Fused masked top-k with running-threshold block pruning.

    Same contract as ``pallas_topk``; no XLA merge step — the running
    top-k is already global when the last block finishes."""
    qn, d = queries.shape
    n, d2 = database.shape
    assert d == d2 and n % block_rows == 0 and d % _LANE == 0 and k <= block_rows

    q_pad = _round_up(max(qn, _SUBLANE), _SUBLANE)
    k_pad = _round_up(k, _LANE)
    num_blocks = n // block_rows

    q = jnp.zeros((q_pad, d), jnp.bfloat16).at[:qn].set(queries.astype(jnp.bfloat16))
    x = database.astype(jnp.bfloat16)
    b = bias.astype(jnp.float32).reshape(1, n)

    kernel = functools.partial(_topk_kernel_pruned, k=k, block_rows=block_rows)
    out_shape = (
        jax.ShapeDtypeStruct((q_pad, k_pad), jnp.float32),
        jax.ShapeDtypeStruct((q_pad, k_pad), jnp.int32),
    )
    top_s, top_i = pl.pallas_call(
        kernel,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec((q_pad, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_rows), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((q_pad, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((q_pad, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((q_pad, k_pad), jnp.float32),
            pltpu.VMEM((q_pad, k_pad), jnp.int32),
        ],
        interpret=interpret,
    )(q, x, b)
    return top_s[:qn, :k], top_i[:qn, :k]


# ---------------------------------------------------------------------------
# int8 quantized path (half the HBM traffic of bf16; int8 MXU throughput)
# ---------------------------------------------------------------------------


@jax.jit
def quantize_rows_int8(x: jax.Array):
    """Symmetric per-row int8 quantization: x ≈ scale[:, None] * q."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=1, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale[:, 0]


def _topk_kernel_int8(
    q_ref, qs_ref, x_ref, xs_ref, bias_ref, out_s_ref, out_i_ref, *, k: int, block_rows: int
):
    i = pl.program_id(0)
    qv = q_ref[...]  # [q_pad, d] int8
    xv = x_ref[...]  # [BLOCK, d] int8
    acc = jax.lax.dot_general(
        qv, xv, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    )  # [q_pad, BLOCK] i32
    scores = acc.astype(jnp.float32) * (qs_ref[...].reshape(-1, 1) * xs_ref[...])
    scores = scores + bias_ref[...]
    vals, idx = _select_topk(scores, k, i * block_rows)
    kpad = out_s_ref.shape[2]
    if kpad > k:
        pad = kpad - k
        vals = jnp.concatenate([vals, jnp.full((vals.shape[0], pad), NEG_INF, jnp.float32)], axis=1)
        idx = jnp.concatenate([idx, jnp.zeros((idx.shape[0], pad), jnp.int32)], axis=1)
    out_s_ref[0] = vals
    out_i_ref[0] = idx


@functools.partial(jax.jit, static_argnames=("k", "block_rows", "interpret"))
def pallas_topk_int8(
    queries: jax.Array,
    database_q: jax.Array,
    db_scales: jax.Array,
    bias: jax.Array,
    k: int,
    *,
    block_rows: int = 2048,
    interpret: bool = False,
):
    """Fused masked top-k over int8-quantized rows.

    Args:
      queries:    [q, d] float — quantized per-query on device
      database_q: [N, d] int8
      db_scales:  [N] float32 per-row scales
      bias:       [N] float32
    """
    qn, d = queries.shape
    n = database_q.shape[0]
    assert n % block_rows == 0 and d % _LANE == 0

    q_pad = _round_up(max(qn, _SUBLANE), _SUBLANE)
    k_pad = _round_up(k, _LANE)
    num_blocks = n // block_rows

    qf = jnp.zeros((q_pad, d), jnp.float32).at[:qn].set(queries.astype(jnp.float32))
    qq, qs = quantize_rows_int8(qf)
    xs = db_scales.astype(jnp.float32).reshape(1, n)
    b = bias.astype(jnp.float32).reshape(1, n)

    kernel = functools.partial(_topk_kernel_int8, k=k, block_rows=block_rows)
    grid_spec = pl.GridSpec(
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec((q_pad, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((q_pad,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_rows), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_rows), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, q_pad, k_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q_pad, k_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
    )
    out_shape = (
        jax.ShapeDtypeStruct((num_blocks, q_pad, k_pad), jnp.float32),
        jax.ShapeDtypeStruct((num_blocks, q_pad, k_pad), jnp.int32),
    )
    block_s, block_i = pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape, interpret=interpret
    )(qq, qs, database_q, xs, b)

    cand_s = jnp.transpose(block_s, (1, 0, 2)).reshape(q_pad, num_blocks * k_pad)
    cand_i = jnp.transpose(block_i, (1, 0, 2)).reshape(q_pad, num_blocks * k_pad)
    top_s, pos = jax.lax.top_k(cand_s, k)
    top_i = jnp.take_along_axis(cand_i, pos, axis=1)
    return top_s[:qn], top_i[:qn]


def _topk_kernel_int8_pruned(
    q_ref, qs_ref, x_ref, xs_ref, bias_ref, out_s_ref, out_i_ref, run_s, run_i, *, k, block_rows
):
    i = pl.program_id(0)
    n_blocks = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        run_s[...] = jnp.full(run_s.shape, NEG_INF, jnp.float32)
        run_i[...] = jnp.zeros(run_i.shape, jnp.int32)

    acc = jax.lax.dot_general(
        q_ref[...], x_ref[...], (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    )
    scores = acc.astype(jnp.float32) * (qs_ref[...].reshape(-1, 1) * xs_ref[...])
    scores = scores + bias_ref[...]

    block_max = jnp.max(scores, axis=1)
    thresholds = run_s[:, k - 1]
    need = jnp.any(block_max > thresholds)

    @pl.when(need)
    def _():
        vals, idx = _select_topk(scores, k, i * block_rows)
        kpad = run_s.shape[1]
        both_s = jnp.concatenate([run_s[...][:, :k], vals], axis=1)
        both_i = jnp.concatenate([run_i[...][:, :k], idx], axis=1)
        merged_s, merged_i = _select_topk_with_payload(both_s, both_i, k)
        if kpad > k:
            pad = kpad - k
            merged_s = jnp.concatenate(
                [merged_s, jnp.full((merged_s.shape[0], pad), NEG_INF, jnp.float32)], axis=1
            )
            merged_i = jnp.concatenate(
                [merged_i, jnp.zeros((merged_i.shape[0], pad), jnp.int32)], axis=1
            )
        run_s[...] = merged_s
        run_i[...] = merged_i

    @pl.when(i == n_blocks - 1)
    def _():
        out_s_ref[...] = run_s[...]
        out_i_ref[...] = run_i[...]


@functools.partial(jax.jit, static_argnames=("k", "block_rows", "interpret"))
def pallas_topk_int8_pruned(
    queries: jax.Array,
    database_q: jax.Array,
    db_scales: jax.Array,
    bias: jax.Array,
    k: int,
    *,
    block_rows: int = 4096,
    interpret: bool = False,
):
    """int8 scoring + running-threshold pruning: the fastest brute-force
    path (half the HBM traffic, selection cost skipped on pruned blocks)."""
    qn, d = queries.shape
    n = database_q.shape[0]
    assert n % block_rows == 0 and d % _LANE == 0

    q_pad = _round_up(max(qn, _SUBLANE), _SUBLANE)
    k_pad = _round_up(k, _LANE)
    num_blocks = n // block_rows

    qf = jnp.zeros((q_pad, d), jnp.float32).at[:qn].set(queries.astype(jnp.float32))
    qq, qs = quantize_rows_int8(qf)
    xs = db_scales.astype(jnp.float32).reshape(1, n)
    b = bias.astype(jnp.float32).reshape(1, n)

    kernel = functools.partial(_topk_kernel_int8_pruned, k=k, block_rows=block_rows)
    out_shape = (
        jax.ShapeDtypeStruct((q_pad, k_pad), jnp.float32),
        jax.ShapeDtypeStruct((q_pad, k_pad), jnp.int32),
    )
    top_s, top_i = pl.pallas_call(
        kernel,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec((q_pad, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((q_pad,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_rows), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_rows), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((q_pad, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((q_pad, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((q_pad, k_pad), jnp.float32),
            pltpu.VMEM((q_pad, k_pad), jnp.int32),
        ],
        interpret=interpret,
    )(qq, qs, database_q, xs, b)
    return top_s[:qn, :k], top_i[:qn, :k]


# ---------------------------------------------------------------------------
# int4 packed path — half the HBM bytes of int8; the brute-force kernel is
# bandwidth-bound, so this is the next ~2× QPS tier. Layout: byte j of a
# packed row holds column j in its LOW nibble and column j + d/2 in its
# HIGH nibble, so in-kernel unpack is two shifts + one lane-axis concat
# (no interleave). Queries stay int8 (asymmetric precision costs nothing:
# the MXU dot is int8×int8 either way).
# ---------------------------------------------------------------------------


def quantize_rows_int4(x: jax.Array):
    """Symmetric per-row int4: x ≈ scale[:, None] * q, q ∈ [-7, 7],
    packed two columns per byte ([N, d] → [N, d//2] int8)."""
    d = x.shape[1]
    assert d % 2 == 0
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 7.0
    q = jnp.clip(jnp.round(xf / scale), -7, 7).astype(jnp.int32)
    lo = q[:, : d // 2] & 0xF
    hi = q[:, d // 2 :] & 0xF
    packed_u8 = (lo | (hi << 4)).astype(jnp.uint8)
    return jax.lax.bitcast_convert_type(packed_u8, jnp.int8), scale[:, 0]


def unpack_int4(packed: jax.Array) -> jax.Array:
    """[..., d//2] packed int8 → [..., d] int8 nibbles in [-7, 7].

    The shifts run in int32: Mosaic on v5e cannot legalize `arith.shrsi`
    on int8 vectors (kernel compile fails with "failed to legalize
    operation 'arith.shrsi'" at vector<...xi8>), while 32-bit shifts
    lower fine and the narrowing back to int8 keeps the MXU dot int8×int8.
    """
    p = packed.astype(jnp.int32)
    hi = (p >> 4).astype(jnp.int8)  # arithmetic shift sign-extends the high nibble
    lo = ((p << 28) >> 28).astype(jnp.int8)  # shift up then arithmetic down
    return jnp.concatenate([lo, hi], axis=-1)


def _unpack_int4_planes(packed: jax.Array):
    """[B, d2] packed int8 → (lo [B, d2] int8, hi [B, d2] int8) signed
    nibbles, without the [B, d] lane-axis concat of ``unpack_int4``.

    Same int32 shift extraction as ``unpack_int4`` (the only pattern
    Mosaic v5e legalizes — int8 shifts fail with 'arith.shrsi', and
    bitwidth-changing ``lax.bitcast_convert_type`` fails with 'Changing
    bitwidths not supported'); the kernel then runs two half-d dots on the
    planes directly so the unpacked vectors never relayout through a lane
    concat."""
    p = packed.astype(jnp.int32)
    hi = (p >> 4).astype(jnp.int8)  # arithmetic shift sign-extends
    lo = ((p << 28) >> 28).astype(jnp.int8)
    return lo, hi


def _topk_kernel_int4_pruned(
    q_ref, qs_ref, x_ref, xs_ref, bias_ref, out_s_ref, out_i_ref, run_s, run_i, *, k, block_rows
):
    i = pl.program_id(0)
    n_blocks = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        run_s[...] = jnp.full(run_s.shape, NEG_INF, jnp.float32)
        run_i[...] = jnp.zeros(run_i.shape, jnp.int32)

    # two half-width dots over the nibble planes (byte j holds column j in
    # its low nibble and column j + d/2 in its high nibble), so no [B, d]
    # concat ever materializes; the MXU contraction work is identical
    lo, hi = _unpack_int4_planes(x_ref[...])  # 2× [BLOCK, d2] int8
    d2 = lo.shape[1]
    q = q_ref[...]
    acc = jax.lax.dot_general(
        q[:, :d2], lo, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    )
    acc = acc + jax.lax.dot_general(
        q[:, d2:], hi, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    )
    scores = acc.astype(jnp.float32) * (qs_ref[...].reshape(-1, 1) * xs_ref[...])
    scores = scores + bias_ref[...]

    block_max = jnp.max(scores, axis=1)
    thresholds = run_s[:, k - 1]
    need = jnp.any(block_max > thresholds)

    @pl.when(need)
    def _():
        vals, idx = _select_topk(scores, k, i * block_rows)
        kpad = run_s.shape[1]
        both_s = jnp.concatenate([run_s[...][:, :k], vals], axis=1)
        both_i = jnp.concatenate([run_i[...][:, :k], idx], axis=1)
        merged_s, merged_i = _select_topk_with_payload(both_s, both_i, k)
        if kpad > k:
            pad = kpad - k
            merged_s = jnp.concatenate(
                [merged_s, jnp.full((merged_s.shape[0], pad), NEG_INF, jnp.float32)], axis=1
            )
            merged_i = jnp.concatenate(
                [merged_i, jnp.zeros((merged_i.shape[0], pad), jnp.int32)], axis=1
            )
        run_s[...] = merged_s
        run_i[...] = merged_i

    @pl.when(i == n_blocks - 1)
    def _():
        out_s_ref[...] = run_s[...]
        out_i_ref[...] = run_i[...]


@functools.partial(jax.jit, static_argnames=("k", "block_rows", "interpret"))
def pallas_topk_int4_pruned(
    queries: jax.Array,
    database_p: jax.Array,
    db_scales: jax.Array,
    bias: jax.Array,
    k: int,
    *,
    block_rows: int = 4096,
    interpret: bool = False,
):
    """Fused masked top-k over int4-packed rows (int8 queries).

    Args:
      queries:    [q, d] float — int8-quantized per query on device
      database_p: [N, d//2] int8 — packed nibbles (quantize_rows_int4)
      db_scales:  [N] float32 per-row scales (amax/7)
      bias:       [N] float32
    """
    qn, d2 = queries.shape[0], database_p.shape[1]
    d = 2 * d2
    n = database_p.shape[0]
    assert queries.shape[1] == d and n % block_rows == 0 and d2 % _LANE == 0

    q_pad = _round_up(max(qn, _SUBLANE), _SUBLANE)
    k_pad = _round_up(k, _LANE)
    num_blocks = n // block_rows

    qf = jnp.zeros((q_pad, d), jnp.float32).at[:qn].set(queries.astype(jnp.float32))
    qq, qs = quantize_rows_int8(qf)
    xs = db_scales.astype(jnp.float32).reshape(1, n)
    b = bias.astype(jnp.float32).reshape(1, n)

    kernel = functools.partial(_topk_kernel_int4_pruned, k=k, block_rows=block_rows)
    out_shape = (
        jax.ShapeDtypeStruct((q_pad, k_pad), jnp.float32),
        jax.ShapeDtypeStruct((q_pad, k_pad), jnp.int32),
    )
    top_s, top_i = pl.pallas_call(
        kernel,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec((q_pad, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((q_pad,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, d2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_rows), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_rows), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((q_pad, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((q_pad, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((q_pad, k_pad), jnp.float32),
            pltpu.VMEM((q_pad, k_pad), jnp.int32),
        ],
        interpret=interpret,
    )(qq, qs, database_p, xs, b)
    return top_s[:qn, :k], top_i[:qn, :k]


@functools.partial(jax.jit, static_argnames=("k",))
def xla_topk_int4(queries, database_p, db_scales, bias, k: int):
    """XLA fallback for the int4 path (unpack + int8 dot, no dequantize)."""
    qq, qs = quantize_rows_int8(queries.astype(jnp.float32))
    xv = unpack_int4(database_p)
    acc = jax.lax.dot_general(
        qq, xv, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    )
    scores = acc.astype(jnp.float32) * (qs[:, None] * db_scales[None, :]) + bias[None, :]
    top_s, top_i = jax.lax.top_k(scores, k)
    return top_s, top_i.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("k",))
def xla_topk_int8(queries, database_q, db_scales, bias, k: int):
    """XLA fallback for the int8 path (dequantize-free scoring)."""
    qf = queries.astype(jnp.float32)
    qq, qs = quantize_rows_int8(qf)
    acc = jax.lax.dot_general(
        qq, database_q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    )
    scores = acc.astype(jnp.float32) * (qs[:, None] * db_scales[None, :]) + bias[None, :]
    top_s, top_i = jax.lax.top_k(scores, k)
    return top_s, top_i.astype(jnp.int32)


# ---------------------------------------------------------------------------
# Dispatch
# ---------------------------------------------------------------------------


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover - no backend at all
        return False


def fused_topk(
    queries: jax.Array,
    database: jax.Array,
    bias: jax.Array,
    k: int,
    *,
    block_rows: int = 1024,
    backend: str = "auto",
):
    """Dispatch between the Pallas and XLA paths.

    ``backend``: auto | pallas | xla | pallas_interpret.
    ``auto`` → Pallas on TPU when the DB is large enough to amortize the
    grid, XLA otherwise (small DB or CPU host testing).
    """
    n = database.shape[0]
    if backend == "auto":
        backend = "pallas" if (_on_tpu() and n >= 4 * block_rows) else "xla"
    if backend == "xla":
        return xla_topk(queries, database, bias, k)
    if backend == "pallas":
        return pallas_topk(queries, database, bias, k, block_rows=block_rows)
    if backend == "pallas_interpret":
        return pallas_topk(queries, database, bias, k, block_rows=block_rows, interpret=True)
    raise ValueError(f"unknown backend {backend!r}")
