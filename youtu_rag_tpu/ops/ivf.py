"""IVF probed-block top-k kernels.

TPU-native IVF (design §7 of SURVEY.md; no reference counterpart — the
reference forwards index_params to Chroma/FAISS):

1. rows are sorted by k-means cluster (``DeviceVectorIndex.reorder``), so
   each cluster is a contiguous row range and each query's probe set is a
   list of *blocks*;
2. the query batch's probed blocks form one deduplicated block-id list
   (batched IVF: union of per-query probes — recall ≥ per-query probing);
3. the Pallas kernel walks a **static-size** block-id list via scalar
   prefetch: the grid is ``max_blocks`` long, each step DMAs only its
   probed ``[BLOCK, d]`` tile (HBM traffic ∝ probed fraction, not N);
   invalid tail entries write NEG_INF candidates;
4. the usual tiny XLA merge reduces per-block candidates.

An XLA gather fallback serves CPU tests and tiny indexes."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .topk import NEG_INF, _round_up, _select_topk, _LANE, _SUBLANE


def _ivf_kernel(ids_ref, nvalid_ref, q_ref, x_ref, bias_ref, out_s_ref, out_i_ref, *, k, block_rows):
    i = pl.program_id(0)
    block_id = ids_ref[i]
    valid = i < nvalid_ref[0]
    qv = q_ref[...]
    xv = x_ref[...]
    scores = jax.lax.dot_general(
        qv, xv, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    scores = scores + bias_ref[...]
    scores = jnp.where(valid, scores, NEG_INF)
    vals, idx = _select_topk(scores, k, block_id * block_rows)
    kpad = out_s_ref.shape[2]
    if kpad > k:
        pad = kpad - k
        vals = jnp.concatenate([vals, jnp.full((vals.shape[0], pad), NEG_INF, jnp.float32)], axis=1)
        idx = jnp.concatenate([idx, jnp.zeros((idx.shape[0], pad), jnp.int32)], axis=1)
    out_s_ref[0] = vals
    out_i_ref[0] = idx


@functools.partial(jax.jit, static_argnames=("k", "block_rows", "interpret"))
def pallas_ivf_topk(
    queries: jax.Array,
    database: jax.Array,
    bias: jax.Array,
    block_ids: jax.Array,
    n_valid: jax.Array,
    k: int,
    *,
    block_rows: int = 1024,
    interpret: bool = False,
):
    """Masked top-k over the probed blocks only.

    Args:
      queries:   [q, d]
      database:  [N, d] cluster-sorted
      bias:      [N] float32
      block_ids: [max_blocks] int32 — probed block indices (dedup, padded)
      n_valid:   [] or [1] int32 — number of valid entries in block_ids
      k:         static top-k
    """
    qn, d = queries.shape
    n = database.shape[0]
    assert n % block_rows == 0 and d % _LANE == 0
    max_blocks = block_ids.shape[0]

    q_pad = _round_up(max(qn, _SUBLANE), _SUBLANE)
    k_pad = _round_up(k, _LANE)
    q = jnp.zeros((q_pad, d), jnp.bfloat16).at[:qn].set(queries.astype(jnp.bfloat16))
    x = database.astype(jnp.bfloat16)
    b = bias.astype(jnp.float32).reshape(1, n)

    kernel = functools.partial(_ivf_kernel, k=k, block_rows=block_rows)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # block_ids, n_valid
        grid=(max_blocks,),
        in_specs=[
            pl.BlockSpec((q_pad, d), lambda i, ids, nv: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, d), lambda i, ids, nv: (ids[i], 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_rows), lambda i, ids, nv: (0, ids[i]), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, q_pad, k_pad), lambda i, ids, nv: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q_pad, k_pad), lambda i, ids, nv: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
    )
    out_shape = (
        jax.ShapeDtypeStruct((max_blocks, q_pad, k_pad), jnp.float32),
        jax.ShapeDtypeStruct((max_blocks, q_pad, k_pad), jnp.int32),
    )
    block_s, block_i = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(block_ids.astype(jnp.int32), jnp.reshape(n_valid, (1,)).astype(jnp.int32), q, x, b)

    cand_s = jnp.transpose(block_s, (1, 0, 2)).reshape(q_pad, max_blocks * k_pad)
    cand_i = jnp.transpose(block_i, (1, 0, 2)).reshape(q_pad, max_blocks * k_pad)
    top_s, pos = jax.lax.top_k(cand_s, k)
    top_i = jnp.take_along_axis(cand_i, pos, axis=1)
    return top_s[:qn], top_i[:qn]


def _ivf_kernel_int8(
    ids_ref, nvalid_ref, q_ref, qs_ref, x_ref, xs_ref, bias_ref, out_s_ref, out_i_ref, *, k, block_rows
):
    i = pl.program_id(0)
    block_id = ids_ref[i]
    valid = i < nvalid_ref[0]
    acc = jax.lax.dot_general(
        q_ref[...], x_ref[...], (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    )
    scores = acc.astype(jnp.float32) * (qs_ref[...].reshape(-1, 1) * xs_ref[...])
    scores = scores + bias_ref[...]
    scores = jnp.where(valid, scores, NEG_INF)
    vals, idx = _select_topk(scores, k, block_id * block_rows)
    kpad = out_s_ref.shape[2]
    if kpad > k:
        pad = kpad - k
        vals = jnp.concatenate([vals, jnp.full((vals.shape[0], pad), NEG_INF, jnp.float32)], axis=1)
        idx = jnp.concatenate([idx, jnp.zeros((idx.shape[0], pad), jnp.int32)], axis=1)
    out_s_ref[0] = vals
    out_i_ref[0] = idx


@functools.partial(jax.jit, static_argnames=("k", "block_rows", "interpret"))
def pallas_ivf_topk_int8(
    queries: jax.Array,
    database_q: jax.Array,
    db_scales: jax.Array,
    bias: jax.Array,
    block_ids: jax.Array,
    n_valid: jax.Array,
    k: int,
    *,
    block_rows: int = 4096,
    interpret: bool = False,
):
    """int8 probed-block top-k: the 10M-on-one-chip configuration
    (int8 keeps 10M x 768 at ~7.7 GB of HBM)."""
    from .topk import quantize_rows_int8

    qn, d = queries.shape
    n = database_q.shape[0]
    assert n % block_rows == 0 and d % _LANE == 0
    max_blocks = block_ids.shape[0]

    q_pad = _round_up(max(qn, _SUBLANE), _SUBLANE)
    k_pad = _round_up(k, _LANE)
    qf = jnp.zeros((q_pad, d), jnp.float32).at[:qn].set(queries.astype(jnp.float32))
    qq, qs = quantize_rows_int8(qf)
    xs = db_scales.astype(jnp.float32).reshape(1, n)
    b = bias.astype(jnp.float32).reshape(1, n)

    kernel = functools.partial(_ivf_kernel_int8, k=k, block_rows=block_rows)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(max_blocks,),
        in_specs=[
            pl.BlockSpec((q_pad, d), lambda i, ids, nv: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((q_pad,), lambda i, ids, nv: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, d), lambda i, ids, nv: (ids[i], 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_rows), lambda i, ids, nv: (0, ids[i]), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_rows), lambda i, ids, nv: (0, ids[i]), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, q_pad, k_pad), lambda i, ids, nv: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q_pad, k_pad), lambda i, ids, nv: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
    )
    out_shape = (
        jax.ShapeDtypeStruct((max_blocks, q_pad, k_pad), jnp.float32),
        jax.ShapeDtypeStruct((max_blocks, q_pad, k_pad), jnp.int32),
    )
    block_s, block_i = pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape, interpret=interpret
    )(block_ids.astype(jnp.int32), jnp.reshape(n_valid, (1,)).astype(jnp.int32), qq, qs, database_q, xs, b)

    cand_s = jnp.transpose(block_s, (1, 0, 2)).reshape(q_pad, max_blocks * k_pad)
    cand_i = jnp.transpose(block_i, (1, 0, 2)).reshape(q_pad, max_blocks * k_pad)
    top_s, pos = jax.lax.top_k(cand_s, k)
    top_i = jnp.take_along_axis(cand_i, pos, axis=1)
    return top_s[:qn], top_i[:qn]


# ---------------------------------------------------------------------------
# double-buffered DMA IVF kernel: the grid-per-block prefetch kernel above
# pays ~3-4x per-block overhead (dynamic index maps defeat Mosaic's
# automatic pipelining). This variant runs ONE program that walks the
# block-id list with explicit async HBM→VMEM copies, double-buffered so the
# next block streams in while the current one scores, and keeps the running
# top-k in VMEM (pruned merges, no per-block HBM output).
# ---------------------------------------------------------------------------


def _ivf_dma_kernel(
    ids_ref,  # SMEM [max_blocks] int32 (scalar prefetch)
    nvalid_ref,  # SMEM [1] int32 (scalar prefetch)
    q_ref,  # VMEM [q_pad, d] int8
    qs_ref,  # VMEM [q_pad] f32
    x_hbm,  # ANY  [N, d] int8
    xs_hbm,  # ANY  [1, N] f32
    bias_hbm,  # ANY  [1, N] f32
    out_s_ref,  # VMEM [q_pad, k_pad] f32
    out_i_ref,  # VMEM [q_pad, k_pad] i32
    x_buf,  # VMEM [2, BR, d] int8
    xs_buf,  # VMEM [2, 1, BR] f32
    bias_buf,  # VMEM [2, 1, BR] f32
    run_s,  # VMEM [q_pad, k_pad] f32
    run_i,  # VMEM [q_pad, k_pad] i32
    x_sem,  # DMA sems (2,)
    xs_sem,  # DMA sems (2,)
    bias_sem,  # DMA sems (2,)
    *,
    k: int,
    block_rows: int,
    packed: bool = False,
):
    from .topk import NEG_INF, _select_topk, _select_topk_with_payload, unpack_int4

    def x_dma(slot, block_id):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(block_id * block_rows, block_rows), :],
            x_buf.at[slot],
            x_sem.at[slot],
        )

    def xs_dma(slot, block_id):
        return pltpu.make_async_copy(
            xs_hbm.at[:, pl.ds(block_id * block_rows, block_rows)],
            xs_buf.at[slot],
            xs_sem.at[slot],
        )

    def bias_dma(slot, block_id):
        return pltpu.make_async_copy(
            bias_hbm.at[:, pl.ds(block_id * block_rows, block_rows)],
            bias_buf.at[slot],
            bias_sem.at[slot],
        )

    run_s[...] = jnp.full(run_s.shape, NEG_INF, jnp.float32)
    run_i[...] = jnp.zeros(run_i.shape, jnp.int32)

    n_valid = nvalid_ref[0]

    # guard the priming copies: with n_valid == 0 the fori_loop never runs,
    # and un-waited in-flight DMAs at kernel exit are undefined behavior
    @pl.when(n_valid > 0)
    def _():
        first_id = ids_ref[0]
        x_dma(0, first_id).start()
        xs_dma(0, first_id).start()
        bias_dma(0, first_id).start()

    def body(i, _):
        slot = jax.lax.rem(i, 2)
        nxt = jax.lax.rem(i + 1, 2)

        @pl.when(i + 1 < n_valid)
        def _():
            nid = ids_ref[i + 1]
            x_dma(nxt, nid).start()
            xs_dma(nxt, nid).start()
            bias_dma(nxt, nid).start()

        block_id = ids_ref[i]
        x_dma(slot, block_id).wait()
        xs_dma(slot, block_id).wait()
        bias_dma(slot, block_id).wait()

        xv = x_buf[slot]
        if packed:  # int4 nibbles → int8 lanes, on the VPU while the
            xv = unpack_int4(xv)  # next block's DMA is in flight
        acc = jax.lax.dot_general(
            q_ref[...], xv, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
        )
        scores = acc.astype(jnp.float32) * (qs_ref[...].reshape(-1, 1) * xs_buf[slot, 0][None, :])
        scores = scores + bias_buf[slot, 0][None, :]

        block_max = jnp.max(scores, axis=1)
        thresholds = run_s[:, k - 1]

        @pl.when(jnp.any(block_max > thresholds))
        def _():
            vals, idx = _select_topk(scores, k, block_id * block_rows)
            both_s = jnp.concatenate([run_s[...][:, :k], vals], axis=1)
            both_i = jnp.concatenate([run_i[...][:, :k], idx], axis=1)
            merged_s, merged_i = _select_topk_with_payload(both_s, both_i, k)
            kpad = run_s.shape[1]
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

        return 0

    jax.lax.fori_loop(0, n_valid, body, 0)
    out_s_ref[...] = run_s[...]
    out_i_ref[...] = run_i[...]


def _ivf_dma_kernel_bf16(
    ids_ref,
    nvalid_ref,
    q_ref,  # VMEM [q_pad, d] bf16
    x_hbm,  # ANY  [N, d] bf16
    bias_hbm,  # ANY [1, N] f32
    out_s_ref,
    out_i_ref,
    x_buf,  # VMEM [2, BR, d] bf16
    bias_buf,  # VMEM [2, 1, BR] f32
    run_s,
    run_i,
    x_sem,
    bias_sem,
    *,
    k: int,
    block_rows: int,
):
    from .topk import NEG_INF, _select_topk, _select_topk_with_payload

    def x_dma(slot, block_id):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(block_id * block_rows, block_rows), :], x_buf.at[slot], x_sem.at[slot]
        )

    def bias_dma(slot, block_id):
        return pltpu.make_async_copy(
            bias_hbm.at[:, pl.ds(block_id * block_rows, block_rows)],
            bias_buf.at[slot],
            bias_sem.at[slot],
        )

    run_s[...] = jnp.full(run_s.shape, NEG_INF, jnp.float32)
    run_i[...] = jnp.zeros(run_i.shape, jnp.int32)

    n_valid = nvalid_ref[0]

    @pl.when(n_valid > 0)  # see int8 kernel: no un-waited DMAs when empty
    def _():
        first_id = ids_ref[0]
        x_dma(0, first_id).start()
        bias_dma(0, first_id).start()

    def body(i, _):
        slot = jax.lax.rem(i, 2)
        nxt = jax.lax.rem(i + 1, 2)

        @pl.when(i + 1 < n_valid)
        def _():
            nid = ids_ref[i + 1]
            x_dma(nxt, nid).start()
            bias_dma(nxt, nid).start()

        block_id = ids_ref[i]
        x_dma(slot, block_id).wait()
        bias_dma(slot, block_id).wait()

        scores = jax.lax.dot_general(
            q_ref[...], x_buf[slot], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        scores = scores + bias_buf[slot, 0][None, :]

        block_max = jnp.max(scores, axis=1)
        thresholds = run_s[:, k - 1]

        @pl.when(jnp.any(block_max > thresholds))
        def _():
            vals, idx = _select_topk(scores, k, block_id * block_rows)
            both_s = jnp.concatenate([run_s[...][:, :k], vals], axis=1)
            both_i = jnp.concatenate([run_i[...][:, :k], idx], axis=1)
            merged_s, merged_i = _select_topk_with_payload(both_s, both_i, k)
            kpad = run_s.shape[1]
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

        return 0

    jax.lax.fori_loop(0, n_valid, body, 0)
    out_s_ref[...] = run_s[...]
    out_i_ref[...] = run_i[...]


@functools.partial(jax.jit, static_argnames=("k", "block_rows", "interpret"))
def pallas_ivf_topk_dma(
    queries: jax.Array,
    database: jax.Array,
    bias: jax.Array,
    block_ids: jax.Array,
    n_valid: jax.Array,
    k: int,
    *,
    block_rows: int = 2048,
    interpret: bool = False,
):
    """Double-buffered bf16 IVF search (mirror of the int8 DMA kernel)."""
    qn, d = queries.shape
    n = database.shape[0]
    assert n % block_rows == 0 and d % _LANE == 0

    q_pad = _round_up(max(qn, _SUBLANE), _SUBLANE)
    k_pad = _round_up(k, _LANE)
    q = jnp.zeros((q_pad, d), jnp.bfloat16).at[:qn].set(queries.astype(jnp.bfloat16))
    x = database.astype(jnp.bfloat16)
    b = bias.astype(jnp.float32).reshape(1, n)

    kernel = functools.partial(_ivf_dma_kernel_bf16, k=k, block_rows=block_rows)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, block_rows, d), jnp.bfloat16),
            pltpu.VMEM((2, 1, block_rows), jnp.float32),
            pltpu.VMEM((q_pad, k_pad), jnp.float32),
            pltpu.VMEM((q_pad, k_pad), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out_shape = (
        jax.ShapeDtypeStruct((q_pad, k_pad), jnp.float32),
        jax.ShapeDtypeStruct((q_pad, k_pad), jnp.int32),
    )
    top_s, top_i = pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape, interpret=interpret
    )(block_ids.astype(jnp.int32), jnp.reshape(n_valid, (1,)).astype(jnp.int32), q, x, b)
    return top_s[:qn, :k], top_i[:qn, :k]


@functools.partial(jax.jit, static_argnames=("k", "block_rows", "interpret"))
def pallas_ivf_topk_int8_dma(
    queries: jax.Array,
    database_q: jax.Array,
    db_scales: jax.Array,
    bias: jax.Array,
    block_ids: jax.Array,
    n_valid: jax.Array,
    k: int,
    *,
    block_rows: int = 4096,
    interpret: bool = False,
):
    """Double-buffered int8 IVF search (see block comment above)."""
    from .topk import quantize_rows_int8

    qn, d = queries.shape
    n = database_q.shape[0]
    assert n % block_rows == 0 and d % _LANE == 0
    max_blocks = block_ids.shape[0]

    q_pad = _round_up(max(qn, _SUBLANE), _SUBLANE)
    k_pad = _round_up(k, _LANE)
    qf = jnp.zeros((q_pad, d), jnp.float32).at[:qn].set(queries.astype(jnp.float32))
    qq, qs = quantize_rows_int8(qf)
    xs = db_scales.astype(jnp.float32).reshape(1, n)
    b = bias.astype(jnp.float32).reshape(1, n)

    kernel = functools.partial(
        _ivf_dma_kernel, k=k, block_rows=block_rows
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # qq
            pl.BlockSpec(memory_space=pltpu.VMEM),  # qs
            pl.BlockSpec(memory_space=pltpu.ANY),  # X stays in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),  # scales
            pl.BlockSpec(memory_space=pltpu.ANY),  # bias
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, block_rows, d), jnp.int8),
            pltpu.VMEM((2, 1, block_rows), jnp.float32),
            pltpu.VMEM((2, 1, block_rows), jnp.float32),
            pltpu.VMEM((q_pad, k_pad), jnp.float32),
            pltpu.VMEM((q_pad, k_pad), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out_shape = (
        jax.ShapeDtypeStruct((q_pad, k_pad), jnp.float32),
        jax.ShapeDtypeStruct((q_pad, k_pad), jnp.int32),
    )
    top_s, top_i = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(block_ids.astype(jnp.int32), jnp.reshape(n_valid, (1,)).astype(jnp.int32), qq, qs, database_q, xs, b)
    return top_s[:qn, :k], top_i[:qn, :k]


@functools.partial(jax.jit, static_argnames=("k", "block_rows", "interpret"))
def pallas_ivf_topk_int4_dma(
    queries: jax.Array,
    database_p: jax.Array,
    db_scales: jax.Array,
    bias: jax.Array,
    block_ids: jax.Array,
    n_valid: jax.Array,
    k: int,
    *,
    block_rows: int = 4096,
    interpret: bool = False,
):
    """Double-buffered IVF search over int4-packed rows (int8 queries)."""
    from .topk import quantize_rows_int8

    qn, d2 = queries.shape[0], database_p.shape[1]
    d = 2 * d2
    n = database_p.shape[0]
    assert queries.shape[1] == d and n % block_rows == 0 and d2 % _LANE == 0

    q_pad = _round_up(max(qn, _SUBLANE), _SUBLANE)
    k_pad = _round_up(k, _LANE)
    qf = jnp.zeros((q_pad, d), jnp.float32).at[:qn].set(queries.astype(jnp.float32))
    qq, qs = quantize_rows_int8(qf)
    xs = db_scales.astype(jnp.float32).reshape(1, n)
    b = bias.astype(jnp.float32).reshape(1, n)

    kernel = functools.partial(
        _ivf_dma_kernel, k=k, block_rows=block_rows, packed=True
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # qq
            pl.BlockSpec(memory_space=pltpu.VMEM),  # qs
            pl.BlockSpec(memory_space=pltpu.ANY),  # packed X stays in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),  # scales
            pl.BlockSpec(memory_space=pltpu.ANY),  # bias
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, block_rows, d2), jnp.int8),
            pltpu.VMEM((2, 1, block_rows), jnp.float32),
            pltpu.VMEM((2, 1, block_rows), jnp.float32),
            pltpu.VMEM((q_pad, k_pad), jnp.float32),
            pltpu.VMEM((q_pad, k_pad), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out_shape = (
        jax.ShapeDtypeStruct((q_pad, k_pad), jnp.float32),
        jax.ShapeDtypeStruct((q_pad, k_pad), jnp.int32),
    )
    top_s, top_i = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(block_ids.astype(jnp.int32), jnp.reshape(n_valid, (1,)).astype(jnp.int32), qq, qs, database_p, xs, b)
    return top_s[:qn, :k], top_i[:qn, :k]


@functools.partial(jax.jit, static_argnames=("k", "block_rows"))
def xla_ivf_topk(queries, database, bias, block_ids, n_valid, k, *, block_rows: int = 1024):
    """Gather fallback: materialize probed blocks, brute-force them."""
    qn, d = queries.shape
    n = database.shape[0]
    nblocks = n // block_rows
    xb = database.reshape(nblocks, block_rows, d)
    bb = bias.reshape(nblocks, block_rows)
    max_blocks = block_ids.shape[0]
    sel_x = jnp.take(xb, block_ids, axis=0)  # [mb, B, d]
    sel_b = jnp.take(bb, block_ids, axis=0)  # [mb, B]
    pos = jnp.arange(max_blocks)
    valid = (pos < jnp.reshape(n_valid, ()))[:, None]
    sel_b = jnp.where(valid, sel_b, NEG_INF)
    q = queries.astype(jnp.bfloat16)
    scores = jnp.einsum(
        "qd,mbd->qmb", q, sel_x.astype(jnp.bfloat16), preferred_element_type=jnp.float32
    ) + sel_b[None]
    flat = scores.reshape(qn, max_blocks * block_rows)
    top_s, flat_i = jax.lax.top_k(flat, k)
    # flat index → global row: block_ids[i // B] * B + i % B
    bsel = flat_i // block_rows
    offs = flat_i % block_rows
    top_i = jnp.take(block_ids, bsel) * block_rows + offs
    return top_s, top_i.astype(jnp.int32)
