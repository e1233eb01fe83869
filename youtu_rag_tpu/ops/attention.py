"""Blockwise attention kernel for the encoder forward.

XLA's attention materializes the [B, H, T, T] score tensor in HBM; this
kernel keeps each query block's scores in VMEM: grid over
(batch·heads, query blocks), K/V for the head live in VMEM (T·hd·bf16 —
1 MB at T=4096), softmax(QKᵀ+bias)·V computed per tile on the MXU. At
encoder scale (T ≤ 4k) the full-T score row fits VMEM, so no online
softmax bookkeeping is needed — HBM touches only Q/K/V/O.

Forward-only: the embedder serves inference; training uses the XLA path
(remat handles memory there). Select via EncoderConfig.attention_impl."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float):
    q = q_ref[0]  # [BQ, hd]
    k = k_ref[0]  # [T, hd]
    v = v_ref[0]  # [T, hd]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BQ, T]
    s = s * scale + bias_ref[0]  # [1, T] broadcast
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=1, keepdims=True)
    p = (p / denom).astype(v.dtype)
    o_ref[0] = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "interpret"))
def blockwise_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: jax.Array,
    *,
    block_q: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """softmax(q·kᵀ·scale + bias)·v without HBM score materialization.

    Args:
      q, k, v: [B, H, T, hd] (hd multiple of 64; T multiple of block_q)
      bias:    [B, T] additive mask bias (-inf for padding), broadcast
               over heads and query positions.
    Returns:   [B, H, T, hd] in q.dtype.
    """
    b, h, t, hd = q.shape
    assert k.shape == v.shape == (b, h, t, hd)
    block_q = min(block_q, t)
    assert t % block_q == 0, (t, block_q)
    scale = 1.0 / (hd**0.5)

    bh = b * h
    qf = q.reshape(bh, t, hd)
    kf = k.reshape(bh, t, hd)
    vf = v.reshape(bh, t, hd)
    # bias per (b,h) row: repeat across heads without materializing [B,H,T]
    bias_f = jnp.repeat(bias.astype(jnp.float32), h, axis=0).reshape(bh, 1, t)

    grid = (bh, t // block_q)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, hd), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, hd), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, hd), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, hd), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, t, hd), q.dtype),
        interpret=interpret,
    )(qf, kf, vf, bias_f)
    return out.reshape(b, h, t, hd)
