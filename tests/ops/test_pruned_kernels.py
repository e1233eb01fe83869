"""Pruned-kernel parity (interpret mode on CPU)."""

import numpy as np
import pytest

from youtu_rag_tpu.ops.topk import (
    NEG_INF,
    pallas_topk,
    pallas_topk_int8,
    pallas_topk_int8_pruned,
    pallas_topk_pruned,
    quantize_rows_int8,
)


@pytest.fixture
def data(rng, unit_vectors):
    N, d = 2048, 128
    X = unit_vectors(rng, N, d)
    Q = unit_vectors(rng, 5, d)
    bias = np.zeros(N, np.float32)
    bias[::5] = NEG_INF
    return Q, X, bias


def test_pruned_matches_baseline(data):
    Q, X, bias = data
    s1, i1 = pallas_topk(Q, X, bias, 10, block_rows=512, interpret=True)
    s2, i2 = pallas_topk_pruned(Q, X, bias, 10, block_rows=512, interpret=True)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-5)


def test_int8_pruned_matches_int8(data):
    import jax.numpy as jnp

    Q, X, bias = data
    Xq, Xs = quantize_rows_int8(jnp.asarray(X))
    s1, i1 = pallas_topk_int8(Q, Xq, Xs, bias, 10, block_rows=512, interpret=True)
    s2, i2 = pallas_topk_int8_pruned(Q, Xq, Xs, bias, 10, block_rows=512, interpret=True)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-5)


def test_pruned_all_masked(data):
    Q, X, _ = data
    bias = np.full(X.shape[0], NEG_INF, np.float32)
    s, i = pallas_topk_pruned(Q, X, bias, 5, block_rows=512, interpret=True)
    assert (np.asarray(s) <= NEG_INF / 2).all()


def test_ivf_dma_matches_grid_kernel(data):
    import jax.numpy as jnp

    from youtu_rag_tpu.ops.ivf import pallas_ivf_topk_int8, pallas_ivf_topk_int8_dma

    Q, X, bias = data
    Xq, Xs = quantize_rows_int8(jnp.asarray(X))
    ids = jnp.asarray(np.array([0, 2, 3, 1, 0, 0, 0, 0], np.int32))
    nv = jnp.asarray([4], jnp.int32)
    s1, i1 = pallas_ivf_topk_int8(Q, Xq, Xs, bias, ids, nv, 10, block_rows=512, interpret=True)
    s2, i2 = pallas_ivf_topk_int8_dma(Q, Xq, Xs, bias, ids, nv, 10, block_rows=512, interpret=True)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-4)


def test_ivf_bf16_dma_matches_grid_kernel(data):
    import jax.numpy as jnp

    from youtu_rag_tpu.ops.ivf import pallas_ivf_topk, pallas_ivf_topk_dma

    Q, X, bias = data
    ids = jnp.asarray(np.array([0, 2, 3, 1, 0, 0, 0, 0], np.int32))
    nv = jnp.asarray([4], jnp.int32)
    s1, i1 = pallas_ivf_topk(Q, X, bias, ids, nv, 10, block_rows=512, interpret=True)
    s2, i2 = pallas_ivf_topk_dma(Q, X, bias, ids, nv, 10, block_rows=512, interpret=True)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-4)


def test_ivf_int4_dma_matches_xla_reference():
    """int4-packed IVF DMA kernel vs an XLA reference over the same
    packed+dequantized values (probed blocks only)."""
    import jax.numpy as jnp

    from youtu_rag_tpu.ops.ivf import pallas_ivf_topk_int4_dma, xla_ivf_topk
    from youtu_rag_tpu.ops.topk import quantize_rows_int4, quantize_rows_int8, unpack_int4

    # d=256: the packed width (d/2) must be lane-aligned for this kernel
    rng = np.random.default_rng(11)
    X = rng.standard_normal((2048, 256)).astype(np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    Q = rng.standard_normal((5, 256)).astype(np.float32)
    Q /= np.linalg.norm(Q, axis=1, keepdims=True)
    bias = np.zeros(2048, np.float32)
    bias[::5] = NEG_INF
    Xp, Xs = quantize_rows_int4(jnp.asarray(X))
    ids = jnp.asarray(np.array([0, 2, 3, 1, 0, 0, 0, 0], np.int32))
    nv = jnp.asarray([4], jnp.int32)
    s2, i2 = pallas_ivf_topk_int4_dma(Q, Xp, Xs, bias, ids, nv, 10, block_rows=512, interpret=True)
    # reference: dequantize the SAME stored values, brute the probed blocks
    qq, qs = quantize_rows_int8(jnp.asarray(Q, jnp.float32))
    deq = (
        np.asarray(unpack_int4(np.asarray(Xp))).astype(np.float32)
        * np.asarray(Xs)[:, None]
    )
    qd = np.asarray(qq, np.float32) * np.asarray(qs)[:, None]
    scores = qd @ deq.T + bias[None, :]
    probed = np.zeros_like(scores, dtype=bool)
    for b in (0, 2, 3, 1):
        probed[:, b * 512 : (b + 1) * 512] = True
    scores = np.where(probed, scores, -np.inf)
    ref_i = np.argsort(-scores, axis=1, kind="stable")[:, :10]
    ref_s = np.take_along_axis(scores, ref_i, axis=1)
    np.testing.assert_allclose(np.asarray(s2), ref_s, rtol=2e-4, atol=2e-4)
