"""int4-packed top-k path: pack/unpack round-trip, kernel parity vs the
dequantized reference, masking, and the XLA fallback."""

import numpy as np
import pytest

from youtu_rag_tpu.ops.topk import (
    NEG_INF,
    pallas_topk_int4_pruned,
    quantize_rows_int4,
    unpack_int4,
    xla_topk_int4,
)


def _unit(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    x = _unit(rng, 64, 256)
    packed, scales = quantize_rows_int4(x)
    packed = np.asarray(packed)
    assert packed.shape == (64, 128) and packed.dtype == np.int8
    nib = np.asarray(unpack_int4(packed))
    assert nib.shape == (64, 256)
    assert nib.min() >= -7 and nib.max() <= 7
    # dequantized values approximate the source within one quant step
    deq = nib.astype(np.float32) * np.asarray(scales)[:, None]
    step = np.asarray(scales)[:, None]
    assert np.all(np.abs(deq - x) <= step * 0.5 + 1e-6)


def _ref_int4_topk(Q, X, bias, k):
    """NumPy reference: same quantization of both sides, f32 scoring."""
    import jax.numpy as jnp

    from youtu_rag_tpu.ops.topk import quantize_rows_int8

    packed, xs = quantize_rows_int4(X)
    nib = np.asarray(unpack_int4(np.asarray(packed))).astype(np.float32)
    qq, qs = quantize_rows_int8(jnp.asarray(Q, jnp.float32))
    qq, qs = np.asarray(qq, np.float32), np.asarray(qs)
    scores = (qq @ nib.T) * (qs[:, None] * np.asarray(xs)[None, :]) + bias[None, :]
    idx = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(scores, idx, axis=1), idx


@pytest.mark.parametrize("backend", ["xla", "pallas_interpret"])
@pytest.mark.parametrize("q,k", [(1, 4), (8, 16)])
def test_int4_topk_parity(backend, q, k):
    rng = np.random.default_rng(1)
    N, d = 1024, 256
    X = _unit(rng, N, d)
    Q = _unit(rng, q, d)
    bias = np.zeros(N, np.float32)
    bias[::5] = NEG_INF

    ref_s, _ = _ref_int4_topk(Q, X, bias, k)
    packed, xs = quantize_rows_int4(X)
    if backend == "xla":
        s, i = xla_topk_int4(Q, packed, xs, bias, k)
    else:
        s, i = pallas_topk_int4_pruned(
            Q, packed, xs, bias, k, block_rows=256, interpret=True
        )
    np.testing.assert_allclose(np.asarray(s), ref_s, atol=1e-4, rtol=1e-4)
    assert np.all(np.asarray(i) % 5 != 0)  # masked rows never surface


def test_int4_recall_vs_exact():
    """int4 scoring recalls most of the exact top-10 on unit vectors —
    the quantization floor the adversarial harness then quantifies."""
    rng = np.random.default_rng(2)
    N, d, k = 4096, 256, 10
    X = _unit(rng, N, d)
    Q = _unit(rng, 8, d)
    bias = np.zeros(N, np.float32)
    exact = np.argsort(-(Q @ X.T), axis=1)[:, :k]
    packed, xs = quantize_rows_int4(X)
    _, got = xla_topk_int4(Q, packed, xs, bias, k)
    got = np.asarray(got)
    recall = np.mean([
        len(set(exact[r]) & set(got[r])) / k for r in range(Q.shape[0])
    ])
    assert recall >= 0.6, recall  # int4 floor; rerank recovers the rest
