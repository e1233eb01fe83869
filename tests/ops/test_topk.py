import numpy as np
import pytest

from youtu_rag_tpu.ops.topk import NEG_INF, pallas_topk, xla_topk


def _ref_topk(Q, X, bias, k):
    import jax.numpy as jnp

    Qb = np.asarray(jnp.asarray(Q, jnp.bfloat16).astype(jnp.float32))
    Xb = np.asarray(jnp.asarray(X, jnp.bfloat16).astype(jnp.float32))
    scores = Qb @ Xb.T + bias[None, :]
    idx = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(scores, idx, axis=1), idx


@pytest.mark.parametrize("backend", ["xla", "pallas_interpret"])
@pytest.mark.parametrize("q,k", [(1, 1), (3, 10), (16, 32)])
def test_topk_matches_numpy(rng, unit_vectors, backend, q, k):
    N, d = 2048, 128
    X = unit_vectors(rng, N, d)
    Q = unit_vectors(rng, q, d)
    bias = np.zeros(N, np.float32)
    bias[::7] = NEG_INF

    ref_s, ref_i = _ref_topk(Q, X, bias, k)
    if backend == "xla":
        s, i = xla_topk(Q, X, bias, k)
    else:
        s, i = pallas_topk(Q, X, bias, k, block_rows=512, interpret=True)
    np.testing.assert_allclose(np.asarray(s), ref_s, atol=2e-3)
    # indices may differ on near-ties after bf16; require score agreement
    got_scores = np.take_along_axis(
        np.asarray(
            np.asarray(Q, np.float32) @ np.asarray(X, np.float32).T + bias[None, :], np.float32
        ),
        np.asarray(i),
        axis=1,
    )
    np.testing.assert_allclose(got_scores, ref_s, atol=5e-3)


def test_masked_rows_never_returned(rng, unit_vectors):
    N, d, k = 1024, 128, 20
    X = unit_vectors(rng, N, d)
    Q = unit_vectors(rng, 2, d)
    bias = np.full(N, NEG_INF, np.float32)
    allowed = [5, 99, 763]
    bias[allowed] = 0.0
    s, i = pallas_topk(Q, X, bias, k, block_rows=512, interpret=True)
    s, i = np.asarray(s), np.asarray(i)
    valid = s > NEG_INF / 2
    assert set(i[valid].tolist()) <= set(allowed)
    assert valid.sum(axis=1).tolist() == [3, 3]


def test_tie_break_lowest_index(rng):
    d = 128
    v = np.zeros((1, d), np.float32)
    v[0, 0] = 1.0
    X = np.tile(v, (512, 1))  # identical rows → all tie
    Q = v.copy()
    bias = np.zeros(512, np.float32)
    s, i = pallas_topk(Q, X, bias, 5, block_rows=256, interpret=True)
    assert np.asarray(i)[0].tolist() == [0, 1, 2, 3, 4]


def test_all_masked(rng, unit_vectors):
    N, d = 512, 128
    X = unit_vectors(rng, N, d)
    Q = unit_vectors(rng, 1, d)
    bias = np.full(N, NEG_INF, np.float32)
    s, i = xla_topk(Q, X, bias, 5)
    assert (np.asarray(s) <= NEG_INF / 2).all()


def test_kmeans_partitions(rng, unit_vectors):
    from youtu_rag_tpu.ops.kmeans import kmeans_assign, kmeans_fit

    # two well-separated clouds must map to distinct centroids
    a = unit_vectors(rng, 100, 64) * 0.1
    a[:, 0] += 1.0
    b = unit_vectors(rng, 100, 64) * 0.1
    b[:, 1] += 1.0
    x = np.concatenate([a, b])
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    cent = kmeans_fit(x, 2, iters=8)
    assign = np.asarray(kmeans_assign(x, cent))
    assert len(set(assign[:100])) == 1
    assert len(set(assign[100:])) == 1
    assert assign[0] != assign[150]
