"""Residual re-ranking (VERDICT r2 item 3): on adversarial
(overlapping-cluster) data the exact re-score of a deeper candidate pool
recovers recall the quantized/pruned probe pass loses."""

import numpy as np

from youtu_rag_tpu.core.config import IndexConfig
from youtu_rag_tpu.core.types import Chunk
from youtu_rag_tpu.index.device_index import DeviceVectorIndex


def _overlapping_corpus(rng, n=4096, d=64, n_clusters=8, spread=1.5):
    centers = rng.standard_normal((n_clusters, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    cid = rng.integers(0, n_clusters, n)
    x = centers[cid] + (spread / np.sqrt(d)) * rng.standard_normal((n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x


def _recall(idx, queries, truth, k, **search_kw):
    # compare by chunk id: build_ivf cluster-sorts rows, so insertion
    # indices and device rows diverge
    got = idx.search(queries, top_k=k, **search_kw)
    hits = 0
    for qi, res in enumerate(got):
        ids = {c.id for c, _ in res}
        hits += len(ids & {f"c{j}" for j in truth[qi]})
    return hits / (len(got) * k)


def _ground_truth(x, queries, k):
    s = queries @ x.T
    return np.argsort(-s, axis=1)[:, :k]


def test_residual_rerank_recovers_int8_recall(rng):
    d, k = 64, 10
    x = _overlapping_corpus(rng, n=4096, d=d)
    # off-center queries: perturbed db POINTS (not cluster centers)
    qsrc = x[rng.integers(0, len(x), 16)]
    queries = qsrc + (1.0 / np.sqrt(d)) * rng.standard_normal((16, d)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    truth = _ground_truth(x, queries, k)
    chunks = [Chunk(f"c{i}", f"d{i}", "", 0) for i in range(len(x))]

    def build(mult):
        cfg = IndexConfig(
            storage_dtype="int8", block_rows=128, min_capacity=4096,
            n_lists=16, n_probe=16, ivf_rerank_multiplier=mult,
        )
        idx = DeviceVectorIndex(d, cfg)
        idx.add(chunks, x)
        idx.build_ivf()
        return idx

    # full probe coverage isolates the quantization-ordering loss
    plain = _recall(build(0.0), queries, truth, k, backend="xla")
    rerank = _recall(build(4.0), queries, truth, k, backend="xla")
    assert plain < 1.0, "overlap corpus not adversarial enough to mean anything"
    assert rerank >= plain
    assert rerank >= 0.95, (plain, rerank)


def test_rerank_results_are_exactly_ordered(rng):
    """Reranked scores must be the exact f32 dot of dequantized rows —
    descending, and matching a host-side recompute."""
    d, k = 32, 5
    x = _overlapping_corpus(rng, n=1024, d=d, n_clusters=4)
    queries = x[:4] + 0.02 * rng.standard_normal((4, d)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    chunks = [Chunk(f"c{i}", f"d{i}", "", 0) for i in range(len(x))]
    cfg = IndexConfig(
        storage_dtype="int8", block_rows=128, min_capacity=1024,
        n_lists=8, n_probe=8, ivf_rerank_multiplier=4.0,
    )
    idx = DeviceVectorIndex(d, cfg)
    idx.add(chunks, x)
    idx.build_ivf()
    deq = np.asarray(idx.dequantized_vectors())[: idx.size, :d]
    for qi, res in enumerate(idx.search(queries, top_k=k, backend="xla")):
        scores = [s for _, s in res]
        assert scores == sorted(scores, reverse=True)
        for c, s in res:
            row = idx._id_to_row[c.id]
            want = float(queries[qi] @ deq[row])
            np.testing.assert_allclose(s, want, atol=1e-4)


def test_rerank_respects_filters_and_tombstones(rng):
    d, k = 32, 5
    x = _overlapping_corpus(rng, n=512, d=d, n_clusters=4)
    chunks = [
        Chunk(f"c{i}", f"d{i}", "", 0, metadata={"kind": "a" if i % 2 else "b"})
        for i in range(len(x))
    ]
    cfg = IndexConfig(
        storage_dtype="int8", block_rows=128, min_capacity=512,
        n_lists=4, n_probe=4, ivf_rerank_multiplier=4.0,
    )
    idx = DeviceVectorIndex(d, cfg)
    idx.add(chunks, x)
    idx.build_ivf()
    idx.delete([f"c{i}" for i in range(0, 64)])
    res = idx.search(x[:2], top_k=k, filters={"kind": "a"}, backend="xla")
    for hits in res:
        assert hits, "filtered rerank returned nothing"
        for c, _ in hits:
            assert c.metadata["kind"] == "a"
            assert int(c.id[1:]) >= 64
