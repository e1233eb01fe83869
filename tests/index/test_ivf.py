"""IVF probed search: recall vs brute force, filters, fresh-tail appends."""

import numpy as np
import pytest

from youtu_rag_tpu.core.config import IndexConfig
from youtu_rag_tpu.core.types import Chunk
from youtu_rag_tpu.index.device_index import DeviceVectorIndex


def _clustered_data(rng, n_clusters, per_cluster, d):
    centers = rng.normal(size=(n_clusters, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs = []
    for c in centers:
        pts = c[None] + 0.15 * rng.normal(size=(per_cluster, d)).astype(np.float32)
        vecs.append(pts / np.linalg.norm(pts, axis=1, keepdims=True))
    return np.concatenate(vecs), centers


@pytest.fixture(scope="module")
def ivf_index():
    rng = np.random.default_rng(7)
    d = 64
    vecs, centers = _clustered_data(rng, 16, 128, d)  # 2048 rows
    cfg = IndexConfig(min_capacity=2048, block_rows=64, n_lists=16, n_probe=4, kmeans_iters=8)
    idx = DeviceVectorIndex(d, cfg)
    chunks = [Chunk(f"c{i}", f"doc{i % 8}", f"t{i}", i, {"i": i}) for i in range(len(vecs))]
    idx.add(chunks, vecs)
    brute = {}
    queries = centers[:8] + 0.05 * rng.normal(size=(8, d)).astype(np.float32)
    for qi, q in enumerate(queries):
        hits = idx.search(q[None], top_k=10)[0]
        brute[qi] = [c.id for c, _ in hits]
    idx.build_ivf()
    return idx, queries, brute


def test_ivf_recall_at_10(ivf_index):
    idx, queries, brute = ivf_index
    recalls = []
    for qi, q in enumerate(queries):
        hits = idx.search(q[None], top_k=10)[0]
        got = [c.id for c, _ in hits]
        recalls.append(len(set(got) & set(brute[qi])) / 10)
    assert np.mean(recalls) >= 0.95, recalls


def test_ivf_pallas_interpret_matches_xla(ivf_index):
    idx, queries, _ = ivf_index
    a = idx.search(queries[:2], top_k=5, backend="xla")
    b = idx.search(queries[:2], top_k=5, backend="pallas_interpret")
    for ha, hb in zip(a, b):
        assert [c.id for c, _ in ha] == [c.id for c, _ in hb]


def test_ivf_with_filters(ivf_index):
    idx, queries, _ = ivf_index
    hits = idx.search(queries[:1], top_k=5, filters={"i": {"$lt": 500}})[0]
    assert hits and all(c.metadata["i"] < 500 for c, _ in hits)


def test_ivf_fresh_tail_append():
    rng = np.random.default_rng(11)
    d = 64
    vecs, centers = _clustered_data(rng, 8, 64, d)
    cfg = IndexConfig(min_capacity=512, block_rows=64, n_lists=8, n_probe=2, kmeans_iters=6)
    idx = DeviceVectorIndex(d, cfg)
    idx.add([Chunk(f"c{i}", "doc", f"t{i}", i) for i in range(len(vecs))], vecs)
    idx.build_ivf()

    # append a brand-new off-cluster vector AFTER the freeze
    novel = rng.normal(size=(1, d)).astype(np.float32)
    novel /= np.linalg.norm(novel)
    idx.add([Chunk("novel", "newdoc", "novel", 0)], novel)
    hits = idx.search(novel, top_k=1)[0]
    assert hits[0][0].id == "novel"  # tail block probed despite no cluster


def test_ivf_delete_tombstone():
    rng = np.random.default_rng(13)
    d = 64
    vecs, centers = _clustered_data(rng, 4, 64, d)
    cfg = IndexConfig(min_capacity=256, block_rows=64, n_lists=4, n_probe=2, kmeans_iters=6)
    idx = DeviceVectorIndex(d, cfg)
    idx.add([Chunk(f"c{i}", "doc", f"t{i}", i) for i in range(len(vecs))], vecs)
    idx.build_ivf()
    q = vecs[:1]
    top = idx.search(q, top_k=1)[0][0][0]
    idx.delete([top.id])
    after = idx.search(q, top_k=1)[0]
    assert after[0][0].id != top.id


def test_reorder_preserves_lookup(rng, unit_vectors):
    d = 32
    idx = DeviceVectorIndex(d, IndexConfig(min_capacity=128, block_rows=64))
    vecs = unit_vectors(rng, 60, d)
    idx.add([Chunk(f"c{i}", f"d{i%3}", f"t{i}", i, {"i": i}) for i in range(60)], vecs)
    before = idx.search(vecs[:3], top_k=3)
    perm = np.random.default_rng(0).permutation(idx.size)
    idx.reorder(perm)
    after = idx.search(vecs[:3], top_k=3)
    for b, a in zip(before, after):
        assert [c.id for c, _ in b] == [c.id for c, _ in a]
    assert idx.get_by_id("c5").content == "t5"
    assert idx.delete_by_document_id("d0") == 20


@pytest.mark.parametrize("dtype", ["bfloat16", "int8"])
def test_host_staged_reorder_parity(rng, unit_vectors, monkeypatch, dtype):
    """When 2x index bytes exceed device memory, reorder stages through
    the host (pull → free → permute → push). Force the path and assert
    identical search results to the device gather."""
    d = 32
    cfg = IndexConfig(min_capacity=128, block_rows=64, storage_dtype=dtype)
    vecs = unit_vectors(rng, 60, d)
    chunks = [Chunk(f"c{i}", f"d{i % 3}", f"t{i}", i, {"i": i}) for i in range(60)]
    perm = np.random.default_rng(1).permutation(60)

    dev = DeviceVectorIndex(d, cfg)
    dev.add(chunks, vecs)
    dev.reorder(perm)
    want = dev.search(vecs[:3], top_k=3)

    host = DeviceVectorIndex(d, cfg)
    host.add(chunks, vecs)
    monkeypatch.setattr(host, "_should_stage_reorder", lambda: True)
    host.reorder(perm)
    got = host.search(vecs[:3], top_k=3)

    for g, w in zip(got, want):
        assert [c.id for c, _ in g] == [c.id for c, _ in w]
        for (_, gs), (_, ws) in zip(g, w):
            assert abs(gs - ws) < 2e-3  # bf16 round-trip through f32
    assert host.get_by_id("c5").content == "t5"
    # and IVF builds fine on top of a host-staged reorder
    host.build_ivf(n_lists=4)
    hit = host.search(vecs[:1], top_k=1)[0][0][0]
    assert hit.id == "c0"


def test_stage_reorder_heuristic(monkeypatch):
    """Free-memory-aware staging decision: uses bytes_in_use when
    reported, falls back to the 2.5x-vs-limit rule, tolerates stats
    errors, honors YRT_HBM_BYTES."""
    idx = DeviceVectorIndex(32, IndexConfig(min_capacity=128, block_rows=64))

    class Dev:
        platform = "tpu"

        def __init__(self, stats=None, raise_=False):
            self._stats, self._raise = stats, raise_

        def memory_stats(self):
            if self._raise:
                raise RuntimeError("UNIMPLEMENTED")
            return self._stats

    total = idx.nbytes()
    # plenty of free memory → device path
    idx._device = Dev({"bytes_limit": 100 * total, "bytes_in_use": total})
    assert idx._should_stage_reorder() is False
    # tight free memory despite a big limit → host staging
    idx._device = Dev({"bytes_limit": 100 * total, "bytes_in_use": int(99.5 * total)})
    assert idx._should_stage_reorder() is True
    # no usage info: 2.5x rule against the limit
    idx._device = Dev({"bytes_limit": 2 * total})
    assert idx._should_stage_reorder() is True
    idx._device = Dev({"bytes_limit": 10 * total})
    assert idx._should_stage_reorder() is False
    # stats raising on a TPU backend still reaches the default/env limit
    monkeypatch.setenv("YRT_HBM_BYTES", str(2 * total))
    idx._device = Dev(raise_=True)
    assert idx._should_stage_reorder() is True
    monkeypatch.setenv("YRT_HBM_BYTES", "not-a-number")
    assert idx._should_stage_reorder() is False  # falls back to 16 GB


def test_ivf_int8_index():
    """int8 storage + IVF (DMA kernel path; XLA dequant fallback on CPU)."""
    rng = np.random.default_rng(21)
    d = 64
    centers = rng.normal(size=(8, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    parts = []
    for c in centers:  # tight clusters: IVF-recall test, not a stress test
        pts = c[None] + 0.05 * rng.normal(size=(64, d)).astype(np.float32)
        parts.append(pts / np.linalg.norm(pts, axis=1, keepdims=True))
    vecs = np.concatenate(parts)
    cfg = IndexConfig(
        min_capacity=512, block_rows=64, n_lists=8, n_probe=3, kmeans_iters=6,
        storage_dtype="int8",
    )
    idx = DeviceVectorIndex(d, cfg)
    idx.add([Chunk(f"c{i}", "doc", f"t{i}", i, {"i": i}) for i in range(len(vecs))], vecs)
    q = centers[:4] + 0.05 * rng.normal(size=(4, d)).astype(np.float32)
    brute = [[c.id for c, _ in h] for h in idx.search(q, top_k=5)]
    idx.build_ivf()
    ivf = [[c.id for c, _ in h] for h in idx.search(q, top_k=5)]
    recalls = [len(set(a) & set(b)) / 5 for a, b in zip(brute, ivf)]
    assert np.mean(recalls) >= 0.9, recalls
    # interpret-mode pallas path agrees with the xla fallback
    a = idx.search(q[:1], top_k=5, backend="xla")[0]
    b = idx.search(q[:1], top_k=5, backend="pallas_interpret")[0]
    assert [c.id for c, _ in a] == [c.id for c, _ in b]
    # filters still fused
    hits = idx.search(q[:1], top_k=5, filters={"i": {"$lt": 100}})[0]
    assert hits and all(c.metadata["i"] < 100 for c, _ in hits)


# -- adaptive nprobe ---------------------------------------------------------


def test_adaptive_probe_shrinks_block_list(rng, unit_vectors):
    """probe_blocks with a tight margin probes fewer blocks for a query
    sitting on one cluster; recall-critical clusters survive via min_probe."""
    import jax.numpy as jnp

    from youtu_rag_tpu.index.ivf import probe_blocks

    d = 32
    cents = unit_vectors(rng, 8, d)
    bstart = jnp.arange(8, dtype=jnp.int32) * 4
    bcnt = jnp.full(8, 4, jnp.int32)
    q = jnp.asarray(cents[2:3])  # exactly on centroid 2

    common = dict(
        n_probe=6, max_cluster_blocks=4, total_blocks=32,
        frozen_blocks=jnp.int32(32), max_blocks=32,
    )
    _, n_fixed = probe_blocks(q, jnp.asarray(cents), bstart, bcnt, **common)
    ids_a, n_adapt = probe_blocks(
        q, jnp.asarray(cents), bstart, bcnt,
        adaptive_margin=jnp.float32(0.05), min_probe=jnp.int32(1), **common,
    )
    assert int(n_fixed) == 24  # 6 clusters x 4 blocks
    assert int(n_adapt) == 4  # only cluster 2 within margin
    assert sorted(np.asarray(ids_a[:4]).tolist()) == [8, 9, 10, 11]

    # min_probe floors the kept set even with margin 0
    _, n_floor = probe_blocks(
        q, jnp.asarray(cents), bstart, bcnt,
        adaptive_margin=jnp.float32(0.0), min_probe=jnp.int32(3), **common,
    )
    assert int(n_floor) == 12


def test_adaptive_ivf_search_recall(rng):
    """End-to-end: adaptive margin keeps recall on clustered data while
    probing less than the fixed plan for on-cluster queries."""
    d = 64
    vecs, centers = _clustered_data(rng, 16, 128, d)
    cfg = IndexConfig(
        min_capacity=2048, block_rows=64, n_lists=16, n_probe=8,
        kmeans_iters=8, ivf_adaptive_margin=0.2, ivf_min_probe=2,
    )
    idx = DeviceVectorIndex(d, cfg)
    idx.add([Chunk(f"c{i}", "d", f"t{i}", i, {}) for i in range(len(vecs))], vecs)
    queries = centers[:8] + 0.05 * rng.normal(size=(8, d)).astype(np.float32)
    brute = [[c.id for c, _ in idx.search(q[None], top_k=10)[0]] for q in queries]
    idx.build_ivf()
    recalls = [
        len({c.id for c, _ in idx.search(q[None], top_k=10)[0]} & set(b)) / 10
        for q, b in zip(queries, brute)
    ]
    assert np.mean(recalls) >= 0.95, recalls


def test_dma_kernels_empty_probe_plan():
    """ADVICE r1: with n_valid == 0 the priming DMAs must not start —
    un-waited in-flight copies at kernel exit are undefined behavior."""
    import jax.numpy as jnp

    from youtu_rag_tpu.ops.ivf import pallas_ivf_topk_dma, pallas_ivf_topk_int8_dma
    from youtu_rag_tpu.ops.topk import NEG_INF, quantize_rows_int8

    rng = np.random.default_rng(5)
    n, d, br = 512, 128, 64
    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(2, d)).astype(np.float32))
    bias = jnp.zeros((n,), jnp.float32)
    ids = jnp.zeros((8,), jnp.int32)
    nv = jnp.int32(0)

    s, _ = pallas_ivf_topk_dma(q, x, bias, ids, nv, 5, block_rows=br, interpret=True)
    assert np.all(np.asarray(s) <= NEG_INF / 2)

    xq, xs = quantize_rows_int8(x)
    s8, _ = pallas_ivf_topk_int8_dma(
        q, xq, xs, bias, ids, nv, 5, block_rows=br, interpret=True
    )
    assert np.all(np.asarray(s8) <= NEG_INF / 2)


def test_nprobe_autotune_closed_loop(rng, unit_vectors):
    """ROADMAP r1 item 6: observed recall drives n_probe up until the
    target holds, and back down when over-provisioned."""
    from youtu_rag_tpu.core.config import IndexConfig
    from youtu_rag_tpu.core.types import Chunk
    from youtu_rag_tpu.index.device_index import DeviceVectorIndex

    d = 64
    # well-separated clusters: probing 1 list gives poor cross-cluster recall
    centers = unit_vectors(rng, 16, d)
    parts = []
    for c in centers:
        pts = c[None] + 0.05 * rng.normal(size=(64, d)).astype(np.float32)
        parts.append(pts / np.linalg.norm(pts, axis=1, keepdims=True))
    vecs = np.concatenate(parts)[rng.permutation(1024)]

    cfg = IndexConfig(
        min_capacity=1024, block_rows=64, n_lists=16, n_probe=1,
        kmeans_iters=8, ivf_recall_target=0.95, ivf_tune_interval=1,
        ivf_min_probe=2,
    )
    idx = DeviceVectorIndex(d, cfg)
    idx.add([Chunk(f"c{i}", "doc", f"t{i}", i, {}) for i in range(1024)], vecs)
    idx.build_ivf(n_lists=16)
    assert idx._ivf.n_probe == 1

    # single queries between clusters stress recall at n_probe=1 (batched
    # plans at this tiny scale cover every block and fall back to brute)
    q = unit_vectors(rng, 12, d)
    grew = []
    for i in range(12):
        idx.search(q[i : i + 1], top_k=10)
        grew.append(idx._ivf.n_probe)
        if (
            idx._ivf_recall_est is not None
            and idx._ivf_recall_est >= 0.95
            and idx._ivf.n_probe > 1
        ):
            break
    assert idx._ivf.n_probe > 1, grew
    assert idx._ivf_recall_est is not None and idx._ivf_recall_est >= 0.95, (
        idx._ivf_recall_est, grew)

    # over-provision: force max probing, then easy self-queries shrink it
    idx._ivf.n_probe = 16
    for _ in range(6):
        idx.search(vecs[:4], top_k=5)
        if idx._ivf.n_probe < 16:
            break
    assert idx._ivf.n_probe < 16

    # tuner state surfaces for the API/monitoring
    assert 0.0 <= idx._ivf_recall_est <= 1.0
