"""DeviceVectorIndex with storage_dtype='int4': add/search/delete/growth/
compact/snapshot, and the IVF / sharded gates."""

import numpy as np
import pytest

from youtu_rag_tpu.core.config import IndexConfig
from youtu_rag_tpu.core.types import Chunk
from youtu_rag_tpu.index.device_index import DeviceVectorIndex


def _chunks(n, prefix="c", doc="d"):
    return [Chunk(f"{prefix}{i}", doc, f"content {i}", i, {"i": i}) for i in range(n)]


def _vecs(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def _index(**kw):
    cfg = IndexConfig(storage_dtype="int4", min_capacity=256, block_rows=128, **kw)
    return DeviceVectorIndex(128, cfg)


def test_int4_add_search_recall():
    rng = np.random.default_rng(0)
    ix = _index()
    X = _vecs(rng, 200, 128)
    ix.add(_chunks(200), X)
    assert ix._vectors.shape[1] == ix.d_pad // 2  # packed width
    hits = ix.search(X[:4], top_k=5)
    # int4 self-similarity: the query's own row must rank first
    for qi, h in enumerate(hits):
        assert h[0][0].id == f"c{qi}"
        assert h[0][1] > 0.9


def test_int4_matches_f32_topk_mostly():
    rng = np.random.default_rng(1)
    ix = _index()
    X = _vecs(rng, 512, 128)
    ix.add(_chunks(512), X)
    Q = _vecs(rng, 4, 128)
    exact = np.argsort(-(Q @ X.T), axis=1)[:, :10]
    hits = ix.search(Q, top_k=10)
    recall = np.mean([
        len({int(h[0].id[1:]) for h in hits[qi]} & set(exact[qi])) / 10
        for qi in range(4)
    ])
    assert recall >= 0.6, recall


def test_int4_delete_and_filters():
    rng = np.random.default_rng(2)
    ix = _index()
    X = _vecs(rng, 64, 128)
    ix.add(_chunks(64), X)
    ix.delete(["c0", "c1"])
    hits = ix.search(X[:1], top_k=5)
    assert all(h[0].id not in ("c0", "c1") for h in hits[0])
    hits = ix.search(X[:1], top_k=5, filters={"i": {"$gte": 60}})
    assert hits[0] and all(h[0].metadata["i"] >= 60 for h in hits[0])


def test_int4_growth_and_compact():
    rng = np.random.default_rng(3)
    ix = _index()
    X = _vecs(rng, 600, 128)  # beyond min_capacity → growth
    ix.add(_chunks(600), X)
    assert ix.capacity >= 600 and ix._vectors.shape[1] == ix.d_pad // 2
    ix.delete([f"c{i}" for i in range(300)])
    ix.compact()
    assert ix.count() == 300
    hits = ix.search(X[599:600], top_k=1)
    assert hits[0][0][0].id == "c599"


def test_int4_dequantize_take_roundtrip():
    rng = np.random.default_rng(4)
    ix = _index()
    X = _vecs(rng, 32, 128)
    ix.add(_chunks(32), X)
    deq = np.asarray(ix.dequantize_take(np.arange(32)))[:, :128]
    # per-row scale bounds the quantization error
    err = np.abs(deq - X).max(axis=1)
    step = np.abs(X).max(axis=1) / 7.0
    assert np.all(err <= step * 0.5 + 1e-6)


def test_int4_snapshot_roundtrip(tmp_path):
    rng = np.random.default_rng(5)
    from youtu_rag_tpu.index.persistence import load_index, save_index

    ix = _index()
    X = _vecs(rng, 100, 128)
    ix.add(_chunks(100), X)
    save_index(ix, tmp_path / "snap")
    ix2 = load_index(tmp_path / "snap")
    assert ix2.count() == 100
    assert ix2.config.storage_dtype == "int4"
    h1 = ix.search(X[:2], top_k=3)
    h2 = ix2.search(X[:2], top_k=3)
    assert [[c.id for c, _ in row] for row in h1] == [[c.id for c, _ in row] for row in h2]


def test_int4_ivf_search():
    """IVF over packed storage: build clusters, probe, and compose with
    the host int8-shadow re-rank (residual on-device rerank is skipped —
    the shadow re-scores at higher precision)."""
    rng = np.random.default_rng(6)
    ix = DeviceVectorIndex(
        128, IndexConfig(storage_dtype="int4", min_capacity=2048, block_rows=128,
                         n_lists=8, n_probe=8)
    )
    X = _vecs(rng, 2048, 128)
    ix.add(_chunks(2048), X)
    ix.build_ivf(n_lists=8)
    assert ix._ivf is not None
    exact = np.argsort(-(X[:8] @ X.T), axis=1)[:, :10]
    hits = ix.search(X[:8], top_k=10)
    recall = np.mean([
        len({int(h[0].id[1:]) for h in hits[qi]} & set(exact[qi])) / 10
        for qi in range(8)
    ])
    assert recall >= 0.9, recall
    assert hits[0][0][0].id == "c0" and hits[0][0][1] > 0.98


def test_int4_sharded_ivf():
    from youtu_rag_tpu.parallel.mesh import get_mesh
    from youtu_rag_tpu.parallel.sharded_index import ShardedVectorIndex

    rng = np.random.default_rng(12)
    ix = ShardedVectorIndex(
        128, IndexConfig(storage_dtype="int4", min_capacity=1024, block_rows=128,
                         n_lists=8, n_probe=8),
        mesh=get_mesh({"db": 8}),
    )
    X = _vecs(rng, 1024, 128)
    ix.add(_chunks(1024), X)
    ix.build_ivf(n_lists=8)
    # full-probe config → exact results; host rerank gives int8 precision
    hits = ix.search(X[:4], top_k=5)
    for qi, row in enumerate(hits):
        assert row[0][0].id == f"c{qi}"
        assert row[0][1] > 0.98


def test_int4_sharded_constructs():
    # sharding is supported (tests/parallel/test_sharded_index.py covers
    # search); only IVF remains gated
    from youtu_rag_tpu.parallel.sharded_index import ShardedVectorIndex

    ix = ShardedVectorIndex(128, IndexConfig(storage_dtype="int4"))
    assert ix._vectors.shape[1] == ix.d_pad // 2


def test_int4_host_rerank_lifts_recall():
    rng = np.random.default_rng(7)
    X = _vecs(rng, 2048, 128)
    Q = _vecs(rng, 8, 128)
    exact = np.argsort(-(Q @ X.T), axis=1)[:, :10]

    def recall(ix):
        hits = ix.search(Q, top_k=10)
        return np.mean([
            len({int(h[0].id[1:]) for h in hits[qi]} & set(exact[qi])) / 10
            for qi in range(8)
        ])

    raw = DeviceVectorIndex(
        128, IndexConfig(storage_dtype="int4", min_capacity=2048, block_rows=128,
                         int4_rerank_multiplier=0.0)
    )
    raw.add(_chunks(2048), X)
    assert raw._host_q8 is None
    r_raw = recall(raw)

    two_stage = DeviceVectorIndex(
        128, IndexConfig(storage_dtype="int4", min_capacity=2048, block_rows=128)
    )
    two_stage.add(_chunks(2048), X)
    assert two_stage._host_q8 is not None
    r2 = recall(two_stage)
    assert r2 > r_raw, (r2, r_raw)
    assert r2 >= 0.95, r2  # int8-shadow rerank recovers the int4 floor


def test_int4_host_rerank_survives_growth_and_delete():
    rng = np.random.default_rng(8)
    ix = _index()
    X = _vecs(rng, 600, 128)
    ix.add(_chunks(600), X)  # forces growth past min_capacity
    ix.delete(["c5"])
    hits = ix.search(X[5:6], top_k=3)
    assert all(h[0].id != "c5" for h in hits[0])
    # self-hit for a live row still ranks first with rerank on
    hits = ix.search(X[100:101], top_k=3)
    assert hits[0][0][0].id == "c100"
    assert hits[0][0][1] > 0.98  # int8-precision score, not int4


def test_int4_packed_width_lane_aligned():
    """The PACKED width must be a lane multiple on TPU — dims whose
    128-padding is an odd lane count (128, 384, 640) pad to 2 lanes."""
    for dim in (128, 384, 768):
        ix = DeviceVectorIndex(
            dim, IndexConfig(storage_dtype="int4", min_capacity=256, block_rows=128)
        )
        assert ix._vec_cols % 128 == 0, (dim, ix._vec_cols)
        assert ix.d_pad >= dim


def test_int4_ivf_tuner_uses_pre_rerank_rows():
    """With host rerank on, the nprobe tuner must compare raw-int4 IVF
    rows against the raw-int4 brute shadow — at full probe coverage the
    observed recall is then 1.0 and n_probe never ratchets up."""
    rng = np.random.default_rng(13)
    ix = DeviceVectorIndex(
        128, IndexConfig(storage_dtype="int4", min_capacity=2048, block_rows=128,
                         n_lists=8, n_probe=8, ivf_recall_target=0.95,
                         ivf_tune_interval=1)
    )
    X = _vecs(rng, 2048, 128)
    ix.add(_chunks(2048), X)
    ix.build_ivf(n_lists=8)
    start_probe = ix._ivf.n_probe
    for i in range(6):
        ix.search(X[i * 4 : i * 4 + 4], top_k=10)
    assert ix._ivf_recall_est is not None and ix._ivf_recall_est >= 0.95, (
        ix._ivf_recall_est
    )
    assert ix._ivf.n_probe <= start_probe, (start_probe, ix._ivf.n_probe)
