import time
import numpy as np
from youtu_rag_tpu.core.config import IndexConfig
from youtu_rag_tpu.core.types import Chunk
from youtu_rag_tpu.index.device_index import DeviceVectorIndex


def _add(idx, n, start, rng, d):
    v = rng.normal(size=(n, d)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    idx.add([Chunk(f"c{start+i}", "d", "", start + i, {}) for i in range(n)], v)


def test_warm_triggers_and_growth_correct(rng):
    d = 32
    idx = DeviceVectorIndex(d, IndexConfig(min_capacity=128, block_rows=64))
    _add(idx, 64, 0, rng, d)
    q = rng.normal(size=(2, d)).astype(np.float32)
    idx.search(q, top_k=5)  # records the signature
    assert idx._seen_sigs
    _add(idx, 40, 64, rng, d)  # 104/128 > 75% -> warm kicks off
    assert any(cap == 256 for cap, _ in idx._warmed)
    for _ in range(100):
        if idx._warm_stats["tiers"] >= 1:
            break
        time.sleep(0.05)
    assert idx._warm_stats["tiers"] >= 1 and idx._warm_stats["kernels"] >= 1
    # growth then search still correct
    _add(idx, 64, 104, rng, d)
    assert idx.capacity == 256
    hits = idx.search(q, top_k=5)
    assert len(hits[0]) == 5


def test_warm_without_searches_covers_appends_only(rng):
    d = 32
    idx = DeviceVectorIndex(d, IndexConfig(min_capacity=128, block_rows=64))
    _add(idx, 120, 0, rng, d)  # >75%, no search signatures recorded yet
    # append-bucket kernels warm (post-growth adds must not compile under
    # the lock); no search kernels without a recorded signature
    assert all(kind == "bucket" for _, (kind, _it) in idx._warmed)


def test_warm_int8(rng):
    d = 32
    idx = DeviceVectorIndex(d, IndexConfig(min_capacity=128, block_rows=64, storage_dtype="int8"))
    _add(idx, 64, 0, rng, d)
    idx.search(np.eye(1, d, dtype=np.float32), top_k=3)
    _add(idx, 40, 64, rng, d)
    for _ in range(100):
        if idx._warm_stats["tiers"] >= 1:
            break
        time.sleep(0.05)
    assert idx._warm_stats["kernels"] >= 1
