"""int8 quantized storage: recall vs float oracle, lifecycle, persistence."""

import numpy as np
import pytest

from youtu_rag_tpu.core.config import IndexConfig
from youtu_rag_tpu.core.types import Chunk
from youtu_rag_tpu.index.device_index import DeviceVectorIndex
from youtu_rag_tpu.index.numpy_ref import NumpyVectorIndex


def _chunks(n):
    return [Chunk(f"c{i}", f"d{i % 4}", f"t{i}", i, {"i": i}) for i in range(n)]


@pytest.fixture
def pair8(rng, unit_vectors):
    d = 64
    cfg = IndexConfig(min_capacity=256, block_rows=128, storage_dtype="int8")
    dev = DeviceVectorIndex(d, cfg)
    ref = NumpyVectorIndex(d, cfg)
    embs = unit_vectors(rng, 300, d)
    dev.add(_chunks(300), embs)
    ref.add(_chunks(300), embs)
    return dev, ref


def test_int8_recall(pair8, rng, unit_vectors):
    dev, ref = pair8
    q = unit_vectors(rng, 10, dev.dim)
    got = dev.search(q, top_k=10)
    want = ref.search(q, top_k=10)
    recalls = [
        len({c.id for c, _ in g} & {c.id for c, _ in w}) / 10 for g, w in zip(got, want)
    ]
    assert np.mean(recalls) >= 0.9, recalls


def test_int8_scores_close(pair8, rng, unit_vectors):
    dev, ref = pair8
    q = unit_vectors(rng, 3, dev.dim)
    got = dev.search(q, top_k=3)
    want = ref.search(q, top_k=3)
    for g, w in zip(got, want):
        np.testing.assert_allclose(
            [s for _, s in g], [s for _, s in w], atol=0.05
        )


def test_int8_pallas_interpret_matches_xla(pair8, rng, unit_vectors):
    dev, _ = pair8
    q = unit_vectors(rng, 2, dev.dim)
    a = dev.search(q, top_k=5, backend="xla")
    b = dev.search(q, top_k=5, backend="pallas_interpret")
    for ha, hb in zip(a, b):
        assert [c.id for c, _ in ha] == [c.id for c, _ in hb]


def test_int8_filters_and_delete(pair8, rng, unit_vectors):
    dev, _ = pair8
    q = unit_vectors(rng, 1, dev.dim)
    hits = dev.search(q, top_k=5, filters={"i": {"$lt": 50}})[0]
    assert hits and all(c.metadata["i"] < 50 for c, _ in hits)
    victim = hits[0][0].id
    dev.delete([victim])
    after = dev.search(q, top_k=5, filters={"i": {"$lt": 50}})[0]
    assert victim not in [c.id for c, _ in after]


def test_int8_memory_halved(rng, unit_vectors):
    d = 128
    bf = DeviceVectorIndex(d, IndexConfig(min_capacity=1024, block_rows=128, storage_dtype="bfloat16"))
    q8 = DeviceVectorIndex(d, IndexConfig(min_capacity=1024, block_rows=128, storage_dtype="int8"))
    assert q8._vectors.nbytes == bf._vectors.nbytes // 2


def test_int8_persistence_roundtrip(pair8, tmp_path, rng, unit_vectors):
    from youtu_rag_tpu.index.persistence import load_index, save_index

    dev, _ = pair8
    save_index(dev, tmp_path / "snap8")
    restored = load_index(tmp_path / "snap8")
    assert restored.config.storage_dtype == "int8"
    assert restored.count() == dev.count()
    q = unit_vectors(rng, 2, dev.dim)
    a = dev.search(q, top_k=5)
    b = restored.search(q, top_k=5)
    for ha, hb in zip(a, b):
        overlap = len({c.id for c, _ in ha} & {c.id for c, _ in hb})
        assert overlap >= 4  # double quantization may swap near-ties
