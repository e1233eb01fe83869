import numpy as np

from youtu_rag_tpu.core.config import IndexConfig
from youtu_rag_tpu.core.types import Chunk
from youtu_rag_tpu.index.device_index import DeviceVectorIndex
from youtu_rag_tpu.index.persistence import BuildManifest, load_index, save_index


def _chunks(n):
    return [Chunk(f"c{i}", f"doc{i % 3}", f"text {i}", i, {"k": i}) for i in range(n)]


def test_snapshot_roundtrip(tmp_path, rng, unit_vectors):
    cfg = IndexConfig(min_capacity=128, block_rows=64)
    idx = DeviceVectorIndex(32, cfg)
    embs = unit_vectors(rng, 50, 32)
    idx.add(_chunks(50), embs)
    idx.delete(["c5", "c6"])  # tombstones must not survive the snapshot

    save_index(idx, tmp_path / "snap")
    restored = load_index(tmp_path / "snap")

    assert restored.count() == 48
    assert restored.get_by_id("c5") is None
    q = unit_vectors(rng, 3, 32)
    a = idx.search(q, top_k=5)
    b = restored.search(q, top_k=5)
    for ha, hb in zip(a, b):
        assert [c.id for c, _ in ha] == [c.id for c, _ in hb]
    # filters still compile against the restored schema
    hits = restored.search(q, top_k=5, filters={"k": {"$lt": 10}})
    assert all(c.metadata["k"] < 10 for c, _ in hits[0])


def test_snapshot_empty(tmp_path):
    idx = DeviceVectorIndex(16, IndexConfig(min_capacity=128, block_rows=64))
    save_index(idx, tmp_path / "empty")
    restored = load_index(tmp_path / "empty")
    assert restored.count() == 0


def test_build_manifest_incremental(tmp_path):
    m = BuildManifest()
    etag = BuildManifest.hash_content(b"v1 content")
    mh = BuildManifest.hash_metadata({"a": 1})
    assert m.needs_rebuild("s1", etag, mh)
    m.record("s1", etag, mh, chunk_count=7)
    assert not m.needs_rebuild("s1", etag, mh)
    # content change → rebuild
    assert m.needs_rebuild("s1", BuildManifest.hash_content(b"v2"), mh)
    # metadata change → rebuild
    assert m.needs_rebuild("s1", etag, BuildManifest.hash_metadata({"a": 2}))
    # derived-files change → rebuild
    assert m.needs_rebuild("s1", etag, mh, derived_files_hash="x")

    m.save(tmp_path / "manifest.json")
    m2 = BuildManifest.load(tmp_path / "manifest.json")
    assert not m2.needs_rebuild("s1", etag, mh)
    assert m2.sources["s1"].chunk_count == 7
    m2.forget("s1")
    assert m2.needs_rebuild("s1", etag, mh)


def test_manifest_load_missing(tmp_path):
    m = BuildManifest.load(tmp_path / "nope.json")
    assert m.sources == {}


def test_int8_native_snapshot(tmp_path, rng, unit_vectors):
    """int8 snapshots store raw int8 + scales (no dequantized f32 blob)."""
    cfg = IndexConfig(min_capacity=128, block_rows=64, storage_dtype="int8")
    idx = DeviceVectorIndex(32, cfg)
    idx.add(_chunks(50), unit_vectors(rng, 50, 32))
    save_index(idx, tmp_path / "s8")
    data = np.load(tmp_path / "s8.npz")
    assert "vectors_q" in data and data["vectors_q"].dtype == np.int8
    assert "scales" in data
    restored = load_index(tmp_path / "s8")
    assert restored.config.storage_dtype == "int8"
    q = unit_vectors(rng, 3, 32)
    a = idx.search(q, top_k=5)
    b = restored.search(q, top_k=5)
    for ha, hb in zip(a, b):
        # re-add renormalizes dequantized rows → requantization can swap
        # near-ties; require top-1 identity and high overlap
        assert ha[0][0].id == hb[0][0].id
        assert len({c.id for c, _ in ha} & {c.id for c, _ in hb}) >= 4


def test_ivf_state_survives_snapshot(tmp_path, rng, unit_vectors):
    """An IVF index restores as an IVF index (re-clustered on load), not a
    silent brute-force downgrade."""
    cfg = IndexConfig(min_capacity=2048, block_rows=64, n_lists=8, n_probe=3, kmeans_iters=6)
    idx = DeviceVectorIndex(32, cfg)
    idx.add(_chunks(512), unit_vectors(rng, 512, 32))
    idx.build_ivf(seed=3)
    assert idx._ivf is not None

    save_index(idx, tmp_path / "ivfsnap")
    restored = load_index(tmp_path / "ivfsnap")
    assert restored._ivf is not None
    assert restored._ivf.n_lists == idx._ivf.n_lists
    q = unit_vectors(rng, 4, 32)
    a = idx.search(q, top_k=5)
    b = restored.search(q, top_k=5)
    for ha, hb in zip(a, b):
        assert ha[0][0].id == hb[0][0].id  # top-1 stable across the cycle
