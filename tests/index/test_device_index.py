import numpy as np
import pytest

from youtu_rag_tpu.core.config import IndexConfig
from youtu_rag_tpu.core.types import Chunk
from youtu_rag_tpu.index.device_index import DeviceVectorIndex
from youtu_rag_tpu.index.numpy_ref import NumpyVectorIndex


def make_chunks(n, doc="doc", meta_fn=None):
    return [
        Chunk(
            id=f"{doc}-{i}",
            document_id=doc,
            content=f"content {doc} {i}",
            chunk_index=i,
            metadata=(meta_fn(i) if meta_fn else {"source": doc, "idx": i}),
        )
        for i in range(n)
    ]


@pytest.fixture
def pair(rng, unit_vectors):
    """A device index and a numpy reference index with identical content."""
    d = 64
    cfg = IndexConfig(min_capacity=256, block_rows=128)
    dev = DeviceVectorIndex(d, cfg)
    ref = NumpyVectorIndex(d, cfg, quantize_bf16=True)
    chunks = make_chunks(300, "docA", meta_fn=lambda i: {"source": "docA", "idx": i, "ts": 1000 + i})
    embs = unit_vectors(rng, 300, d)
    dev.add(chunks, embs)
    ref.add(chunks, embs)
    return dev, ref, embs


def _ids(hits):
    return [c.id for c, _ in hits]


def test_basic_search_parity(pair, rng, unit_vectors):
    dev, ref, embs = pair
    queries = unit_vectors(rng, 5, dev.dim)
    for backend in ("xla", "pallas_interpret"):
        got = dev.search(queries, top_k=10, backend=backend)
        want = ref.search(queries, top_k=10)
        for g, w in zip(got, want):
            # summation order differs (MXU vs numpy) → near-ties may swap;
            # require high overlap and matching score values
            overlap = len(set(_ids(g)) & set(_ids(w))) / 10
            assert overlap >= 0.9
            np.testing.assert_allclose([s for _, s in g], [s for _, s in w], atol=3e-2)


def test_recall_at_10(pair, rng, unit_vectors):
    dev, ref, _ = pair
    queries = unit_vectors(rng, 20, dev.dim)
    got = dev.search(queries, top_k=10)
    want = ref.search(queries, top_k=10)
    recalls = [
        len(set(_ids(g)) & set(_ids(w))) / max(len(w), 1) for g, w in zip(got, want)
    ]
    assert np.mean(recalls) >= 0.99


def test_filtered_search_parity(pair, rng, unit_vectors):
    dev, ref, _ = pair
    queries = unit_vectors(rng, 4, dev.dim)
    filters = {"$and": [{"ts": {"$gte": 1100}}, {"ts": {"$lt": 1200}}]}
    got = dev.search(queries, top_k=8, filters=filters)
    want = ref.search(queries, top_k=8, filters=filters)
    for g, w in zip(got, want):
        assert _ids(g) == _ids(w)
        for c, _ in g:
            assert 1100 <= c.metadata["ts"] < 1200


def test_filter_repeated_same_signature(pair, rng, unit_vectors):
    dev, _, _ = pair
    q = unit_vectors(rng, 1, dev.dim)
    r1 = dev.search(q, top_k=3, filters={"source": "docA"})
    r2 = dev.search(q, top_k=3, filters={"source": "nope"})
    assert len(r1[0]) == 3
    assert len(r2[0]) == 0
    assert len(dev._filter_cache) == 1  # same signature shared


def test_delete_and_reinsert(pair, rng, unit_vectors):
    dev, ref, embs = pair
    q = unit_vectors(rng, 1, dev.dim)
    before = dev.search(q, top_k=5)[0]
    victim = before[0][0]
    dev.delete([victim.id])
    ref.delete([victim.id])
    assert dev.count() == ref.count() == 299
    after = dev.search(q, top_k=5)[0]
    assert victim.id not in _ids(after)
    # near-ties may swap between MXU/XLA and numpy summation: compare sets
    assert set(_ids(after)) == set(_ids(ref.search(q, top_k=5)[0]))
    # reinsert with same id → replaces, not duplicates
    dev.add([victim], embs[[int(victim.id.split("-")[1])]])
    assert dev.count() == 300
    again = dev.search(q, top_k=5)[0]
    assert set(_ids(again)) == set(_ids(before))
    assert again[0][0].id == victim.id


def test_delete_by_document(rng, unit_vectors):
    d = 32
    cfg = IndexConfig(min_capacity=128, block_rows=128)
    dev = DeviceVectorIndex(d, cfg)
    dev.add(make_chunks(10, "docA"), unit_vectors(rng, 10, d))
    dev.add(make_chunks(7, "docB"), unit_vectors(rng, 7, d))
    assert dev.delete_by_document_id("docA") == 10
    assert dev.count() == 7
    hits = dev.search(unit_vectors(rng, 1, d), top_k=20)[0]
    assert all(c.document_id == "docB" for c, _ in hits)


def test_capacity_growth(rng, unit_vectors):
    d = 32
    cfg = IndexConfig(min_capacity=128, block_rows=128)
    dev = DeviceVectorIndex(d, cfg)
    for batch in range(4):
        dev.add(make_chunks(100, f"doc{batch}"), unit_vectors(rng, 100, d))
    assert dev.count() == 400
    assert dev.capacity >= 512
    hits = dev.search(unit_vectors(rng, 1, d), top_k=5)[0]
    assert len(hits) == 5


def test_compact_preserves_results(pair, rng, unit_vectors):
    dev, _, _ = pair
    q = unit_vectors(rng, 2, dev.dim)
    dev.delete([f"docA-{i}" for i in range(0, 300, 3)])
    before = [_ids(h) for h in dev.search(q, top_k=10)]
    dev.compact()
    assert dev.count() == 200
    after = [_ids(h) for h in dev.search(q, top_k=10)]
    assert before == after


def test_host_fallback_filter(pair, rng, unit_vectors):
    dev, _, _ = pair
    q = unit_vectors(rng, 1, dev.dim)
    hits = dev.search(q, top_k=5, filters={"source": {"$regex": "^doc"}})[0]
    assert len(hits) == 5


def test_l2_metric(rng, unit_vectors):
    d = 32
    cfg = IndexConfig(min_capacity=128, block_rows=128, metric="l2")
    dev = DeviceVectorIndex(d, cfg)
    ref = NumpyVectorIndex(d, cfg, quantize_bf16=True)
    chunks = make_chunks(150, "docL")
    embs = rng_embs = unit_vectors(rng, 150, d) * 3.0
    dev.add(chunks, embs)
    ref.add(chunks, embs)
    q = unit_vectors(rng, 3, d)
    got = dev.search(q, top_k=5)
    want = ref.search(q, top_k=5)
    for g, w in zip(got, want):
        assert _ids(g) == _ids(w)


def test_empty_index_search(rng, unit_vectors):
    dev = DeviceVectorIndex(32, IndexConfig(min_capacity=128, block_rows=128))
    hits = dev.search(unit_vectors(rng, 1, 32), top_k=5)
    assert hits == [[]]


def test_auto_compact_on_tombstone_ratio(rng, unit_vectors):
    d = 32
    cfg = IndexConfig(min_capacity=512, block_rows=64, auto_compact_ratio=0.5)
    dev = DeviceVectorIndex(d, cfg)
    vecs = unit_vectors(rng, 400, d)
    dev.add(make_chunks(400, "docC"), vecs)
    assert dev.size == 400
    # delete 60% → ratio crosses 0.5 → compaction rebuilds without tombstones
    dev.delete([f"docC-{i}" for i in range(240)])
    assert dev.live_count == 160
    assert dev.size == 160  # compacted
    hits = dev.search(unit_vectors(rng, 1, d), top_k=5)[0]
    assert len(hits) == 5 and all(int(c.id.split("-")[1]) >= 240 for c, _ in hits)


def test_auto_compact_disabled(rng, unit_vectors):
    d = 32
    cfg = IndexConfig(min_capacity=512, block_rows=64, auto_compact_ratio=0.0)
    dev = DeviceVectorIndex(d, cfg)
    dev.add(make_chunks(400, "docD"), unit_vectors(rng, 400, d))
    dev.delete([f"docD-{i}" for i in range(300)])
    assert dev.size == 400  # tombstones retained
    assert dev.live_count == 100


def test_reserve_prevents_growth(rng, unit_vectors):
    d = 32
    dev = DeviceVectorIndex(d, IndexConfig(min_capacity=128, block_rows=128))
    dev.reserve(1000)
    cap = dev.capacity
    assert cap >= 1000
    for batch in range(4):
        dev.add(make_chunks(200, f"r{batch}"), unit_vectors(rng, 200, d))
    assert dev.capacity == cap  # no growth during the appends
    assert dev.count() == 800


def test_update_metadata_reencodes_filters(rng, unit_vectors):
    from youtu_rag_tpu.core.config import IndexConfig
    from youtu_rag_tpu.index.device_index import DeviceVectorIndex

    idx = DeviceVectorIndex(32, IndexConfig(min_capacity=128, block_rows=64))
    embs = unit_vectors(rng, 20, 32)
    chunks = [Chunk(f"c{i}", "d", f"t{i}", i, {"tier": "cold"}) for i in range(20)]
    idx.add(chunks, embs)

    # searches with the old value see everything; new value sees nothing
    q = embs[:1]
    assert len(idx.search(q, top_k=5, filters={"tier": "cold"})[0]) == 5
    assert len(idx.search(q, top_k=5, filters={"tier": "hot"})[0]) == 0

    n = idx.update_metadata(["c0", "c1", "c2", "missing"], [{"tier": "hot"}] * 4)
    assert n == 3
    hot = idx.search(q, top_k=10, filters={"tier": "hot"})[0]
    assert {c.id for c, _ in hot} == {"c0", "c1", "c2"}
    # host-side record agrees with the device columns
    assert idx.get_by_id("c1").metadata == {"tier": "hot"}
    # vectors untouched: unfiltered top-1 for q (= c0's embedding) is still c0
    assert idx.search(q, top_k=1)[0][0][0].id == "c0"


def test_update_metadata_new_key_extends_schema(rng, unit_vectors):
    from youtu_rag_tpu.core.config import IndexConfig
    from youtu_rag_tpu.index.device_index import DeviceVectorIndex

    idx = DeviceVectorIndex(32, IndexConfig(min_capacity=128, block_rows=64))
    idx.add([Chunk("a", "d", "t", 0, {})], unit_vectors(rng, 1, 32))
    idx.update_metadata(["a"], [{"brand_new": 7}])
    hits = idx.search(unit_vectors(rng, 1, 32), top_k=1, filters={"brand_new": 7})[0]
    assert [c.id for c, _ in hits] == ["a"]


def test_clear_compact_preserve_lock_object(pair):
    """ADVICE r1: clear()/compact() must never reassign self._lock —
    threads blocked on the old lock would race holders of the new one."""
    dev, _, embs = pair
    lock = dev._lock
    dev.delete([dev._chunks[0].id])
    dev.compact()
    assert dev._lock is lock
    dev.clear()
    assert dev._lock is lock
    assert dev.count() == 0
    # index is fully usable after the in-place reset
    chunks = make_chunks(10, "post-clear")
    dev.add(chunks, embs[:10])
    assert dev.count() == 10
    assert dev.search(embs[:1], top_k=1)[0][0][0].id == "post-clear-0"
