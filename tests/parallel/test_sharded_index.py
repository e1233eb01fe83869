"""Multi-device tests on the 8-virtual-CPU-device mesh (conftest sets
xla_force_host_platform_device_count=8)."""

import numpy as np
import pytest

from youtu_rag_tpu.core.config import IndexConfig
from youtu_rag_tpu.core.types import Chunk
from youtu_rag_tpu.index.numpy_ref import NumpyVectorIndex
from youtu_rag_tpu.parallel.mesh import get_mesh
from youtu_rag_tpu.parallel.sharded_index import ShardedVectorIndex


def make_chunks(n, doc="doc"):
    return [
        Chunk(f"{doc}-{i}", doc, f"content {i}", i, {"source": doc, "idx": i})
        for i in range(n)
    ]


def test_mesh_shapes():
    m = get_mesh()
    assert m.shape["db"] == 8
    m2 = get_mesh({"dp": 2, "tp": 4})
    assert m2.shape == {"dp": 2, "tp": 4}
    m3 = get_mesh({"dp": -1, "tp": 2})
    assert m3.shape["dp"] == 4


@pytest.fixture(scope="module")
def sharded_pair():
    rng = np.random.default_rng(1)
    d = 64
    cfg = IndexConfig(min_capacity=1024, block_rows=128)
    mesh = get_mesh({"db": 8})
    dev = ShardedVectorIndex(d, cfg, mesh=mesh)
    ref = NumpyVectorIndex(d, cfg, quantize_bf16=True)
    chunks = make_chunks(900, "docS")
    embs = rng.normal(size=(900, d)).astype(np.float32)
    embs /= np.linalg.norm(embs, axis=1, keepdims=True)
    dev.add(chunks, embs)
    ref.add(chunks, embs)
    return dev, ref, rng


def _ids(hits):
    return [c.id for c, _ in hits]


def test_sharded_capacity_divisible(sharded_pair):
    dev, _, _ = sharded_pair
    assert dev.capacity % (8 * dev.config.block_rows) == 0


def test_sharded_search_parity(sharded_pair):
    dev, ref, rng = sharded_pair
    q = rng.normal(size=(6, dev.dim)).astype(np.float32)
    got = dev.search(q, top_k=10)
    want = ref.search(q, top_k=10)
    for g, w in zip(got, want):
        overlap = len(set(_ids(g)) & set(_ids(w))) / 10
        assert overlap >= 0.9
        np.testing.assert_allclose(
            [s for _, s in g][:5], [s for _, s in w][:5], atol=3e-2
        )


def test_sharded_filtered_search(sharded_pair):
    dev, ref, rng = sharded_pair
    q = rng.normal(size=(2, dev.dim)).astype(np.float32)
    filters = {"idx": {"$gte": 100, "$lt": 200}}
    got = dev.search(q, top_k=5, filters=filters)
    want = ref.search(q, top_k=5, filters=filters)
    for g, w in zip(got, want):
        assert _ids(g) == _ids(w)
        for c, _ in g:
            assert 100 <= c.metadata["idx"] < 200


def test_sharded_delete(sharded_pair):
    dev, ref, rng = sharded_pair
    q = rng.normal(size=(1, dev.dim)).astype(np.float32)
    top = dev.search(q, top_k=3)[0]
    victim = top[0][0].id
    dev.delete([victim])
    ref.delete([victim])
    after = dev.search(q, top_k=3)[0]
    assert victim not in _ids(after)
    assert _ids(after) == _ids(ref.search(q, top_k=3)[0])


def test_sharded_matches_single_device():
    """Same data through ShardedVectorIndex (8 dev) vs DeviceVectorIndex (1)."""
    from youtu_rag_tpu.index.device_index import DeviceVectorIndex

    rng = np.random.default_rng(2)
    d = 32
    cfg = IndexConfig(min_capacity=512, block_rows=64)
    chunks = make_chunks(500, "docP")
    embs = rng.normal(size=(500, d)).astype(np.float32)
    single = DeviceVectorIndex(d, cfg)
    multi = ShardedVectorIndex(d, cfg, mesh=get_mesh({"db": 8}))
    single.add(chunks, embs)
    multi.add(chunks, embs)
    q = rng.normal(size=(4, d)).astype(np.float32)
    s_hits = single.search(q, top_k=7)
    m_hits = multi.search(q, top_k=7)
    for s, m in zip(s_hits, m_hits):
        assert set(_ids(s)) == set(_ids(m))


def test_sharded_int8_matches_numpy():
    rng = np.random.default_rng(5)
    d = 64
    cfg = IndexConfig(min_capacity=1024, block_rows=64, storage_dtype="int8")
    mesh = get_mesh({"db": 8})
    dev = ShardedVectorIndex(d, cfg, mesh=mesh)
    ref = NumpyVectorIndex(d, cfg)
    chunks = make_chunks(600, "doc8")
    embs = rng.normal(size=(600, d)).astype(np.float32)
    embs /= np.linalg.norm(embs, axis=1, keepdims=True)
    dev.add(chunks, embs)
    ref.add(chunks, embs)
    q = rng.normal(size=(4, d)).astype(np.float32)
    got = dev.search(q, top_k=10)
    want = ref.search(q, top_k=10)
    recalls = [
        len({c.id for c, _ in g} & {c.id for c, _ in w}) / 10 for g, w in zip(got, want)
    ]
    assert np.mean(recalls) >= 0.9, recalls
    # delete works across shards
    victim = got[0][0][0].id
    dev.delete([victim])
    after = dev.search(q[:1], top_k=10)[0]
    assert victim not in [c.id for c, _ in after]


def test_sharded_ivf_recall_and_tail():
    rng = np.random.default_rng(9)
    d = 64
    centers = rng.normal(size=(8, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    parts = []
    for c in centers:
        pts = c[None] + 0.05 * rng.normal(size=(96, d)).astype(np.float32)
        parts.append(pts / np.linalg.norm(pts, axis=1, keepdims=True))
    vecs = np.concatenate(parts)  # 768 rows
    order = rng.permutation(len(vecs))
    vecs = vecs[order]

    cfg = IndexConfig(min_capacity=1024, block_rows=64, n_lists=8, n_probe=3, kmeans_iters=8)
    mesh = get_mesh({"db": 8})
    idx = ShardedVectorIndex(d, cfg, mesh=mesh)
    idx.add([Chunk(f"c{i}", "doc", f"t{i}", i, {"i": i}) for i in range(len(vecs))], vecs)

    q = centers[:4] + 0.03 * rng.normal(size=(4, d)).astype(np.float32)
    brute = [[c.id for c, _ in h] for h in idx.search(q, top_k=10)]
    idx.build_ivf()
    ivf = [[c.id for c, _ in h] for h in idx.search(q, top_k=10)]
    recalls = [len(set(a) & set(b)) / 10 for a, b in zip(brute, ivf)]
    assert np.mean(recalls) >= 0.9, recalls

    # filters fuse into the sharded IVF path too
    hits = idx.search(q[:1], top_k=5, filters={"i": {"$lt": 400}})[0]
    assert hits and all(c.metadata["i"] < 400 for c, _ in hits)

    # fresh-tail: a novel vector appended after the freeze is findable
    novel = rng.normal(size=(1, d)).astype(np.float32)
    novel /= np.linalg.norm(novel)
    idx.add([Chunk("novel", "newdoc", "novel", 0)], novel)
    top = idx.search(novel, top_k=1)[0]
    assert top[0][0].id == "novel"


def test_sharded_clear_compact_preserve_mesh():
    """ADVICE r1: the inherited __init__-based reset used to rebind the
    index to the default mesh/axis (device positional landing in mesh)."""
    rng = np.random.default_rng(3)
    d = 32
    cfg = IndexConfig(min_capacity=1024, block_rows=64)
    mesh = get_mesh({"rows": 8})
    idx = ShardedVectorIndex(d, cfg, mesh=mesh, axis="rows")
    lock = idx._lock
    vecs = rng.normal(size=(100, d)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    idx.add(make_chunks(100, "m"), vecs)
    idx.delete(["m-0"])
    idx.compact()
    assert idx.mesh is mesh and idx.axis == "rows" and idx._lock is lock
    assert idx.count() == 99
    assert idx.search(vecs[1:2], top_k=1)[0][0][0].id == "m-1"
    idx.clear()
    assert idx.mesh is mesh and idx.axis == "rows" and idx._lock is lock
    idx.add(make_chunks(8, "n"), vecs[:8])
    assert idx.search(vecs[:1], top_k=1)[0][0][0].id == "n-0"


def test_sharded_ivf_uneven_tail_not_truncated():
    """ADVICE r1: the probe-plan size must budget the fresh tail of the
    *least*-frozen shard; sizing by max(frozen_local) silently dropped
    post-freeze rows landing deep in an empty shard's tail."""
    rng = np.random.default_rng(11)
    d = 32
    cfg = IndexConfig(
        min_capacity=32768, block_rows=64, n_lists=32, n_probe=1, kmeans_iters=4
    )
    mesh = get_mesh({"db": 8})
    idx = ShardedVectorIndex(d, cfg, mesh=mesh)

    def unit(n):
        v = rng.normal(size=(n, d)).astype(np.float32)
        return v / np.linalg.norm(v, axis=1, keepdims=True)

    # 2560 rows all land in shard 0 (40/64 blocks frozen); shards 1-7 empty
    idx.add(make_chunks(2560, "base"), unit(2560))
    idx.build_ivf()
    assert idx._ivf_frozen_min == 0  # an empty shard is 100% fresh tail
    # append past shard 0 into shard 1's deep tail (block ≥ 32 of shard 1)
    idx.add(make_chunks(3700, "tail"), unit(3700))
    novel = unit(1)
    idx.add([Chunk("novel", "newdoc", "novel", 0, {})], novel)
    top = idx.search(novel, top_k=1)[0]
    assert top and top[0][0].id == "novel"


def test_ring_permutation_matches_gather():
    """The ppermute-ring global permutation (VERDICT r2 weak #8) must
    agree with the GSPMD-gather path on an arbitrary cross-shard
    permutation, for bf16 and int8 storage."""
    rng = np.random.default_rng(9)
    d = 32
    for dtype in ("bfloat16", "int8"):
        cfg = IndexConfig(min_capacity=256, block_rows=32, storage_dtype=dtype)
        mesh = get_mesh({"db": 8})
        idx = ShardedVectorIndex(d, cfg, mesh=mesh)
        chunks = make_chunks(200, "docR")
        embs = rng.normal(size=(200, d)).astype(np.float32)
        embs /= np.linalg.norm(embs, axis=1, keepdims=True)
        idx.add(chunks, embs)

        perm = rng.permutation(idx.capacity).astype(np.int64)
        want = (
            np.asarray(idx._global_perm_fn(
                idx._vectors, idx._cols, idx._bias, idx._scales_or_dummy(), perm
            )[0]),
            np.asarray(idx._bias)[perm],
        )
        v, c, b, s = idx._permute_global_ring(perm)
        np.testing.assert_array_equal(np.asarray(v), want[0])
        np.testing.assert_allclose(np.asarray(b), want[1])
        if dtype == "int8":
            np.testing.assert_allclose(
                np.asarray(s), np.asarray(idx._scales_or_dummy())[perm]
            )


def test_multiprocess_style_compact_via_ring():
    """Cross-shard compaction through _permute_global: live rows gather to
    the global front; search results unchanged."""
    rng = np.random.default_rng(10)
    d = 32
    cfg = IndexConfig(min_capacity=256, block_rows=32, auto_compact_ratio=0.0)
    mesh = get_mesh({"db": 8})
    idx = ShardedVectorIndex(d, cfg, mesh=mesh)
    chunks = make_chunks(200, "docC")
    embs = rng.normal(size=(200, d)).astype(np.float32)
    embs /= np.linalg.norm(embs, axis=1, keepdims=True)
    idx.add(chunks, embs)
    idx.delete([f"docC-{i}" if chunks[0].id.startswith("docC-") else chunks[i].id for i in range(0, 100, 2)])
    before = [_ids(h) for h in idx.search(embs[:4], top_k=5)]

    # run the multi-process compact body (ring permutation) directly
    live = [r for r, c in enumerate(idx._chunks) if c is not None]
    dead = [r for r, c in enumerate(idx._chunks) if c is None]
    perm = np.asarray(live + dead, np.int64)
    full = np.concatenate([perm, np.arange(idx.size, idx.capacity)])
    idx._permute_global(full)
    idx._chunks = [idx._chunks[o] for o in perm[: len(live)]]
    idx._rebuild_host_maps()
    idx.size = len(live)
    idx.live_count = len(live)

    after = [_ids(h) for h in idx.search(embs[:4], top_k=5)]
    assert before == after


def test_sharded_int4_two_stage():
    """int4-packed shards on the 8-device mesh: per-shard kernel unpacks
    locally, the tiny candidate merge crosses the mesh, and the host
    int8-shadow re-rank recovers the quantization floor."""
    rng = np.random.default_rng(9)
    d = 64
    mesh = get_mesh({"db": 8})
    cfg = IndexConfig(storage_dtype="int4", min_capacity=1024, block_rows=128)
    dev = ShardedVectorIndex(d, cfg, mesh=mesh)
    chunks = make_chunks(900, "doc4")
    embs = rng.normal(size=(900, d)).astype(np.float32)
    embs /= np.linalg.norm(embs, axis=1, keepdims=True)
    dev.add(chunks, embs)
    assert dev._vectors.shape[1] == dev.d_pad // 2  # packed width, sharded rows
    assert dev._host_q8 is not None

    exact = np.argsort(-(embs[:8] @ embs.T), axis=1)[:, :10]
    hits = dev.search(embs[:8], top_k=10)
    recall = np.mean([
        len({int(c.id.split("-")[1]) for c, _ in hits[qi]} & set(exact[qi])) / 10
        for qi in range(8)
    ])
    assert recall >= 0.95, recall
    # self-hit first, with int8-precision score
    assert hits[0][0][0].id == "doc4-0" and hits[0][0][1] > 0.98

    dev.delete(["doc4-0"])
    hits = dev.search(embs[:1], top_k=5)
    assert all(c.id != "doc4-0" for c, _ in hits[0])

    # IVF over packed shards (full-probe defaults → exact)
    dev.build_ivf(n_lists=4)
    hits = dev.search(embs[5:6], top_k=3)
    assert hits[0][0][0].id == "doc4-5"

    # compaction keeps the shadow aligned (single-process: base rebuild)
    dev.compact()
    hits = dev.search(embs[5:6], top_k=3)
    assert hits[0][0][0].id == "doc4-5"
    assert hits[0][0][1] > 0.98


def test_dp_embedder_parity_over_mesh():
    """Multi-chip serving embeds data-parallel: the dp-sharded forward
    matches the single-device forward, and batch buckets stay divisible
    by the device count."""
    import jax
    from jax.sharding import Mesh

    from youtu_rag_tpu.models.embedder import TpuEmbedder
    from youtu_rag_tpu.models.encoder import EncoderConfig

    cfg = EncoderConfig(d_model=64, n_layers=2, n_heads=2, d_ff=128,
                        out_dim=64, vocab_size=512, max_len=64,
                        attention_impl="xla")
    plain = TpuEmbedder(config=cfg, batch_size=16, seed=3)
    mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))
    dp = TpuEmbedder(config=cfg, params=plain.params, batch_size=16, mesh=mesh)
    assert dp._dp == 8
    texts = [f"sample text number {i} about topic {i % 3}" for i in range(5)]
    a = plain.embed_batch(texts)
    b = dp.embed_batch(texts)
    np.testing.assert_allclose(a, b, atol=2e-5, rtol=2e-5)


def test_kb_with_mesh_passes_dp_embedder():
    from youtu_rag_tpu.core.config import RAGConfig, VectorStoreConfig
    from youtu_rag_tpu.retrieval.kb import KnowledgeBase

    mesh = get_mesh({"db": 8})
    # hash provider: the mesh kwarg is ignored gracefully
    kb = KnowledgeBase(
        "dp_kb",
        RAGConfig(vector_store=VectorStoreConfig(index=IndexConfig(min_capacity=1024, block_rows=128))),
        mesh=mesh,
    )
    assert kb.store._mesh is mesh


def test_dp_embedder_non_pow2_device_count():
    """Batch bucket floors must be MULTIPLES of dp (max(8, dp) breaks
    for dp=6: bucket 8 is not divisible by 6)."""
    import jax
    from jax.sharding import Mesh

    from youtu_rag_tpu.models.embedder import TpuEmbedder
    from youtu_rag_tpu.models.encoder import EncoderConfig

    cfg = EncoderConfig(d_model=64, n_layers=1, n_heads=2, d_ff=128,
                        out_dim=64, vocab_size=512, max_len=64,
                        attention_impl="xla")
    mesh = Mesh(np.array(jax.devices()[:6]), ("dp",))
    emb = TpuEmbedder(config=cfg, batch_size=16, mesh=mesh)
    out = emb.embed_batch(["alpha beta", "gamma", "delta epsilon zeta"])
    assert out.shape == (3, 64)
    assert np.all(np.isfinite(out))
