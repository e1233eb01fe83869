"""Search-path request coalescing (retrieval/store.py::_SearchCoalescer):
concurrent searches inside the window share one fused kernel launch per
(top_k, filters) signature, results slice back per caller exactly."""

import asyncio

import numpy as np
import pytest

from youtu_rag_tpu.core.config import IndexConfig, VectorStoreConfig
from youtu_rag_tpu.core.types import Chunk
from youtu_rag_tpu.retrieval.store import TpuVectorStore


def _mk_store(window_ms=20.0):
    cfg = VectorStoreConfig(
        index=IndexConfig(min_capacity=256, block_rows=64),
        coalesce_window_ms=window_ms,
    )
    return TpuVectorStore(cfg)


def _chunks(n, d=32):
    rng = np.random.default_rng(0)
    out = []
    for i in range(n):
        v = rng.normal(size=d)
        v[i % d] += 6.0  # distinctive direction per chunk
        out.append(
            Chunk(f"c{i}", f"doc{i}", f"text {i}", 0, {"grp": i % 2},
                  embedding=(v / np.linalg.norm(v)).tolist())
        )
    return out


def test_concurrent_searches_coalesce_and_slice_back():
    async def go():
        store = _mk_store()
        chunks = _chunks(16)
        await store.add_chunks(chunks)
        # fire 6 concurrent single-query searches targeting distinct chunks
        queries = [np.asarray(chunks[i].embedding, np.float32) for i in (1, 3, 5, 7, 9, 11)]
        results = await asyncio.gather(
            *(store.search_batch([q], top_k=2) for q in queries)
        )
        for i, res in zip((1, 3, 5, 7, 9, 11), results):
            assert len(res) == 1 and res[0][0][0].id == f"c{i}"
        stats = store._coalescer().stats
        assert stats["queries"] == 6
        # all six shared dispatches (same top_k, no filters → one group);
        # allow 2 in case the first call raced ahead of the window
        assert stats["dispatches"] <= 2
        assert stats["max_merged"] >= 5
        return True

    assert asyncio.run(go())


def test_different_filters_get_separate_launches_with_correct_results():
    async def go():
        store = _mk_store()
        chunks = _chunks(16)
        await store.add_chunks(chunks)
        q = np.asarray(chunks[4].embedding, np.float32)
        r_all, r_g0, r_g1 = await asyncio.gather(
            store.search_batch([q], top_k=4),
            store.search_batch([q], top_k=4, filters={"grp": 0}),
            store.search_batch([q], top_k=4, filters={"grp": 1}),
        )
        assert r_all[0][0][0].id == "c4"
        assert all(c.metadata["grp"] == 0 for c, _ in r_g0[0])
        assert all(c.metadata["grp"] == 1 for c, _ in r_g1[0])
        assert r_g0[0][0][0].id == "c4"  # grp 0 contains c4
        return True

    assert asyncio.run(go())


def test_errors_propagate_to_all_waiters():
    async def go():
        store = _mk_store()
        await store.add_chunks(_chunks(8))

        class Boom(Exception):
            pass

        orig = store._index.search

        def broken(*a, **k):
            raise Boom("kernel exploded")

        store._index.search = broken
        q = np.asarray(_chunks(1)[0].embedding, np.float32)
        outs = await asyncio.gather(
            store.search_batch([q], top_k=2),
            store.search_batch([q], top_k=2),
            return_exceptions=True,
        )
        assert all(isinstance(o, Boom) for o in outs)
        store._index.search = orig
        # the coalescer worker survives for subsequent calls
        ok = await store.search_batch([q], top_k=2)
        assert ok and ok[0]
        return True

    assert asyncio.run(go())


def test_query_batch_pow2_bucketing():
    """Odd query counts pad to the next pow2 bucket (one executable per
    bucket instead of one per count) and slice back exactly."""
    async def go():
        store = _mk_store(window_ms=0.0)
        chunks = _chunks(16)
        await store.add_chunks(chunks)
        for n in (1, 3, 5, 6):
            qs = [np.asarray(chunks[i].embedding, np.float32) for i in range(n)]
            res = await store.search_batch(qs, top_k=2)
            assert len(res) == n
            for i, hits in enumerate(res):
                assert hits[0][0].id == f"c{i}"
        sigs = {s[0] for s in store._index._seen_sigs}
        assert sigs <= {1, 2, 4, 8}  # bucketed, not per-count
        return True

    assert asyncio.run(go())


def test_window_zero_bypasses_coalescer():
    async def go():
        store = _mk_store(window_ms=0.0)
        await store.add_chunks(_chunks(8))
        q = np.asarray(_chunks(1)[0].embedding, np.float32)
        res = await store.search_batch([q], top_k=2)
        assert res[0]
        assert store._search_coalescer is None
        return True

    assert asyncio.run(go())
