"""CoalescingEmbedder: concurrent embed calls merge into one dispatch."""

import asyncio

import numpy as np

from youtu_rag_tpu.core.config import EmbeddingConfig
from youtu_rag_tpu.models.embedder import CoalescingEmbedder, EmbedderFactory, HashEmbedder


class CountingEmbedder(HashEmbedder):
    def __init__(self, dim=64):
        super().__init__(dim=dim, use_native=False)
        self.calls = 0
        self.batch_sizes = []

    async def embed_texts(self, texts):
        self.calls += 1
        self.batch_sizes.append(len(texts))
        return await super().embed_texts(texts)


def test_concurrent_queries_coalesce():
    inner = CountingEmbedder()
    emb = CoalescingEmbedder(inner, window_ms=20.0)
    queries = [f"query number {i}" for i in range(16)]

    async def go():
        results = await asyncio.gather(*(emb.embed_query(q) for q in queries))
        expects = [(await inner.embed_texts([q]))[0] for q in queries]
        return results, expects

    results, expects = asyncio.run(go())
    # all 16 should have merged into very few underlying dispatches
    # (the 16 expects afterwards each count as one call)
    assert inner.calls <= 3 + 16
    assert emb.stats["items"] == 16
    for r, e in zip(results, expects):
        np.testing.assert_allclose(r, e, rtol=1e-6)


def test_results_sliced_per_caller():
    inner = CountingEmbedder()
    emb = CoalescingEmbedder(inner, window_ms=20.0)

    async def go():
        a, b = await asyncio.gather(
            emb.embed_texts(["alpha one", "alpha two", "alpha three"]),
            emb.embed_texts(["beta one"]),
        )
        direct = await inner.embed_texts(["beta one"])
        return a, b, direct

    a, b, direct = asyncio.run(go())
    assert len(a) == 3 and len(b) == 1
    np.testing.assert_allclose(b[0], direct[0], rtol=1e-6)


def test_max_batch_flushes_early():
    inner = CountingEmbedder()
    emb = CoalescingEmbedder(inner, window_ms=500.0, max_batch=4)

    async def go():
        t0 = asyncio.get_running_loop().time()
        await asyncio.gather(*(emb.embed_query(f"q{i}") for i in range(4)))
        return asyncio.get_running_loop().time() - t0

    # 4 requests hit max_batch → flush without waiting out the 500ms window
    assert asyncio.run(go()) < 0.4
    assert inner.calls == 1 and inner.batch_sizes == [4]


def test_error_propagates_to_all_waiters():
    class FailingEmbedder(HashEmbedder):
        async def embed_texts(self, texts):
            raise ValueError("backend down")

    emb = CoalescingEmbedder(FailingEmbedder(use_native=False), window_ms=10.0)

    async def go():
        results = await asyncio.gather(
            emb.embed_query("a"), emb.embed_query("b"), return_exceptions=True
        )
        # the worker survives a failed batch: swap in a working inner
        emb.inner = HashEmbedder(dim=512, use_native=False)
        out = await emb.embed_query("recovered")
        return results, out

    results, out = asyncio.run(go())
    assert all(isinstance(r, RuntimeError) for r in results)
    assert len(out) == 512


def test_empty_input():
    emb = CoalescingEmbedder(HashEmbedder(use_native=False), window_ms=5.0)
    assert asyncio.run(emb.embed_texts([])) == []


def test_factory_wraps_when_configured():
    cfg = EmbeddingConfig(provider="hash", coalesce_window_ms=5.0, dimensions=64)
    emb = EmbedderFactory.create(cfg)
    assert isinstance(emb, CoalescingEmbedder)
    assert emb.dimension == 64
    assert len(asyncio.run(emb.embed_query("hello world"))) == 64
    # off by default
    assert not isinstance(
        EmbedderFactory.create(EmbeddingConfig(provider="hash")), CoalescingEmbedder
    )


def test_worker_restarts_across_event_loops():
    cfg = EmbeddingConfig(provider="hash", coalesce_window_ms=2.0, dimensions=32)
    emb = EmbedderFactory.create(cfg)
    r1 = asyncio.run(emb.embed_query("loop one"))
    r2 = asyncio.run(emb.embed_query("loop two"))  # new loop → worker restarts
    assert len(r1) == 32 and len(r2) == 32
