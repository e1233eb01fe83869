"""Regression pins for the retrieval review findings."""

import asyncio

import numpy as np

from youtu_rag_tpu.core.config import (
    IndexConfig,
    MonitorConfig,
    RetrieverConfig,
    VectorStoreConfig,
)
from youtu_rag_tpu.core.types import Chunk, RetrievalResult
from youtu_rag_tpu.models.embedder import HashEmbedder
from youtu_rag_tpu.retrieval.context import ContextAssembler
from youtu_rag_tpu.retrieval.monitoring import StorageMonitor
from youtu_rag_tpu.retrieval.retriever import HybridRetriever
from youtu_rag_tpu.retrieval.store import TpuVectorStore


def _store_with(texts, emb):
    cfg = VectorStoreConfig(index=IndexConfig(min_capacity=128, block_rows=64))
    store = TpuVectorStore(cfg)
    vecs = emb.embed_batch(texts)
    chunks = [
        Chunk(f"c{i}", f"d{i}", t, 0, {}, embedding=vecs[i].tolist())
        for i, t in enumerate(texts)
    ]
    asyncio.run(store.add_chunks(chunks))
    return store


def test_empty_query_batch_returns_empty():
    emb = HashEmbedder(dim=64)
    store = _store_with(["alpha beta", "gamma delta"], emb)
    assert asyncio.run(store.search_batch(np.zeros((0, 64), np.float32))) == []


def test_hybrid_honors_threshold_and_reranker():
    emb = HashEmbedder(dim=64)
    store = _store_with(["pizza with cheese", "jupiter red spot", "tax law"], emb)

    calls = []

    class SpyReranker:
        async def rerank(self, query, results, top_k=None):
            calls.append(query)
            return list(reversed(results))[:top_k]

    r = HybridRetriever(
        store, emb, RetrieverConfig(top_k=2, similarity_threshold=0.0),
        reranker=SpyReranker(),
    )
    # impossible threshold now actually filters hybrid results
    none = asyncio.run(r.retrieve("pizza cheese", similarity_threshold=0.99))
    assert none == []
    # reranker engages when requested (was silently dropped before)
    hits = asyncio.run(r.retrieve("pizza cheese", enable_reranking=True))
    assert calls and hits
    # hybrid scores stay dense similarities, not ~1/60 RRF artifacts
    plain = asyncio.run(r.retrieve("pizza cheese"))
    assert plain[0].score > 0.2


def test_context_assembler_truncates_oversized_top_hit():
    ca = ContextAssembler(max_context_length=200)
    big = RetrievalResult(
        chunk=Chunk("c", "d", "x" * 2000, 0, {}), score=0.9, rank=1
    )
    out = ca.assemble([big])
    assert out  # used to be "" — zero context for the LLM
    assert len(out) <= 220


def test_alerts_fire_with_logging_disabled():
    mon = StorageMonitor(
        None,
        MonitorConfig(enable_query_logging=False, enable_alerts=True,
                      alert_thresholds={"query_latency_ms": 10.0}),
        name="kb",
    )
    asyncio.run(mon.log_query("q", latency_ms=50.0, result_count=1))
    assert len(mon._alerts) == 1
    assert len(mon._queries) == 0  # logging stays off
